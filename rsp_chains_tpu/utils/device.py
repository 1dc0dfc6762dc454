"""Bounded TPU device acquisition.

On this runtime the chip is reached through a TCP relay; when the tunnel is
down, ``jax.devices()`` blocks forever in connect retries. Standalone scripts
(bench.py, benchmarks/warm_cache.py) must fail loudly after a bound instead
of hanging their caller — and must NOT retry in a loop (a killed probe
re-poisons the relay; see CLAUDE.md)."""

from __future__ import annotations

import threading


def acquire_device(timeout_s: float = 600.0):
    """Return ``jax.devices()[0]`` or raise ``TimeoutError`` after
    ``timeout_s``. The acquisition runs in a daemon thread so a hung relay
    never blocks the caller past the bound."""
    import jax

    box: dict = {}

    def _get():
        try:
            box["dev"] = jax.devices()[0]
        except Exception as e:  # noqa: BLE001 — report the real failure
            box["err"] = e

    t = threading.Thread(target=_get, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if "dev" in box:
        return box["dev"]
    if "err" in box:
        raise TimeoutError(f"device acquisition failed: {box['err']}")
    raise TimeoutError(
        f"device acquisition timed out after {timeout_s:.0f}s "
        "(TPU relay tunnel unreachable)")
