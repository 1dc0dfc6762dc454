"""Tracing / profiling (SURVEY §5.1).

The reference's observability is Verilator waveform dumps; the TPU analogs are
``jax.profiler`` traces (every chain stage already runs under a
``jax.named_scope`` so stages appear as annotations in the trace viewer) and
wall-clock per-stage timing sweeps."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rsp_trace"):
    """Capture a jax.profiler trace of the enclosed block (open with xprof /
    tensorboard). Stage named_scopes appear as trace annotations."""
    import jax

    with jax.profiler.trace(log_dir):
        yield log_dir


def _timeit(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def stage_timings(chain, x, rt, iters: int = 20) -> Dict[str, float]:
    """Wall-clock seconds per cumulative stage prefix of a chain. Each prefix is
    jitted separately; the marginal cost of stage k is t[k] - t[k-1] (fusion
    means stages are not independently timeable — the prefix deltas are the
    honest number)."""
    import jax

    from ..chain import Chain

    out: Dict[str, float] = {}
    for k in range(1, len(chain.stages) + 1):
        prefix = Chain(chain.cfg, chain.stages[:k])
        f = jax.jit(prefix.__call__)
        out[chain.stages[k - 1].name] = _timeit(f, x, rt, iters=iters)
    return out
