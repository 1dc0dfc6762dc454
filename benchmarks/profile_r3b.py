"""r3 on-chip ladder: the fused FFT+mag+GOS/CASH whole-chain kernel.

Validates the new ``fused_chain_gos`` (digest vs the XLA GOSCA composition —
device->host array fetches are unreliable on this runtime, so only scalars
cross) and times the runtime-dispatch preset across the CA / GOS / CASH
register settings at the headline CPI (64 x 256 x 1024), GOSCA wmax=64
elaboration. Run alone (ONE TPU process at a time; see CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import threading

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import measure_per_call
    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
        fft_mag_cfar_chain,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.utils.device import acquire_device

    dev = acquire_device(600)
    print(f"device: {dev}", file=sys.stderr)

    channels, pulses, n = 64, 256, 1024
    samples = channels * pulses * n

    def build(use_pallas: bool):
        cfg = ChainConfig(
            fft=FftConfig(max_size=n),
            cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                            include_cash=True, max_fft_size=n,
                            use_pallas=use_pallas),
        )
        return fft_mag_cfar_chain(cfg)

    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(channels, pulses, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(channels, pulses, n) * 100, jnp.float32))
    # validation batch: the XLA GOSCA reference materializes a
    # [frames, 64, 1024] window stack — full bench scale is ~4.3 GB and
    # crashes the remote compile helper (r3b first attempt); 8 channels
    # keeps the reference tractable while validating every datapath
    xv = C(x.re[:8], x.im[:8])

    regs = {
        "ca": dict(cfar_algorithm=0, cfar_mode=0),
        "gos_w32": dict(cfar_algorithm=1, cfar_mode=0, index_lagg=16,
                        index_lead=16),
        "gos_go_w64": dict(cfar_algorithm=1, cfar_mode=1, ref_window_size=64,
                           index_lagg=48, index_lead=48, div_sum=6),
        "cash": dict(cfar_algorithm=0, cfar_mode=3, sub_window_size=8),
    }

    f_xla = build(False).jit()
    f_pal = build(True).jit()

    results = {}
    for name, kw in regs.items():
        base = dict(fft_size=n, ref_window_size=32, guard_window_size=4,
                    threshold_scaler=3.5, div_sum=5)
        base.update(kw)
        rt = RuntimeConfig.make(**base)
        verdict = {}

        def work():
            try:
                def digests(a, r):
                    o1 = f_xla(a, r)
                    o2 = f_pal(a, r)
                    scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
                    return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / scale,
                            jnp.sum(o1.peaks.astype(jnp.int32)
                                    - o2.peaks.astype(jnp.int32) != 0))

                dthr, dpk = jax.jit(digests)(xv, rt)
                verdict["dthr"] = float(dthr)
                verdict["flips"] = int(dpk)
                verdict["ms"] = measure_per_call(f_pal, x, rt) * 1e3
            except Exception as e:  # noqa: BLE001
                verdict["err"] = f"{type(e).__name__}: {e}"[:400]

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(timeout=3600)
        if t.is_alive():
            verdict["err"] = "timeout"
        results[name] = verdict
        print(f"{name}: {verdict}", file=sys.stderr)
        if "err" in verdict:
            break  # a wedged relay poisons every later candidate

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
