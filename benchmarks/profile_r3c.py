"""Isolate the r3b compile failure: compile-check each piece separately on
chip — (1) the XLA GOSCA chain at small batch, (2) fused_chain_gos at wmax=16,
(3) fused_chain_gos at wmax=64, (4) the dispatch op. Small batches; each step
prints before/after so the crashing compile is identified."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
        fft_mag_cfar_chain,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_gos, fused_chain_gos_op,
    )
    from rsp_chains_tpu.utils.device import acquire_device

    dev = acquire_device(600)
    print(f"device: {dev}", file=sys.stderr, flush=True)

    n = 1024
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(16, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(16, n) * 100, jnp.float32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=8,
                            guard_window_size=2, cfar_algorithm=1,
                            index_lagg=4, index_lead=4, threshold_scaler=3.5)

    def cfar(wmax, cash):
        return CfarConfig(max_ref_window=wmax, max_guard_window=4,
                          variant=CfarVariant.GOSCA, include_cash=cash,
                          max_fft_size=n)

    steps = []

    def step(name, fn):
        t0 = time.time()
        print(f"--- {name} ...", file=sys.stderr, flush=True)
        try:
            out = fn()
            jax.block_until_ready(out)
            s = float(jnp.max(out.threshold)) if hasattr(out, "threshold") else 0
            print(f"{name}: OK ({time.time()-t0:.1f}s, digest {s:.4g})",
                  file=sys.stderr, flush=True)
            steps.append((name, "ok"))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:500],
                  file=sys.stderr, flush=True)
            steps.append((name, "fail"))

    fft_cfg = FftConfig(max_size=n)

    step("gos_kernel_wmax16", lambda: jax.jit(
        lambda a, r: fused_chain_gos(a, r, fft_cfg, cfar(16, False)))(x, rt))
    step("gos_kernel_wmax64", lambda: jax.jit(
        lambda a, r: fused_chain_gos(a, r, fft_cfg, cfar(64, False)))(x, rt))
    step("gos_kernel_wmax64_cash", lambda: jax.jit(
        lambda a, r: fused_chain_gos(a, r, fft_cfg, cfar(64, True)))(x, rt))
    step("dispatch_op_wmax64", lambda: jax.jit(
        lambda a, r: fused_chain_gos_op(a, r, fft_cfg, cfar(64, True)))(x, rt))

    cfgx = ChainConfig(fft=fft_cfg, cfar=CfarConfig(
        max_ref_window=64, variant=CfarVariant.GOSCA, include_cash=True,
        max_fft_size=n, use_pallas=False))
    step("xla_gosca_small", lambda: fft_mag_cfar_chain(cfgx).jit()(x, rt))

    print({k: v for k, v in steps})


if __name__ == "__main__":
    main()
