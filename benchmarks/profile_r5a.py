"""r5 session A: root-cause the driver-flagged RD / pulse-compression drift
(BENCH_r04: rd_chain_fused +341%, pulse_compression +165% beyond the ±30%
band vs r3, while the headline/GOS/wire/int lines in the SAME session matched
their r4 medians).

Working hypothesis (code diff r3->r4 of the flagged kernels is 21 lines —
the lean-tail default — and `fused_rd_2d_chain` did not change AT ALL yet
also read ~2x): the flagged lines are exactly the ones whose per-call compute
(0.44/0.53/0.62 ms) sits below the relay's per-iteration overhead in the
slope method (2 dispatches/iter: the kernel + the tiny `mix` helper). In a
session where that overhead rises to ~1.3-1.9 ms, overhead-bound lines read
as the overhead while compute-bound lines (>=0.87 ms) stay in band.

This session therefore measures, interleaved:
  - `floor`        the slope-method overhead itself (trivial kernel) —
                   the session's per-iteration floor, stated explicitly
  - `ca_lean`      the 64-ch headline anchor (compute-bound control)
  - `rd_lean/classic`      the flagged RD kernel, both tails, 16 ch
  - `rd_lean_64`           the same kernel at 64 ch (compute-bound form)
  - `pc_classic/lean`      the flagged PC chain, both tails, 4 ch
  - `pc_classic_16`        the same at 16 ch (compute-bound form)
  - `rd2d` / `rd2d_64`     the (unchanged-since-r3) fused 2-D detector

Decision rule: if rd/pc/2d at the LARGE batch land at ~4x the r3 small-batch
numbers (same per-sample rate) while the small-batch reads hug the measured
floor, the r4 "regression" is the harness floor, not the kernels — fix =
measure ladder lines at compute-dominated batch sizes + report the floor.
If `rd_lean` genuinely exceeds `rd_classic` beyond drift, flip the default.

Run ALONE on the chip: PYTHONPATH=/root/repo:/root/.axon_site python ...
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import measure_per_call
    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, DopplerConfig, FftConfig,
        MatchedFilterConfig, RuntimeConfig,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.golden import lfm_chirp
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca
    from rsp_chains_tpu.kernels.rd_pallas import (
        _h_block, fused_rd_2d_chain, fused_rd_chain,
    )
    from rsp_chains_tpu.ops.cfar_2d import Cfar2dConfig, Cfar2dRuntime
    from rsp_chains_tpu.utils.device import acquire_device

    print(f"device: {acquire_device(600)}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    x16 = C(x.re[:16], x.im[:16])
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    taps = np.asarray(lfm_chirp(128, 0.0, 0.25))
    cfg3 = ChainConfig(fft=fft_cfg,
                       matched_filter=MatchedFilterConfig(num_taps=128,
                                                          fft_size=n),
                       doppler=DopplerConfig(num_pulses=256), cfar=ca_cfg)
    n2 = 4096
    fft2 = FftConfig(max_size=n2)
    ca2 = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                     include_cash=False, max_fft_size=n2)
    hb2 = _h_block(taps, n2, True)
    rng2 = np.random.RandomState(1)
    x2_16 = C(jnp.asarray(rng2.randn(16, 256, n2) * 100, jnp.float32),
              jnp.asarray(rng2.randn(16, 256, n2) * 100, jnp.float32))
    x2 = C(x2_16.re[:4], x2_16.im[:4])
    rt2 = RuntimeConfig.make(fft_size=n2, ref_window_size=32,
                             guard_window_size=4, threshold_scaler=8.0)

    cfg2d = Cfar2dConfig(max_ref_range=16, max_guard_range=4,
                         max_ref_doppler=8, max_guard_doppler=2)
    rt2d = Cfar2dRuntime.make(ref_range=8, guard_range=2, ref_doppler=4,
                              guard_doppler=1, threshold_scaler=6.0,
                              active_range=n)

    xtiny = jnp.zeros((8, 128), jnp.float32)

    fam = {
        # slope-method overhead: a trivial kernel whose compute is ~0; what
        # measure_per_call reports for it IS the session's per-iter floor
        "floor": (jax.jit(lambda a, r: a * r.threshold_scaler), xtiny, rt),
        "ca_lean": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg)), x, rt),
        "rd_lean": (jax.jit(lambda a, r: fused_rd_chain(
            a, r, taps, cfg3)), x16, rt),
        "rd_classic": (jax.jit(lambda a, r: fused_rd_chain(
            a, r, taps, cfg3, tail_impl="classic")), x16, rt),
        "rd_lean_64": (jax.jit(lambda a, r: fused_rd_chain(
            a, r, taps, cfg3)), x, rt),
        "pc_classic": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft2, ca2, h_block=hb2, tail_impl="classic")), x2, rt2),
        "pc_lean": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft2, ca2, h_block=hb2, tail_impl="lean")), x2, rt2),
        "pc_classic_16": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft2, ca2, h_block=hb2, tail_impl="classic")), x2_16, rt2),
        "rd2d": (jax.jit(lambda a, r: fused_rd_2d_chain(
            a, r, rt2d, taps, cfg3, cfg2d)), x16, rt),
        "rd2d_64": (jax.jit(lambda a, r: fused_rd_2d_chain(
            a, r, rt2d, taps, cfg3, cfg2d)), x, rt),
    }
    import time
    for name, (f, xx, rr) in fam.items():
        t0 = time.perf_counter()
        jax.block_until_ready(
            jax.tree.leaves(f(xx, rr))[0])
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    results = {k: [] for k in fam}
    for rep in range(int(os.environ.get("R5A_REPS", "5"))):
        for name, (f, xx, rr) in fam.items():
            ms = measure_per_call(f, xx, rr) * 1e3
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    out = {"session": "r5a", "reps_ms": results,
           "median_ms": {k: round(float(np.nanmedian(v)), 4)
                         for k, v in results.items()},
           "min_ms": {k: round(float(np.nanmin(v)), 4)
                      for k, v in results.items()}}
    print(json.dumps(out["median_ms"]), flush=True)
    with open("/root/repo/benchmarks/results_r5a.json", "w") as fh:
        json.dump(out, fh, indent=1)
    os._exit(0)


if __name__ == "__main__":
    main()
