"""r4 session F: short clean-session re-read of the RD / pulse-compression
kernels after r4e found the relay in a degraded state (CA anchor 1.8-3.4 ms
vs 0.87 in r4d; rd_lean<=rd_classic in every interleaved rep, digests 0/0).
Three anchored families only, run first-thing in a fresh process.
Run ALONE."""

from __future__ import annotations

import json
import os
import sys

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
        CfarConfig, CfarVariant, ChainConfig, DopplerConfig, FftConfig,
        MatchedFilterConfig, RuntimeConfig,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.golden import lfm_chirp
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca
    from rsp_chains_tpu.kernels.rd_pallas import _h_block, fused_rd_chain
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
    x2 = C(jnp.asarray(rng2.randn(4, 256, n2) * 100, jnp.float32),
           jnp.asarray(rng2.randn(4, 256, n2) * 100, jnp.float32))
    rt2 = RuntimeConfig.make(fft_size=n2, ref_window_size=32,
                             guard_window_size=4, threshold_scaler=8.0)

    fam = {
        "ca_lean_anchor": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg)), x, rt),
        "rd_lean": (jax.jit(lambda a, r: fused_rd_chain(
            a, r, taps, cfg3)), x16, rt),
        # tail pinned: fused_chain_ca's default later became shape-aware
        # (classic at n1 > 8), which would make this label lie (ADVICE r4)
        "pc_lean": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft2, ca2, h_block=hb2, tail_impl="lean")), x2, rt2),
    }
    for name, (f, xx, rr) in fam.items():
        jax.block_until_ready(f(xx, rr))
        print(f"warm {name}", file=sys.stderr, flush=True)
    results = {k: [] for k in fam}
    for rep in range(int(os.environ.get("R4F_REPS", "4"))):
        for name, (f, xx, rr) in fam.items():
            ms = measure_per_call(f, xx, rr) * 1e3
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    out = {"session": "r4f", "reps_ms": results,
           "median_ms": {k: round(float(np.nanmedian(v)), 4)
                         for k, v in results.items()}}
    print(json.dumps(out["median_ms"]), flush=True)
    with open("/tmp/r4f.json", "w") as fh:
        json.dump(out, fh, indent=1)
    os._exit(0)


if __name__ == "__main__":
    main()
