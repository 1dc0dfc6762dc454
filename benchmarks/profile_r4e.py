"""r4 session E: bisect the bench-observed RD / pulse-compression slowdown
(BENCH check run: rd 0.95 ms vs r3's 0.44; pc 1.22 vs 0.53 — both beyond the
±30% drift band in a session whose CA headline was FAST). Hypothesis: the r4
lean CA tail (made default for the chain, packed, AND RD kernels in 68b90da)
was A/B'd on-chip only for the 1-D chain at N=1024 — interleave lean vs
classic for the RD kernel (16x256x1024) and the collapsed pulse-compression
chain (4x256x4096), with the 1-D CA chain as the session-drift anchor.
Run ALONE (one TPU process; see CLAUDE.md)."""

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

    def rd(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_rd_chain(
            a, r, taps, cfg3, **_kw))

    def pc(**kw):
        # pin the lean default explicitly: fused_chain_ca's shape-aware
        # default later became classic at n1 > 8, which would silently turn
        # this script's pc_lean family into classic-vs-classic (ADVICE r4)
        kw.setdefault("tail_impl", "lean")
        return jax.jit(lambda a, r, _kw=kw: fused_chain_ca(
            a, r, fft2, ca2, h_block=hb2, **_kw))

    # bit-identity digests first (scalars only)
    def dig(f1, f2, a, r):
        def d(aa, rr):
            o1, o2 = f1(aa, rr), f2(aa, rr)
            return (jnp.max(jnp.abs(o1.threshold - o2.threshold)),
                    jnp.sum(o1.peaks.astype(jnp.int32)
                            != o2.peaks.astype(jnp.int32)))
        dt, df = jax.jit(d)(a, r)
        return float(dt), int(df)

    checks = {}
    try:
        checks["rd_lean_vs_classic"] = dig(rd(), rd(tail_impl="classic"),
                                           x16, rt)
        checks["pc_lean_vs_classic"] = dig(pc(), pc(tail_impl="classic"),
                                           x2, rt2)
        print(f"digests: {checks}", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"digest FAILED: {e}"[:300], file=sys.stderr, flush=True)

    fam = {
        "ca_lean_anchor": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg)), x, rt),
        "rd_lean": (rd(), x16, rt),
        "rd_classic": (rd(tail_impl="classic"), x16, rt),
        "pc_lean": (pc(), x2, rt2),
        "pc_classic": (pc(tail_impl="classic"), x2, rt2),
    }
    ok = {}
    for name, (f, xx, rr) in fam.items():
        try:
            jax.block_until_ready(f(xx, rr))
            ok[name] = (f, xx, rr)
            print(f"warm {name}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"warm {name} FAILED: {e}"[:200], file=sys.stderr, flush=True)
    results = {k: [] for k in ok}
    for rep in range(int(os.environ.get("R4E_REPS", "5"))):
        for name, (f, xx, rr) in ok.items():
            try:
                ms = measure_per_call(f, xx, rr) * 1e3
            except Exception:  # noqa: BLE001
                ms = float("nan")
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    out = {"session": "r4e", "reps_ms": results,
           "median_ms": {k: round(float(np.nanmedian(v)), 4)
                         for k, v in results.items() if v},
           "digests": checks}
    print(json.dumps(out["median_ms"]), flush=True)
    with open("/tmp/r4e.json", "w") as fh:
        json.dump(out, fh, indent=1)
    os._exit(0)


if __name__ == "__main__":
    main()
