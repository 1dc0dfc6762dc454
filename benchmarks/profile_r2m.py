"""Stage 13: re-budget the fused chain under the GATED body; fold-twiddle and
tile-size A/Bs.

r2l shipped: bf16x2 dots + MXU perm + gated CFAR + no gate_mag = 1.277 ms
(13.14 Gs/s). Remaining budget unknown post-gating — re-ablate. Candidates:
* fold_twiddle: pass 2 (4 VPU passes on [F,N]) folded into per-block pass-3
  constants (zero extra MXU cost; r2j attempt hit a transient compile-helper
  500 — retry).
* block_frames 64: smaller tiles, more grid programs — scheduling A/B.
Drift-controlled r2h methodology.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

RESULTS = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp

    from rsp_chains_tpu import CfarConfig, CfarVariant, FftConfig, RuntimeConfig
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca

    log(f"device: {jax.devices()[0]}")
    n = 1024
    ch = 64
    samples = ch * 256 * n
    rng = np.random.RandomState(0)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32, guard_window_size=4,
                            threshold_scaler=3.5, div_sum=5)
    fft_cfg = FftConfig(max_size=n)
    ca = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                    include_cash=False, max_fft_size=n)
    re_i = rng.randint(-20000, 20000, (ch, 256, n))
    im_i = rng.randint(-20000, 20000, (ch, 256, n))
    x = C(jnp.asarray(re_i, jnp.float32), jnp.asarray(im_i, jnp.float32))

    mix = jax.jit(lambda out, base: dataclasses.replace(
        base, threshold_scaler=base.threshold_scaler
        + 1e-30 * out.threshold[(0,) * out.threshold.ndim]))
    digest = jax.jit(lambda out: out.threshold[(0,) * out.threshold.ndim])

    def timed_run(f, xx, rr, k):
        rt_i = rr
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(xx, rt_i)
            rt_i = mix(out, rr)
        _ = float(digest(out))
        return time.perf_counter() - t0

    def chain(bf=128, fold=False, abl="", gated=True):
        return jax.jit(
            lambda a, r, bf=bf, fold=fold, abl=abl, gated=gated:
            fused_chain_ca(a, r, fft_cfg, ca, block_frames=bf,
                           perm_mag_only=True, mask_operand=False,
                           pass1_radix2=True, dot_impl="bf16x2",
                           fold_twiddle=fold, ablate=abl,
                           gate_mag=False, perm_impl="mxu",
                           gated_cfar=gated))

    configs = {
        "ship": (chain(), x, rt),                       # r2l gated_nogm (cached)
        "fold": (chain(fold=True), x, rt),
        "bf64": (chain(bf=64), x, rt),
        "abl_cfar": (chain(abl="cfar"), x, rt),         # FFT+mag+perm only
        "abl_perm": (chain(abl="perm"), x, rt),         # no interleave
        "abl_mxu": (chain(abl="mxu"), x, rt),           # no pass-3 dots
        "abl_pass1": (chain(abl="pass1"), x, rt),       # no radix-8 butterflies
    }

    for name in list(configs):
        f, xx, rr = configs[name]
        t0 = time.perf_counter()
        try:
            timed_run(f, xx, rr, 2)
            log(f"warm {name} [{time.perf_counter()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            log(f"warm {name} FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS[name] = {"error": str(e)[:300]}
            del configs[name]

    if "ship" in configs and "fold" in configs:
        f_ref = configs["ship"][0]
        f = configs["fold"][0]

        def digests(a, r):
            o1 = f_ref(a, r)
            o2 = f(a, r)
            scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
            return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / scale,
                    jnp.sum(o1.peaks != o2.peaks))

        dthr, dpk = jax.jit(digests)(x, rt)
        RESULTS.setdefault("fold", {})["rel_dthr"] = float(dthr)
        RESULTS.setdefault("fold", {})["flips"] = int(dpk)
        log(f"digest fold: rel={float(dthr):.2e} flips={int(dpk)}")

    K_LO, K_HI, REPS = 5, 45, 5
    lo = {name: [] for name in configs}
    hi = {name: [] for name in configs}
    for rep in range(REPS):
        for name, (f, xx, rr) in configs.items():
            lo[name].append(timed_run(f, xx, rr, K_LO))
            hi[name].append(timed_run(f, xx, rr, K_HI))
        log(f"rep {rep} done")

    for name in configs:
        dt = (min(hi[name]) - min(lo[name])) / (K_HI - K_LO)
        dt = max(dt, 1e-9)
        RESULTS.setdefault(name, {}).update({
            "ms": round(dt * 1e3, 4),
            "gsps": round(samples / dt / 1e9, 3),
        })
        log(f"{name}: {dt*1e3:.4f} ms ({samples/dt/1e9:.2f} Gs/s)")

    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
