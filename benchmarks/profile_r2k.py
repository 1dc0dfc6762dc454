"""Stage 11: gated-magnitude + MXU-permutation + elaboration-sized shift bits.

r2j budget (1.73 ms tile time): CFAR body ~1.0 ms, interleave ~0.62 ms,
MXU ~0.14 ms, pass1 ~0. This stage moves the interleave onto the (mostly idle)
MXU as two single-pass bf16 matmuls against an exact 0/1 permutation operand,
gates the sqrt/log magnitude pipelines behind pl.when on the mode register,
and shrinks the runtime-rotation bit decompositions to the elaborated maxima
(lag 4 bits instead of 7). Drift-controlled r2h methodology.
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

    def chain(bf, impl, gm=False, perm="roll", abl=""):
        return jax.jit(
            lambda a, r, bf=bf, impl=impl, gm=gm, perm=perm, abl=abl:
            fused_chain_ca(a, r, fft_cfg, ca, block_frames=bf,
                           perm_mag_only=True, mask_operand=False,
                           pass1_radix2=True, dot_impl=impl,
                           gate_mag=gm, perm_impl=perm, ablate=abl))

    configs = {
        "base_b2": (chain(128, "bf16x2"), x, rt),
        "gm_b2": (chain(128, "bf16x2", gm=True), x, rt),
        "mxu_b2": (chain(128, "bf16x2", gm=True, perm="mxu"), x, rt),
        "mxu_b2_nogate": (chain(128, "bf16x2", perm="mxu"), x, rt),
        "f256_mxu_b2": (chain(256, "bf16x2", gm=True, perm="mxu"), x, rt),
        "abl_cfar_mxu": (chain(128, "bf16x2", gm=True, perm="mxu",
                               abl="cfar"), x, rt),
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

    # on-chip digest validation vs base_b2
    if "base_b2" in configs:
        f_ref = configs["base_b2"][0]
        for name in list(configs):
            if name in ("base_b2", "abl_cfar_mxu"):
                continue
            f, xx, rr = configs[name]

            def digests(a, r, f=f):
                o1 = f_ref(a, r)
                o2 = f(a, r)
                scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
                return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / scale,
                        jnp.sum(o1.peaks != o2.peaks))

            dthr, dpk = jax.jit(digests)(xx, rr)
            RESULTS.setdefault(name, {})["rel_dthr"] = float(dthr)
            RESULTS.setdefault(name, {})["flips"] = int(dpk)
            log(f"digest {name}: rel={float(dthr):.2e} flips={int(dpk)}")

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
