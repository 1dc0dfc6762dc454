"""Stage 14: row-group software pipelining inside the chain kernel.

r2m: the single-group kernel is one serial MXU->MXU->VPU dependency chain
(VPU ~0.9 ms + MXU ~0.58 ms ~= the 1.35 ms total). row_groups=k partitions the
tile into k independent frame groups so Mosaic can overlap group i's CFAR
(VPU) with group i+1's FFT/perm (MXU). fold_twiddle now default (r2m win).
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

    def chain(rg=1, bf=128, fold=True):
        return jax.jit(
            lambda a, r, rg=rg, bf=bf, fold=fold:
            fused_chain_ca(a, r, fft_cfg, ca, block_frames=bf,
                           perm_mag_only=True, mask_operand=False,
                           pass1_radix2=True, dot_impl="bf16x2",
                           fold_twiddle=fold, gate_mag=False,
                           perm_impl="mxu", gated_cfar=True,
                           row_groups=rg))

    configs = {
        "fold_rg1": (chain(1), x, rt),        # cached from r2m "fold"
        "fold_rg2": (chain(2), x, rt),
        "fold_rg4": (chain(4), x, rt),
        "fold_rg2_bf256": (chain(2, bf=256), x, rt),
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

    if "fold_rg1" in configs:
        f_ref = configs["fold_rg1"][0]
        for name in list(configs):
            if name == "fold_rg1":
                continue
            f = configs[name][0]

            def digests(a, r, f=f):
                o1 = f_ref(a, r)
                o2 = f(a, r)
                return (jnp.max(jnp.abs(o1.threshold - o2.threshold)),
                        jnp.sum(o1.peaks != o2.peaks))

            dthr, dpk = jax.jit(digests)(x, rt)
            RESULTS.setdefault(name, {})["abs_dthr"] = float(dthr)
            RESULTS.setdefault(name, {})["flips"] = int(dpk)
            log(f"digest {name}: abs={float(dthr):.2e} flips={int(dpk)}")

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
