"""Stage 15: CFAR window sums on the MXU as runtime-built 0/1 band matmuls.

r2n killed row-group pipelining (Mosaic serializes independent groups), so the
VPU+MXU serial sum stands and the 0.67 ms VPU CA body is the biggest budget
item. This A/B moves the sliding-window sums onto the MXU: the block-order
magnitude row is hi/lo-split and multiplied against [P | bands] — the
interleave permutation, the lag/lead window sums, AND the divider shift in ONE
wide operand whose values (not code) carry the runtime registers.

  ship : the r2m/r2l shipped kernel (VPU dyadic box sums, gated CA body)
  bmm3 : boxsum_impl='mxu'  — [N, 3N] operand (perm | lag | lead)
  bmm2 : boxsum_impl='mxu2' — [N, 2N+128] operand, lead = runtime roll of the
         extended lag columns (2/3 the matmul width, ~5 extra VPU rolls)

Drift-controlled r2h methodology (interleaved reps, min-of-5 slope).
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

    def chain(boxsum="vpu", bf=128):
        return jax.jit(
            lambda a, r, boxsum=boxsum, bf=bf:
            fused_chain_ca(a, r, fft_cfg, ca, block_frames=bf,
                           perm_mag_only=True, mask_operand=False,
                           pass1_radix2=True, dot_impl="bf16x2",
                           fold_twiddle=True, gate_mag=False,
                           perm_impl="mxu", gated_cfar=True,
                           boxsum_impl=boxsum))

    configs = {
        "ship": (chain("vpu"), x, rt),        # cached from r2n fold_rg1
        "bmm3": (chain("mxu"), x, rt),
        "bmm2": (chain("mxu2"), x, rt),
        "bmm2_bf256": (chain("mxu2", bf=256), x, rt),
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

    if "ship" in configs:
        f_ref = configs["ship"][0]
        for name in list(configs):
            if name == "ship":
                continue
            f = configs[name][0]

            def digests(a, r, f=f):
                o1 = f_ref(a, r)
                o2 = f(a, r)
                dthr = jnp.max(jnp.abs(o1.threshold - o2.threshold))
                rel = dthr / jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
                return (dthr, rel, jnp.sum(o1.peaks != o2.peaks))

            dthr, rel, dpk = jax.jit(digests)(x, rt)
            RESULTS.setdefault(name, {}).update(
                abs_dthr=float(dthr), rel_dthr=float(rel), flips=int(dpk))
            log(f"digest {name}: abs={float(dthr):.2e} rel={float(rel):.2e} "
                f"flips={int(dpk)}")

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
