"""Stage 12: runtime-GATED CA-CFAR body (pl.when-gated scratch rolls).

r2k budget: CFAR body ~0.61 ms of the 1.30 ms tile (abl_cfar 0.69 ms). The
ungated body pays roll+select for EVERY bit of every runtime rotation and all
6 dyadic box doublings; the gated body executes only the set bits / needed
doublings and skips the peak-grouping tail when the register is off. For the
bench config (w=32, g=4) that is ~15 executed roll passes vs ~40.

A/Bs: gated vs ungated (both gate_mag on/off), plus the packed wire-format
chain with the gated body. Drift-controlled r2h methodology.
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
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_ca_packed,
    )

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
    words = jnp.asarray(
        ((re_i.astype(np.int64) & 0xFFFF) << 16
         | (im_i.astype(np.int64) & 0xFFFF)).astype(np.uint32))

    mix = jax.jit(lambda out, base: dataclasses.replace(
        base, threshold_scaler=base.threshold_scaler
        + 1e-30 * out.threshold[(0,) * out.threshold.ndim]))
    digest = jax.jit(lambda out: out.threshold[(0,) * out.threshold.ndim])
    mix_w = jax.jit(lambda out, base: dataclasses.replace(
        base, threshold_scaler=base.threshold_scaler
        + 1e-30 * (out[(0,) * out.ndim] >> 31).astype(jnp.float32)))
    digest_w = jax.jit(lambda out: out[(0,) * out.ndim])

    def timed_run(f, xx, rr, k, wire=False):
        rt_i = rr
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(xx, rt_i)
            rt_i = (mix_w if wire else mix)(out, rr)
        _ = float((digest_w if wire else digest)(out))
        return time.perf_counter() - t0

    def chain(gated, gm):
        return jax.jit(
            lambda a, r, gated=gated, gm=gm:
            fused_chain_ca(a, r, fft_cfg, ca, block_frames=128,
                           perm_mag_only=True, mask_operand=False,
                           pass1_radix2=True, dot_impl="bf16x2",
                           gate_mag=gm, perm_impl="mxu", gated_cfar=gated))

    def wire(gated):
        return jax.jit(
            lambda a, r, gated=gated:
            fused_chain_ca_packed(a, r, fft_cfg, ca, block_frames=128,
                                  dot_impl="bf16x2", perm_impl="mxu",
                                  gated_cfar=gated))

    configs = {
        "ungated_gm": (chain(False, True), x, rt, False),   # r2k mxu_b2 (cached)
        "gated_gm": (chain(True, True), x, rt, False),
        "gated_nogm": (chain(True, False), x, rt, False),
        "wire_gated": (wire(True), words, rt, True),
    }

    for name in list(configs):
        f, xx, rr, w = configs[name]
        t0 = time.perf_counter()
        try:
            timed_run(f, xx, rr, 2, wire=w)
            log(f"warm {name} [{time.perf_counter()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            log(f"warm {name} FAILED {type(e).__name__}: {str(e)[:200]}")
            RESULTS[name] = {"error": str(e)[:300]}
            del configs[name]

    # on-chip digest validation: gated must be bit-identical to ungated
    if "ungated_gm" in configs:
        f_ref = configs["ungated_gm"][0]
        for name in ("gated_gm", "gated_nogm"):
            if name not in configs:
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
        for name, (f, xx, rr, w) in configs.items():
            lo[name].append(timed_run(f, xx, rr, K_LO, wire=w))
            hi[name].append(timed_run(f, xx, rr, K_HI, wire=w))
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
