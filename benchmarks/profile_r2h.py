"""Stage 8: drift-controlled re-measurement of the chain-kernel A/B cross.

r2f/r2g produced irreproducible timings (same config 0.82 vs 2.19 ms; one 0.0)
— the 10-call slope signal was smaller than relay/device drift between runs.
This harness fixes the methodology:

* 64x256x1024 CPI (4x the bench batch) so per-call compute dominates;
* slope over a 40-call spread (k=5 vs k=45);
* ROUND-ROBIN repeats: each rep times every config once, in order, so slow
  phases of the relay hit all configs equally; report per-config min.
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
    from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_gos_cfar
    from rsp_chains_tpu.ops.cfar import CfarOutput

    log(f"device: {jax.devices()[0]}")
    n = 1024
    ch = 64
    samples = ch * 256 * n
    rng = np.random.RandomState(0)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32, guard_window_size=4,
                            threshold_scaler=3.5, div_sum=5)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1, index_lagg=16,
                                index_lead=16)
    rt_cash = dataclasses.replace(rt_gos, cfar_mode=jnp.asarray(3, jnp.int32))
    fft_cfg = FftConfig(max_size=n)
    ca = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                    include_cash=False, max_fft_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    re_i = rng.randint(-20000, 20000, (ch, 256, n))
    im_i = rng.randint(-20000, 20000, (ch, 256, n))
    x = C(jnp.asarray(re_i, jnp.float32), jnp.asarray(im_i, jnp.float32))
    words_np = ((re_i.astype(np.int16).astype(np.uint16).astype(np.uint32) << 16)
                | im_i.astype(np.int16).astype(np.uint16).astype(np.uint32))
    words = jnp.asarray(words_np, jnp.uint32)

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

    configs = {}

    # chain formulation cross at bf=128
    for pmo, mop, r2 in ((1, 1, 1), (1, 0, 1), (0, 0, 1), (0, 0, 0),
                         (1, 0, 0), (1, 1, 0)):
        name = f"bf128_mag{pmo}_op{mop}_r2{r2}"
        configs[name] = (jax.jit(
            lambda a, r, pmo=pmo, mop=mop, r2=r2: fused_chain_ca(
                a, r, fft_cfg, ca, block_frames=128, perm_mag_only=bool(pmo),
                mask_operand=bool(mop), pass1_radix2=bool(r2))), x, rt)

    def wire(w, r):
        out = fused_chain_ca_packed(w, r, fft_cfg, ca, block_frames=128)
        thr = (out >> 11).astype(jnp.float32)
        return CfarOutput(threshold=thr, peaks=(out & 1) == 1)

    configs["wire_bf128"] = (jax.jit(wire), words, rt)
    configs["gos_w32_bf8_t256"] = (jax.jit(
        lambda a, r: fused_mag_gos_cfar(a, r, gos_cfg, version=2,
                                        block_frames=8, range_tile=256)), x, rt_gos)
    configs["cash_w32_bf8_t256"] = (configs["gos_w32_bf8_t256"][0], x, rt_cash)

    # compile + warm everything first
    for name, (f, xx, rr) in configs.items():
        t0 = time.perf_counter()
        timed_run(f, xx, rr, 2)
        log(f"warm {name} [{time.perf_counter()-t0:.0f}s]")

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
        RESULTS[name] = {
            "ms": round(dt * 1e3, 4),
            "gsps": round(samples / dt / 1e9, 3),
            "lo_ms": [round(v * 1e3, 2) for v in lo[name]],
            "hi_ms": [round(v * 1e3, 2) for v in hi[name]],
        }
        log(f"{name}: {dt*1e3:.4f} ms ({samples/dt/1e9:.2f} Gs/s)")

    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
