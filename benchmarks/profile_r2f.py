"""Stage 6: optimized chain kernel (mag-only interleave, radix-2 pass 1,
precomputed perm masks) + hoisted/parameterized GOS kernel tile sweep."""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import measure_per_call  # noqa: E402

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
    from rsp_chains_tpu.ops.cfar import cfar_op
    from rsp_chains_tpu.ops.fft import fft_op
    from rsp_chains_tpu.ops.logmag import logmag

    log(f"device: {jax.devices()[0]}")
    n = 1024
    ch = 16
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

    from rsp_chains_tpu.ops.cfar import CfarOutput

    def bench_one(name, f, xx, rr):
        try:
            t0 = time.perf_counter()
            dt = measure_per_call(f, xx, rr, k_lo=4, k_hi=14)
            RESULTS[name] = {"ms": round(dt * 1e3, 4),
                             "gsps": round(samples / dt / 1e9, 3)}
            log(f"{name}: {dt*1e3:.4f} ms ({samples/dt/1e9:.2f} Gs/s) "
                f"[wall {time.perf_counter()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"{name}: FAILED {e}")

    # ---- optimized chain kernel: digest vs XLA, then timing ----
    p128 = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca,
                                               block_frames=128))

    def xla_chain(a, r):
        spec = fft_op(a, r.log2_fft_size, fft_cfg)
        return cfar_op(logmag(spec, r.mag_mode), r, ca)

    def chain_digest(a, r):
        o1 = jax.jit(xla_chain)(a, r)
        o2 = p128(a, r)
        scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
        return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / scale,
                jnp.sum(o1.peaks.astype(jnp.int32)
                        - o2.peaks.astype(jnp.int32) != 0))

    t0 = time.perf_counter()
    dthr, dpk = jax.jit(chain_digest)(x, rt)
    log(f"chain digest rel={float(dthr):.2e} flips={int(dpk)} "
        f"[wall {time.perf_counter()-t0:.0f}s]")
    RESULTS["chain_digest"] = {"rel_dthr": float(dthr), "flips": int(dpk)}
    bench_one("pair_bf128_opt", p128, x, rt)
    p256 = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca,
                                               block_frames=256))
    bench_one("pair_bf256_opt", p256, x, rt)

    def wire(w, r):
        out = fused_chain_ca_packed(w, r, fft_cfg, ca, block_frames=128)
        thr = (out >> 11).astype(jnp.float32)
        return CfarOutput(threshold=thr, peaks=(out & 1) == 1)

    bench_one("wire_bf128_opt", jax.jit(wire), words, rt)

    # ---- hoisted GOS kernel: digest + (bf, tile) sweep ----
    def gos(bf, tile):
        return jax.jit(lambda a, r: fused_mag_gos_cfar(
            a, r, gos_cfg, version=2, block_frames=bf, range_tile=tile))

    g_base = gos(16, 512)

    def gos_digest(a, r):
        o1 = jax.jit(lambda aa, rr: cfar_op(
            logmag(aa, rr.mag_mode), rr, gos_cfg))(a, r)
        o2 = g_base(a, r)
        scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
        return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / scale,
                jnp.sum(o1.peaks.astype(jnp.int32)
                        - o2.peaks.astype(jnp.int32) != 0))

    t0 = time.perf_counter()
    dthr, dpk = jax.jit(gos_digest)(x, rt_gos)
    log(f"gos digest rel={float(dthr):.2e} flips={int(dpk)} "
        f"[wall {time.perf_counter()-t0:.0f}s]")
    RESULTS["gos_digest"] = {"rel_dthr": float(dthr), "flips": int(dpk)}

    bench_one("gos_w32_bf16_t512", g_base, x, rt_gos)
    bench_one("cash_w32_bf16_t512", g_base, x, rt_cash)
    bench_one("gos_w32_bf8_t256", gos(8, 256), x, rt_gos)
    bench_one("gos_w32_bf32_t512", gos(32, 512), x, rt_gos)

    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
