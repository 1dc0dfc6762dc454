"""Stage 5: chain-kernel block-size sweep + gated GOS kernel timing."""

from __future__ import annotations

import dataclasses
import json
import os
import sys

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
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca
    from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_gos_cfar

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
    rt_gos8 = RuntimeConfig.make(fft_size=n, ref_window_size=8,
                                 guard_window_size=4, threshold_scaler=3.5,
                                 div_sum=3, cfar_algorithm=1, index_lagg=4,
                                 index_lead=4)
    rt_cash = dataclasses.replace(rt_gos, cfar_mode=jnp.asarray(3, jnp.int32))
    fft_cfg = FftConfig(max_size=n)
    ca = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                    include_cash=False, max_fft_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    x = C(jnp.asarray(rng.randn(ch, 256, n), jnp.float32),
          jnp.asarray(rng.randn(ch, 256, n), jnp.float32))

    def bench_one(name, f, rr):
        try:
            dt = measure_per_call(f, x, rr, k_lo=4, k_hi=14)
            RESULTS[name] = {"ms": round(dt * 1e3, 4),
                             "gsps": round(samples / dt / 1e9, 3)}
            log(f"{name}: {dt*1e3:.4f} ms ({samples/dt/1e9:.2f} Gs/s)")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"{name}: FAILED {e}")

    for bf in (128, 256, 64):
        f = jax.jit(lambda a, r, bf=bf: fused_chain_ca(a, r, fft_cfg, ca,
                                                       block_frames=bf))
        bench_one(f"pair_bf{bf}", f, rt)

    g1 = jax.jit(lambda a, r: fused_mag_gos_cfar(a, r, gos_cfg, version=1))
    g2 = jax.jit(lambda a, r: fused_mag_gos_cfar(a, r, gos_cfg, version=2))
    dg = jax.jit(lambda a, r: jnp.max(jnp.abs(
        g1(a, r).threshold - g2(a, r).threshold)))(x, rt_gos)
    RESULTS["gos_gated_digest_vs_v1"] = float(dg)
    log(f"gos gated vs v1 digest: {float(dg):.2e}")
    bench_one("gos_gated_w32", g2, rt_gos)
    bench_one("gos_gated_w8", g2, rt_gos8)
    bench_one("cash_gated_w32", g2, rt_cash)

    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
