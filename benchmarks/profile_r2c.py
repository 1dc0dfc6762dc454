"""Stage 3: time the new fully-fused chain kernel + GOS v1/v2 A/B on-chip.

Slope methodology from bench.py (serialized dependency, scalar digest). The
0.68 ms dispatch floor means small-batch numbers read as max(floor, compute);
the 4x batch resolves compute. Digest-validates the fused chain against the
XLA path before timing it.
"""

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
    import jax.numpy as jnp

    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
        fft_mag_cfar_chain,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_gos_cfar

    # persistent compilation cache: the fused-chain Mosaic compile through the
    # remote helper takes tens of minutes cold; cache it across processes
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass
    log(f"device: {jax.devices()[0]}")
    n = 1024
    rng = np.random.RandomState(0)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32, guard_window_size=4,
                            threshold_scaler=3.5, div_sum=5)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1, index_lagg=16,
                                index_lead=16)
    rt_cash = dataclasses.replace(
        rt_gos, cfar_mode=jnp.asarray(3, jnp.int32))

    def mk_x(ch):
        return C(jnp.asarray(rng.randn(ch, 256, n), jnp.float32),
                 jnp.asarray(rng.randn(ch, 256, n), jnp.float32))

    x16 = mk_x(16)
    x64 = mk_x(64)

    ca = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                    include_cash=False, max_fft_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)

    def cfg(pallas):
        return ChainConfig(fft=FftConfig(max_size=n),
                           cfar=dataclasses.replace(ca, use_pallas=pallas))

    fused = fft_mag_cfar_chain(cfg(True)).jit()     # now the fused chain kernel
    xla = fft_mag_cfar_chain(cfg(False)).jit()

    # on-chip digest validation of the fused chain kernel
    def digests(a, r):
        o1 = xla(a, r)
        o2 = fused(a, r)
        return (jnp.max(jnp.abs(o1.threshold - o2.threshold)),
                jnp.sum(o1.peaks.astype(jnp.int32)
                        - o2.peaks.astype(jnp.int32) != 0))

    t0 = time.perf_counter()
    dthr, dpk = jax.jit(digests)(x16, rt)
    dthr, dpk = float(dthr), int(dpk)
    RESULTS["fused_chain_digest"] = {"dthr": dthr, "dpk": dpk}
    log(f"fused chain digest: dthr={dthr:.2e} dpk={dpk} "
        f"[wall {time.perf_counter()-t0:.0f}s]")
    # the kernel's FFT sums in a different (valid) order than the XLA path;
    # with |dthr| < 1e-3 any peak flip is a borderline cell within that margin
    cells = 16 * 256 * n
    assert dthr < 1e-3 and dpk <= 1e-4 * cells, "fused chain diverges on-chip"

    def bench_one(name, f, x, r, ch):
        try:
            dt = measure_per_call(f, x, r, k_lo=4, k_hi=14)
            samples = ch * 256 * n
            RESULTS[name] = {"ms": round(dt * 1e3, 4),
                             "gsps": round(samples / dt / 1e9, 3)}
            log(f"{name}: {dt*1e3:.4f} ms ({samples/dt/1e9:.2f} Gs/s)")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"{name}: FAILED {e}")

    bench_one("fused_chain_16ch", fused, x16, rt, 16)
    bench_one("fused_chain_64ch", fused, x64, rt, 64)
    bench_one("xla_fft_pallas_tail_64ch", xla, x64, rt, 64)

    g1 = jax.jit(lambda a, r: fused_mag_gos_cfar(a, r, gos_cfg, version=1))
    g2 = jax.jit(lambda a, r: fused_mag_gos_cfar(a, r, gos_cfg, version=2))
    # digest g2 vs g1 on-chip
    dg = jax.jit(lambda a, r: jnp.max(jnp.abs(
        g1(a, r).threshold - g2(a, r).threshold)))(x16, rt_gos)
    RESULTS["gos_v2_digest_vs_v1"] = float(dg)
    log(f"gos v2 vs v1 digest: {float(dg):.2e}")
    bench_one("gos_v1_16ch", g1, x16, rt_gos, 16)
    bench_one("gos_v2_16ch", g2, x16, rt_gos, 16)
    bench_one("cash_v1_16ch", g1, x16, rt_cash, 16)
    bench_one("cash_v2_16ch", g2, x16, rt_cash, 16)

    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
