"""Profile stage 2: true component compute via scan-of-K (single dispatch).

Stage 1 (profile_r2.py) showed a 0.68 ms per-call dispatch floor through the
relay — single-call component timings are max(floor, compute) and resolve
nothing below the floor. Here every measurement scans K iterations of the
component inside ONE jitted call with a threaded carry, so per-iteration
compute = (t_call - floor) / K.
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
    import jax.numpy as jnp

    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
        fft_mag_cfar_chain,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.ops.fft import fft_op
    from rsp_chains_tpu.kernels.cfar_pallas import (
        fused_mag_cfar, fused_mag_gos_cfar,
    )

    log(f"device: {jax.devices()[0]}")
    channels, pulses, n = 16, 256, 1024
    samples = channels * pulses * n
    rng = np.random.RandomState(0)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32, guard_window_size=4,
                            threshold_scaler=3.5, div_sum=5)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1, index_lagg=16,
                                index_lead=16)
    rt_cash = dataclasses.replace(rt_gos, cfar_mode=jnp.asarray(3, jnp.int32))

    def scan_component(fn, x_stack, rt0, K):
        """One jitted call: scan K iterations of fn with a scalar carry."""
        def body(carry, xi):
            rr = dataclasses.replace(
                rt0, threshold_scaler=rt0.threshold_scaler + 1e-30 * carry)
            out = fn(xi, rr)
            leaf = out.threshold if hasattr(out, "threshold") else out.re
            return leaf[(0,) * leaf.ndim], leaf[(0,) * leaf.ndim]

        def run(xk):
            carry, outs = jax.lax.scan(body, jnp.float32(0.0), xk)
            return outs

        return jax.jit(run)

    def timeit(name, jf, x_stack, K, per_iter_samples):
        try:
            t0 = time.perf_counter()
            o = jf(x_stack)
            _ = float(np.asarray(o)[K - 1])  # forces completion
            t_compile = time.perf_counter() - t0
            ts = []
            for _ in range(5):
                t1 = time.perf_counter()
                o = jf(x_stack)
                _ = float(np.asarray(o)[K - 1])
                ts.append(time.perf_counter() - t1)
            t = min(ts)
            per = (t - 0.0007) / K  # subtract one dispatch floor
            RESULTS[name] = {"call_ms": round(t * 1e3, 3),
                             "per_iter_ms": round(per * 1e3, 4),
                             "gsps": round(per_iter_samples / per / 1e9, 3)}
            log(f"{name}: {per*1e3:.3f} ms/iter ({per_iter_samples/per/1e9:.2f}"
                f" Gs/s) [compile {t_compile:.0f}s]")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"{name}: FAILED {type(e).__name__}: {e}")

    K = 8
    x8 = C(jnp.asarray(rng.randn(K, channels, pulses, n), jnp.float32),
           jnp.asarray(rng.randn(K, channels, pulses, n), jnp.float32))

    fft_h = FftConfig(max_size=n, matmul_precision="highest")
    fft_d = FftConfig(max_size=n, matmul_precision="default")
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)

    timeit("fft_highest",
           scan_component(lambda x, r: fft_op(x, r.log2_fft_size, fft_h),
                          x8, rt, K), x8, K, samples)
    timeit("fft_default",
           scan_component(lambda x, r: fft_op(x, r.log2_fft_size, fft_d),
                          x8, rt, K), x8, K, samples)
    timeit("ca_tail",
           scan_component(lambda x, r: fused_mag_cfar(x, r, ca_cfg),
                          x8, rt, K), x8, K, samples)

    def chain_of(prec, pallas=True):
        cfg = ChainConfig(fft=FftConfig(max_size=n, matmul_precision=prec),
                          cfar=dataclasses.replace(ca_cfg, use_pallas=pallas))
        ch = fft_mag_cfar_chain(cfg)
        return lambda x, r: ch(x, r)

    timeit("chain_highest", scan_component(chain_of("highest"), x8, rt, K),
           x8, K, samples)
    timeit("chain_default", scan_component(chain_of("default"), x8, rt, K),
           x8, K, samples)

    # GOS kernels at bench scale, K=4
    K2 = 4
    x4 = C(x8.re[:K2], x8.im[:K2])
    timeit("gos_v1",
           scan_component(lambda x, r: fused_mag_gos_cfar(x, r, gos_cfg,
                                                          version=1),
                          x4, rt_gos, K2), x4, K2, samples)
    timeit("gos_v2",
           scan_component(lambda x, r: fused_mag_gos_cfar(x, r, gos_cfg,
                                                          version=2),
                          x4, rt_gos, K2), x4, K2, samples)
    timeit("cash_v2",
           scan_component(lambda x, r: fused_mag_gos_cfar(x, r, gos_cfg,
                                                          version=2),
                          x4, rt_cash, K2), x4, K2, samples)

    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
