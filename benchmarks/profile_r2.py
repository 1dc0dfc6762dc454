"""Round-2 component profile on the real chip (single process!).

r1's standalone component timings (FFT 1.15 ms, CA tail 0.83 ms) EXCEED the
measured whole chain (0.76 ms), so they must include a large per-call floor
(relay dispatch + the mix/digest helpers of the slope method). This script
pins down: the dispatch floor, true component costs above the floor, and the
effect of amortizing the floor by scanning K CPIs inside one jitted call.

Run: python benchmarks/profile_r2.py  (on the TPU; ~10 min of remote compiles)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(f, args, digest, mix, k_lo=6, k_hi=26):
    """Slope-method per-call time: serialize calls with a data dependency via
    ``mix(out, args) -> args`` and force completion with a scalar ``digest``."""
    import jax

    def run(k):
        a = args
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(*a)
            a = mix(out, args)
        _ = float(digest(out))
        return time.perf_counter() - t0

    run(2)
    t_lo = min(run(k_lo) for _ in range(3))
    t_hi = min(run(k_hi) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
        fft_mag_cfar_chain,
    )
    from rsp_chains_tpu.cplx import C, as_pair
    from rsp_chains_tpu.ops.fft import fft_op
    from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_cfar

    log(f"device: {jax.devices()[0]}")
    channels, pulses, n = 16, 256, 1024
    samples = channels * pulses * n
    rng = np.random.RandomState(0)
    x = as_pair((rng.randn(channels, pulses, n)
                 + 1j * rng.randn(channels, pulses, n)).astype(np.complex64))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32, guard_window_size=4,
                            threshold_scaler=3.5, div_sum=5)

    def cfg(use_pallas, precision="highest"):
        return ChainConfig(
            fft=FftConfig(max_size=n, matmul_precision=precision),
            cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                            include_cash=False, max_fft_size=n,
                            use_pallas=use_pallas),
        )

    # mix/digest pairs per output type
    import dataclasses

    def mix_rt(out, args):
        x0, rt0 = args
        leaf = out.threshold if hasattr(out, "threshold") else out.re
        s = leaf[(0,) * leaf.ndim]
        return (x0, dataclasses.replace(
            rt0, threshold_scaler=rt0.threshold_scaler + 1e-30 * s))

    def dig(out):
        leaf = out.threshold if hasattr(out, "threshold") else out.re
        return leaf[(0,) * leaf.ndim]

    mixj = jax.jit(mix_rt)
    digj = jax.jit(dig)

    def bench_one(name, f, args, per_call_samples=samples):
        try:
            t0 = time.perf_counter()
            dt = measure(f, args, digj, mixj)
            RESULTS[name] = {"ms": round(dt * 1e3, 4),
                             "gsps": round(per_call_samples / dt / 1e9, 3)}
            log(f"{name}: {dt*1e3:.4f} ms  ({per_call_samples/dt/1e9:.2f} Gs/s)"
                f"  [wall {time.perf_counter()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            log(f"{name}: FAILED {type(e).__name__}: {e}")

    # 1. dispatch floor: near-zero compute, same calling convention
    def _floor(xx, rr):
        from rsp_chains_tpu.ops.cfar import CfarOutput

        t = xx.re[:1, :1, :128] * rr.threshold_scaler
        return CfarOutput(threshold=t, peaks=t > 0)

    bench_one("dispatch_floor", jax.jit(_floor), (x, rt))

    # 2. XLA four-step FFT alone (HIGHEST)
    c = cfg(False)
    fft_f = jax.jit(lambda xx, rr: fft_op(xx, rr.log2_fft_size, c.fft))
    bench_one("fft_highest", fft_f, (x, rt))

    extended = os.environ.get("PROFILE_EXTENDED", "") == "1"
    if extended:
        c_d = cfg(False, "default")
        fft_fd = jax.jit(lambda xx, rr: fft_op(xx, rr.log2_fft_size, c_d.fft))
        bench_one("fft_default_precision", fft_fd, (x, rt))

    # 3. fused CA tail alone on a precomputed spectrum
    spec = C(jnp.asarray(rng.randn(channels, pulses, n), jnp.float32),
             jnp.asarray(rng.randn(channels, pulses, n), jnp.float32))
    tail_f = jax.jit(lambda ss, rr: fused_mag_cfar(ss, rr, cfg(True).cfar))
    bench_one("ca_tail_pallas", tail_f, (spec, rt))

    # 4. full chain
    bench_one("chain_pallas", fft_mag_cfar_chain(cfg(True)).jit(), (x, rt))
    if extended:
        bench_one("chain_xla", fft_mag_cfar_chain(cfg(False)).jit(), (x, rt))
        bench_one("chain_pallas_fft_default",
                  fft_mag_cfar_chain(cfg(True, "default")).jit(), (x, rt))

    # 5. K CPIs scanned inside ONE call (amortizes the dispatch floor)
    K = 8
    xs = C(jnp.asarray(rng.randn(K, channels, pulses, n), jnp.float32),
           jnp.asarray(rng.randn(K, channels, pulses, n), jnp.float32))
    chain = fft_mag_cfar_chain(cfg(True))

    def scan_chain(xk, rr):
        def body(carry, xi):
            rr2 = dataclasses.replace(
                rr, threshold_scaler=rr.threshold_scaler + 1e-30 * carry)
            out = chain(xi, rr2)
            return out.threshold[0, 0, 0], out.threshold[:1, :1, :128]

        carry, outs = jax.lax.scan(body, jnp.float32(0.0), xk)
        from rsp_chains_tpu.ops.cfar import CfarOutput

        return CfarOutput(threshold=outs, peaks=outs > 0)

    scan_f = jax.jit(scan_chain)
    bench_one(f"chain_pallas_scan{K}", scan_f, (xs, rt),
              per_call_samples=samples * K)

    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
