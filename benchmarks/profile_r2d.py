"""Stage 4: wire-format kernel timing + BLOCK_FRAMES A/B on-chip.

Also probes whether the persistent compilation cache works through the axon
remote-compile path (watch the compile walls across runs).
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

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # noqa: BLE001
        pass

    import jax.numpy as jnp

    from rsp_chains_tpu import CfarConfig, CfarVariant, FftConfig, RuntimeConfig, packing
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_ca_packed,
    )

    log(f"device: {jax.devices()[0]}")
    n = 1024
    ch = 16
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
    # pack on the HOST (complex64 cannot exist on this TPU; device->host
    # array fetches are unreliable)
    words_np = ((re_i.astype(np.int16).astype(np.uint16).astype(np.uint32) << 16)
                | im_i.astype(np.int16).astype(np.uint16).astype(np.uint32))
    words = jnp.asarray(words_np, jnp.uint32)
    del packing

    # CfarOutput-like shim so measure_per_call's digest works on word outputs
    from rsp_chains_tpu.ops.cfar import CfarOutput

    def wire(bf):
        def f(w, r):
            out = fused_chain_ca_packed(w, r, fft_cfg, ca, block_frames=bf)
            thr = (out >> 11).astype(jnp.float32)
            return CfarOutput(threshold=thr, peaks=(out & 1) == 1)
        return jax.jit(f)

    def pair(bf):
        return jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca,
                                                   block_frames=bf))

    def bench_one(name, f, xx):
        try:
            t0 = time.perf_counter()
            dt = measure_per_call(f, xx, rt, k_lo=4, k_hi=14)
            RESULTS[name] = {"ms": round(dt * 1e3, 4),
                             "gsps": round(samples / dt / 1e9, 3)}
            log(f"{name}: {dt*1e3:.4f} ms ({samples/dt/1e9:.2f} Gs/s) "
                f"[wall {time.perf_counter()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"{name}: FAILED {e}")

    # validation: wire thresholds (integer-truncated) vs pair kernel
    p32 = pair(32)
    w32 = wire(32)
    dig = jax.jit(lambda a, w, r: (
        jnp.max(jnp.abs(jnp.floor(jnp.clip(p32(a, r).threshold, 0, 2.0**20))
                        - w32(w, r).threshold)),
        jnp.sum(p32(a, r).peaks != w32(w, r).peaks)))
    t0 = time.perf_counter()
    dthr, dpk = dig(x, words, rt)
    log(f"wire digest vs pair: dthr={float(dthr):.1f} dpk={int(dpk)} "
        f"[wall {time.perf_counter()-t0:.0f}s]")
    RESULTS["wire_digest"] = {"dthr": float(dthr), "dpk": int(dpk)}

    bench_one("pair_bf32", p32, x)
    bench_one("pair_bf128", pair(128), x)
    bench_one("wire_bf32", w32, words)
    bench_one("wire_bf128", wire(128), words)

    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
