"""Stage 7: isolate the pair-chain-kernel formulation regression.

r2f measured the optimized kernel (mag-only perm + mask operand + radix-2
pass 1) at 0.82 ms/bf128 vs 0.41 ms for the r1 formulation at the same tile.
This A/B toggles each change independently, plus tile sizes, and re-times the
wire kernel variants.
"""

from __future__ import annotations

import itertools
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
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca

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
    x = C(jnp.asarray(rng.randn(ch, 256, n) * 2e4, jnp.float32),
          jnp.asarray(rng.randn(ch, 256, n) * 2e4, jnp.float32))

    def bench_one(name, f):
        try:
            t0 = time.perf_counter()
            dt = measure_per_call(f, x, rt, k_lo=4, k_hi=14)
            RESULTS[name] = {"ms": round(dt * 1e3, 4),
                             "gsps": round(samples / dt / 1e9, 3)}
            log(f"{name}: {dt*1e3:.4f} ms ({samples/dt/1e9:.2f} Gs/s) "
                f"[wall {time.perf_counter()-t0:.0f}s]")
        except Exception as e:  # noqa: BLE001
            RESULTS[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"{name}: FAILED {e}")

    # full cross at bf=128: (perm_mag_only, mask_operand, pass1_radix2)
    for pmo, mop, r2 in itertools.product((True, False), repeat=3):
        name = (f"bf128_mag{int(pmo)}_op{int(mop)}_r2{int(r2)}")
        f = jax.jit(lambda a, r, pmo=pmo, mop=mop, r2=r2: fused_chain_ca(
            a, r, fft_cfg, ca, block_frames=128, perm_mag_only=pmo,
            mask_operand=mop, pass1_radix2=r2))
        bench_one(name, f)

    # the r1 formulation at bf 128 re-check plus tile sweep of the best
    print(json.dumps(RESULTS, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
