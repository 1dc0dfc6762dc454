"""r5 session F: the single-stack (oe3d) GOS ladder formulation A/B.

The r5 gates took the GOS chain to 3.51 ms; KERNELS §2b bounds the residual
sort cost as ~1.14 ms of serial-issue CEs + ~1.3 ms of stack movement (the
list form's per-stage concat/split churn). ``merge_impl='oe3d'`` keeps the
whole ladder level as ONE [R, F, slab] value — rolls, CE stages and the
rank-select tree are big 3-D ops with leading-dim strided slices and
reshapes instead of concat/split batching. Bit-identical in interpret mode
(tests) — this session digests it on-chip and measures it against the
shipped default, interleaved with the CA anchor.

Run ALONE: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_r5f.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    raise SystemExit(
        "archived: the oe3d formulation this script A/B'd was removed after "
        "Mosaic failed to lower it (docs/KERNELS.md §2b; results_r5f.json is "
        "the record) — re-running would silently measure the bitonic form "
        "under the oe3d label")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import measure_per_call
    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, FftConfig, RuntimeConfig,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_gos,
    )
    from rsp_chains_tpu.utils.device import acquire_device

    print(f"device: {acquire_device(600)}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    x8 = C(x.re[:8], x.im[:8])
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    rt_gos = dataclasses.replace(
        rt, cfar_algorithm=jnp.asarray(1, jnp.int32),
        index_lagg=jnp.asarray(16, jnp.int32),
        index_lead=jnp.asarray(16, jnp.int32))

    f_ca = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca_cfg))
    f_gos = jax.jit(lambda a, r: fused_chain_gos(a, r, fft_cfg, gos_cfg))
    f_3d = jax.jit(lambda a, r: fused_chain_gos(a, r, fft_cfg, gos_cfg,
                                                merge_impl="oe3d"))

    # on-chip bit-identity digest default-vs-oe3d at 8 channels
    def dig(a, r):
        o1 = f_gos(a, r)
        o2 = f_3d(a, r)
        return (jnp.max(jnp.abs(o1.threshold - o2.threshold)),
                jnp.sum(o1.peaks.astype(jnp.int32)
                        - o2.peaks.astype(jnp.int32) != 0))

    import threading
    checks = {}

    def _dig():
        d, fl = jax.jit(dig)(x8, rt_gos)
        checks["oe3d_vs_default"] = [float(d), int(fl)]

    t = threading.Thread(target=_dig, daemon=True)
    t.start()
    t.join(timeout=2700)
    if t.is_alive() or "oe3d_vs_default" not in checks:
        print("oe3d digest timed out / failed — abandoning the A/B",
              file=sys.stderr, flush=True)
        out = {"session": "r5f", "digests": checks, "aborted": True}
        with open("/root/repo/benchmarks/results_r5f.json", "w") as fh:
            json.dump(out, fh, indent=1)
        os._exit(1)
    print(f"digest oe3d vs default: {checks['oe3d_vs_default']}",
          file=sys.stderr, flush=True)

    fam = {
        "ca_lean": (f_ca, x, rt),
        "gos_default": (f_gos, x, rt_gos),
        "gos_oe3d": (f_3d, x, rt_gos),
    }
    import time
    for name, (f, xx, rr) in fam.items():
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree.leaves(f(xx, rr))[0])
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    results = {k: [] for k in fam}
    for rep in range(int(os.environ.get("R5F_REPS", "5"))):
        for name, (f, xx, rr) in fam.items():
            ms = measure_per_call(f, xx, rr) * 1e3
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    out = {"session": "r5f", "digests": checks, "reps_ms": results,
           "median_ms": {k: round(float(np.nanmedian(v)), 4)
                         for k, v in results.items()}}
    print(json.dumps(out["median_ms"]), flush=True)
    with open("/root/repo/benchmarks/results_r5f.json", "w") as fh:
        json.dump(out, fh, indent=1)
    os._exit(0)


if __name__ == "__main__":
    main()
