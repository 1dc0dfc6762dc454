"""r5 session H: the integer GOS kernel on-chip — exactness digest + rate.

Families (interleaved): CA anchor, the integer CA chain (context), the new
integer GOS chain (GOSCA registers through the preset route), and the float
GOS chain (the sort-cost comparison at matching registers). Exactness is a
chunked digest vs the XLA integer pipeline at 8 channels (the bench validates
at 64); the measured shape is the 64x256x1024 headline CPI.

Run ALONE: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_r5h.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import measure_per_call
    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
        fft_mag_cfar_chain,
    )
    from rsp_chains_tpu.configs import FixedPointConfig
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_gos,
    )
    from rsp_chains_tpu.ops.bit_true import cfar_int, fft_int_op, mag_int_op
    from rsp_chains_tpu.utils.device import acquire_device

    print(f"device: {acquire_device(600)}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    rng = np.random.RandomState(0)
    xf = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
           jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    xi = C(jnp.round(jnp.clip(xf.re * 250, -32767, 32767)).astype(jnp.int32),
           jnp.round(jnp.clip(xf.im * 250, -32767, 32767)).astype(jnp.int32))
    xi8 = C(xi.re[:8], xi.im[:8])
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    rt_gos = dataclasses.replace(
        rt, cfar_algorithm=jnp.asarray(1, jnp.int32),
        index_lagg=jnp.asarray(16, jnp.int32),
        index_lead=jnp.asarray(16, jnp.int32))

    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    int_ca_cfg = ChainConfig(
        fft=fft_cfg, cfar=ca_cfg,
        fixed_point=FixedPointConfig(enabled=True, width=16, bin_point=0,
                                     bit_true=True))
    int_gos_chain_cfg = ChainConfig(
        fft=fft_cfg, cfar=gos_cfg,
        fixed_point=FixedPointConfig(enabled=True, width=16, bin_point=0,
                                     bit_true=True))

    f_ca = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca_cfg))
    f_gos = jax.jit(lambda a, r: fused_chain_gos(a, r, fft_cfg, gos_cfg))
    f_int_ca = fft_mag_cfar_chain(int_ca_cfg).jit()
    f_int_gos = fft_mag_cfar_chain(int_gos_chain_cfg).jit()

    def xla_int_gos(a, r):
        spec = fft_int_op(a, r.log2_fft_size, fft_cfg)
        return cfar_int(mag_int_op(spec, r.mag_mode,
                                   int_gos_chain_cfg.mag), r, gos_cfg)

    def dig(a, r):
        # 2-channel lax.map chunks: the XLA integer GOS reference peaks
        # ~35 GB HBM at 8 channels in one jit (window stacks + CASH cumsums)
        o2 = f_int_gos(a, r)
        cs = 2
        xr = a.re.reshape(8 // cs, cs, 256, n)
        xim = a.im.reshape(8 // cs, cs, 256, n)
        t2 = o2.threshold.reshape(8 // cs, cs, 256, n)
        p2 = o2.peaks.reshape(8 // cs, cs, 256, n)

        def body(args):
            cr, ci, ct, cp = args
            o1 = xla_int_gos(C(cr, ci), r)
            return (jnp.max(jnp.abs(o1.threshold - ct)),
                    jnp.sum(o1.peaks.astype(jnp.int32)
                            - cp.astype(jnp.int32) != 0))

        ds, fls = jax.lax.map(body, (xr, xim, t2, p2))
        return jnp.max(ds), jnp.sum(fls)

    import threading
    checks = {}

    def _dig():
        for name, rr in (("gos16", rt_gos),
                         ("gos_uneq", dataclasses.replace(
                             rt_gos, index_lead=jnp.asarray(17, jnp.int32))),
                         ("ca_regs", rt)):
            d, fl = jax.jit(dig)(xi8, rr)
            checks[name] = [int(d), int(fl)]
            print(f"digest {name}: {checks[name]}", file=sys.stderr,
                  flush=True)

    t = threading.Thread(target=_dig, daemon=True)
    t.start()
    t.join(timeout=2700)
    if t.is_alive():
        print("digest timed out", file=sys.stderr, flush=True)
        os._exit(1)
    if any(v != [0, 0] for v in checks.values()):
        print(f"EXACTNESS FAILED: {checks}", file=sys.stderr, flush=True)
        with open("/root/repo/benchmarks/results_r5h.json", "w") as fh:
            json.dump({"session": "r5h", "digests": checks,
                       "exact": False}, fh, indent=1)
        os._exit(1)

    fam = {
        "ca_lean": (f_ca, xf, rt),
        "int_ca": (f_int_ca, xi, rt),
        "int_gos": (f_int_gos, xi, rt_gos),
        "float_gos": (f_gos, xf, rt_gos),
    }
    import time
    for name, (f, xx, rr) in fam.items():
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree.leaves(f(xx, rr))[0])
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    results = {k: [] for k in fam}
    for rep in range(int(os.environ.get("R5H_REPS", "5"))):
        for name, (f, xx, rr) in fam.items():
            ms = measure_per_call(f, xx, rr) * 1e3
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    out = {"session": "r5h", "digests": checks, "exact": True,
           "reps_ms": results,
           "median_ms": {k: round(float(np.nanmedian(v)), 4)
                         for k, v in results.items()}}
    print(json.dumps(out["median_ms"]), flush=True)
    with open("/root/repo/benchmarks/results_r5h.json", "w") as fh:
        json.dump(out, fh, indent=1)
    os._exit(0)


if __name__ == "__main__":
    main()
