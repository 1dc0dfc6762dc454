"""r4 FINAL measurement session: one process, everything interleaved, medians
written to benchmarks/results_r4.json (merging the 2-D OS numbers from
profile_r4b's --chip output if present at /tmp/r4b_chip.json).

Families measured (all digest-checked on-chip before timing):
  - CA chain lean vs classic (the r4 headline pick),
  - GOS chain: lean epilogue vs classic, batched rolls vs per-row, and the
    HONEST sort-tail ablations (merge / rank / sort / tail — the r4-fixed,
    DCE-proof instrumentation) → the docs/KERNELS.md §2b floor table,
  - wire-format chain: lean vs unpack/pack structural ablations,
  - at-speed bit-true integer chain.

Run ALONE (one TPU process at a time; see CLAUDE.md)."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import measure_per_call
    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
        fft_mag_cfar_chain, packing,
    )
    from rsp_chains_tpu.configs import FixedPointConfig
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_ca_packed, fused_chain_gos,
    )
    from rsp_chains_tpu.utils.device import acquire_device

    print(f"device: {acquire_device(600)}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    xq = C(jnp.round(jnp.clip(x.re * 25, -32767, 32767)),
           jnp.round(jnp.clip(x.im * 25, -32767, 32767)))
    words = jax.jit(packing.pack_iq)(xq)
    xi16 = C(xq.re.astype(jnp.int32), xq.im.astype(jnp.int32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1,
                                index_lagg=16, index_lead=16)

    def gos(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_chain_gos(
            a, r, fft_cfg, gos_cfg, **_kw))

    def wire(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_chain_ca_packed(
            a, r, fft_cfg, ca_cfg, **_kw))

    int_cfg = ChainConfig(
        fft=FftConfig(max_size=n), cfar=ca_cfg,
        fixed_point=FixedPointConfig(enabled=True, width=16, bin_point=0,
                                     bit_true=True))
    f_int = fft_mag_cfar_chain(int_cfg).jit()

    # ---- exactness digests (scalars only) --------------------------------
    checks = {}
    try:
        def d(a, r):
            o1 = gos(tail_impl="classic")(a, r)
            o2 = gos()(a, r)
            o3 = gos(roll_impl="batch")(a, r)
            return (jnp.max(jnp.abs(o1.threshold - o2.threshold)),
                    jnp.sum(o1.peaks != o2.peaks),
                    jnp.max(jnp.abs(o2.threshold - o3.threshold)),
                    jnp.sum(o2.peaks != o3.peaks))
        dt, df, dbt, dbf = jax.jit(d)(x, rt_gos)
        checks["gos_lean_vs_classic"] = [float(dt), int(df)]
        checks["gos_batch_vs_lean"] = [float(dbt), int(dbf)]
        print(f"digests: lean-vs-classic {float(dt)}/{int(df)}, "
              f"batch-vs-lean {float(dbt)}/{int(dbf)} (must all be 0)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"gos digests FAILED: {e}"[:300], file=sys.stderr, flush=True)

    fam = {
        "ca_lean": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg)), x, rt),
        "ca_classic": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, tail_impl="classic")), x, rt),
        "gos_lean": (gos(), x, rt_gos),
        "gos_classic_tail": (gos(tail_impl="classic"), x, rt_gos),
        "gos_batch_roll": (gos(roll_impl="batch"), x, rt_gos),
        "gos_oe_batch": (gos(merge_impl="oe_batch"), x, rt_gos),
        "gos_batch_all": (gos(roll_impl="batch", merge_impl="oe_batch",
                              select_impl="batch"), x, rt_gos),
        "gos_ablate_merge": (gos(ablate="merge"), x, rt_gos),
        "gos_ablate_rank": (gos(ablate="rank"), x, rt_gos),
        "gos_ablate_sort": (gos(ablate="sort"), x, rt_gos),
        "gos_ablate_tail": (gos(ablate="tail"), x, rt_gos),
        "wire_lean": (wire(), words, rt),
        "wire_ablate_unpack": (wire(ablate="unpack"), words, rt),
        "wire_ablate_pack": (wire(ablate="pack"), words, rt),
        "int_chain": (f_int, xi16, rt),
    }
    ok = {}
    for name, (f, xx, rr) in fam.items():
        try:
            jax.block_until_ready(f(xx, rr))
            ok[name] = (f, xx, rr)
            print(f"warm {name}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"warm {name} FAILED: {e}"[:200], file=sys.stderr, flush=True)
    results = {k: [] for k in ok}
    reps = int(os.environ.get("R4D_REPS", "5"))
    for rep in range(reps):
        for name, (f, xx, rr) in ok.items():
            try:
                ms = measure_per_call(f, xx, rr) * 1e3
            except Exception:  # noqa: BLE001
                ms = float("nan")
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)

    out = {
        "session": "r4d",
        "shape": "64x256x1024",
        "reps_ms": results,
        "median_ms": {k: round(float(np.nanmedian(v)), 4)
                      for k, v in results.items() if v},
        "digests": checks,
    }
    r4b_path = "/tmp/r4b_chip.json"
    if os.path.exists(r4b_path) and os.path.getsize(r4b_path) > 2:
        try:
            with open(r4b_path) as fh:
                out["rd_2d_os"] = json.load(fh)
        except Exception:  # noqa: BLE001
            pass
    with open("/root/repo/benchmarks/results_r4.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["median_ms"]), flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
