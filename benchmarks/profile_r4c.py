"""r4 on-chip session C (follow-up to r4a): (1) the lean GOS epilogue vs the
classic value-ladder epilogue (the r4a ablation put the ungated epilogue at
~1.3 ms of the 5.3 ms chain), (2) the HONEST sort-tail ablation family —
r4a's 'rank' leaked through dead-code elimination (rows[0] alone let the
compiler delete the ladder) and 'shift' leaked through min(a,a) folding; the
fixed 'rank' consumes every row, 'shift' is dropped, (3) wire-format
unpack/pack ablations quantifying the structural VPU cost of the wire words
over the pair form (VERDICT item 3 floor evidence). Interleaved reps; run
ALONE."""

from __future__ import annotations

import json
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
        CfarConfig, CfarVariant, FftConfig, RuntimeConfig, packing,
    )
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
    xi16 = C(jnp.round(jnp.clip(x.re * 25, -32767, 32767)),
             jnp.round(jnp.clip(x.im * 25, -32767, 32767)))
    words = jax.jit(packing.pack_iq)(xi16)
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

    # exactness: lean GOS epilogue vs classic, on-chip
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
        print(f"gos lean-vs-classic on-chip: max|dthr|={float(dt)} "
              f"flips={int(df)} (must be 0/0); batch-roll vs lean: "
              f"max|dthr|={float(dbt)} flips={int(dbf)} (must be 0/0)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"gos lean digest FAILED: {e}"[:300], file=sys.stderr, flush=True)

    fam = {
        "gos_lean": (gos(), x, rt_gos),
        "gos_classic_tail": (gos(tail_impl="classic"), x, rt_gos),
        "gos_batch_roll": (gos(roll_impl="batch"), x, rt_gos),
        "gos_ablate_merge": (gos(ablate="merge"), x, rt_gos),
        "gos_ablate_rank": (gos(ablate="rank"), x, rt_gos),
        "gos_ablate_sort": (gos(ablate="sort"), x, rt_gos),
        "gos_ablate_tail": (gos(ablate="tail"), x, rt_gos),
        "wire_lean": (wire(), words, rt),
        "wire_ablate_unpack": (wire(ablate="unpack"), words, rt),
        "wire_ablate_pack": (wire(ablate="pack"), words, rt),
        "ca_lean": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg)), x, rt),
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
    for rep in range(4):
        for name, (f, xx, rr) in ok.items():
            try:
                ms = measure_per_call(f, xx, rr) * 1e3
            except Exception:  # noqa: BLE001
                ms = float("nan")
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
