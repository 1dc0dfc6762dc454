"""r5 session B: the GOS order-statistic round (VERDICT r4 item 2).

Two parts, one interleaved session:

1. **The amortized bit-sliced radix select, IMPLEMENTED and measured.** The
   r3/r4 notes carried it as an evaluated-not-shipped idea; the verdict
   demands the implemented form's numbers. Two micro-kernels on identical
   [16384, 1024] magnitude rows (the headline CPI's row count), w = 32:

   - ``micro_ladder``: the shipped sliding-merge structure — batched odd-even
     merge ladder to 32 sorted rows + two batched rank-select trees (the r4
     default formulation, lifted out of the chain kernel so the A/B isolates
     the sort section).
   - ``micro_radix1/2``: bit-sliced binary-search selection. The windows
     SLIDE, so a per-bit counting pass cannot be shared across windows (the
     candidate prefix is per-window, which breaks the box-sum decomposition;
     a wavelet-tree layout would need per-lane gathers — banned on this
     hardware). The only gather-free exact form counts per OFFSET: the 32
     shifted rows are materialized once (static rolls, shared by all
     consumers — the claimed amortization), then each rank runs 31 rounds of
     ``lo = where(count(v < lo|bit) <= k, lo|bit, lo)`` with count =
     32 compares + adds. Op count: 32 rolls + 31x64 ~ 2k passes per rank vs
     the whole ladder's ~300 — the measurement below makes the §2b floor
     claim about this form MEASURED, not estimated. Equality of the two
     kernels' outputs is digest-checked on-chip.

2. **The r5 chain-kernel gates**, measured against the r4 default (4.433 ms
   interleaved median, results_r4.json): register-gated CA rows (dead under
   GOS registers), register-gated peak-grouping neighbor rows, and the
   shared rank-select tree when index_lagg == index_lead (the shipped
   register file). Families isolate each: ``gos_new`` (ranks 16/16,
   grouping 0 — the bench registers), ``gos_unequal`` (16/17: pays the
   second tree), ``gos_grouped`` (grouping 1: pays the neighbor rows).
   Digest-validated vs the XLA composition at 8 channels in-session.

Run ALONE: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_r5b.py
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

M = 128       # slab margin (GOS3_MARGIN)
W = 32        # micro A/B window
NMICRO = 1024
F_TOT = int(__import__("os").environ.get("R5B_FTOT", "16384"))
INTERPRET = __import__("os").environ.get("R5B_INTERPRET") == "1"


def _build_micro_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rsp_chains_tpu.kernels.cfar_pallas import (
        _oe_merge_lists_batched,
        _rank_select_tree_batched,
        _roll_left,
        _roll_right,
    )

    n = NMICRO
    slab_w = n + 2 * M
    bf = 32

    def ladder_kernel(scal_ref, mag_ref, lag_ref, lead_ref):
        rank_g = scal_ref[0]
        rank_l = scal_ref[1]
        guard = scal_ref[2]
        slab = mag_ref[:, :]
        rows = [slab]
        for lev in range(5):
            m = 1 << lev
            if len(rows) > 1:
                fr = rows[0].shape[0]
                rolled = pltpu.roll(jnp.concatenate(rows, axis=0),
                                    slab_w - m, axis=1)
                shifted = [rolled[i * fr:(i + 1) * fr]
                           for i in range(len(rows))]
            else:
                shifted = [pltpu.roll(r, slab_w - m, axis=1) for r in rows]
            rows = _oe_merge_lists_batched(rows, shifted)
        idx_g = jnp.broadcast_to(rank_g, slab.shape)
        idx_l = jnp.broadcast_to(rank_l, slab.shape)
        val_g = _rank_select_tree_batched(rows, idx_g)
        val_l = _rank_select_tree_batched(rows, idx_l)
        lag_ref[:, :] = _roll_right(val_g, guard + W)[:, M : M + n]
        lead_ref[:, :] = _roll_left(val_l, guard + 1)[:, M : M + n]

    def radix_kernel(scal_ref, mag_ref, lag_ref, lead_ref, rows_scr,
                     *, two_ranks: bool):
        rank_g = scal_ref[0]
        rank_l = scal_ref[1]
        guard = scal_ref[2]
        slab = mag_ref[:, :]
        vi = jax.lax.bitcast_convert_type(slab, jnp.int32)
        # the shared counting operand: all W shifted rows, built once and
        # reused by every bit round of every consumer (the amortization)
        for d in range(W):
            rows_scr[d] = (pltpu.roll(vi, slab_w - d, axis=1) if d
                           else vi)

        def select(k):
            kb = jnp.broadcast_to(k, slab.shape)
            lo = jnp.zeros(slab.shape, jnp.int32)
            for b in reversed(range(31)):
                cand = lo | (1 << b)
                cnt = jnp.zeros(slab.shape, jnp.int32)
                for d in range(W):
                    cnt = cnt + (rows_scr[d] < cand).astype(jnp.int32)
                lo = jnp.where(cnt <= kb, cand, lo)
            return jax.lax.bitcast_convert_type(lo, jnp.float32)

        val_g = select(rank_g)
        val_l = select(rank_l) if two_ranks else val_g
        lag_ref[:, :] = _roll_right(val_g, guard + W)[:, M : M + n]
        lead_ref[:, :] = _roll_left(val_l, guard + 1)[:, M : M + n]

    def build(kernel, scratch):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(F_TOT // bf,),
                in_specs=[pl.BlockSpec((bf, slab_w), lambda i, *_: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[
                    pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=([pltpu.VMEM((W, bf, slab_w), jnp.int32)]
                                if scratch else []),
            ),
            out_shape=[jax.ShapeDtypeStruct((F_TOT, n), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=INTERPRET,
        )

    f_ladder = build(ladder_kernel, scratch=False)
    f_radix1 = build(functools.partial(radix_kernel, two_ranks=False),
                     scratch=True)
    f_radix2 = build(functools.partial(radix_kernel, two_ranks=True),
                     scratch=True)
    return f_ladder, f_radix1, f_radix2


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
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_gos
    from rsp_chains_tpu.ops.cfar import cfar_op
    from rsp_chains_tpu.ops.fft import fft_op
    from rsp_chains_tpu.ops.logmag import logmag
    from rsp_chains_tpu.utils.device import acquire_device

    print(f"device: {acquire_device(600)}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    x8 = C(x.re[:8], x.im[:8])
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)

    def gos_rt(lagg, lead, grouping=0):
        return dataclasses.replace(
            rt, cfar_algorithm=jnp.asarray(1, jnp.int32),
            index_lagg=jnp.asarray(lagg, jnp.int32),
            index_lead=jnp.asarray(lead, jnp.int32),
            peak_grouping=jnp.asarray(grouping, jnp.int32))

    f_gos = jax.jit(lambda a, r: fused_chain_gos(a, r, fft_cfg, gos_cfg))

    # CA anchor for the session's drift context
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca

    f_ca = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca_cfg))

    # ---- digest: gos_new vs XLA at 8 channels (cheap; bench does 64) ----
    def xla_gos(a, r):
        s = fft_op(a, r.log2_fft_size, fft_cfg)
        return cfar_op(logmag(s, r.mag_mode), r, gos_cfg)

    def dig(a, r):
        o1 = jax.jit(xla_gos)(a, r)
        o2 = f_gos(a, r)
        scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
        return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / scale,
                jnp.sum(o1.peaks.astype(jnp.int32)
                        - o2.peaks.astype(jnp.int32) != 0))

    checks = {}
    for name, rr in (("equal", gos_rt(16, 16)),
                     ("unequal", gos_rt(16, 17)),
                     ("grouped", gos_rt(16, 16, grouping=1)),
                     ("ca_regs", rt)):
        d, fl = jax.jit(dig)(x8, rr)
        checks[name] = [float(d), int(fl)]
        print(f"digest {name}: {checks[name]}", file=sys.stderr, flush=True)

    # ---- micro kernels + their equality digest ----
    f_ladder, f_radix1, f_radix2 = _build_micro_kernels()
    mag_rows = np.abs(rng.randn(F_TOT, NMICRO + 2 * M)).astype(np.float32)
    mag_rows[:, :M] = 0.0
    mag_rows[:, M + NMICRO:] = 0.0
    mag_j = jnp.asarray(mag_rows)

    def micro(f):
        return jax.jit(lambda a, r: f(jnp.stack(
            [r.index_lagg, r.index_lead, r.guard_window_size]), a)[0])

    m_ladder = micro(f_ladder)
    m_radix1 = micro(f_radix1)
    m_radix2 = micro(f_radix2)

    def micro_dig(a, r):
        s = jnp.stack([r.index_lagg, r.index_lead, r.guard_window_size])
        l1, d1 = f_ladder(s, a)
        l2, d2 = f_radix2(s, a)
        return (jnp.sum(jnp.abs(l1 - l2) > 0) + jnp.sum(jnp.abs(d1 - d2) > 0),
                jnp.int32(0))

    dmic = jax.jit(micro_dig)(mag_j, gos_rt(16, 17))
    checks["micro_equal_cells_off"] = int(dmic[0])
    print(f"micro ladder-vs-radix mismatched cells: {int(dmic[0])}",
          file=sys.stderr, flush=True)

    fam = {
        "ca_lean": (f_ca, x, rt),
        "gos_new": (f_gos, x, gos_rt(16, 16)),
        "gos_unequal": (f_gos, x, gos_rt(16, 17)),
        "gos_grouped": (f_gos, x, gos_rt(16, 16, grouping=1)),
        "micro_ladder": (m_ladder, mag_j, gos_rt(16, 17)),
        "micro_radix1": (m_radix1, mag_j, gos_rt(16, 17)),
        "micro_radix2": (m_radix2, mag_j, gos_rt(16, 17)),
    }
    import time
    for name, (f, xx, rr) in fam.items():
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree.leaves(f(xx, rr))[0])
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    results = {k: [] for k in fam}
    for rep in range(int(os.environ.get("R5B_REPS", "5"))):
        for name, (f, xx, rr) in fam.items():
            ms = measure_per_call(f, xx, rr) * 1e3
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    out = {"session": "r5b", "digests": checks, "reps_ms": results,
           "median_ms": {k: round(float(np.nanmedian(v)), 4)
                         for k, v in results.items()},
           "min_ms": {k: round(float(np.nanmin(v)), 4)
                      for k, v in results.items()}}
    print(json.dumps(out["median_ms"]), flush=True)
    with open("/root/repo/benchmarks/results_r5b.json", "w") as fh:
        json.dump(out, fh, indent=1)
    os._exit(0)


if __name__ == "__main__":
    main()
