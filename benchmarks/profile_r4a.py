"""r4 on-chip session A: (1) lean-vs-classic CA tail A/B at the headline CPI
(+ exactness digest — the lean tail must be BIT-identical on real hardware
too), (2) wire-format kernel lean/bf256 vs the r3 classic/bf128 form and its
ratio to the pair kernel (VERDICT item 3), (3) the bit-true integer chain's
first on-chip timing + exactness digest (VERDICT item 4), (4) the GOS sort
tail's interleaved per-pass ablation family at the headline CPI (VERDICT
item 1 floor proof; ablated results are WRONG by construction — timing only).
Run ALONE (single TPU process). Results print incrementally: a late failure
must not lose earlier numbers."""

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
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
    )
    from rsp_chains_tpu.configs import FixedPointConfig
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_ca_packed, fused_chain_gos,
    )
    from rsp_chains_tpu.kernels.int_chain_pallas import fused_chain_int
    from rsp_chains_tpu.utils.device import acquire_device

    dev = acquire_device(600)
    print(f"device: {dev}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    xi16 = C(jnp.round(jnp.clip(x.re * 25, -32767, 32767)).astype(jnp.int32),
             jnp.round(jnp.clip(x.im * 25, -32767, 32767)).astype(jnp.int32))
    from rsp_chains_tpu import packing

    words = jax.jit(packing.pack_iq)(xi16)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1,
                                index_lagg=16, index_lead=16)

    def ca(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, **_kw))

    def wire(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_chain_ca_packed(
            a, r, fft_cfg, ca_cfg, **_kw))

    def gos(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_chain_gos(
            a, r, fft_cfg, gos_cfg, **_kw))

    int_cfg = ChainConfig(
        fft=fft_cfg, cfar=ca_cfg,
        fixed_point=FixedPointConfig(enabled=True, width=16, bin_point=0,
                                     bit_true=True))
    f_int = jax.jit(lambda a, r: fused_chain_int(a, r, fft_cfg, ca_cfg))

    # ---- exactness digests (scalar fetches only) ----
    def digest_pair(fa, fb, xx, rr):
        def d(a, r):
            o1, o2 = fa(a, r), fb(a, r)
            return (jnp.max(jnp.abs(o1.threshold.astype(jnp.float32)
                                    - o2.threshold.astype(jnp.float32))),
                    jnp.sum(o1.peaks != o2.peaks))
        dt, df = jax.jit(d)(xx, rr)
        return float(dt), int(df)

    try:
        dt, df = digest_pair(ca(), ca(tail_impl="classic"), x, rt)
        print(f"lean-vs-classic on-chip: max|dthr|={dt} flips={df} "
              f"(must be 0/0)", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"lean digest FAILED: {e}"[:300], file=sys.stderr, flush=True)

    try:
        def dw(wv, r):
            a = wire()(wv, r)
            b = wire(tail_impl="classic", block_frames=128)(wv, r)
            return jnp.sum(a != b)
        dfw = int(jax.jit(dw)(words, rt))
        print(f"wire lean-vs-classic words differing: {dfw} (must be 0)",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"wire digest FAILED: {e}"[:300], file=sys.stderr, flush=True)

    try:
        from rsp_chains_tpu.ops.bit_true import cfar_int, fft_int_op, mag_int_op

        def xla_int(a, r):
            spec = fft_int_op(a, r.log2_fft_size, fft_cfg)
            return cfar_int(mag_int_op(spec, r.mag_mode), r, ca_cfg)

        dt, df = digest_pair(f_int, jax.jit(xla_int), xi16, rt)
        print(f"int-chain vs XLA bit-true on-chip: max|dthr|={dt} flips={df} "
              f"(must be 0/0)", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"int digest FAILED: {e}"[:300], file=sys.stderr, flush=True)

    # ---- interleaved timing families ----
    fam_main = {
        "ca_lean_bf256": (ca(), x, rt),
        "ca_classic_bf256": (ca(tail_impl="classic"), x, rt),
        "wire_lean_bf256": (wire(), words, rt),
        "wire_classic_bf128": (wire(tail_impl="classic", block_frames=128),
                               words, rt),
        "wire_classic_bf256": (wire(tail_impl="classic"), words, rt),
        "int_chain_bf256": (f_int, xi16, rt),
    }
    fam_gos = {
        "gos_base": (gos(), x, rt_gos),
        "gos_ablate_fft": (gos(ablate="fft"), x, rt_gos),
        "gos_ablate_merge": (gos(ablate="merge"), x, rt_gos),
        "gos_ablate_shift": (gos(ablate="shift"), x, rt_gos),
        "gos_ablate_rank": (gos(ablate="rank"), x, rt_gos),
        "gos_ablate_sort": (gos(ablate="sort"), x, rt_gos),
        "gos_ablate_tail": (gos(ablate="tail"), x, rt_gos),
    }

    def run_family(title, fam, reps):
        ok = {}
        for name, (f, xx, rr) in fam.items():
            try:
                jax.block_until_ready(f(xx, rr))
                ok[name] = (f, xx, rr)
                print(f"warm {name}", file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"warm {name} FAILED: {e}"[:200], file=sys.stderr,
                      flush=True)
        results = {k: [] for k in ok}
        for rep in range(reps):
            for name, (f, xx, rr) in ok.items():
                try:
                    ms = measure_per_call(f, xx, rr) * 1e3
                except Exception:  # noqa: BLE001
                    ms = float("nan")
                results[name].append(round(ms, 4))
                print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr,
                      flush=True)
        print(json.dumps({title: results}), flush=True)

    run_family("main", fam_main, reps=4)
    run_family("gos_ablation", fam_gos, reps=3)
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
