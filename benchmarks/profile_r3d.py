"""r3 A/B ladder #2 — GOS chain formulations and the CA VPU-wall attack.

GOS chain (headline CPI 64x256x1024, GOSCA wmax=64, w=32 registers):
  * merge_impl: bitonic vs Batcher odd-even (20% fewer comparators, exact)
  * block_frames: 8 / 16 / 32

CA chain wall (VERDICT r2 item 2): stage ablations of the shipped fold
formulation (results are WRONG by construction — timing only), plus
row_groups and block_frames probes, to produce the measured budget table
for docs/KERNELS.md. Run alone (one TPU process)."""

from __future__ import annotations

import json
import sys
import threading

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
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_gos,
    )
    from rsp_chains_tpu.utils.device import acquire_device

    dev = acquire_device(600)
    print(f"device: {dev}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)

    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1,
                                index_lagg=16, index_lead=16)

    results = {}

    def probe(name, f, rr, budget=2400, ref=None):
        verdict = {}

        def work():
            try:
                if ref is not None:
                    def digests(a, r):
                        o1 = ref(a, r)
                        o2 = f(a, r)
                        s = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
                        return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / s,
                                jnp.sum(o1.peaks.astype(jnp.int32)
                                        - o2.peaks.astype(jnp.int32) != 0))
                    dthr, dpk = jax.jit(digests)(x, rr)
                    verdict["dthr"] = float(dthr)
                    verdict["flips"] = int(dpk)
                verdict["ms"] = round(measure_per_call(f, x, rr) * 1e3, 4)
            except Exception as e:  # noqa: BLE001
                verdict["err"] = f"{type(e).__name__}: {e}"[:300]

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(timeout=budget)
        if t.is_alive():
            verdict["err"] = "timeout"
        results[name] = verdict
        print(f"{name}: {verdict}", file=sys.stderr, flush=True)

    # ---- GOS chain A/Bs (reference: the bitonic bf16 shipped form) ----
    f_ref = jax.jit(lambda a, r: fused_chain_gos(a, r, fft_cfg, gos_cfg))
    probe("gos_bitonic_bf16", f_ref, rt_gos)
    for name, kw in (
        ("gos_oe_bf16", dict(merge_impl="oe")),
        ("gos_oe_bf32", dict(merge_impl="oe", block_frames=32)),
        ("gos_bitonic_bf32", dict(block_frames=32)),
        ("gos_oe_bf8", dict(merge_impl="oe", block_frames=8)),
    ):
        f = jax.jit(lambda a, r, _kw=kw: fused_chain_gos(
            a, r, fft_cfg, gos_cfg, **_kw))
        probe(name, f, rt_gos, ref=f_ref)

    # CASH under the oe form (its ladder is sort-free but shares the slab)
    rt_cash = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                 guard_window_size=4, threshold_scaler=3.5,
                                 div_sum=5, cfar_mode=3, sub_window_size=8)
    probe("cash_bitonic_bf16", f_ref, rt_cash)

    # ---- CA chain wall: ablations of the shipped fold formulation ----
    # (ablations give WRONG results — timing only, no digest)
    f_ca = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca_cfg))
    probe("ca_ship_fold", f_ca, rt)
    for abl in ("cfar", "perm", "mxu", "pass1"):
        f = jax.jit(lambda a, r, _a=abl: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, ablate=_a, gated_cfar=False))
        probe(f"ca_ablate_{abl}", f, rt)
    for name, kw in (
        ("ca_rowgroups2", dict(row_groups=2)),
        ("ca_rowgroups4", dict(row_groups=4)),
        ("ca_bf256", dict(block_frames=256)),
        ("ca_bf64", dict(block_frames=64)),
        ("ca_gatemag", dict(gate_mag=True)),
    ):
        f = jax.jit(lambda a, r, _kw=kw: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, **_kw))
        probe(f"{name}", f, rt, ref=f_ca)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
