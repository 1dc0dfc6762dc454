"""r3 clean re-run of the CA-wall probes (the r3d CA numbers were contaminated
by a concurrent CPU-heavy pytest run inflating the host timing loop) plus the
remaining GOS candidates. Run ALONE — no other processes."""

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
    rt_cash = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                 guard_window_size=4, threshold_scaler=3.5,
                                 div_sum=5, cfar_mode=3, sub_window_size=8)

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

    f_ca = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca_cfg))
    probe("ca_ship_bf128", f_ca, rt)
    for name, kw in (
        ("ca_bf256", dict(block_frames=256)),
        ("ca_bf256_rg2", dict(block_frames=256, row_groups=2)),
        ("ca_rg2", dict(row_groups=2)),
        ("ca_bf512", dict(block_frames=512)),
        ("ca_bf256_gatemag", dict(block_frames=256, gate_mag=True)),
    ):
        f = jax.jit(lambda a, r, _kw=kw: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, **_kw))
        probe(name, f, rt, ref=f_ca)
    # ablations at bf256 for the budget table (WRONG results, timing only)
    for abl in ("cfar", "perm", "mxu", "pass1"):
        f = jax.jit(lambda a, r, _a=abl: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, ablate=_a, gated_cfar=False,
            block_frames=256))
        probe(f"ca_bf256_ablate_{_a_name(abl)}", f, rt)

    # GOS: the new defaults (oe + bf32) and the bf64 candidate
    f_gos = jax.jit(lambda a, r: fused_chain_gos(a, r, fft_cfg, gos_cfg))
    probe("gos_ship_oe_bf32", f_gos, rt_gos)
    f_gos64 = jax.jit(lambda a, r: fused_chain_gos(a, r, fft_cfg, gos_cfg,
                                                   block_frames=64))
    probe("gos_oe_bf64", f_gos64, rt_gos, ref=f_gos)
    probe("cash_oe_bf32", f_gos, rt_cash)
    f_gos_w64 = RuntimeConfig.make(fft_size=n, ref_window_size=64,
                                   guard_window_size=4, threshold_scaler=3.5,
                                   div_sum=6, cfar_algorithm=1,
                                   index_lagg=32, index_lead=32)
    probe("gos_w64_oe_bf32", f_gos, f_gos_w64)

    print(json.dumps(results, indent=1))


def _a_name(a):
    return a


if __name__ == "__main__":
    main()
