"""r3 on-chip validation of the fused RD+2D-CFAR kernel (first real-TPU
compile — interpret-mode tests cannot catch Mosaic legalization/VMEM issues;
sublane-axis pltpu.roll is the novel ingredient here) + block-frame A/B for
the standalone GOS tail kernel. Run ALONE."""

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
        CfarConfig, CfarVariant, ChainConfig, DopplerConfig, FftConfig,
        MatchedFilterConfig, RuntimeConfig,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.golden import lfm_chirp
    from rsp_chains_tpu.ops.cfar_2d import Cfar2dConfig, Cfar2dRuntime
    from rsp_chains_tpu.utils.device import acquire_device

    dev = acquire_device(600)
    print(f"device: {dev}", file=sys.stderr, flush=True)

    n, p, ch = 1024, 256, 16
    taps = np.asarray(lfm_chirp(128, 0.0, 0.25))
    cfg = ChainConfig(
        fft=FftConfig(max_size=n),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n),
        doppler=DopplerConfig(num_pulses=p),
        cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n),
    )
    cfg2d = Cfar2dConfig(max_ref_range=16, max_guard_range=4,
                         max_ref_doppler=8, max_guard_doppler=2)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(ch, p, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(ch, p, n) * 100, jnp.float32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=8.0)
    rt2 = Cfar2dRuntime.make(ref_range=8, guard_range=2, ref_doppler=4,
                             guard_doppler=1, threshold_scaler=6.0,
                             active_range=n)

    results = {}

    def run_guard(name, fn, budget=3600):
        verdict = {}

        def work():
            try:
                fn(verdict)
            except Exception as e:  # noqa: BLE001
                verdict["err"] = f"{type(e).__name__}: {e}"[:300]

        t = threading.Thread(target=work, daemon=True)
        t.start()
        t.join(timeout=budget)
        if t.is_alive():
            verdict["err"] = "timeout"
        results[name] = verdict
        print(f"{name}: {verdict}", file=sys.stderr, flush=True)

    # ---- fused RD + 2-D CFAR: validate vs the composed route, then time ----
    from rsp_chains_tpu.kernels.rd_pallas import fused_rd_2d_chain, fused_rd_chain
    from rsp_chains_tpu.ops.cfar_2d import cfar_2d_op
    from rsp_chains_tpu.ops.logmag import logmag

    f_2d = jax.jit(lambda a, r, r2: fused_rd_2d_chain(
        a, r, r2, taps, cfg, cfg2d))

    def composed(a, r, r2):
        y = fused_rd_chain(a, r, taps, cfg, emit="map")
        return cfar_2d_op(logmag(y, r.mag_mode, cfg.mag), r2, cfg2d)

    def val(verdict):
        def digests(a, r, r2):
            o1 = composed(a, r, r2)
            o2 = f_2d(a, r, r2)
            s = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
            return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / s,
                    jnp.sum(o1.peaks.astype(jnp.int32)
                            - o2.peaks.astype(jnp.int32) != 0))
        dthr, dpk = jax.jit(digests)(x, rt, rt2)
        verdict["dthr"] = float(dthr)
        verdict["flips"] = int(dpk)

    run_guard("rd2d_validate", val)

    def time_2d(verdict):
        import dataclasses
        import time

        mix = jax.jit(lambda out, base: dataclasses.replace(
            base, threshold_scaler=base.threshold_scaler
            + 1e-30 * out.threshold[(0,) * out.threshold.ndim]))
        dig = jax.jit(lambda out: out.threshold[(0,) * out.threshold.ndim])

        def run(k):
            r2i = rt2
            out = None
            t0 = time.perf_counter()
            for _ in range(k):
                out = f_2d(x, rt, r2i)
                r2i = mix(out, rt2)
            _ = float(dig(out))
            return time.perf_counter() - t0

        run(2)
        lo = min(run(6) for _ in range(3))
        hi = min(run(30) for _ in range(3))
        verdict["ms"] = round(max(hi - lo, 1e-9) / 24 * 1e3, 4)
        # composed route for comparison (same registers)
        f_c = jax.jit(composed)

        def run_c(k):
            r2i = rt2
            out = None
            t0 = time.perf_counter()
            for _ in range(k):
                out = f_c(x, rt, r2i)
                r2i = mix(out, rt2)
            _ = float(dig(out))
            return time.perf_counter() - t0

        run_c(2)
        lo = min(run_c(6) for _ in range(3))
        hi = min(run_c(30) for _ in range(3))
        verdict["composed_ms"] = round(max(hi - lo, 1e-9) / 24 * 1e3, 4)

    run_guard("rd2d_time", time_2d)

    # ---- standalone GOS tail kernel: bf16 (ship) vs bf32, oe merge ----
    from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_gos_cfar

    gcfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                      include_cash=True, max_fft_size=n)
    spec = C(jnp.asarray(rng.randn(4096, n) * 100, jnp.float32),
             jnp.asarray(rng.randn(4096, n) * 100, jnp.float32))
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1,
                                index_lagg=16, index_lead=16)
    f16 = jax.jit(lambda a, r: fused_mag_gos_cfar(a, r, gcfg))
    f32 = jax.jit(lambda a, r: fused_mag_gos_cfar(a, r, gcfg,
                                                  block_frames=32))

    def gtail(verdict):
        def digests(a, r):
            o1 = f16(a, r)
            o2 = f32(a, r)
            s = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
            return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / s,
                    jnp.sum(o1.peaks.astype(jnp.int32)
                            - o2.peaks.astype(jnp.int32) != 0))
        dthr, dpk = jax.jit(digests)(spec, rt_gos)
        verdict["dthr"] = float(dthr)
        verdict["flips"] = int(dpk)
        verdict["bf16_ms"] = round(measure_per_call(f16, spec, rt_gos) * 1e3, 4)
        verdict["bf32_ms"] = round(measure_per_call(f32, spec, rt_gos) * 1e3, 4)

    run_guard("gos_tail_bf_ab", gtail)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
