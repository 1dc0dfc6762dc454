"""Round-3 full config-ladder measurement -> benchmarks/results_r3.json.

BASELINE.md configs with the shipped round-3 formulations: the fused chain
kernel (bf16x2 dots, MXU permutation + stack_hi_lo, gated CA body), the
single-kernel collapsed pulse compression (h_block), the fused range-Doppler
kernel (structural-inverse MF, dense Doppler matmul), and the GOS v3
sliding-merge sort as the default tail. Each fused path is digest-validated
on-device against its XLA composition before being trusted.

Run as the ONLY TPU process (benchmarks/warm_cache.py first if the kernels
changed; persistent cache enabled here too).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "results_r3.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    import rsp_chains_tpu as rsp
    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, DopplerConfig, FftConfig,
        MatchedFilterConfig, RuntimeConfig,
    )
    from rsp_chains_tpu.cplx import C, as_pair
    from rsp_chains_tpu.golden import lfm_chirp
    from rsp_chains_tpu.kernels.cfar_pallas import (
        fused_mag_cfar, fused_mag_gos_cfar, fused_mag_gos_dispatch,
    )
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_ca_packed,
    )
    from rsp_chains_tpu.utils.device import acquire_device

    try:
        dev = acquire_device(600)
    except TimeoutError as e:
        log(str(e))
        raise SystemExit(3)
    log(f"device: {dev}")
    rng = np.random.RandomState(0)
    results = {
        "hardware": f"{dev.device_kind} (1 chip, via axon relay)",
        "methodology": "serialized-dependency slope timing "
                       "(min over 5 reps of (t(K=45)-t(K=5))/40)",
        "round": "r3",
    }

    def mixer(digest_fn):
        return jax.jit(lambda out, base: dataclasses.replace(
            base, threshold_scaler=base.threshold_scaler
            + 1e-30 * digest_fn(out)))

    def timed(f, xx, rr, digest_fn, k_lo=5, k_hi=45, reps=5):
        mx = mixer(digest_fn)
        dig = jax.jit(digest_fn)

        def run(k):
            rt_i = rr
            out = None
            t0 = time.perf_counter()
            for _ in range(k):
                out = f(xx, rt_i)
                rt_i = mx(out, rr)
            _ = float(dig(out))
            return time.perf_counter() - t0

        run(2)
        lo = [run(k_lo) for _ in range(reps)]
        hi = [run(k_hi) for _ in range(reps)]
        return max((min(hi) - min(lo)) / (k_hi - k_lo), 1e-9)

    def validate(pair_fn, xx, rr, name):
        """On-device scalar digests: fused-vs-XLA max rel threshold delta +
        peak flips (array fetches hang on this runtime)."""
        def digests(x, r):
            o1, o2 = pair_fn(x, r)
            scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
            return (jnp.max(jnp.abs(o1.threshold - o2.threshold)) / scale,
                    jnp.sum(o1.peaks.astype(jnp.int32)
                            - o2.peaks.astype(jnp.int32) != 0))
        try:
            dthr, dpk = jax.jit(digests)(xx, rr)
            results[name] = {"rel_dthr": float(dthr), "peak_flips": int(dpk)}
            log(f"{name}: dthr={float(dthr):.3e} flips={int(dpk)}")
        except Exception as e:  # noqa: BLE001
            results[name] = f"error: {str(e)[:300]}"
            log(f"{name} FAILED: {str(e)[:300]}")

    d_thr = lambda o: o.threshold[(0,) * o.threshold.ndim]
    d_arr = lambda o: o[(0,) * o.ndim].astype(jnp.float32)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    ca = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                    include_cash=False, max_fft_size=n)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    taps = lfm_chirp(128, 0.0, 0.25)
    taps_np = np.asarray(taps)

    def iq(ch, p, nn):
        return C(jnp.asarray(rng.randint(-20000, 20000, (ch, p, nn)),
                             jnp.float32),
                 jnp.asarray(rng.randint(-20000, 20000, (ch, p, nn)),
                             jnp.float32))

    def record(name, f, xx, rr, samples, digest=d_thr, **extra):
        try:
            dt = timed(f, xx, rr, digest)
            results[name] = {"ms_per_call": round(dt * 1e3, 4),
                             "msamples_per_s": round(samples / dt / 1e6, 1),
                             **extra}
            log(f"{name}: {dt*1e3:.3f} ms = {samples/dt/1e9:.2f} Gs/s")
            return dt
        except Exception as e:  # noqa: BLE001
            results[name] = f"error: {str(e)[:300]}"
            log(f"{name} FAILED: {str(e)[:300]}")
            return None

    # ---- config 1: headline fused chain ----
    f_chain = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca))
    x1 = iq(64, 256, n)
    for ch, xx in ((64, x1), (16, iq(16, 256, n))):
        record(f"config1_chain_1024_{ch}ch", f_chain, xx, rt, ch * 256 * n)

    # ---- fold interleave: pass-3 columns sigma-reordered so the natural-
    # order permutation shrinks to log2(n1) bit-swap roll/select steps —
    # replaces the dense [N, N] MXU permutation matmul (the r2m budget's
    # single largest item, ~0.40 ms). Exact on f32; digest-validated against
    # the shipped mxu formulation before timing ----
    f_fold = jax.jit(lambda a, r: fused_chain_ca(a, r, fft_cfg, ca,
                                                 perm_impl="fold"))
    validate(lambda x, r: (f_chain(x, r), f_fold(x, r)), x1, rt,
             "config1_fold_validation")
    record("config1_chain_1024_64ch_fold", f_fold, x1, rt, 64 * 256 * n)

    # ---- wire-format serving chain ----
    re_i = rng.randint(-20000, 20000, (64, 256, n))
    im_i = rng.randint(-20000, 20000, (64, 256, n))
    words = jnp.asarray(((re_i.astype(np.int64) & 0xFFFF) << 16
                         | (im_i.astype(np.int64) & 0xFFFF)).astype(np.uint32))
    f_wire = jax.jit(lambda a, r: fused_chain_ca_packed(a, r, fft_cfg, ca))
    record("config_wire_chain_1024_64ch", f_wire, words, rt, 64 * 256 * n,
           digest=d_arr)

    # ---- config 2: collapsed pulse compression (single kernel, h_block) ----
    n2 = 4096
    cfg2 = ChainConfig(
        fft=FftConfig(max_size=n2),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n2),
        cfar=CfarConfig(max_ref_window=64, max_fft_size=n2,
                        variant=CfarVariant.CA, include_cash=False),
    )
    pc = rsp.pulse_compression_chain(cfg2, taps=taps)
    rt2 = RuntimeConfig.make(fft_size=n2, ref_window_size=32,
                             guard_window_size=4, threshold_scaler=8.0)
    x2 = as_pair((rng.randn(4, 256, n2) + 1j * rng.randn(4, 256, n2))
                 .astype(np.complex64))
    f2 = pc.jit()

    from rsp_chains_tpu.ops.cfar import cfar_op
    from rsp_chains_tpu.ops.fft import fft_op
    from rsp_chains_tpu.ops.logmag import logmag
    from rsp_chains_tpu.ops.matched_filter import matched_filter

    def xla_pc(x, r):
        y = matched_filter(x, taps_np, cfg2.matched_filter)
        s = fft_op(y, r.log2_fft_size, cfg2.fft)
        return cfar_op(logmag(s, r.mag_mode, cfg2.mag), r, cfg2.cfar)

    validate(lambda x, r: (xla_pc(x, r), f2(x, r)), x2, rt2,
             "config2_validation")
    record("config2_pc_fused_4096", f2, x2, rt2, 4 * 256 * n2,
           workload="[4x256x4096] collapsed chain as ONE kernel")

    # fold interleave at 4096 (n1=32: 5 swap steps replace the 11-step
    # rotation network)
    from rsp_chains_tpu.kernels.rd_pallas import _h_block

    hb2 = _h_block(taps_np, n2, cfg2.matched_filter.normalize)
    f2_fold = jax.jit(lambda a, r: fused_chain_ca(
        a, r, cfg2.fft, cfg2.cfar, perm_impl="fold", h_block=hb2))
    validate(lambda x, r: (f2(x, r), f2_fold(x, r)), x2, rt2,
             "config2_fold_validation")
    record("config2_pc_fused_4096_fold", f2_fold, x2, rt2, 4 * 256 * n2)

    # ---- config 3: fused range-Doppler ----
    cfg3 = ChainConfig(
        fft=FftConfig(max_size=n),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n),
        doppler=DopplerConfig(num_pulses=256), cfar=ca,
    )
    rd = rsp.range_doppler_chain(cfg3, taps=taps).jit()
    x3 = iq(16, 256, n)

    from rsp_chains_tpu.ops.doppler import doppler_fft

    def xla_rd(x, r):
        y = matched_filter(x, taps_np, cfg3.matched_filter)
        d = doppler_fft(y, cfg3.doppler)
        return cfar_op(logmag(d, r.mag_mode, cfg3.mag), r, cfg3.cfar)

    validate(lambda x, r: (xla_rd(x, r), rd(x, r)), x3, rt,
             "config3_validation")
    dt = record("config3_rd_fused_256p", rd, x3, rt, 16 * 256 * n)
    if dt:
        results["config3_rd_fused_256p"]["rd_maps_per_s"] = round(16 / dt, 1)

    # ---- CFAR tail kernels at bench scale [4096 x 1024]: v3 defaults ----
    spec = C(jnp.asarray(rng.randn(4096, n) * 100, jnp.float32),
             jnp.asarray(rng.randn(4096, n) * 100, jnp.float32))
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1, index_lagg=16,
                                index_lead=16)
    rt_cash = dataclasses.replace(rt_gos, cfar_mode=jnp.asarray(3, jnp.int32))
    rt_ca = dataclasses.replace(rt_gos, cfar_algorithm=jnp.asarray(0, jnp.int32))
    f_ca = jax.jit(lambda a, r: fused_mag_cfar(a, r, ca))
    f_gos = jax.jit(lambda a, r: fused_mag_gos_cfar(a, r, gos_cfg))  # v3
    f_disp = jax.jit(lambda a, r: fused_mag_gos_dispatch(a, r, gos_cfg))
    tails = {}
    for name, f, r in (("ca_ms", f_ca, rt), ("gos_v3_ms", f_gos, rt_gos),
                       ("cash_v3_ms", f_gos, rt_cash),
                       ("ca_via_dispatch_ms", f_disp, rt_ca)):
        try:
            dtv = timed(f, spec, r, d_thr)
            tails[name] = round(dtv * 1e3, 3)
            log(f"tail {name}: {dtv*1e3:.3f} ms")
        except Exception as e:  # noqa: BLE001
            tails[name] = f"error: {str(e)[:160]}"
            log(f"tail {name} FAILED: {str(e)[:160]}")
    results["cfar_tail_kernels_4096x1024"] = tails

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=1))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
