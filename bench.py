"""Headline benchmark: Msamples/s/chip through the FFT + logmag + CA-CFAR chain.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline proxy: the reference publishes no numbers (README "Work in progress");
its architectural throughput is 1 complex sample/cycle/chain (SDF pipeline with
1-beat/cycle handshake, SURVEY §6). At a representative 250 MHz FPGA clock that is
250 Msamples/s/chain, which we use as ``vs_baseline`` denominator.

Timing methodology (this runtime is a remote relay where ``block_until_ready``
returns before execution completes, so naive wall-clock timing measures dispatch
latency, not compute): K chain invocations are serialized inside ONE jitted
``fori_loop`` by threading a scalar derived from each call's output into the
next call's runtime config (a true data dependency, negligible extra work). The
per-call time is the slope between two loop lengths, which cancels both the
dispatch latency and the loop overhead. The final scalar is fetched, which
forces end-to-end completion.

Run on the real TPU chip (default platform). Extra diagnostics go to stderr.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

BASELINE_MSPS = 250.0  # SDF chain @ 250 MHz, 1 sample/cycle (proxy)


def measure_per_call(f, x, rt, k_lo=6, k_hi=30):
    """True per-call time of jitted ``f(x, rt)``.

    Calls are serialized by threading a scalar from each call's output into the
    next call's runtime config (so the device cannot overlap or elide them),
    and completion is forced by fetching one scalar at the end. Per-call time =
    slope between two sequence lengths, cancelling dispatch latency and the
    final-fetch cost. Only tiny helper jits are compiled (wrapping the whole
    sequence in one fori_loop would need a heavyweight remote compile)."""
    import jax
    import jax.numpy as jnp

    mix = jax.jit(lambda out, base: dataclasses.replace(
        base, threshold_scaler=base.threshold_scaler
        + 1e-30 * out.threshold[(0,) * out.threshold.ndim]))
    digest = jax.jit(lambda out: out.threshold[(0,) * out.threshold.ndim])

    def run(k):
        rt_i = rt
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(x, rt_i)
            rt_i = mix(out, rt)
        _ = float(digest(out))  # scalar fetch forces end-to-end completion
        return time.perf_counter() - t0

    run(2)  # warm every helper
    t_lo = min(run(k_lo) for _ in range(3))
    t_hi = min(run(k_hi) for _ in range(3))
    return max(t_hi - t_lo, 1e-9) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

    from rsp_chains_tpu import (
        CfarConfig,
        CfarVariant,
        ChainConfig,
        FftConfig,
        RuntimeConfig,
        fft_mag_cfar_chain,
    )

    # persistent compilation cache: the fused-chain Mosaic compile through the
    # remote helper takes tens of minutes cold; cache it across processes
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass
    # Bounded device acquisition: if the relay tunnel is down, jax.devices()
    # blocks forever in connect retries — fail loudly after 10 min instead of
    # hanging the caller (no JSON line is emitted; a fabricated number would
    # be worse than an absent one).
    from rsp_chains_tpu.utils.device import acquire_device

    try:
        dev = acquire_device(600)
    except TimeoutError as e:
        print(f"{e}; no measurement taken", file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)
    print(f"device: {dev}", file=sys.stderr)

    # 64 channels: a representative serving batch, and large enough that
    # per-call compute dominates the relay's ~0.7 ms dispatch floor (r2h:
    # at 16 channels the floor is ~half the measurement)
    channels, pulses, n = 64, 256, 1024

    def build(use_pallas: bool):
        cfg = ChainConfig(
            fft=FftConfig(max_size=n),
            cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                            include_cash=False, max_fft_size=n,
                            use_pallas=use_pallas),
        )
        return fft_mag_cfar_chain(cfg).jit()

    from rsp_chains_tpu.cplx import C

    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(channels, pulses, n), jnp.float32),
          jnp.asarray(rng.randn(channels, pulses, n), jnp.float32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32, guard_window_size=4,
                            threshold_scaler=3.5, div_sum=5)
    samples = channels * pulses * n

    f_xla = build(use_pallas=False)
    dt = measure_per_call(f_xla, x, rt)
    path = "xla"
    print(f"xla per-call: {dt*1e3:.4f} ms", file=sys.stderr)

    # The fused whole-chain kernel formulations: each candidate is validated
    # by an on-device scalar digest against the XLA path (device->host array
    # fetches are unreliable on this runtime, so only scalars cross) and only
    # a VALIDATED faster time replaces the current pick. Each candidate runs
    # under its own watchdog — a hang or compile stall must not stall the
    # driver, and a late candidate failing must not lose an earlier win.
    # Accuracy bar: the bf16x2 split matmuls give f32-grade FFT accuracy
    # (~2e-6 of the threshold scale; Mosaic's plain "f32" dots are single-pass
    # bf16 — r2i); accept relative dthr < 1e-4 with a <=1e-5 flip fraction
    # (a logic bug shows as O(1) divergence, a precision regression as >1e-4).
    import threading

    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca

    def try_candidate(name, f_pal, budget_s):
        verdict = {}

        def _validate():
            try:
                def digests(a, r):
                    o1 = f_xla(a, r)
                    o2 = f_pal(a, r)
                    scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
                    return (jnp.max(jnp.abs(o1.threshold - o2.threshold))
                            / scale,
                            jnp.sum(o1.peaks.astype(jnp.int32)
                                    - o2.peaks.astype(jnp.int32) != 0))

                dthr, dpk = jax.jit(digests)(x, rt)
                verdict["dthr"] = float(dthr)  # rel to the threshold scale
                verdict["dpk"] = int(dpk)
                verdict["dt"] = measure_per_call(f_pal, x, rt)
            except Exception as e:  # noqa: BLE001
                verdict["err"] = f"{type(e).__name__}: {e}"[:300]

        t = threading.Thread(target=_validate, daemon=True)
        t.start()
        t.join(timeout=budget_s)
        if t.is_alive() or "err" in verdict:
            print(f"{name} unavailable ({verdict.get('err', 'timeout')})",
                  file=sys.stderr)
            return None
        if verdict["dthr"] < 1e-4 and verdict["dpk"] <= 1e-5 * samples:
            print(f"{name} validated (dthr={verdict['dthr']:.2e}, "
                  f"benign peak flips {verdict['dpk']}); "
                  f"per-call {verdict['dt']*1e3:.4f} ms", file=sys.stderr)
            return verdict["dt"]
        print(f"{name} digest mismatch dthr={verdict['dthr']} "
              f"dpk={verdict['dpk']}", file=sys.stderr)
        return None

    # shipped formulation first — fold interleave since r3 (first Mosaic
    # compile through the remote helper can take tens of minutes cold —
    # persistent-cached afterwards; benchmarks/warm_cache.py pre-warms)
    dt_pal = try_candidate("pallas-fused-chain", build(use_pallas=True), 3300)
    if dt_pal is not None and dt_pal < dt:
        dt, path = dt_pal, "pallas-fused-chain"
    # mxu-permutation alternate (the r2 shipped formulation; 1.271 vs fold's
    # 0.961 ms in the r3 ladder) — a fallback in case the fold path regresses;
    # a shorter budget: losing it keeps the result above
    cfar_cfg1 = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                           include_cash=False, max_fft_size=n,
                           use_pallas=True)
    # pinned to 128-frame tiles: the [N, N] permutation operand plus the
    # (r3-default) 256-frame tiles overflow scoped VMEM and crash the compiler
    f_mxu = jax.jit(lambda a, r: fused_chain_ca(
        a, r, FftConfig(max_size=n), cfar_cfg1, perm_impl="mxu",
        block_frames=128))
    dt_mxu = try_candidate("pallas-fused-chain-mxu", f_mxu, 2400)
    if dt_mxu is not None and dt_mxu < dt:
        dt, path = dt_mxu, "pallas-fused-chain-mxu"

    msps = samples / dt / 1e6
    print(f"fft+mag+cfar [{path}]: {dt*1e3:.4f} ms / {samples} samples",
          file=sys.stderr)

    # ---- validated ladder: the other BASELINE configs, one stderr JSON line
    # each (digest-validated + watchdogged like the headline; a regression in
    # any shipped kernel shows in the driver's round-end BENCH tail). The
    # stdout contract stays ONE line: the headline JSON, printed last. ----
    def ladder_line(name, f_new, f_ref, xx, rr, n_samples, budget_s,
                    extra=None):
        verdict = {"metric": name}

        def _work():
            try:
                def digests(a, r):
                    o1 = f_ref(a, r)
                    o2 = f_new(a, r)
                    scale = jnp.maximum(jnp.max(jnp.abs(o1.threshold)), 1e-30)
                    return (jnp.max(jnp.abs(o1.threshold - o2.threshold))
                            / scale,
                            jnp.sum(o1.peaks.astype(jnp.int32)
                                    - o2.peaks.astype(jnp.int32) != 0))

                dthr, dpk = jax.jit(digests)(xx, rr)
                verdict["dthr"] = float(f"{float(dthr):.3e}")
                verdict["peak_flips"] = int(dpk)
                dtl = measure_per_call(f_new, xx, rr)
                verdict["ms_per_call"] = round(dtl * 1e3, 4)
                verdict["msamples_per_s"] = round(n_samples / dtl / 1e6, 1)
                if extra:
                    verdict.update(extra(dtl))
                verdict["validated"] = (verdict["dthr"] < 1e-4
                                        and verdict["peak_flips"]
                                        <= 1e-5 * n_samples)
            except Exception as e:  # noqa: BLE001
                verdict["err"] = f"{type(e).__name__}: {e}"[:300]

        th = threading.Thread(target=_work, daemon=True)
        th.start()
        th.join(timeout=budget_s)
        if th.is_alive():
            verdict["err"] = "timeout"
        print(json.dumps(verdict), file=sys.stderr)
        sys.stderr.flush()
        # a timed-out worker is a zombie still issuing device work — any
        # later ladder measurement would be contended and silently polluted
        return not th.is_alive()

    try:
        from rsp_chains_tpu import (
            DopplerConfig, MatchedFilterConfig, pulse_compression_chain,
            range_doppler_chain,
        )
        from rsp_chains_tpu.golden import lfm_chirp
        from rsp_chains_tpu.ops.cfar import cfar_op
        from rsp_chains_tpu.ops.doppler import doppler_fft
        from rsp_chains_tpu.ops.fft import fft_op
        from rsp_chains_tpu.ops.logmag import logmag
        from rsp_chains_tpu.ops.matched_filter import matched_filter

        taps = lfm_chirp(128, 0.0, 0.25)
        taps_np = np.asarray(taps)

        # config 3 (flagship): fused range-Doppler chain, 16 x 256 x 1024
        cfg3 = ChainConfig(
            fft=FftConfig(max_size=n),
            matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n),
            doppler=DopplerConfig(num_pulses=256), cfar=cfar_cfg1,
        )
        rd = range_doppler_chain(cfg3, taps=taps).jit()

        def xla_rd(a, r):
            y = matched_filter(a, taps_np, cfg3.matched_filter)
            d3 = doppler_fft(y, cfg3.doppler)
            return cfar_op(logmag(d3, r.mag_mode, cfg3.mag), r, cfg3.cfar)

        x3 = C(x.re[:16], x.im[:16])
        ok = ladder_line("rd_chain_fused_16x256x1024", rd, jax.jit(xla_rd),
                         x3, rt, 16 * 256 * n, 2400,
                         extra=lambda dtl: {"rd_maps_per_s":
                                            round(16 / dtl, 1)})

        # config 2: collapsed pulse compression, 4 x 256 x 4096
        n2 = 4096
        cfg2 = ChainConfig(
            fft=FftConfig(max_size=n2),
            matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n2),
            cfar=CfarConfig(max_ref_window=64, max_fft_size=n2,
                            variant=CfarVariant.CA, include_cash=False),
        )
        pc = pulse_compression_chain(cfg2, taps=taps).jit()
        rt2 = RuntimeConfig.make(fft_size=n2, ref_window_size=32,
                                 guard_window_size=4, threshold_scaler=8.0)

        def xla_pc(a, r):
            y = matched_filter(a, taps_np, cfg2.matched_filter)
            s = fft_op(y, r.log2_fft_size, cfg2.fft)
            return cfar_op(logmag(s, r.mag_mode, cfg2.mag), r, cfg2.cfar)

        rng2 = np.random.RandomState(1)
        x2 = C(jnp.asarray(rng2.randn(4, 256, n2) * 100, jnp.float32),
               jnp.asarray(rng2.randn(4, 256, n2) * 100, jnp.float32))
        if ok:
            ok = ladder_line("pulse_compression_fused_4x256x4096", pc,
                             jax.jit(xla_pc), x2, rt2, 4 * 256 * n2, 2400)

        # GOS whole-chain kernel (r3): fused FFT+mag+sort tail, GOSCA regs
        from rsp_chains_tpu.kernels.chain_pallas import fused_chain_gos

        gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                             include_cash=True, max_fft_size=n)
        f_gos = jax.jit(lambda a, r: fused_chain_gos(
            a, r, FftConfig(max_size=n), gos_cfg))
        rt_gos = dataclasses.replace(
            rt, cfar_algorithm=jnp.asarray(1, jnp.int32),
            index_lagg=jnp.asarray(16, jnp.int32),
            index_lead=jnp.asarray(16, jnp.int32))

        def xla_gos(a, r):
            s = fft_op(a, r.log2_fft_size, FftConfig(max_size=n))
            return cfar_op(logmag(s, r.mag_mode), r, gos_cfg)

        # validate at 8 channels (the XLA GOS window stack is ~4 GB at 64)
        x8 = C(x.re[:8], x.im[:8])
        if ok:
            ladder_line("gos_chain_fused_8x256x1024", f_gos, jax.jit(xla_gos),
                        x8, rt_gos, 8 * 256 * n, 2400)
    except Exception as e:  # noqa: BLE001 — the ladder must never cost the headline
        print(f"ladder error: {type(e).__name__}: {e}"[:300], file=sys.stderr)

    print(json.dumps({
        "metric": "fft_mag_cfar_chain_throughput",
        "value": round(msps, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    # hard-exit: a watchdogged thread may be stuck in a relay fetch, and its
    # teardown would abort the interpreter (exit code 134) after valid output
    os._exit(0)


if __name__ == "__main__":
    main()
