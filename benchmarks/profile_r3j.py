"""r3 flagship-tuning probe: RD kernel row_group / col_tile variants plus the
wire-format kernel at both block sizes — interleaved reps (drift control).
Run ALONE."""

from __future__ import annotations

import dataclasses
import json
import sys
import time

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
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca_packed
    from rsp_chains_tpu.kernels.rd_pallas import fused_rd_chain
    from rsp_chains_tpu.utils.device import acquire_device

    dev = acquire_device(600)
    print(f"device: {dev}", file=sys.stderr, flush=True)

    n, p = 1024, 256
    taps = np.asarray(lfm_chirp(128, 0.0, 0.25))
    cfg = ChainConfig(
        fft=FftConfig(max_size=n),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n),
        doppler=DopplerConfig(num_pulses=p),
        cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n),
    )
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(16, p, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(16, p, n) * 100, jnp.float32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=8.0)

    def rd(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_rd_chain(
            a, r, taps, cfg, **_kw))

    fft_cfg = FftConfig(max_size=n)
    ca = cfg.cfar
    words = jnp.asarray(((rng.randint(-20000, 20000, (64, 256, n))
                          .astype(np.int64) & 0xFFFF) << 16
                         | (rng.randint(-20000, 20000, (64, 256, n))
                            .astype(np.int64) & 0xFFFF)).astype(np.uint32))

    def wire(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_chain_ca_packed(
            a, r, fft_cfg, ca, **_kw))

    def measure_words(f, ww, rr, k_lo=6, k_hi=30):
        mix = jax.jit(lambda out, base: dataclasses.replace(
            base, threshold_scaler=base.threshold_scaler
            + 1e-30 * out[(0,) * out.ndim].astype(jnp.float32)))
        dig = jax.jit(lambda out: out[(0,) * out.ndim].astype(jnp.float32))

        def run(k):
            rt_i = rr
            out = None
            t0 = time.perf_counter()
            for _ in range(k):
                out = f(ww, rt_i)
                rt_i = mix(out, rr)
            _ = float(dig(out))
            return time.perf_counter() - t0

        run(2)
        lo = min(run(k_lo) for _ in range(3))
        hi = min(run(k_hi) for _ in range(3))
        return max(hi - lo, 1e-9) / (k_hi - k_lo)

    cands = {
        "rd_ship_rg128_ct256": (rd(), "rd"),
        "rd_rg256_ct256": (rd(row_group=256), "rd"),
        "rd_rg128_ct512": (rd(col_tile=512), "rd"),
        "rd_rg128_ct1024": (rd(col_tile=1024), "rd"),
        "rd_rg64_ct256": (rd(row_group=64), "rd"),
        "wire_bf128": (wire(), "wire"),
        "wire_bf256": (wire(block_frames=256), "wire"),
    }
    for name, (f, kind) in cands.items():
        try:
            out = f(x, rt) if kind == "rd" else f(words, rt)
            jax.block_until_ready(out)
            print(f"warm {name}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"warm {name} FAILED: {e}"[:200], file=sys.stderr, flush=True)
            cands[name] = (None, kind)

    results = {k: [] for k in cands}
    for rep in range(4):
        for name, (f, kind) in cands.items():
            if f is None:
                continue
            try:
                ms = (measure_per_call(f, x, rt) if kind == "rd"
                      else measure_words(f, words, rt)) * 1e3
            except Exception:  # noqa: BLE001
                ms = float("nan")
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
