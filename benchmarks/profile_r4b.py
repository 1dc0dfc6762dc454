"""r4 on-chip session B: the 2-D ORDERED-STATISTIC map detector measured on
the chip (VERDICT item 6 — the OS body is XLA-only by construction and had no
on-chip number anywhere).

Two modes:
  --ref OUT.json   run on the 8-device CPU mesh, write reference digests
                   (threshold sum, peak count) for the OS and CA register
                   settings of the SAME include_os elaboration;
  --chip REF.json  run on the real TPU: digest-validate against the reference
                   scalars (scalar fetches only), then time ms/CPI for the
                   runtime OS and CA register settings.

The input is deterministic (seeded), so the CPU digests are the golden —
the TPU run compares within a bf16x2-matmul tolerance band."""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def build():
    import jax.numpy as jnp

    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, DopplerConfig, FftConfig,
        MatchedFilterConfig, RuntimeConfig,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.golden import lfm_chirp
    from rsp_chains_tpu.ops.cfar_2d import Cfar2dConfig, Cfar2dRuntime, rd_2d_cfar_chain

    n, p, chs = 1024, 256, 16
    cfg = ChainConfig(
        fft=FftConfig(max_size=n),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n),
        doppler=DopplerConfig(num_pulses=p),
        cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n),
    )
    cfg2d = Cfar2dConfig(max_ref_range=8, max_guard_range=2,
                         max_ref_doppler=4, max_guard_doppler=1,
                         include_os=True)
    taps = np.asarray(lfm_chirp(128, 0.0, 0.25))
    f = rd_2d_cfar_chain(cfg, taps=taps, cfg2d=cfg2d)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(chs, p, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(chs, p, n) * 100, jnp.float32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=8.0)
    # scaler 2.2: pure-noise maps must still DETECT (a zero peak count would
    # validate nothing on the peak side)
    rt2_os = Cfar2dRuntime.make(ref_range=6, guard_range=2, ref_doppler=3,
                                guard_doppler=1, threshold_scaler=2.2,
                                active_range=n, algorithm=1,
                                os_rank=cfg2d.os_stack // 2,
                                validate_against=cfg2d)
    rt2_ca = Cfar2dRuntime.make(ref_range=6, guard_range=2, ref_doppler=3,
                                guard_doppler=1, threshold_scaler=2.2,
                                active_range=n, algorithm=0,
                                validate_against=cfg2d)
    return f, x, rt, rt2_os, rt2_ca


def digests(f, x, rt, rt2):
    import jax
    import jax.numpy as jnp

    def d(a, r, r2):
        o = f(a, r, r2)
        return (jnp.sum(o.threshold.astype(jnp.float32)),
                jnp.sum(o.peaks.astype(jnp.int32)))

    s, c = jax.jit(d)(x, rt, rt2)
    return float(s), int(c)


def main():
    mode, path = sys.argv[1], sys.argv[2]
    import jax

    if mode == "--ref":
        import os

        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        from rsp_chains_tpu.utils.device import acquire_device

        print(f"device: {acquire_device(600)}", file=sys.stderr, flush=True)

    f, x, rt, rt2_os, rt2_ca = build()
    out = {}
    for name, rt2 in (("os", rt2_os), ("ca", rt2_ca)):
        s, c = digests(f, x, rt, rt2)
        out[name] = {"thr_sum": s, "peaks": c}
        print(f"{name}: thr_sum={s:.6g} peaks={c}", file=sys.stderr,
              flush=True)

    if mode == "--ref":
        with open(path, "w") as fh:
            json.dump(out, fh)
        print(json.dumps({"mode": "ref", **out}), flush=True)
        return

    with open(path) as fh:
        ref = json.load(fh)
    for name in ("os", "ca"):
        rs, rc = ref[name]["thr_sum"], ref[name]["peaks"]
        ds = abs(out[name]["thr_sum"] - rs) / max(abs(rs), 1e-30)
        dc = abs(out[name]["peaks"] - rc)
        out[name]["ref_thr_sum"] = rs
        out[name]["ref_peaks"] = rc
        out[name]["rel_thr_sum_err"] = ds
        out[name]["peak_count_delta"] = dc
        out[name]["validated"] = bool(ds < 1e-3
                                      and dc <= max(4, rc // 1000))

    from bench import measure_per_call

    for name, rt2 in (("os", rt2_os), ("ca", rt2_ca)):
        g = jax.jit(lambda a, r, _r2=rt2: f(a, r, _r2))
        ms = measure_per_call(g, x, rt) * 1e3
        out[name]["ms_per_call"] = round(ms, 4)
        out[name]["rd_maps_per_s"] = round(16 / (ms / 1e3), 1)
        print(f"{name}: {ms:.4f} ms", file=sys.stderr, flush=True)
    print(json.dumps({"mode": "chip", "shape": "16x256x1024", **out}),
          flush=True)
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
