"""Scaling benchmark harness — BASELINE config ladder.

Modes:
  python benchmarks/scaling.py chip     # single-chip perf suite (real TPU)
  python benchmarks/scaling.py mesh     # sharded-path scaling on an N-device
                                        # virtual CPU mesh (correctness-grade
                                        # scaling harness; real ICI numbers need
                                        # a multi-chip slice)

Emits one JSON object per benchmark line to stdout.

BASELINE config ladder coverage:
  1. 1-ch 1024-pt FFT+logmag+CA-CFAR          -> "chain_1ch"
  2. pulse compression chain, 1 chip          -> "pulse_compression"
  3. 2-D range-Doppler 256-pulse CPI          -> "range_doppler"
  4. 16-ch channel-parallel + halo FIR        -> "mesh" mode (sharded paths)
  5. multi-CPI streaming, pod mesh            -> "mesh" mode (cpi axis)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=20, warmup=3):
    """Blocked wall-clock timing — reliable on CPU. For the real chip use
    ``bench.measure_per_call`` (the relay's block_until_ready returns early)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def _emit(name, samples, dt, **extra):
    rec = {"bench": name, "msamples_per_s": round(samples / dt / 1e6, 1),
           "ms_per_call": round(dt * 1e3, 4)}
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def chip_suite():
    import jax
    import jax.numpy as jnp

    from bench import measure_per_call

    from rsp_chains_tpu.cplx import as_pair
    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, DopplerConfig, FftConfig,
        MatchedFilterConfig, RuntimeConfig, fft_mag_cfar_chain,
        pulse_compression_chain, range_doppler_chain,
    )
    from rsp_chains_tpu.golden import lfm_chirp

    rng = np.random.RandomState(0)
    rt = RuntimeConfig.make(fft_size=1024, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5, div_sum=5)

    # config 1 ladder rung at production batch: FFT+mag+CFAR
    for use_pallas in (False, True):
        cfg = ChainConfig(
            fft=FftConfig(max_size=1024),
            cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                            include_cash=False, use_pallas=use_pallas))
        f = fft_mag_cfar_chain(cfg).jit()
        x = as_pair((rng.randn(16, 256, 1024)
                     + 1j * rng.randn(16, 256, 1024)).astype(np.complex64))
        try:
            dt = measure_per_call(f, x, rt)
            _emit(f"chain_fft_mag_cfar[{'pallas' if use_pallas else 'xla'}]",
                  x.size, dt)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"bench": f"chain[{use_pallas}]",
                              "error": type(e).__name__}), flush=True)

    # config 2: pulse compression (4096-pt frames)
    chirp = lfm_chirp(128, 0.0, 0.25)
    cfg2 = ChainConfig(
        fft=FftConfig(max_size=4096),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=4096),
        cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False))
    ch2 = pulse_compression_chain(cfg2, taps=chirp).jit()
    rt2 = RuntimeConfig.make(fft_size=4096, ref_window_size=32,
                             guard_window_size=4, threshold_scaler=5.0, div_sum=5)
    x2 = as_pair((rng.randn(4, 256, 4096)
                  + 1j * rng.randn(4, 256, 4096)).astype(np.complex64))
    dt = measure_per_call(ch2, x2, rt2)
    _emit("pulse_compression_4096", x2.size, dt)

    # config 3: 2-D range-Doppler, 256-pulse CPI
    cfg3 = ChainConfig(
        fft=FftConfig(max_size=1024),
        matched_filter=MatchedFilterConfig(num_taps=128),
        doppler=DopplerConfig(num_pulses=256),
        cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False))
    ch3 = range_doppler_chain(cfg3, taps=chirp).jit()
    x3 = as_pair((rng.randn(16, 256, 1024)
                  + 1j * rng.randn(16, 256, 1024)).astype(np.complex64))
    dt = measure_per_call(ch3, x3, rt)
    maps_per_s = 16 / dt
    _emit("range_doppler_256p", x3.size, dt, rd_maps_per_s=round(maps_per_s, 1))


def mesh_suite(n_devices: int = 8):
    import os

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
        fft_mag_cfar_chain,
    )
    from rsp_chains_tpu.parallel import make_mesh, make_sharded_pipeline
    from rsp_chains_tpu.parallel.sharded import channel_sharded

    rng = np.random.RandomState(0)
    rt = RuntimeConfig.make(fft_size=1024, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5, div_sum=5)
    cfg = ChainConfig(
        fft=FftConfig(max_size=1024),
        # XLA path: the Pallas kernel only runs interpreted (slowly) on CPU
        cfar=CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, use_pallas=False))
    x = jnp.asarray(rng.randn(16, 64, 1024) + 1j * rng.randn(16, 64, 1024),
                    jnp.complex64)

    # unsharded baseline (1 device)
    f1 = fft_mag_cfar_chain(cfg).jit()
    dt1 = _timeit(lambda a: f1(a, rt).threshold, x, iters=5)
    _emit("mesh_unsharded_1dev", x.size, dt1)

    # channel sharding across all devices
    for nch in (2, 4, n_devices):
        mesh = make_mesh(channels=nch, range_shards=1)
        fc = channel_sharded(fft_mag_cfar_chain(cfg).__call__, mesh, batch_ndim=2)
        xs = jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("ch", None, None)))
        dt = _timeit(lambda a: fc(a, rt).threshold, xs, iters=5)
        _emit(f"mesh_channel_sharded_{nch}dev", x.size, dt,
              speedup_vs_1dev=round(dt1 / dt, 2),
              efficiency=round(dt1 / dt / nch, 2))

    # channels x range with halo exchange
    mesh = make_mesh(channels=n_devices // 2, range_shards=2)
    fp = make_sharded_pipeline(cfg, mesh)
    xs = jax.device_put(x, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("ch", None, None)))
    dt = _timeit(lambda a: fp(a, rt).threshold, xs, iters=5)
    _emit(f"mesh_ch{n_devices//2}_rng2_halo", x.size, dt,
          speedup_vs_1dev=round(dt1 / dt, 2))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    if mode == "chip":
        chip_suite()
    elif mode == "mesh":
        mesh_suite(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
