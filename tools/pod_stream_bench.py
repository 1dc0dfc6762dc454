#!/usr/bin/env python
"""Pod-level streaming throughput on the 8-device virtual CPU mesh
(VERDICT r4 item 8; BASELINE configs 4-5).

Correctness of the pod path is proven elsewhere (tests/test_multihost.py runs
2 real jax.distributed processes); this records its *throughput shape* —
CPIs/s through ``PodStreamingPipeline`` over a (cpi=2, ch=2, rng=2) mesh — as
a tracked, CPU-only, order-of-magnitude line so scaling efficiency has a
baseline before real multi-chip hardware exists. Numbers are CPU-mesh
numbers: the line's value is the trend across rounds, not the absolute rate.

Prints ONE JSON line to stdout. Invoked by bench.py as a subprocess (the TPU
bench process cannot host a CPU mesh itself: the axon plugin owns the
platform in-process).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        + os.environ.get("XLA_FLAGS", ""))
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize prepends axon
    import numpy as np

    from rsp_chains_tpu import (
        CfarConfig, ChainConfig, FftConfig, RuntimeConfig, fft_mag_cfar_chain,
    )
    from rsp_chains_tpu.golden import three_tone_signal
    from rsp_chains_tpu.parallel.multihost import (
        PodStreamingPipeline, make_pod_mesh,
    )

    mesh = make_pod_mesh(time_blocks=2, channels=2, range_shards=2)
    cfg = ChainConfig(
        fft=FftConfig(max_size=1024),
        cfar=CfarConfig(max_ref_window=64, max_guard_window=8),
    )
    chain = fft_mag_cfar_chain(cfg)
    rt = RuntimeConfig.make(fft_size=1024, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    rt = jax.tree_util.tree_map(np.asarray, rt)

    t_blocks, ch, p, n = 2, 2, 64, 1024
    rng = np.random.RandomState(7)
    base = np.stack([
        np.stack([
            np.stack([three_tone_signal(n, shift_range_factor=12,
                                        seed=10 * t + s)
                      for _ in range(p)])
            for s in range(ch)])
        for t in range(t_blocks)]).astype(np.complex64)

    done = []
    pipe = PodStreamingPipeline(
        chain.__call__, rt, mesh,
        on_result=lambda s, o, m: done.append(m), detections_every=0)
    n_warm, n_meas = 2, 10
    verdict = {"metric": "pod_streaming_cpu8_2x2x2",
               "mesh": "cpi=2,ch=2,rng=2 (virtual CPU)"}
    with pipe:
        for k in range(n_warm):
            pipe.submit(k, base)
        t0 = time.time()
        while pipe.stats.frames_out < n_warm and time.time() - t0 < 300:
            time.sleep(0.02)
        ph0 = pipe.stats.phase_totals()   # exclude warm-up + jit compile
        t0 = time.perf_counter()
        for k in range(n_meas):
            # perturb so no caching of values is conceivable
            pipe.submit(n_warm + k, base * (1.0 + 1e-6 * k))
        while (pipe.stats.frames_out < n_warm + n_meas
               and time.perf_counter() - t0 < 420):
            time.sleep(0.02)
        dt = time.perf_counter() - t0
        ph1 = pipe.stats.phase_totals()
    batches = pipe.stats.frames_out - n_warm
    maps = batches * t_blocks * ch
    samples = batches * t_blocks * ch * p * n
    verdict.update(
        cpi_batches=batches,
        failed=int(pipe.stats.frames_failed),
        batches_per_s=round(batches / dt, 2),
        cpi_maps_per_s=round(maps / dt, 1),
        msamples_per_s=round(samples / dt / 1e6, 1),
        phase_ms={k: round((ph1[k] - ph0[k]) / max(batches, 1) * 1e3, 2)
                  for k in ph1},
        validated=batches == n_meas and pipe.stats.frames_failed == 0,
    )
    print(json.dumps(verdict))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
