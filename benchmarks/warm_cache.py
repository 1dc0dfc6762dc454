"""Pre-warm the persistent compilation cache with every shipped kernel.

Cold Mosaic compiles of the big fused kernels take up to ~29 minutes through
the remote compile helper; the cache (/root/.cache/jax_comp_cache) works
across processes. Run this once after kernel-code changes (single TPU
process!) so later bench/serving runs start hot. Each compile is exercised
with ONE tiny-batch call and a scalar digest fetch (device->host array
fetches are unreliable on this runtime).
"""

from __future__ import annotations

import sys
import time

import numpy as np


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

    from rsp_chains_tpu.utils.device import acquire_device

    try:
        print(f"device: {acquire_device(600)}", file=sys.stderr)
    except TimeoutError as e:
        print(f"{e}; nothing warmed", file=sys.stderr)
        raise SystemExit(3)
    rng = np.random.RandomState(0)
    t_all = time.perf_counter()

    def iq(*shape):
        return C(jnp.asarray(rng.randn(*shape) * 100, jnp.float32),
                 jnp.asarray(rng.randn(*shape) * 100, jnp.float32))

    def warm(name, fn, *args):
        t0 = time.perf_counter()
        try:
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))
            print(f"{name}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {str(e)[:200]}", file=sys.stderr)

    n = 1024
    ca = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                    include_cash=False, max_fft_size=n)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    taps = lfm_chirp(128, 0.0, 0.25)

    # 1. headline fused chain (1024) — both the direct kernel and the preset op
    chain = rsp.fft_mag_cfar_chain(ChainConfig(fft=FftConfig(max_size=n),
                                               cfar=ca)).jit()
    warm("fused_chain_1024 (preset op)", chain, iq(128, n), rt)

    # 2. wire-format chain
    words = jnp.asarray(rng.randint(0, 1 << 32, (128, n), dtype=np.int64)
                        .astype(np.uint32))
    wire = rsp.rx_fft_mag_cfar_tx_chain(ChainConfig(fft=FftConfig(max_size=n),
                                                    cfar=ca)).jit()
    warm("wire_chain_1024", wire, words, rt)

    # 3. mag+CFAR tails: CA kernel + GOS v3 kernel (GOSCA elaboration)
    from rsp_chains_tpu.kernels.cfar_pallas import (
        fused_mag_cfar, fused_mag_gos_cfar,
    )

    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1, index_lagg=16,
                                index_lead=16)
    warm("mag_cfar_tail", jax.jit(lambda a, r: fused_mag_cfar(a, r, ca)),
         iq(32, n), rt)
    warm("gos_v3_tail", jax.jit(lambda a, r: fused_mag_gos_cfar(a, r, gos_cfg)),
         iq(32, n), rt_gos)

    # 4. fused RD chain (config 3) + map form
    cfg3 = ChainConfig(
        fft=FftConfig(max_size=n),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n),
        doppler=DopplerConfig(num_pulses=256), cfar=ca,
    )
    rd = rsp.range_doppler_chain(cfg3, taps=taps).jit()
    warm("rd_fused_256p", rd, iq(2, 256, n), rt)
    from rsp_chains_tpu.kernels.rd_pallas import fused_rd_chain

    warm("rd_map_256p",
         jax.jit(lambda a, r: fused_rd_chain(a, r, np.asarray(taps), cfg3,
                                             emit="map")),
         iq(2, 256, n), rt)

    # 5. collapsed pulse compression at 4096 (single kernel with h_block)
    n2 = 4096
    cfg2 = ChainConfig(
        fft=FftConfig(max_size=n2),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=n2),
        cfar=CfarConfig(max_ref_window=64, max_fft_size=n2,
                        variant=CfarVariant.CA, include_cash=False),
    )
    pc = rsp.pulse_compression_chain(cfg2, taps=taps).jit()
    rt2 = RuntimeConfig.make(fft_size=n2, ref_window_size=32,
                             guard_window_size=4, threshold_scaler=8.0)
    warm("pc_fused_4096", pc, iq(4, n2), rt2)

    # 6. fold-interleave formulation (r3 candidate: sigma-reordered pass-3
    # columns + log2(n1) bit-swap steps instead of the permutation matmul /
    # rotation network) — at both ladder sizes
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca
    from rsp_chains_tpu.kernels.rd_pallas import _h_block

    warm("fused_chain_1024_fold",
         jax.jit(lambda a, r: fused_chain_ca(a, r, FftConfig(max_size=n), ca,
                                             perm_impl="fold")),
         iq(128, n), rt)
    hb2 = _h_block(np.asarray(taps), n2, cfg2.matched_filter.normalize)
    warm("pc_fused_4096_fold",
         jax.jit(lambda a, r: fused_chain_ca(a, r, cfg2.fft, cfg2.cfar,
                                             perm_impl="fold", h_block=hb2)),
         iq(4, n2), rt2)

    # 7. r3 kernels: the GOS whole chain (dispatch preset + direct kernel at
    # the bench-ladder shapes), and the fused RD + 2-D CFAR
    gos_chain = rsp.fft_mag_cfar_chain(ChainConfig(fft=FftConfig(max_size=n),
                                                   cfar=gos_cfg)).jit()
    warm("gos_chain_preset_8ch", gos_chain, iq(8, 256, n), rt_gos)
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_gos

    warm("gos_chain_kernel_64ch",
         jax.jit(lambda a, r: fused_chain_gos(a, r, FftConfig(max_size=n),
                                              gos_cfg)),
         iq(64, 256, n), rt_gos)
    warm("headline_64ch (exact bench shape)", chain, iq(64, 256, n), rt)

    from rsp_chains_tpu.ops.cfar_2d import Cfar2dConfig, Cfar2dRuntime
    from rsp_chains_tpu.kernels.rd_pallas import fused_rd_2d_chain

    cfg2d = Cfar2dConfig(max_ref_range=16, max_guard_range=4,
                         max_ref_doppler=8, max_guard_doppler=2)
    rt2d = Cfar2dRuntime.make(ref_range=8, guard_range=2, ref_doppler=4,
                              guard_doppler=1, threshold_scaler=6.0,
                              active_range=n)
    warm("rd_2d_fused_256p",
         jax.jit(lambda a, r, r2: fused_rd_2d_chain(a, r, r2,
                                                    np.asarray(taps), cfg3,
                                                    cfg2d)),
         iq(2, 256, n), rt, rt2d)

    # 8. r4 kernels at the EXACT bench shapes (grid size is compiled in):
    # lean-tail headline + classic fallback, wire chain at the 64-ch ladder
    # shape and the 16-ch streaming shape, the bit-true integer chain, the
    # fused 2-D detector at 16 ch, and the GOS chain at 8 ch (validation leg)
    warm("headline_64ch_classic_tail",
         jax.jit(lambda a, r: fused_chain_ca(a, r, FftConfig(max_size=n), ca,
                                             tail_impl="classic")),
         iq(64, 256, n), rt)
    w64 = jnp.asarray(rng.randint(0, 1 << 32, (64, 256, n), dtype=np.int64)
                      .astype(np.uint32))
    warm("wire_chain_64ch", wire, w64, rt)
    warm("wire_chain_16ch_streaming", wire, w64[:16], rt)
    from rsp_chains_tpu.configs import FixedPointConfig

    int_cfg = ChainConfig(
        fft=FftConfig(max_size=n), cfar=ca,
        fixed_point=FixedPointConfig(enabled=True, width=16, bin_point=0,
                                     bit_true=True))
    f_int = rsp.fft_mag_cfar_chain(int_cfg).jit()
    xi = C(jnp.asarray(rng.randint(-30000, 30000, (64, 256, n)), jnp.int32),
           jnp.asarray(rng.randint(-30000, 30000, (64, 256, n)), jnp.int32))
    warm("bit_true_chain_64ch", f_int, xi, rt)
    warm("rd_2d_fused_16ch",
         jax.jit(lambda a, r, r2: fused_rd_2d_chain(a, r, r2,
                                                    np.asarray(taps), cfg3,
                                                    cfg2d)),
         iq(16, 256, n), rt, rt2d)
    warm("rd_map_16ch",
         jax.jit(lambda a, r: fused_rd_chain(a, r, np.asarray(taps), cfg3,
                                             emit="map")),
         iq(16, 256, n), rt)
    warm("rd_fused_16ch", rd, iq(16, 256, n), rt)
    warm("gos_chain_kernel_8ch",
         jax.jit(lambda a, r: fused_chain_gos(a, r, FftConfig(max_size=n),
                                              gos_cfg)),
         iq(8, 256, n), rt_gos)
    warm("pc_fused_4096_bench", pc, iq(4, 256, n2), rt2)

    print(f"total: {time.perf_counter()-t_all:.1f}s", file=sys.stderr)
    import os

    os._exit(0)


if __name__ == "__main__":
    main()
