"""Fused range-Doppler kernel (kernels/rd_pallas.py) and the collapsed
pulse-compression chain — equivalence vs the XLA stage composition.

Shapes are kept small (P=16, N=256): interpret-mode Pallas dominates suite
time (see CLAUDE.md suite hot spots)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsp_chains_tpu import (
    CfarConfig,
    CfarVariant,
    ChainConfig,
    DopplerConfig,
    FftConfig,
    MatchedFilterConfig,
    RuntimeConfig,
    pulse_compression_chain,
    range_doppler_chain,
)
from rsp_chains_tpu.cplx import as_pair, join
from rsp_chains_tpu.golden import chirp_with_targets, lfm_chirp
from rsp_chains_tpu.kernels.rd_pallas import fused_rd_chain
from rsp_chains_tpu.ops.cfar import cfar_op
from rsp_chains_tpu.ops.doppler import doppler_fft
from rsp_chains_tpu.ops.logmag import logmag
from rsp_chains_tpu.ops.matched_filter import matched_filter

P, N = 16, 256
TAPS = lfm_chirp(32, 0.0, 0.25)


def _cfg(variant=CfarVariant.CA, include_cash=False, window="hann"):
    return ChainConfig(
        fft=FftConfig(max_size=N),
        matched_filter=MatchedFilterConfig(num_taps=len(TAPS), fft_size=N),
        doppler=DopplerConfig(num_pulses=P, window=window),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                        max_fft_size=N, variant=variant,
                        include_cash=include_cash),
    )


def _rt(**kw):
    kw.setdefault("fft_size", N)
    kw.setdefault("ref_window_size", 8)
    kw.setdefault("guard_window_size", 2)
    kw.setdefault("threshold_scaler", 3.0)
    kw.setdefault("div_sum", 4)
    return RuntimeConfig.make(**kw)


def _xla_rd(cpi, rt, cfg):
    y = matched_filter(cpi, TAPS, cfg.matched_filter)
    d = doppler_fft(y, cfg.doppler)
    m = logmag(d, rt.mag_mode, cfg.mag)
    return cfar_op(m, rt, cfg.cfar)


def _cpi(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(b, P, N) + 1j * rng.randn(b, P, N)).astype(np.complex64)


def test_fused_rd_matches_xla_composition():
    cfg = _cfg()
    cpi = _cpi()
    rt = _rt()
    want = _xla_rd(as_pair(cpi), rt, cfg)
    got = fused_rd_chain(as_pair(cpi), rt, TAPS, cfg, interpret=True)
    thr_w = np.asarray(want.threshold)
    thr_g = np.asarray(got.threshold)
    scale = np.abs(thr_w).max()
    assert np.abs(thr_g - thr_w).max() / scale < 1e-4
    # bf16x2-split matmuls vs f32 XLA: only razor-margin cells may flip
    flips = int(np.sum(np.asarray(got.peaks) != np.asarray(want.peaks)))
    assert flips <= 2, flips


def test_fused_rd_go_so_modes_and_runtime_registers_no_recompile():
    cfg = _cfg()
    cpi = as_pair(_cpi(b=1, seed=1))
    f = jax.jit(lambda x, r: fused_rd_chain(x, r, TAPS, cfg, interpret=True))
    cases = [
        dict(cfar_mode=0, ref_window_size=8, guard_window_size=2, div_sum=3),
        dict(cfar_mode=1, ref_window_size=16, guard_window_size=4, div_sum=4),
        dict(cfar_mode=2, ref_window_size=4, guard_window_size=1, div_sum=2),
        dict(peak_grouping=1),
        dict(log_or_linear=0, mag_mode=3, threshold_scaler=1.5),
        dict(mag_mode=1),
        dict(cfar_fft_size=N // 2),  # runtime CFAR active-range register
    ]
    for kw in cases:
        rt = _rt(**kw)
        want = _xla_rd(cpi, rt, cfg)
        got = f(cpi, rt)
        thr_w = np.asarray(want.threshold)
        scale = max(np.abs(thr_w).max(), 1e-9)
        assert np.abs(np.asarray(got.threshold) - thr_w).max() / scale \
            < 1e-4, kw
        flips = int(np.sum(np.asarray(got.peaks) != np.asarray(want.peaks)))
        assert flips <= 2, (kw, flips)
    assert f._cache_size() == 1


def test_fused_rd_emit_map_matches_mf_doppler():
    cfg = _cfg()
    cpi = as_pair(_cpi(b=1, seed=2))
    want = doppler_fft(matched_filter(cpi, TAPS, cfg.matched_filter),
                       cfg.doppler)
    got = fused_rd_chain(cpi, _rt(), TAPS, cfg, interpret=True, emit="map")
    w = join(want)
    g = join(got)
    assert np.abs(np.asarray(g) - np.asarray(w)).max() / np.abs(w).max() < 1e-4


def test_fused_rd_target_lands_on_expected_cell():
    cfg = _cfg(window=None)
    fd, delay = 0.25, 50
    cpi = chirp_with_targets(P, N, TAPS, [(delay, 1.0, fd)], noise_db=-60)
    rt = _rt(threshold_scaler=8.0)
    out = fused_rd_chain(as_pair(cpi[None]), rt, TAPS, cfg, interpret=True)
    pk = np.asarray(out.peaks)[0]
    # detection at Doppler bin P/2 + fd*P (fftshifted), range bin = delay
    assert pk[P // 2 + int(fd * P), delay]
    # and that cell is the strongest of the RD map (emit='map' front half)
    rd = fused_rd_chain(as_pair(cpi[None]), rt, TAPS, cfg, interpret=True,
                        emit="map")
    mag = np.abs(np.asarray(join(rd)))[0]
    assert np.unravel_index(np.argmax(mag), mag.shape) == \
        (P // 2 + int(fd * P), delay)


def test_rd_preset_routes_to_fused_kernel_and_matches():
    cfg = _cfg()
    chain = range_doppler_chain(cfg, taps=TAPS)
    assert [s.name for s in chain.stages] == ["rd_fused"]
    cpi = _cpi(b=1, seed=3)
    rt = _rt()
    got = chain.jit()(as_pair(cpi), rt)
    want = _xla_rd(as_pair(cpi), rt, cfg)
    scale = np.abs(np.asarray(want.threshold)).max()
    assert np.abs(np.asarray(got.threshold)
                  - np.asarray(want.threshold)).max() / scale < 1e-4


def test_rd_preset_gosca_routes_map_plus_sort_kernel():
    cfg = _cfg(variant=CfarVariant.GOSCA, include_cash=True)
    chain = range_doppler_chain(cfg, taps=TAPS)
    assert [s.name for s in chain.stages] == ["rd_map_fused",
                                              "mag_gos_cfar_fused"]
    cpi = _cpi(b=1, seed=4)
    rt = _rt(cfar_algorithm=1, index_lagg=6, index_lead=6)
    got = chain.jit()(as_pair(cpi), rt)
    want = _xla_rd(as_pair(cpi), rt, cfg)
    scale = np.abs(np.asarray(want.threshold)).max()
    assert np.abs(np.asarray(got.threshold)
                  - np.asarray(want.threshold)).max() / scale < 1e-4


def test_rd_preset_xla_fallback_unfusable_shape():
    """A pulse count the kernel does not elaborate falls back to stages."""
    cfg = dataclasses.replace(_cfg(), doppler=DopplerConfig(num_pulses=12,
                                                            window="hann"))
    chain = range_doppler_chain(cfg, taps=TAPS)
    assert [s.name for s in chain.stages][0] == "matched_filter"


# ---------------------------------------------------------------------------
# collapsed pulse compression (config 2)
# ---------------------------------------------------------------------------


def _pc_cfg(runtime_size=True):
    return ChainConfig(
        fft=FftConfig(max_size=N, runtime_size=runtime_size),
        matched_filter=MatchedFilterConfig(num_taps=len(TAPS), fft_size=N),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                        max_fft_size=N, variant=CfarVariant.CA,
                        include_cash=False),
    )


def _xla_pc(x, rt, cfg):
    from rsp_chains_tpu.ops.fft import fft_op

    y = matched_filter(x, TAPS, cfg.matched_filter)
    s = fft_op(y, rt.log2_fft_size, cfg.fft)
    m = logmag(s, rt.mag_mode, cfg.mag)
    return cfar_op(m, rt, cfg.cfar)


def test_pulse_compression_collapse_matches_composition_full_size():
    cfg = _pc_cfg()
    chain = pulse_compression_chain(cfg, taps=TAPS)
    # CA-fusable elaboration: the whole collapsed chain is ONE kernel
    assert [s.name for s in chain.stages] == ["pc_fused"]
    rng = np.random.RandomState(5)
    x = as_pair((rng.randn(3, N) + 1j * rng.randn(3, N)).astype(np.complex64))
    rt = _rt()
    got = chain.jit()(x, rt)
    want = _xla_pc(x, rt, cfg)
    scale = np.abs(np.asarray(want.threshold)).max()
    assert np.abs(np.asarray(got.threshold)
                  - np.asarray(want.threshold)).max() / scale < 1e-4


def test_pulse_compression_runtime_small_size_branch():
    """Below the elaborated max the collapse is invalid; the cond's literal
    branch must reproduce the stage composition exactly."""
    cfg = _pc_cfg()
    chain = pulse_compression_chain(cfg, taps=TAPS)
    rng = np.random.RandomState(6)
    x = as_pair((rng.randn(2, N) + 1j * rng.randn(2, N)).astype(np.complex64))
    rt = _rt(fft_size=N // 2)
    got = chain.jit()(x, rt)
    want = _xla_pc(x, rt, cfg)
    thr_w = np.asarray(want.threshold)
    np.testing.assert_allclose(np.asarray(got.threshold), thr_w,
                               rtol=1e-4, atol=1e-5 * np.abs(thr_w).max())


def test_pulse_compression_spectral_mf_path_for_gosca():
    """Non-CA elaborations keep the spectral_mf collapse + the GOS tail."""
    cfg = dataclasses.replace(
        _pc_cfg(),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4, max_fft_size=N,
                        variant=CfarVariant.GOSCA, include_cash=True))
    chain = pulse_compression_chain(cfg, taps=TAPS)
    assert chain.stages[0].name == "spectral_mf"
    rng = np.random.RandomState(9)
    x = as_pair((rng.randn(2, N) + 1j * rng.randn(2, N)).astype(np.complex64))
    rt = _rt(cfar_algorithm=1, index_lagg=6, index_lead=6)
    got = chain.jit()(x, rt)
    want = _xla_pc(x, rt, cfg)
    scale = np.abs(np.asarray(want.threshold)).max()
    assert np.abs(np.asarray(got.threshold)
                  - np.asarray(want.threshold)).max() / scale < 1e-4


def test_pulse_compression_fused_n4096_lowers():
    """The 4096-point elaboration (BASELINE config 2) lowers with the
    roll/select interleave and the h_block operand (lowering only — the
    interpret-mode execution at 4096 is exercised on-chip)."""
    import jax

    cfg = ChainConfig(
        fft=FftConfig(max_size=4096),
        matched_filter=MatchedFilterConfig(num_taps=128, fft_size=4096),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                        max_fft_size=4096, variant=CfarVariant.CA,
                        include_cash=False),
    )
    taps = lfm_chirp(128, 0.0, 0.25)
    chain = pulse_compression_chain(cfg, taps=taps)
    assert [s.name for s in chain.stages] == ["pc_fused"]
    rng = np.random.RandomState(10)
    x = as_pair((rng.randn(1, 4096) + 1j * rng.randn(1, 4096))
                .astype(np.complex64))
    rt = RuntimeConfig.make(fft_size=4096, ref_window_size=8,
                            guard_window_size=2, threshold_scaler=8.0,
                            div_sum=4)
    jax.jit(chain.__call__).lower(x, rt)  # must trace + lower cleanly


def test_sharded_rd_pipeline_fused_front_matches_unsharded():
    """The (ch, rng) sharded RD step with the fused MF+Doppler front half and
    the kernel CFAR tail equals the unsharded fused chain (CPU mesh,
    interpret-mode kernels)."""
    from rsp_chains_tpu.parallel import make_mesh
    from rsp_chains_tpu.parallel.sharded import make_sharded_rd_pipeline

    n = 512
    cfg = ChainConfig(
        fft=FftConfig(max_size=n),
        matched_filter=MatchedFilterConfig(num_taps=len(TAPS), fft_size=n),
        doppler=DopplerConfig(num_pulses=P),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                        max_fft_size=n, variant=CfarVariant.CA,
                        include_cash=False),
    )
    mesh = make_mesh(channels=2, range_shards=4)
    rng = np.random.RandomState(8)
    x = (rng.randn(2, P, n) + 1j * rng.randn(2, P, n)).astype(np.complex64)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=8,
                            guard_window_size=2, threshold_scaler=3.0,
                            div_sum=4)

    pipe = make_sharded_rd_pipeline(cfg, mesh, TAPS)
    out_s = pipe(as_pair(x), rt)
    out_u = range_doppler_chain(cfg, taps=TAPS).jit()(as_pair(x), rt)
    thr_u = np.asarray(out_u.threshold)
    scale = np.abs(thr_u).max()
    assert np.abs(np.asarray(out_s.threshold) - thr_u).max() / scale < 1e-4


def test_pc_fused_no_recompile_across_runtime_sizes():
    """The full/small runtime-size branches live under ONE lax.cond — the
    fft-size register stays a traced scalar (no recompile)."""
    cfg = _pc_cfg()
    chain = pulse_compression_chain(cfg, taps=TAPS)
    jc = chain.jit()
    rng = np.random.RandomState(11)
    x = as_pair((rng.randn(2, N) + 1j * rng.randn(2, N)).astype(np.complex64))
    jc(x, _rt())
    jc(x, _rt(fft_size=N // 2))
    assert jc._cache_size() == 1


def test_fused_rd_512_pulses_lowers():
    """The 512-pulse elaboration (raised scoped-VMEM budget) traces and
    lowers cleanly; execution at this size is exercised on-chip."""
    cfg = ChainConfig(
        fft=FftConfig(max_size=256),
        matched_filter=MatchedFilterConfig(num_taps=32, fft_size=256),
        doppler=DopplerConfig(num_pulses=512),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                        max_fft_size=256, variant=CfarVariant.CA,
                        include_cash=False),
    )
    chain = range_doppler_chain(cfg, taps=TAPS)
    assert [s.name for s in chain.stages] == ["rd_fused"]
    rng = np.random.RandomState(13)
    x = as_pair((rng.randn(1, 512, 256)
                 + 1j * rng.randn(1, 512, 256)).astype(np.complex64))
    rt = RuntimeConfig.make(fft_size=256, ref_window_size=8,
                            guard_window_size=2, threshold_scaler=8.0,
                            div_sum=3)
    jax.jit(chain.__call__).lower(x, rt)
