"""Fused Pallas mag+CFAR kernel vs the XLA reference path (interpret mode on the
CPU platform; the same kernel compiles via Mosaic on TPU — exercised by bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsp_chains_tpu.configs import (
    CfarConfig, CfarMode, CfarVariant, ChainConfig, FftConfig, MagMode,
    RuntimeConfig,
)
from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_cfar
from rsp_chains_tpu.ops.cfar import cfar_op
from rsp_chains_tpu.ops.logmag import logmag


def _spec(rng, shape=(4, 256)):
    x = (rng.randn(*shape) * 50 + 1j * rng.randn(*shape) * 50).astype(np.complex64)
    x[..., 40] = 4000 + 100j
    x[..., 200] = 2500 - 500j
    return x


CFG = CfarConfig(max_ref_window=64, max_guard_window=8, variant=CfarVariant.CA,
                 include_cash=False, use_pallas=True)


def _compare(spec, rt, atol=2e-2):
    got = fused_mag_cfar(jnp.asarray(spec), rt, CFG, interpret=True)
    mag = logmag(jnp.asarray(spec), rt.mag_mode)
    want = cfar_op(mag, rt, CFG)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=atol)
    np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


@pytest.mark.parametrize("mode", [CfarMode.CELL_AVERAGING, CfarMode.GREATEST_OF,
                                  CfarMode.SMALLEST_OF])
@pytest.mark.parametrize("w,g", [(32, 4), (16, 2), (64, 8), (2, 1)])
def test_matches_xla_path(mode, w, g, rng):
    rt = RuntimeConfig.make(fft_size=256, cfar_mode=mode, ref_window_size=w,
                            guard_window_size=g, threshold_scaler=3.5)
    _compare(_spec(rng), rt)


@pytest.mark.parametrize("mag_mode", [MagMode.ABS, MagMode.SQR, MagMode.JPL,
                                      MagMode.LOG2])
def test_mag_modes(mag_mode, rng):
    rt = RuntimeConfig.make(fft_size=256, mag_mode=mag_mode, ref_window_size=16,
                            guard_window_size=2,
                            log_or_linear=0 if mag_mode == MagMode.LOG2 else 1,
                            threshold_scaler=2.0 if mag_mode == MagMode.LOG2 else 3.5)
    _compare(_spec(rng), rt, atol=5e-2)


def test_runtime_frame_shrink(rng):
    spec = _spec(rng)
    spec[..., 128:] = 1e6  # poison the inactive region
    rt = RuntimeConfig.make(fft_size=128, ref_window_size=16, guard_window_size=2)
    got = fused_mag_cfar(jnp.asarray(spec), rt, CFG, interpret=True)
    assert np.all(np.asarray(got.threshold)[..., 128:] == 0)
    assert not np.any(np.asarray(got.peaks)[..., 128:])
    _compare(spec, rt)


def test_peak_grouping(rng):
    rt = RuntimeConfig.make(fft_size=256, ref_window_size=16, guard_window_size=2,
                            peak_grouping=1)
    _compare(_spec(rng), rt)


@pytest.mark.parametrize("mode", [CfarMode.CELL_AVERAGING, CfarMode.GREATEST_OF])
@pytest.mark.parametrize("w,g,pg", [(16, 2, 0), (4, 3, 1), (64, 8, 1)])
def test_gated_body_bit_identical_to_ungated(mode, w, g, pg, rng):
    """The pl.when-gated CA body (scratch-resident rolls skipped when their
    register bit is clear) must be BIT-identical to the value-based body —
    the rolls are exact lane permutations and the box-sum addition order is
    unchanged, so any difference is a gating bug."""
    spec = jnp.asarray(_spec(rng))
    rt = RuntimeConfig.make(fft_size=256, cfar_mode=mode, ref_window_size=w,
                            guard_window_size=g, peak_grouping=pg,
                            threshold_scaler=3.5)
    a = fused_mag_cfar(spec, rt, CFG, interpret=True, gated=True)
    b = fused_mag_cfar(spec, rt, CFG, interpret=True, gated=False)
    np.testing.assert_array_equal(np.asarray(a.threshold),
                                  np.asarray(b.threshold))
    np.testing.assert_array_equal(np.asarray(a.peaks), np.asarray(b.peaks))


def test_gos_dispatch_routes_ca_register_to_ca_kernel(rng):
    """A GOSCA elaboration with the runtime algorithm register set to CA must
    produce the CA kernel's output exactly (the reference flips this register
    at runtime, RspChainVanillaTester.scala:124-132); set to GOS, the sort
    kernel's output; and flipping the register must NOT recompile."""
    import jax

    from rsp_chains_tpu.kernels.cfar_pallas import (
        fused_mag_cfar, fused_mag_gos_cfar, fused_mag_gos_dispatch,
    )

    gos_cfg = CfarConfig(max_ref_window=16, max_guard_window=4,
                         variant=CfarVariant.GOSCA, include_cash=True,
                         max_fft_size=256)
    spec = jnp.asarray(_spec(rng))
    jf = jax.jit(lambda s, r: fused_mag_gos_dispatch(s, r, gos_cfg,
                                                     interpret=True))
    rt_ca = RuntimeConfig.make(fft_size=256, ref_window_size=8,
                               guard_window_size=2, threshold_scaler=3.0,
                               cfar_algorithm=0, index_lagg=4, index_lead=4)
    rt_gos = RuntimeConfig.make(fft_size=256, ref_window_size=8,
                                guard_window_size=2, threshold_scaler=3.0,
                                cfar_algorithm=1, index_lagg=4, index_lead=4)
    got_ca = jf(spec, rt_ca)
    want_ca = fused_mag_cfar(spec, rt_ca, gos_cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_ca.threshold),
                                  np.asarray(want_ca.threshold))
    np.testing.assert_array_equal(np.asarray(got_ca.peaks),
                                  np.asarray(want_ca.peaks))
    got_gos = jf(spec, rt_gos)
    want_gos = fused_mag_gos_cfar(spec, rt_gos, gos_cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_gos.threshold),
                                  np.asarray(want_gos.threshold))
    np.testing.assert_array_equal(np.asarray(got_gos.peaks),
                                  np.asarray(want_gos.peaks))
    assert jf._cache_size() == 1   # register flip, no recompile
    # the CA and GOS thresholds genuinely differ (the cond selects something)
    assert not np.array_equal(np.asarray(got_ca.threshold),
                              np.asarray(got_gos.threshold))


def test_frame_padding_non_multiple_of_block(rng):
    spec = _spec(rng, shape=(3, 256))  # 3 frames -> padded to BLOCK_FRAMES
    rt = RuntimeConfig.make(fft_size=256, ref_window_size=16, guard_window_size=2)
    _compare(spec, rt)


def test_chain_integration_fused_tail(rng):
    from rsp_chains_tpu.presets import fft_mag_cfar_chain
    from rsp_chains_tpu.golden import three_tone_signal

    cfg_fused = ChainConfig(fft=FftConfig(max_size=1024), cfar=CFG)
    cfg_ref = ChainConfig(
        fft=FftConfig(max_size=1024),
        cfar=CfarConfig(max_ref_window=64, max_guard_window=8,
                        variant=CfarVariant.CA, include_cash=False),
    )
    iq = jnp.asarray(three_tone_signal(1024, shift_range_factor=12), jnp.complex64)
    rt = RuntimeConfig.make(fft_size=1024, ref_window_size=32, guard_window_size=4,
                            threshold_scaler=3.5, div_sum=5)
    chain = fft_mag_cfar_chain(cfg_fused)
    # the builder now fuses the WHOLE chain (FFT included) for CA configs
    assert chain.stage_names == ("fft_mag_cfar_fused",)
    out = chain(iq, rt)
    want = fft_mag_cfar_chain(cfg_ref)(iq, rt)
    np.testing.assert_allclose(np.asarray(out.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=1e-2)
    np.testing.assert_array_equal(np.asarray(out.peaks), np.asarray(want.peaks))


# ---------------------------------------------------------------------------
# GOS kernel (VMEM-resident windowed sort)
# ---------------------------------------------------------------------------

from rsp_chains_tpu.configs import CfarAlgorithm
from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_gos_cfar

# small elaboration: interpret-mode sort cost scales with the window maximum
GCFG = CfarConfig(max_ref_window=16, max_guard_window=4, variant=CfarVariant.GOSCA,
                  include_cash=False)


def _compare_gos(spec, rt, atol=5e-2, version=2):
    got = fused_mag_gos_cfar(jnp.asarray(spec), rt, GCFG, interpret=True,
                             version=version)
    assert got.threshold.shape == spec.shape
    mag = logmag(jnp.asarray(spec), rt.mag_mode)
    want = cfar_op(mag, rt, GCFG)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=atol)
    np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


@pytest.mark.parametrize("mode", [CfarMode.CELL_AVERAGING, CfarMode.GREATEST_OF,
                                  CfarMode.SMALLEST_OF])
@pytest.mark.slow
@pytest.mark.parametrize("rank", [0, 7])
@pytest.mark.parametrize("version", [2, 3])
def test_gos_kernel_matches_xla(mode, rank, version, rng):
    spec = _spec(rng, shape=(2, 256))
    rt = RuntimeConfig.make(fft_size=256, cfar_mode=mode,
                            cfar_algorithm=CfarAlgorithm.GOS,
                            ref_window_size=8, guard_window_size=2,
                            index_lagg=rank, index_lead=rank, threshold_scaler=3.0)
    _compare_gos(spec, rt, version=version)


@pytest.mark.slow
@pytest.mark.parametrize("version", [2, 3])
def test_gos_kernel_runtime_algorithm_switch(version, rng):
    spec = _spec(rng, shape=(2, 256))
    for algo in (CfarAlgorithm.CA, CfarAlgorithm.GOS):
        rt = RuntimeConfig.make(fft_size=256, cfar_algorithm=algo,
                                ref_window_size=8, guard_window_size=2,
                                index_lagg=4, index_lead=4)
        _compare_gos(spec, rt, version=version)


@pytest.mark.slow
@pytest.mark.parametrize("version", [2, 3])
def test_gos_kernel_frame_shrink_and_grouping(version, rng):
    spec = _spec(rng, shape=(2, 512))
    spec[..., 300:] = 1e6
    rt = RuntimeConfig.make(fft_size=256, cfar_algorithm=CfarAlgorithm.GOS,
                            ref_window_size=8, guard_window_size=2,
                            index_lagg=4, index_lead=4, peak_grouping=1)
    got = fused_mag_gos_cfar(jnp.asarray(spec), rt, GCFG, interpret=True,
                             version=version)
    assert np.all(np.asarray(got.threshold)[..., 256:] == 0)
    _compare_gos(spec, rt, version=version)


def test_gos_kernel_chain_integration(rng):
    """A GOSCA elaboration whose FFT is NOT fusable (pre-FFT window) keeps the
    two-stage composition: XLA FFT + the fused sort-tail kernel."""
    from rsp_chains_tpu.presets import fft_mag_cfar_chain
    from rsp_chains_tpu.golden import three_tone_signal

    cfg = ChainConfig(fft=FftConfig(max_size=1024, window="hann"),
                      cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                                      variant=CfarVariant.GOSCA,
                                      include_cash=False, use_pallas=True))
    chain = fft_mag_cfar_chain(cfg)
    assert chain.stage_names == ("fft", "mag_gos_cfar_fused")
    iq = jnp.asarray(three_tone_signal(1024, shift_range_factor=12), jnp.complex64)
    rt = RuntimeConfig.make(fft_size=1024, cfar_algorithm=CfarAlgorithm.GOS,
                            ref_window_size=16, guard_window_size=4,
                            index_lagg=8, index_lead=8, threshold_scaler=3.5)
    out = chain(iq, rt)
    peaks = np.flatnonzero(np.asarray(out.peaks))
    assert {128, 256, 512} <= set(peaks.tolist())


GCFG_CASH = CfarConfig(max_ref_window=16, max_guard_window=4,
                       variant=CfarVariant.GOSCA, include_cash=True)


@pytest.mark.slow
@pytest.mark.parametrize("sw", [3, 4])
@pytest.mark.parametrize("version", [2, 3])
def test_gos_kernel_cash_mode(sw, version, rng):
    spec = _spec(rng, shape=(2, 256))
    rt = RuntimeConfig.make(fft_size=256, cfar_mode=CfarMode.CASH,
                            ref_window_size=8, guard_window_size=2,
                            sub_window_size=sw, threshold_scaler=3.0)
    got = fused_mag_gos_cfar(jnp.asarray(spec), rt, GCFG_CASH, interpret=True,
                             version=version)
    want = cfar_op(logmag(jnp.asarray(spec), rt.mag_mode), rt, GCFG_CASH)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


@pytest.mark.parametrize("version", [2, 3])
def test_gos_kernel_cash_sub_window_exceeds_ref_window(version, rng):
    """Runtime sub_window_size > ref_window_size: no sub-window fits, so the
    CASH statistic is 0 and the threshold is pure scaler — the golden/v2
    semantics. RuntimeConfig.make validates this combination away, but the
    server's JSON config frames and CLI --set can write raw registers
    (dataclasses.replace below), so the kernels must clamp defensively
    (the r2 guard-window lesson, ADVICE round 1)."""
    import dataclasses

    spec = _spec(rng, shape=(2, 256))
    rt = RuntimeConfig.make(fft_size=256, cfar_mode=CfarMode.CASH,
                            ref_window_size=8, guard_window_size=2,
                            sub_window_size=4, threshold_scaler=3.0)
    rt = dataclasses.replace(rt, sub_window_size=jnp.asarray(16, jnp.int32))
    got = fused_mag_gos_cfar(jnp.asarray(spec), rt, GCFG_CASH, interpret=True,
                             version=version)
    want = cfar_op(logmag(jnp.asarray(spec), rt.mag_mode), rt, GCFG_CASH)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


@pytest.mark.slow
def test_gos_kernel_v3_halo_extended_frame_length(rng):
    """The sharded tail calls with halo-extended lengths (e.g. 1280 =
    1024 + 2*PAD) that are NOT multiples of 1024 — the v3 tile picker must
    fall back to a 256-aligned divisor instead of a full-row tile that would
    blow the scoped-VMEM budget on-chip."""
    spec = _spec(rng, shape=(2, 1280))
    rt = RuntimeConfig.make(fft_size=1024, cfar_mode=CfarMode.GREATEST_OF,
                            ref_window_size=8, guard_window_size=2,
                            cfar_algorithm=CfarAlgorithm.GOS,
                            index_lagg=4, index_lead=4, threshold_scaler=3.0,
                            cfar_fft_size=1280)
    got = fused_mag_gos_cfar(jnp.asarray(spec), rt, GCFG_CASH, interpret=True,
                             version=3)
    want = cfar_op(logmag(jnp.asarray(spec), rt.mag_mode), rt, GCFG_CASH,
                   active_hi=jnp.asarray(1280, jnp.int32))
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=5e-2)


@pytest.mark.slow
@pytest.mark.parametrize("version", [2, 3])
def test_gos_kernel_cash_runtime_mode_switch(version, rng):
    """All four modes through the CASH-elaborated kernel (runtime switch)."""
    spec = _spec(rng, shape=(2, 256))
    for mode in (CfarMode.CELL_AVERAGING, CfarMode.GREATEST_OF,
                 CfarMode.SMALLEST_OF, CfarMode.CASH):
        rt = RuntimeConfig.make(fft_size=256, cfar_mode=mode,
                                ref_window_size=8, guard_window_size=2,
                                sub_window_size=3, threshold_scaler=3.0)
        got = fused_mag_gos_cfar(jnp.asarray(spec), rt, GCFG_CASH,
                                 interpret=True, version=version)
        want = cfar_op(logmag(jnp.asarray(spec), rt.mag_mode), rt, GCFG_CASH)
        np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


# ---------------------------------------------------------------------------
# fully-fused FFT+mag+CFAR chain kernel (kernels/chain_pallas.py)
# ---------------------------------------------------------------------------

from rsp_chains_tpu.kernels.chain_pallas import (  # noqa: E402
    _bit_perm_steps, fused_chain_ca, fused_chain_ca_op,
)
from rsp_chains_tpu.configs import FftConfig as _FftCfg  # noqa: E402


def _xla_chain_out(x, rt, fft_cfg, cfar_cfg):
    from rsp_chains_tpu.ops.cfar import cfar_op
    from rsp_chains_tpu.ops.fft import fft_op
    from rsp_chains_tpu.ops.logmag import logmag

    spec = fft_op(x, rt.log2_fft_size, fft_cfg)
    return cfar_op(logmag(spec, rt.mag_mode), rt, cfar_cfg)


@pytest.mark.parametrize("n", [256, 512])
@pytest.mark.parametrize("boxsum", ["vpu", "mxu", "mxu2"])
def test_fused_chain_kernel_matches_xla(n, boxsum, rng):
    from rsp_chains_tpu.cplx import as_pair

    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=32, variant=CfarVariant.CA,
                          include_cash=False)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=16, guard_window_size=2,
                            threshold_scaler=3.0, div_sum=4)
    x = (rng.randn(3, n) + 1j * rng.randn(3, n)).astype(np.complex64)
    got = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                         boxsum_impl=boxsum)
    want = _xla_chain_out(as_pair(x), rt, fft_cfg, cfar_cfg)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


@pytest.mark.parametrize("n", [256, 512])
def test_fused_chain_fold_interleave_matches_xla(n, rng):
    """perm_impl='fold': the interleave folded into the pass-3 DFT column
    order, leaving only log2(n1) residual bit-swap roll/select steps — an
    EXACT lane permutation (no hi/lo split residual)."""
    from rsp_chains_tpu.cplx import as_pair

    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=32, variant=CfarVariant.CA,
                          include_cash=False)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=16, guard_window_size=2,
                            threshold_scaler=3.0, div_sum=4)
    x = (rng.randn(3, n) + 1j * rng.randn(3, n)).astype(np.complex64)
    got = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                         perm_impl="fold")
    want = _xla_chain_out(as_pair(x), rt, fft_cfg, cfar_cfg)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


@pytest.mark.slow
def test_fused_chain_fold_bit_identical_to_roll(rng):
    """'fold' performs the same f32 dot products as 'roll' (identical rows
    against identical column vectors — only their PLACEMENT differs) followed
    by exact permutations, so the two formulations must agree bit-for-bit.
    Covers n1 = 2 (one swap step) and n1 = 16 (four steps, the size where the
    dense permutation operand stops fitting VMEM)."""
    from rsp_chains_tpu.cplx import as_pair

    for n, bf, frames in ((256, 128, 3), (2048, 8, 2)):
        fft_cfg = _FftCfg(max_size=n)
        cfar_cfg = CfarConfig(max_ref_window=16, max_guard_window=4,
                              variant=CfarVariant.CA, include_cash=False)
        rt = RuntimeConfig.make(fft_size=n, ref_window_size=8,
                                guard_window_size=2, threshold_scaler=3.0,
                                div_sum=3)
        x = (rng.randn(frames, n)
             + 1j * rng.randn(frames, n)).astype(np.complex64)
        a = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                           perm_impl="roll", block_frames=bf)
        b = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                           perm_impl="fold", block_frames=bf)
        np.testing.assert_array_equal(np.asarray(a.threshold),
                                      np.asarray(b.threshold))
        np.testing.assert_array_equal(np.asarray(a.peaks), np.asarray(b.peaks))


def test_fused_chain_fold_with_h_block(rng):
    """The collapsed pulse-compression form (block-order spectral weights)
    under 'fold': the weights are sigma-permuted to the reordered layout —
    bit-identical to the 'roll' form."""
    from rsp_chains_tpu.cplx import as_pair
    from rsp_chains_tpu.golden.fixtures import lfm_chirp
    from rsp_chains_tpu.kernels.rd_pallas import _h_block

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=16, max_guard_window=4,
                          variant=CfarVariant.CA, include_cash=False)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=8, guard_window_size=2,
                            threshold_scaler=3.0, div_sum=3)
    hb = _h_block(np.asarray(lfm_chirp(32, 0.0, 0.25)), n, True)
    x = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    a = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                       perm_impl="roll", h_block=hb)
    b = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                       perm_impl="fold", h_block=hb)
    np.testing.assert_array_equal(np.asarray(a.threshold),
                                  np.asarray(b.threshold))
    np.testing.assert_array_equal(np.asarray(a.peaks), np.asarray(b.peaks))


def test_fused_chain_packed_fold_bit_identical(rng):
    """The wire-format kernel under 'fold' emits the same packed words."""
    from rsp_chains_tpu import packing
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca_packed

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=16, max_guard_window=4,
                          variant=CfarVariant.CA, include_cash=False)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=8, guard_window_size=2,
                            threshold_scaler=3.0, div_sum=3)
    iq = (rng.randint(-20000, 20000, (2, n))
          + 1j * rng.randint(-20000, 20000, (2, n))).astype(np.complex64)
    words = jnp.asarray(packing.pack_iq(jnp.asarray(iq)), jnp.uint32)
    a = fused_chain_ca_packed(words, rt, fft_cfg, cfar_cfg, interpret=True,
                              perm_impl="roll")
    b = fused_chain_ca_packed(words, rt, fft_cfg, cfar_cfg, interpret=True,
                              perm_impl="fold")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode", [CfarMode.CELL_AVERAGING, CfarMode.GREATEST_OF,
                                  CfarMode.SMALLEST_OF])
@pytest.mark.slow
@pytest.mark.parametrize("ll,pg", [(1, 0), (0, 1), (1, 1)])
def test_fused_chain_lean_tail_bit_identical(mode, ll, pg, rng):
    """The r4 'lean' CA tail folds the power-of-two divider, the CA 1/2, and
    the linear-mode scaler into one coefficient, mode-gates the threshold
    writes, and fast-paths the full-active frame — all EXACT transformations
    (power-of-two scaling commutes with every rounding; max/min commute with
    positive scaling), so it must match the classic tail bit-for-bit."""
    from rsp_chains_tpu.cplx import as_pair

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=32, max_guard_window=8,
                          variant=CfarVariant.CA, include_cash=False)
    x = (rng.randn(3, n) + 1j * rng.randn(3, n)).astype(np.complex64)
    for fft_size in (n, n // 2):      # full-active fast path AND masked path
        rt = RuntimeConfig.make(fft_size=n, cfar_fft_size=fft_size,
                                cfar_mode=mode, ref_window_size=16,
                                guard_window_size=3, threshold_scaler=3.5,
                                div_sum=4, log_or_linear=ll, peak_grouping=pg)
        a = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                           tail_impl="classic")
        b = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                           tail_impl="lean")
        np.testing.assert_array_equal(np.asarray(a.threshold),
                                      np.asarray(b.threshold))
        np.testing.assert_array_equal(np.asarray(a.peaks), np.asarray(b.peaks))


@pytest.mark.parametrize("alg,mode,ll,pg", [
    (1, 0, 1, 0), (1, 1, 0, 1), (1, 2, 1, 1), (0, 0, 1, 0), (1, 3, 1, 0),
])
def test_gos_lean_epilogue_bit_identical(alg, mode, ll, pg, rng):
    """The r4 lean GOS epilogue (pl.when mode select + folded linear scaler +
    gated grouping) must match the classic value-ladder epilogue bit-for-bit
    across the algorithm/mode/log/grouping register surface (incl. runtime
    frame shrink)."""
    from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_gos_cfar

    gcfg = CfarConfig(max_ref_window=16, max_guard_window=4,
                      variant=CfarVariant.GOSCA, include_cash=True,
                      max_fft_size=256)
    spec = jnp.asarray(_spec(rng))
    for fft_size in (256, 128):
        rt = RuntimeConfig.make(fft_size=256, cfar_fft_size=fft_size,
                                cfar_mode=mode, ref_window_size=8,
                                guard_window_size=2, threshold_scaler=3.0,
                                log_or_linear=ll, peak_grouping=pg,
                                cfar_algorithm=alg, index_lagg=4, index_lead=4,
                                sub_window_size=2)
        a = fused_mag_gos_cfar(spec, rt, gcfg, interpret=True,
                               tail_impl="classic")
        b = fused_mag_gos_cfar(spec, rt, gcfg, interpret=True,
                               tail_impl="lean")
        np.testing.assert_array_equal(np.asarray(a.threshold),
                                      np.asarray(b.threshold))
        np.testing.assert_array_equal(np.asarray(a.peaks), np.asarray(b.peaks))


@pytest.mark.parametrize("variant", [dict(roll_impl="batch"),
                                     dict(merge_impl="oe_batch"),
                                     dict(select_impl="batch"),
                                     dict(roll_impl="batch",
                                          merge_impl="oe_batch",
                                          select_impl="batch")])
def test_gos_batched_formulations_bit_identical(variant, rng):
    """roll_impl='batch' (one roll of the sublane-stacked level) and
    merge_impl='oe_batch' (each merge stage as one batched min + max) must be
    bit-identical to the per-row formulations across window sizes."""
    from rsp_chains_tpu.kernels.cfar_pallas import fused_mag_gos_cfar

    gcfg = CfarConfig(max_ref_window=16, max_guard_window=4,
                      variant=CfarVariant.GOSCA, include_cash=True,
                      max_fft_size=256)
    spec = jnp.asarray(_spec(rng))
    for wsz, lead_off in ((16, 0), (8, 0), (8, -1)):   # incl. unequal ranks
        rt = RuntimeConfig.make(fft_size=256, cfar_mode=0,
                                ref_window_size=wsz, guard_window_size=2,
                                threshold_scaler=3.0, log_or_linear=1,
                                peak_grouping=1, cfar_algorithm=1,
                                index_lagg=wsz // 2,
                                index_lead=wsz // 2 + lead_off,
                                sub_window_size=2)
        a = fused_mag_gos_cfar(spec, rt, gcfg, interpret=True)
        b = fused_mag_gos_cfar(spec, rt, gcfg, interpret=True, **variant)
        np.testing.assert_array_equal(np.asarray(a.threshold),
                                      np.asarray(b.threshold))
        np.testing.assert_array_equal(np.asarray(a.peaks), np.asarray(b.peaks))


def test_oe_merge_schedule_matches_list_merge(rng):
    """The staged batched merge network must be comparator-for-comparator the
    same network: merged output of random sorted lists equals numpy sort."""
    from rsp_chains_tpu.kernels.cfar_pallas import (
        _oe_merge_lists, _oe_merge_lists_batched,
    )

    for m in (1, 2, 4, 8, 16):
        a = np.sort(rng.randn(m, 4, 8).astype(np.float32), axis=0)
        b = np.sort(rng.randn(m, 4, 8).astype(np.float32), axis=0)
        al = [jnp.asarray(a[i]) for i in range(m)]
        bl = [jnp.asarray(b[i]) for i in range(m)]
        got = np.stack([np.asarray(r)
                        for r in _oe_merge_lists_batched(al, bl)])
        ref = np.stack([np.asarray(r) for r in _oe_merge_lists(al, bl)])
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(
            got, np.sort(np.concatenate([a, b]), axis=0))


@pytest.mark.parametrize("pg", [0, 1])
def test_fused_chain_packed_lean_bit_identical(pg, rng):
    """The wire-format kernel's lean tail emits {thr | bin | peak} words
    in-pass; the words must equal the classic unfuse-then-pack epilogue's."""
    from rsp_chains_tpu import packing
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca_packed

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=16, max_guard_window=4,
                          variant=CfarVariant.CA, include_cash=False)
    iq = (rng.randint(-20000, 20000, (2, n))
          + 1j * rng.randint(-20000, 20000, (2, n))).astype(np.complex64)
    words = jnp.asarray(packing.pack_iq(jnp.asarray(iq)), jnp.uint32)
    for fft_size in (n, n // 2):
        rt = RuntimeConfig.make(fft_size=n, cfar_fft_size=fft_size,
                                ref_window_size=8, guard_window_size=2,
                                threshold_scaler=3.0, div_sum=3,
                                peak_grouping=pg)
        a = fused_chain_ca_packed(words, rt, fft_cfg, cfar_cfg,
                                  interpret=True, tail_impl="classic")
        b = fused_chain_ca_packed(words, rt, fft_cfg, cfar_cfg,
                                  interpret=True, tail_impl="lean")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_chain_stack_hi_lo_bit_identical(rng):
    """Stacking the hi/lo split terms into one tall matmul is the same math
    in a different dispatch shape — outputs must be bit-identical."""
    from rsp_chains_tpu.cplx import as_pair

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=32, variant=CfarVariant.CA,
                          include_cash=False)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=16, guard_window_size=2,
                            threshold_scaler=3.0, div_sum=4)
    x = (rng.randn(3, n) + 1j * rng.randn(3, n)).astype(np.complex64)
    for boxsum in ("vpu", "mxu2"):
        a = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                           boxsum_impl=boxsum, stack_hi_lo=False)
        b = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg, interpret=True,
                           boxsum_impl=boxsum, stack_hi_lo=True)
        np.testing.assert_array_equal(np.asarray(a.threshold),
                                      np.asarray(b.threshold))
        np.testing.assert_array_equal(np.asarray(a.peaks), np.asarray(b.peaks))


@pytest.mark.slow
@pytest.mark.parametrize("boxsum", ["mxu", "mxu2"])
def test_fused_chain_band_boxsum_modes_and_edges(boxsum, rng):
    """The MXU band-matmul CFAR path across runtime modes, guard=0, active
    ranges below the elaborated size, and peak grouping — every register the
    band operand folds into its values."""
    from rsp_chains_tpu.cplx import as_pair

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=32, max_guard_window=8,
                          variant=CfarVariant.CA, include_cash=False)
    x = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    for mode, w, g, cfar_n, pg in (
        (CfarMode.CELL_AVERAGING, 16, 1, n, 0),
        (CfarMode.GREATEST_OF, 8, 4, n, 1),
        (CfarMode.SMALLEST_OF, 32, 8, n, 0),
        (CfarMode.CELL_AVERAGING, 8, 2, n // 2, 1),
    ):
        rt = RuntimeConfig.make(fft_size=n, cfar_fft_size=cfar_n,
                                cfar_mode=mode, ref_window_size=w,
                                guard_window_size=g, threshold_scaler=2.5,
                                div_sum=int(np.log2(w)), peak_grouping=pg)
        got = fused_chain_ca(as_pair(x), rt, fft_cfg, cfar_cfg,
                             interpret=True, boxsum_impl=boxsum)
        want = _xla_chain_out(as_pair(x), rt, fft_cfg, cfar_cfg)
        np.testing.assert_allclose(np.asarray(got.threshold),
                                   np.asarray(want.threshold),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.peaks),
                                      np.asarray(want.peaks))


def test_fused_chain_runtime_size_branches(rng):
    """The runtime FFT-size register: full size runs the fused kernel branch,
    a smaller size the XLA-FFT + spectrum-kernel branch — same jitted fn."""
    import jax

    from rsp_chains_tpu.cplx import as_pair

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    cfar_cfg = CfarConfig(max_ref_window=16, max_guard_window=4,
                          variant=CfarVariant.CA, include_cash=False)
    x = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    jf = jax.jit(lambda xx, rr: fused_chain_ca_op(xx, rr, fft_cfg, cfar_cfg,
                                                  interpret=True))
    for size, w, g in ((n, 8, 2), (n // 2, 4, 1)):
        rt = RuntimeConfig.make(fft_size=size, ref_window_size=w,
                                guard_window_size=g, threshold_scaler=3.0,
                                div_sum=int(np.log2(w)))
        got = jf(as_pair(x), rt)
        want = _xla_chain_out(as_pair(x), rt, fft_cfg, cfar_cfg)
        np.testing.assert_allclose(np.asarray(got.threshold),
                                   np.asarray(want.threshold),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got.peaks),
                                      np.asarray(want.peaks))
    assert jf._cache_size() == 1


def test_bit_reversed_elaboration_keeps_xla_fft_stage(rng):
    """use_bit_reverse=False emits RAW SDF (bit-reversed) cell order — only
    the XLA FFT stage applies that reorder, so the fused whole-chain kernels
    (natural order only) must not be selected; the chain output must be the
    bit-reversed ordering for both the float and wire tops."""
    import dataclasses

    from rsp_chains_tpu import ChainConfig, fft_mag_cfar_chain, rx_fft_mag_cfar_tx_chain
    from rsp_chains_tpu.configs import FftConfig

    n = 256
    cfar = CfarConfig(max_ref_window=16, max_guard_window=4,
                      variant=CfarVariant.CA, include_cash=False)
    cfg_rev = ChainConfig(fft=FftConfig(max_size=n, use_bit_reverse=False),
                          cfar=cfar)
    ch = fft_mag_cfar_chain(cfg_rev)
    assert "fft" in ch.stage_names, ch.stage_names   # not the fused top
    assert "fused" not in rx_fft_mag_cfar_tx_chain(cfg_rev).stage_names[0]

    # the bit-reversed chain equals the natural chain's output permuted
    cfg_nat = dataclasses.replace(
        cfg_rev, fft=dataclasses.replace(cfg_rev.fft, use_bit_reverse=True),
        cfar=dataclasses.replace(cfar, use_pallas=False))
    x = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=8, guard_window_size=2,
                            threshold_scaler=3.0, div_sum=3)
    from rsp_chains_tpu.cplx import as_pair

    got = ch.jit()(as_pair(x), rt)
    want = fft_mag_cfar_chain(cfg_nat).jit()(as_pair(x), rt)
    # CFAR ran over the reversed-order cells: compare against the XLA
    # composition elaborated with the same bit-reversed FFT
    from rsp_chains_tpu.ops.cfar import cfar_op
    from rsp_chains_tpu.ops.fft import fft_op
    from rsp_chains_tpu.ops.logmag import logmag

    spec = fft_op(as_pair(x), rt.log2_fft_size, cfg_rev.fft)
    want_rev = cfar_op(logmag(spec, rt.mag_mode), rt, cfg_nat.cfar)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want_rev.threshold),
                               rtol=1e-4, atol=1e-5)
    # sanity: the orders genuinely differ
    assert not np.allclose(np.asarray(got.threshold),
                           np.asarray(want.threshold))


def test_chain_builder_uses_fused_chain_kernel():
    from rsp_chains_tpu import ChainConfig, fft_mag_cfar_chain
    from rsp_chains_tpu.configs import FftConfig

    cfg = ChainConfig(
        fft=FftConfig(max_size=256),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                        variant=CfarVariant.CA, include_cash=False),
    )
    ch = fft_mag_cfar_chain(cfg)
    assert ch.stage_names == ("fft_mag_cfar_fused",)
    # GOS elaborations fuse the whole chain too (r3); a non-fusable FFT
    # (pre-FFT window) keeps the composed form
    cfg2 = ChainConfig(
        fft=FftConfig(max_size=256),
        cfar=CfarConfig(max_ref_window=16, variant=CfarVariant.GOSCA,
                        include_cash=False),
    )
    assert fft_mag_cfar_chain(cfg2).stage_names == ("fft_mag_gos_cfar_fused",)
    cfg3 = ChainConfig(
        fft=FftConfig(max_size=256, window="hann"),
        cfar=CfarConfig(max_ref_window=16, variant=CfarVariant.GOSCA,
                        include_cash=False),
    )
    assert "fft" in fft_mag_cfar_chain(cfg3).stage_names


def test_fused_wire_chain_matches_composed(rng):
    """The packed wire-format kernel (words in -> words out) equals the
    composed unpack->fft->mag->cfar->pack chain, including the runtime-size
    register's small branch."""
    import jax

    from rsp_chains_tpu import packing, rx_fft_mag_cfar_tx_chain
    from rsp_chains_tpu.configs import ChainConfig, FftConfig

    n = 256
    cfg = ChainConfig(
        fft=FftConfig(max_size=n),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                        variant=CfarVariant.CA, include_cash=False),
    )
    import dataclasses

    cfg_x = dataclasses.replace(
        cfg, cfar=dataclasses.replace(cfg.cfar, use_pallas=False))
    ch = rx_fft_mag_cfar_tx_chain(cfg)
    assert ch.stage_names == ("rx_fft_mag_cfar_tx_fused",)
    ch_x = rx_fft_mag_cfar_tx_chain(cfg_x)

    iq = (rng.randint(-20000, 20000, (2, n))
          + 1j * rng.randint(-20000, 20000, (2, n))).astype(np.complex64)
    words = jnp.asarray(packing.pack_iq(jnp.asarray(iq)), jnp.uint32)
    jf = ch.jit()
    for size, w, g in ((n, 8, 2), (n // 2, 4, 1)):
        rt = RuntimeConfig.make(fft_size=size, ref_window_size=w,
                                guard_window_size=g, threshold_scaler=3.0,
                                div_sum=int(np.log2(w)))
        got = np.asarray(jf(words, rt))
        want = np.asarray(ch_x.jit()(words, rt))
        tg, bg, pg = packing.unpack_cfar_words(got, int(np.log2(n)))
        tw_, bw_, pw_ = packing.unpack_cfar_words(want, int(np.log2(n)))
        np.testing.assert_array_equal(bg, bw_)
        np.testing.assert_array_equal(pg, pw_)
        assert np.abs(tg.astype(np.int64) - tw_.astype(np.int64)).max() <= 1
    assert jf._cache_size() == 1


# ---------------------------------------------------------------------------
# fully-fused FFT+mag+GOS/CASH chain kernel (VERDICT r2 item 1)
# ---------------------------------------------------------------------------

from rsp_chains_tpu.kernels.chain_pallas import (  # noqa: E402
    fused_chain_gos, fused_chain_gos_op,
)


@pytest.mark.parametrize("mode", [CfarMode.CELL_AVERAGING,
                                  CfarMode.GREATEST_OF])
@pytest.mark.parametrize("rank", [0, 7])
def test_fused_chain_gos_matches_xla(mode, rank, rng):
    """One kernel: in-kernel FFT -> mag -> v3 sliding-merge GOS tail == the
    XLA fft_op + logmag + cfar_op composition."""
    from rsp_chains_tpu.cplx import as_pair

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    rt = RuntimeConfig.make(fft_size=n, cfar_mode=mode,
                            cfar_algorithm=CfarAlgorithm.GOS,
                            ref_window_size=8, guard_window_size=2,
                            index_lagg=rank, index_lead=rank,
                            threshold_scaler=3.0)
    x = (rng.randn(3, n) + 1j * rng.randn(3, n)).astype(np.complex64)
    got = fused_chain_gos(as_pair(x), rt, fft_cfg, GCFG, interpret=True)
    want = _xla_chain_out(as_pair(x), rt, fft_cfg, GCFG)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


def test_fused_chain_gos_cash_mode(rng):
    from rsp_chains_tpu.cplx import as_pair

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    rt = RuntimeConfig.make(fft_size=n, cfar_mode=CfarMode.CASH,
                            cfar_algorithm=CfarAlgorithm.GOS,
                            ref_window_size=8, guard_window_size=2,
                            sub_window_size=4, threshold_scaler=3.0)
    x = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    got = fused_chain_gos(as_pair(x), rt, fft_cfg, GCFG_CASH, interpret=True)
    want = _xla_chain_out(as_pair(x), rt, fft_cfg, GCFG_CASH)
    np.testing.assert_allclose(np.asarray(got.threshold),
                               np.asarray(want.threshold), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.peaks), np.asarray(want.peaks))


@pytest.mark.slow
def test_fused_chain_gos_op_runtime_dispatch(rng):
    """fused_chain_gos_op: ONE executable dispatches CA register -> CA chain
    kernel, GOS/CASH -> GOS chain kernel, small runtime size -> XLA FFT +
    spectrum tail; each branch equals the XLA composition."""
    import jax

    from rsp_chains_tpu.cplx import as_pair

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    jf = jax.jit(lambda a, r: fused_chain_gos_op(a, r, fft_cfg, GCFG_CASH,
                                                 interpret=True))
    x = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    sweeps = [
        dict(cfar_algorithm=CfarAlgorithm.CA),
        dict(cfar_algorithm=CfarAlgorithm.GOS, index_lagg=5, index_lead=5),
        dict(cfar_algorithm=CfarAlgorithm.CA, cfar_mode=CfarMode.CASH,
             sub_window_size=4),
        dict(cfar_algorithm=CfarAlgorithm.GOS, fft_size=128),
    ]
    for kw in sweeps:
        rt = RuntimeConfig.make(ref_window_size=8, guard_window_size=2,
                                threshold_scaler=3.0,
                                **{"fft_size": n, **kw})
        got = jf(as_pair(x), rt)
        want = _xla_chain_out(as_pair(x), rt, fft_cfg, GCFG_CASH)
        np.testing.assert_allclose(np.asarray(got.threshold),
                                   np.asarray(want.threshold),
                                   rtol=1e-4, atol=1e-5, err_msg=str(kw))
        np.testing.assert_array_equal(np.asarray(got.peaks),
                                      np.asarray(want.peaks), err_msg=str(kw))
    assert jf._cache_size() == 1


@pytest.mark.slow
def test_fused_chain_gos_preset_single_stage(rng):
    """A GOSCA elaboration with a fusable FFT builds the whole chain as ONE
    stage (the r2 verdict's 'done' bar) and still detects the three tones."""
    from rsp_chains_tpu.golden import three_tone_signal
    from rsp_chains_tpu.presets import fft_mag_cfar_chain

    cfg = ChainConfig(fft=FftConfig(max_size=256),
                      cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                                      variant=CfarVariant.GOSCA,
                                      include_cash=True, max_fft_size=256))
    chain = fft_mag_cfar_chain(cfg)
    assert chain.stage_names == ("fft_mag_gos_cfar_fused",)
    iq = jnp.asarray(three_tone_signal(256, shift_range_factor=12),
                     jnp.complex64)
    rt = RuntimeConfig.make(fft_size=256, cfar_algorithm=CfarAlgorithm.GOS,
                            ref_window_size=16, guard_window_size=4,
                            index_lagg=8, index_lead=8, threshold_scaler=3.5)
    out = chain.jit()(iq, rt)
    peaks = np.flatnonzero(np.asarray(out.peaks))
    assert {32, 64, 128} <= set(peaks.tolist())


@pytest.mark.slow
def test_gos_oe_merge_bit_identical_to_bitonic(rng):
    """Batcher odd-even merge ladder == bitonic merge ladder bit-for-bit
    (both are exact f32 min/max networks computing the same sorted windows)."""
    from rsp_chains_tpu.cplx import as_pair

    n = 256
    fft_cfg = _FftCfg(max_size=n)
    x = (rng.randn(2, n) + 1j * rng.randn(2, n)).astype(np.complex64)
    for mode, extra in ((CfarMode.CELL_AVERAGING, {}),
                        (CfarMode.GREATEST_OF, {})):
        rt = RuntimeConfig.make(fft_size=n, cfar_mode=mode,
                                cfar_algorithm=CfarAlgorithm.GOS,
                                ref_window_size=16, guard_window_size=2,
                                index_lagg=3, index_lead=11,
                                threshold_scaler=3.0, **extra)
        a = fused_chain_gos(as_pair(x), rt, fft_cfg, GCFG, interpret=True,
                            merge_impl="bitonic")
        b = fused_chain_gos(as_pair(x), rt, fft_cfg, GCFG, interpret=True,
                            merge_impl="oe")
        np.testing.assert_array_equal(np.asarray(a.threshold),
                                      np.asarray(b.threshold))
        np.testing.assert_array_equal(np.asarray(a.peaks), np.asarray(b.peaks))
