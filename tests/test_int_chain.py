"""At-speed bit-true integer chain kernel (kernels/int_chain_pallas.py) vs the
exact XLA integer pipeline (ops/bit_true.py) — interpret mode, BIT-equality
throughout (the kernel's contract is exactness, not SNR-closeness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsp_chains_tpu.configs import (
    CfarConfig, CfarVariant, ChainConfig, FftConfig, FixedPointConfig,
    RuntimeConfig,
)
from rsp_chains_tpu.cplx import C
from rsp_chains_tpu.kernels.int_chain_pallas import (
    _isqrt32_k, fused_chain_int, fused_chain_int_op, int_chain_fusable,
)
from rsp_chains_tpu.ops.bit_true import (
    _isqrt32, cfar_int, fft_int_op, mag_int_op,
)

N = 256
CFAR = CfarConfig(max_ref_window=32, max_guard_window=8,
                  variant=CfarVariant.CA, include_cash=False)


def _iq(rng, frames=3, n=N, amp=30000):
    return C(jnp.asarray(rng.randint(-amp, amp, (frames, n)), jnp.int32),
             jnp.asarray(rng.randint(-amp, amp, (frames, n)), jnp.int32))


def _xla_int_chain(x, rt, fft_cfg, cfar_cfg, mag_cfg=None):
    spec = fft_int_op(x, rt.log2_fft_size, fft_cfg)
    return cfar_int(mag_int_op(spec, rt.mag_mode, mag_cfg), rt, cfar_cfg)


def _assert_bit_equal(got, want):
    np.testing.assert_array_equal(np.asarray(got.threshold),
                                  np.asarray(want.threshold))
    np.testing.assert_array_equal(np.asarray(got.peaks),
                                  np.asarray(want.peaks))


def test_isqrt_square_compare_equals_division_form():
    """The kernel's square-compare isqrt corrections are equivalent to the
    XLA path's division-based ones (s > x//s <=> s^2 > x for s >= 1), with
    overflow guarded at 46340 — exact on boundary and adversarial values."""
    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 2**31 - 1,
            46340**2, 46340**2 - 1, 46340**2 + 1]
    vals += [k * k for k in range(1, 3000, 53)]
    vals += [k * k - 1 for k in range(2, 3000, 53)]
    vals += list(np.random.RandomState(0).randint(0, 2**31 - 1, 2000))
    v = jnp.asarray(np.asarray(vals, np.int32))
    np.testing.assert_array_equal(np.asarray(_isqrt32(v)),
                                  np.asarray(_isqrt32_k(v)))


@pytest.mark.slow
@pytest.mark.parametrize("mag_mode", [0, 1, 2])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_int_chain_kernel_bit_exact(mag_mode, mode, rng):
    rt = RuntimeConfig.make(fft_size=N, ref_window_size=16,
                            guard_window_size=3, threshold_scaler=3.5,
                            div_sum=4, cfar_mode=mode, mag_mode=mag_mode)
    x = _iq(rng)
    got = fused_chain_int(x, rt, FftConfig(max_size=N), CFAR, interpret=True)
    _assert_bit_equal(got, _xla_int_chain(x, rt, FftConfig(max_size=N), CFAR))


@pytest.mark.parametrize("ll,pg", [(0, 0), (0, 1), (1, 1)])
def test_int_chain_kernel_log_domain_and_grouping(ll, pg, rng):
    rt = RuntimeConfig.make(fft_size=N, ref_window_size=8,
                            guard_window_size=2, threshold_scaler=2.0,
                            div_sum=3, log_or_linear=ll, peak_grouping=pg)
    x = _iq(rng)
    got = fused_chain_int(x, rt, FftConfig(max_size=N), CFAR, interpret=True)
    _assert_bit_equal(got, _xla_int_chain(x, rt, FftConfig(max_size=N), CFAR))


@pytest.mark.parametrize("el,km", [
    ((1, 0, 1, 0, 0, 0, 0, 0), None),              # expanding stages
    (None, (1, 1, 0, 1, 1, 1, 1, 1)),              # keepLSB wraparound stage
    ((0, 1, 0, 0, 0, 0, 0, 0), (1, 0, 1, 1, 1, 1, 1, 1)),  # mixed
])
@pytest.mark.slow
def test_int_chain_kernel_expand_and_keep_lsb(el, km, rng):
    """Expanding stages route the 8-bit split-product twiddle path; keepLSB
    stages wrap — both must stay bit-exact at near-full-scale input."""
    fc = FftConfig(max_size=N, expand_logic=el, keep_msb_or_lsb=km)
    rt = RuntimeConfig.make(fft_size=N, ref_window_size=16,
                            guard_window_size=3, threshold_scaler=3.5,
                            div_sum=4)
    x = _iq(rng, amp=32768)
    got = fused_chain_int(x, rt, fc, CFAR, interpret=True)
    _assert_bit_equal(got, _xla_int_chain(x, rt, fc, CFAR))


def test_int_chain_op_register_dispatch_no_recompile(rng):
    """The dispatcher covers the FULL runtime surface on one executable:
    CA calls hit the kernel; LUT-log2 magnitude, GOS algorithm, CASH mode and
    shrunken FFT-size registers hit the exact XLA pipeline — all bit-equal to
    the XLA composition, with exactly one compile."""
    cfg = ChainConfig(
        fft=FftConfig(max_size=N, runtime_size=True),
        cfar=CfarConfig(max_ref_window=16, max_guard_window=4,
                        variant=CfarVariant.GOSCA, include_cash=True),
    )
    x = _iq(rng)
    jf = jax.jit(lambda xx, rr: fused_chain_int_op(xx, rr, cfg,
                                                   interpret=True))
    for kw in (dict(),
               dict(cfar_algorithm=1),
               dict(cfar_mode=3, sub_window_size=4),
               dict(mag_mode=3),
               dict(fft_size=N // 2)):
        base = dict(fft_size=N, ref_window_size=8, guard_window_size=2,
                    threshold_scaler=3.0, div_sum=3, index_lagg=4,
                    index_lead=4, sub_window_size=2)
        base.update(kw)
        rt = RuntimeConfig.make(**base)
        _assert_bit_equal(jf(x, rt),
                          _xla_int_chain(x, rt, cfg.fft, cfg.cfar, cfg.mag))
    assert jf._cache_size() == 1


def test_preset_routes_bit_true_to_int_kernel(rng):
    """fft_mag_cfar_chain with a fusable bit-true elaboration builds the ONE
    fused integer stage, and its output equals the stage composition."""
    from rsp_chains_tpu.presets import fft_mag_cfar_chain

    cfg = ChainConfig(
        fft=FftConfig(max_size=N),
        cfar=CfarConfig(max_ref_window=32, max_guard_window=8,
                        variant=CfarVariant.CA, include_cash=False),
        fixed_point=FixedPointConfig(enabled=True, width=16, bin_point=0,
                                     bit_true=True),
    )
    assert int_chain_fusable(cfg)
    chain = fft_mag_cfar_chain(cfg)
    assert chain.stage_names == ("fft_mag_cfar_int_fused",)
    rt = RuntimeConfig.make(fft_size=N, ref_window_size=16,
                            guard_window_size=2, threshold_scaler=3.5,
                            div_sum=4)
    x = _iq(rng)
    got = chain.jit()(x, rt)
    _assert_bit_equal(got, _xla_int_chain(x, rt, cfg.fft, cfg.cfar, cfg.mag))


def test_int_chain_fusable_gates():
    from rsp_chains_tpu.configs import EdgePolicy

    base = dict(fft=FftConfig(max_size=N),
                fixed_point=FixedPointConfig(enabled=True, bit_true=True))
    assert int_chain_fusable(ChainConfig(
        cfar=CfarConfig(max_ref_window=32), **base))
    # pure GOS has no CA datapath for the kernel
    assert not int_chain_fusable(ChainConfig(
        cfar=CfarConfig(max_ref_window=32, variant=CfarVariant.GOS), **base))
    # oversized windows, non-PARTIAL edges, sendCut fall back
    assert not int_chain_fusable(ChainConfig(
        cfar=CfarConfig(max_ref_window=128), **base))
    assert not int_chain_fusable(ChainConfig(
        cfar=CfarConfig(max_ref_window=32, edge_policy=EdgePolicy.WRAP),
        **base))
    assert not int_chain_fusable(ChainConfig(
        cfar=CfarConfig(max_ref_window=32, send_cut=True), **base))
    # bit-reversed-output elaborations keep the XLA stage
    assert not int_chain_fusable(ChainConfig(
        fft=FftConfig(max_size=N, use_bit_reverse=False),
        cfar=CfarConfig(max_ref_window=32),
        fixed_point=FixedPointConfig(enabled=True, bit_true=True)))


# ---------------------------------------------------------------------------
# r5: integer GOS kernel (the reference's shipped GOSCA elaboration at speed)
# ---------------------------------------------------------------------------

GOSCA = CfarConfig(max_ref_window=16, max_guard_window=4,
                   variant=CfarVariant.GOSCA, include_cash=True,
                   max_fft_size=N)


@pytest.mark.slow
@pytest.mark.parametrize("regs", [
    dict(cfar_algorithm=1, cfar_mode=0, mag_mode=2, ref_window_size=8,
         guard_window_size=2, index_lagg=4, index_lead=4, peak_grouping=0),
    dict(cfar_algorithm=1, cfar_mode=0, mag_mode=2, ref_window_size=8,
         guard_window_size=2, index_lagg=4, index_lead=5, peak_grouping=1),
    dict(cfar_algorithm=1, cfar_mode=1, mag_mode=0, ref_window_size=16,
         guard_window_size=4, index_lagg=7, index_lead=2, peak_grouping=0),
    dict(cfar_algorithm=1, cfar_mode=2, mag_mode=1, ref_window_size=4,
         guard_window_size=1, index_lagg=1, index_lead=3, peak_grouping=1),
    dict(cfar_algorithm=0, cfar_mode=0, mag_mode=2, ref_window_size=8,
         guard_window_size=2, index_lagg=4, index_lead=4, peak_grouping=1),
])
def test_int_gos_kernel_bit_exact(regs, rng):
    """The r5 integer GOS kernel (sliding-merge ladder on int32 values) must
    be BIT-equal to ops.bit_true.cfar_int across GOS/CA registers, modes,
    magnitudes, unequal ranks, and grouping."""
    from rsp_chains_tpu.kernels.int_chain_pallas import fused_chain_int_gos

    fft_cfg = FftConfig(max_size=N)
    x = _iq(rng)
    rt = RuntimeConfig.make(fft_size=N, threshold_scaler=3.5,
                            div_sum=int(np.log2(regs["ref_window_size"])),
                            sub_window_size=2, **regs)
    got = fused_chain_int_gos(x, rt, fft_cfg, GOSCA, interpret=True)
    want = _xla_int_chain(x, rt, fft_cfg, GOSCA)
    _assert_bit_equal(got, want)


@pytest.mark.slow
def test_int_gos_dispatch_routes_all_register_surfaces(rng):
    """fused_chain_int_op on a GOSCA elaboration: CA registers -> CA kernel,
    GOS registers -> the r5 GOS kernel, CASH mode / LUT-log2 / shrunken-size
    registers -> the XLA integer path — all bit-equal, ONE executable."""
    cfg = ChainConfig(fft=FftConfig(max_size=N), cfar=GOSCA)
    x = _iq(rng)
    jf = jax.jit(lambda a, r: fused_chain_int_op(a, r, cfg, interpret=True))
    cases = [
        dict(cfar_algorithm=1, cfar_mode=0, mag_mode=2,
             index_lagg=4, index_lead=4),
        dict(cfar_algorithm=1, cfar_mode=3, mag_mode=2,
             index_lagg=4, index_lead=4),                      # CASH -> XLA
        dict(cfar_algorithm=0, cfar_mode=0, mag_mode=2),       # CA kernel
        dict(cfar_algorithm=1, cfar_mode=1, mag_mode=3,
             index_lagg=2, index_lead=6),                      # LUT -> XLA
    ]
    for kw in cases:
        rt = RuntimeConfig.make(fft_size=N, ref_window_size=8,
                                guard_window_size=2, threshold_scaler=3.5,
                                div_sum=3, sub_window_size=2,
                                peak_grouping=1, **kw)
        _assert_bit_equal(jf(x, rt),
                          _xla_int_chain(x, rt, cfg.fft, cfg.cfar, cfg.mag))
    assert jf._cache_size() == 1   # register flips never recompile
