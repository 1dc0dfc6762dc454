"""Single-kernel range-Doppler CPI chain (BASELINE config 3, the flagship).

The XLA pipeline (``presets.range_doppler_chain``: matched filter -> Doppler
FFT -> logmag -> CFAR) round-trips the CPI through HBM at least five times —
three four-step FFT evaluations for the matched filter, a transposed pulse-axis
FFT, and the mag+CFAR tail. This kernel processes one whole [P, N] channel CPI
per grid step with everything VMEM-resident: the only HBM traffic is one read
of the IQ pair and one write of threshold + peaks.

Two structural wins over a stage-by-stage translation:

1. **The matched filter never leaves block order.** The four-step FFT's
   output interleave (the r2 headline kernel's single most expensive VPU/MXU
   item at 0.40 ms/CPI) is skipped on BOTH sides: the forward transform stops
   at block order (pass 1 -> folded-twiddle DFT-128 pass), the reference
   spectrum H is host-permuted into block order, and the inverse transform is
   the STRUCTURAL inverse (per-block conj-DFT-128 with the conj twiddle folded
   on the output side, then conj radix-n1 butterflies across blocks), which
   reads block order and writes natural time order directly:
       F = P·C·T·B  =>  F⁻¹·P = B⁻¹·T⁻¹·C⁻¹ — no permutation anywhere.
2. **The Doppler FFT is one dense DFT matmul along sublanes.** The pulse axis
   (P ≤ 512) lives on sublanes, so the slow-time transform is D @ Y with a
   [P, P] DFT-matrix constant — an ideal MXU shape — with the Doppler window
   folded into D's columns, fftshift into its row order, and the DIV_N scaling
   into its values. No transposes, no per-stage passes.

The CA/GO/SO CFAR body and its register file are shared with the headline
chain kernel (``cfar_pallas._ca_cfar_into``; reference register semantics
``RspChainVanillaTester.scala:113-146``). GOS/CASH elaborations use
``emit='map'`` (the complex RD map out, one extra HBM round trip) feeding the
VMEM-sort kernel — routing decided by ``presets.range_doppler_chain``.

Accuracy: every matmul is the two-term bf16 split (``dot_impl='bf16x2'``,
see ``chain_pallas._dot_pass3`` — Mosaic's "f32" dots are single-pass bf16),
~1e-5 relative through the 4 MXU passes; the ``'bf16'`` switch is the fast
low-precision A/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..configs import (
    CfarConfig,
    ChainConfig,
    DopplerConfig,
    FftScaling,
    MatchedFilterConfig,
    RuntimeConfig,
)
from ..ops.cfar import CfarOutput
from .cfar_pallas import (
    PAD,
    _bits_for,
    _ca_cfar_into,
    _ca_cfar_into_lean,
    _magnitude,
)
from .chain_pallas import (
    _chain_consts_folded,
    _chain_scalars,
    _dft_blocks,
    _dot_pass3,
    _sinv_map,
)

RD_ROW_GROUP = 128   # matched-filter row tile (pulses per pass-1/3 sweep)
RD_COL_TILE = 256    # Doppler matmul column tile (range bins per D @ Y slab)


# ---------------------------------------------------------------------------
# host constants
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _inv_folded(n: int, split_bf16: bool = True):
    """Structural-inverse pass-3 constants: per block k1,
    Winv_k1[k2, m2] = exp(+2πi·k2·m2/128) · exp(+2πi·k1·m2/n) / n — the
    conj-DFT-128 with the conjugate four-step twiddle folded as a COLUMN scale
    (it multiplies the matmul's output index m2) and the full 1/n inverse
    scale. Gauss triple layout matching ``chain_pallas._chain_consts_folded``:
    [n1, 6, 128, 128] bf16 (hi triple then lo residual triple), or
    [n1, 3, 128, 128] f32."""
    n1 = n // 128
    k2 = np.arange(128)[:, None]
    m2 = np.arange(128)[None, :]
    f128_inv = np.exp(2j * np.pi * k2 * m2 / 128) / n
    blocks = []
    for k1 in range(n1):
        tw_c = np.exp(2j * np.pi * k1 * np.arange(128) / n)
        d = f128_inv * tw_c[None, :]
        wr = d.real.astype(np.float32)
        wi = d.imag.astype(np.float32)
        blocks.append(np.stack([wr, wi, wr + wi]))
    stacked = np.stack(blocks)
    if split_bf16:
        import ml_dtypes

        hi = stacked.astype(ml_dtypes.bfloat16)
        lo = (stacked - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return np.concatenate([hi, lo], axis=1)
    return stacked


def _h_natural(taps: np.ndarray, n: int, normalize: bool) -> np.ndarray:
    """Matched-filter reference spectrum H = conj(FFT_n(pad(taps)))[/||taps||]
    in natural bin order (complex128 host constant). Matches
    ``ops.matched_filter.matched_filter`` (``hf = FFT(pad(taps)).conj()``,
    optional 1/||taps|| normalization) — the single source for the collapsed
    ``spectral_mf`` preset stage and the in-kernel block-order operands."""
    t = np.asarray(taps).astype(np.complex128)
    assert t.ndim == 1 and t.shape[0] <= n
    h = np.conj(np.fft.fft(t, n))
    if normalize:
        h = h / max(np.sqrt(np.sum(np.abs(t) ** 2)), 1e-30)
    return h


def _h_block(taps: np.ndarray, n: int, normalize: bool) -> np.ndarray:
    """``_h_natural`` permuted into the four-step BLOCK order (lane j holds H
    of natural bin sinv(j)), so the in-kernel spectral multiply needs no
    interleave. Returns [2, n] f32 (re, im)."""
    h = _h_natural(taps, n, normalize)
    n1 = n // 128
    hb = h[np.asarray(_sinv_map(n, n1))]
    return np.stack([hb.real, hb.imag]).astype(np.float32)


def rd_fusable(cfg: ChainConfig, taps) -> bool:
    """Whether this elaboration + replica fit the fused RD kernel's
    constraints — the single eligibility predicate shared by
    ``presets.range_doppler_chain`` and ``parallel.sharded.
    make_sharded_rd_pipeline`` (and mirrored by ``fused_rd_chain``'s own
    asserts): frame length a {2,4,8}·128 four-step shape, pulse count a power
    of two in [8, 512] (the dense [P, P] Doppler operand; 512 raises the
    scoped-VMEM budget), frequency-domain frame-sized matched filter, replica
    no longer than the frame."""
    mf_cfg = cfg.matched_filter
    dop_cfg = cfg.doppler
    if mf_cfg is None or dop_cfg is None:
        return False
    n = cfg.fft.max_size
    p = dop_cfg.num_pulses
    return (
        n % 128 == 0 and n // 128 in (2, 4, 8)
        and (p & (p - 1)) == 0 and 8 <= p <= 512
        and mf_cfg.method == "freq"
        and np.asarray(taps).shape[-1] <= n
        # the in-kernel CFAR's circular scratch pad bound (mirrors the
        # fused_rd_chain assert — eligibility must imply the call succeeds)
        and cfg.cfar.max_ref_window + cfg.cfar.max_guard_window + 1 <= PAD
    )


@functools.lru_cache(maxsize=None)
def _doppler_triple(p: int, window: str | None, fft_shift: bool,
                    scaling: FftScaling, split_bf16: bool = True):
    """The slow-time transform as ONE dense constant: D[k, j] =
    exp(-2πi·k'·j/p) · win[j] · scale with k' = (k + p/2) mod p when
    ``fft_shift`` (output row k holds centered Doppler bin k − p/2 — the
    fftshift is a row reorder of the matrix, free). Gauss triple
    (Dr, Di, Dr+Di), bf16 hi/lo split: [6, p, p] (or [3, p, p] f32)."""
    from ..ops.windows import window as make_window

    k = np.arange(p)[:, None]
    if fft_shift:
        k = (k + p // 2) % p
    j = np.arange(p)[None, :]
    d = np.exp(-2j * np.pi * k * j / p)
    d = d * make_window(window, p).astype(np.float64)[None, :]
    if scaling is FftScaling.DIV_N:
        d = d / p
    elif scaling is FftScaling.SQRT_N:
        d = d / np.sqrt(p)
    dr = d.real.astype(np.float32)
    di = d.imag.astype(np.float32)
    triple = np.stack([dr, di, dr + di])
    if split_bf16:
        import ml_dtypes

        hi = triple.astype(ml_dtypes.bfloat16)
        lo = (triple - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return np.concatenate([hi, lo], axis=0)
    return triple


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _dot_left(d_ref, yr, yi, dot_impl: str):
    """Complex left-multiply (D @ y) with the Gauss identity
    (re, im) = (t1 − t2, t3 − t1 − t2), t1 = Dr@yr, t2 = Di@yi,
    t3 = (Dr+Di)@(yr+yi); bf16 two-term split of the data when 'bf16x2'."""
    if dot_impl == "bf16x2":
        def split(a):
            hi = a.astype(jnp.bfloat16)
            lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        def dot2(wh, wl, ah, al):
            return (jnp.dot(wh, ah, preferred_element_type=jnp.float32)
                    + jnp.dot(wh, al, preferred_element_type=jnp.float32)
                    + jnp.dot(wl, ah, preferred_element_type=jnp.float32))

        yrh, yrl = split(yr)
        yih, yil = split(yi)
        ysh, ysl = split(yr + yi)
        t1 = dot2(d_ref[0], d_ref[3], yrh, yrl)
        t2 = dot2(d_ref[1], d_ref[4], yih, yil)
        t3 = dot2(d_ref[2], d_ref[5], ysh, ysl)
    else:  # 'bf16': single-pass (fast/low-precision A/B)
        t1 = jnp.dot(d_ref[0], yr.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        t2 = jnp.dot(d_ref[1], yi.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        t3 = jnp.dot(d_ref[2], (yr + yi).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return t1 - t2, t3 - t1 - t2


def _mf_rows(xr, xi, wf_ref, wi_ref, h_ref, n1: int, dot_impl: str):
    """Matched filter along the range (lane) axis of a [G, N] row group, all
    in block order: pass 1 -> folded fwd DFT-128 -> ⊙H -> folded inverse
    conj-DFT-128 -> conj pass 1. Returns (y_re, y_im) in natural time order."""
    xrb = [xr[:, 128 * m1 : 128 * (m1 + 1)] for m1 in range(n1)]
    xib = [xi[:, 128 * m1 : 128 * (m1 + 1)] for m1 in range(n1)]
    ar, ai = _dft_blocks(xrb, xib)                       # fwd pass 1
    dr_blocks, di_blocks = [], []
    for k1 in range(n1):
        cr, ci = _dot_pass3(ar[k1], ai[k1], wf_ref[k1], dot_impl)
        hr = h_ref[0, 128 * k1 : 128 * (k1 + 1)]
        hi = h_ref[1, 128 * k1 : 128 * (k1 + 1)]
        tr = cr * hr - ci * hi                           # spectral ⊙ H
        ti = cr * hi + ci * hr
        dr, di = _dot_pass3(tr, ti, wi_ref[k1], dot_impl)  # inverse pass 3
        dr_blocks.append(dr)
        di_blocks.append(di)
    yr, yi = _dft_blocks(dr_blocks, di_blocks, sign=+1)  # inverse pass 1
    return jnp.concatenate(yr, axis=1), jnp.concatenate(yi, axis=1)


def _rd_front(xr_ref, xi_ref, wf_ref, wi_ref, h_ref, d_ref, thr_ref, pk_ref,
              y_scr, mag_mode, *, n: int, n1: int, p: int, row_group: int,
              col_tile: int, dot_impl: str, emit: str):
    """Matched filter + Doppler transform, leaving the magnitude map in
    ``thr_ref`` (or, ``emit='map'``, the complex RD pair in thr/pk refs).
    Shared by the 1-D-CFAR and 2-D-CFAR RD kernels."""
    # ---- matched filter along range, in row groups of pulses ----
    for g in range(p // row_group):
        sl = slice(g * row_group, (g + 1) * row_group)
        yr, yi = _mf_rows(xr_ref[sl, :], xi_ref[sl, :], wf_ref, wi_ref, h_ref,
                          n1, dot_impl)
        thr_ref[sl, :] = yr
        y_scr[sl, :n] = yi

    # ---- Doppler DFT along pulses (sublanes), column-tiled; the magnitude
    # lands straight in thr_ref so the complex RD map never materializes ----
    for t in range(n // col_tile):
        cs = pl.ds(t * col_tile, col_tile)
        rr, ri = _dot_left(d_ref, thr_ref[:, cs], y_scr[:, cs], dot_impl)
        if emit == "map":
            thr_ref[:, cs] = rr
            pk_ref[:, cs] = ri
        else:
            thr_ref[:, cs] = _magnitude(rr, ri, mag_mode)


def _rd_kernel(
    scal_ref, fscal_ref,
    xr_ref, xi_ref,          # [P, N] one channel's CPI (IQ pair)
    wf_ref,                  # [n1, 6, 128, 128] bf16 fwd folded consts
    wi_ref,                  # [n1, 6, 128, 128] bf16 inverse folded consts
    h_ref,                   # [2, N] f32 block-order MF reference spectrum
    d_ref,                   # [6, P, P] bf16 Doppler DFT Gauss triple (hi/lo)
    thr_ref, pk_ref,         # [P, N] outputs
    y_scr,                   # [P, N + PAD] f32 scratch (see below)
    *,
    n: int, n1: int, p: int, row_group: int, col_tile: int, dot_impl: str,
    emit: str, lag_bits: int, lead2_bits: int, tail_impl: str = "lean",
):
    """VMEM budget: the compressed-pulse pair is stored as yr -> ``thr_ref``
    (each Doppler column tile reads its slice then overwrites it — value
    semantics make the read-then-write safe) and yi -> ``y_scr[:, :n]``, whose
    buffer is then REUSED as the CFAR circular working row ([P, N + PAD]) once
    the Doppler loop has consumed the pulses. No dedicated RD-map buffers."""
    mag_mode = scal_ref[7]
    _rd_front(xr_ref, xi_ref, wf_ref, wi_ref, h_ref, d_ref, thr_ref, pk_ref,
              y_scr, mag_mode, n=n, n1=n1, p=p, row_group=row_group,
              col_tile=col_tile, dot_impl=dot_impl, emit=emit)
    if emit == "map":
        return

    # ---- CA/GO/SO CFAR along range per Doppler bin (shared gated body) ----
    mag = thr_ref[:, :]
    if tail_impl == "lean":
        _ca_cfar_into_lean(mag, scal_ref, fscal_ref, thr_ref, pk_ref, y_scr,
                           n, lag_bits=lag_bits, lead2_bits=lead2_bits)
    else:
        _ca_cfar_into(mag, scal_ref, fscal_ref, thr_ref, pk_ref, y_scr, n,
                      lag_bits=lag_bits, lead2_bits=lead2_bits)


# ---------------------------------------------------------------------------
# fused 2-D (range x Doppler) CA-CFAR (VERDICT r2 item 8)
# ---------------------------------------------------------------------------


def _cbox(x, half, axis: int, max_half: int):
    """In-kernel centered sliding sum over offsets [-half, +half] of runtime
    half-extent along ``axis`` (the Pallas mirror of
    ``ops.cfar_2d._centered_box``): a bit-composed right-aligned dyadic
    ladder + one bit-decomposed recenter roll, on VALUES. The caller provides
    a >= (2·max_half + 2) zero margin on both sides of ``axis``."""
    w = 2 * half + 1
    size = x.shape[axis]
    acc = jnp.zeros_like(x)
    blk = x
    n_bits = max(int(np.ceil(np.log2(2 * max_half + 2))), 1)
    for b in range(n_bits):
        bit = ((w >> b) & 1) == 1
        acc = jnp.where(bit, blk + pltpu.roll(acc, 1 << b, axis=axis), acc)
        if b < n_bits - 1:
            blk = blk + pltpu.roll(blk, 1 << b, axis=axis)
    for b in range(max(int(max_half).bit_length(), 1)):
        acc = jnp.where(((half >> b) & 1) == 1,
                        pltpu.roll(acc, size - (1 << b), axis=axis), acc)
    return acc


def _interval_count(pos, a, lo, hi):
    """|[pos-a, pos+a] ∩ [lo, hi)| — the separable per-axis training count
    (the validity mask is an outer product of two interval indicators, so the
    2-D count plane needs no box sums)."""
    return jnp.maximum(
        jnp.minimum(pos + a, hi - 1) - jnp.maximum(pos - a, lo) + 1, 0
    ).astype(jnp.float32)


def _cfar2d_into(scal_ref, fscal_ref, thr_ref, pk_ref, plane_scr, *,
                 p: int, n: int, pd: int, pr: int,
                 max_ar: int, max_ad: int, max_gr: int, max_gd: int):
    """2-D rectangular-annulus CA-CFAR on the magnitude map sitting in
    ``thr_ref`` [P, N], writing threshold/peaks in place. Same semantics as
    ``ops.cfar_2d.cfar_2d_op`` (PARTIAL edges, true training-count divisor,
    8-neighbour grouping), VMEM-resident: ``plane_scr`` [P+2pd, N+2pr] holds
    the zero-padded map; box sums are value rolls along lanes (range) and
    sublanes (Doppler); the training count is built from the separable
    per-axis interval counts (no box sums over a validity plane).

    2-D register file (scal layout): [w_r, g_r, w_d, g_d, log_or_linear,
    peak_grouping, active_hi, mag_mode, active_lo]; fscal [scaler]."""
    w_r = scal_ref[0]
    g_r = scal_ref[1]
    w_d = scal_ref[2]
    g_d = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    active_hi = scal_ref[6]
    active_lo = scal_ref[8]
    scaler = fscal_ref[0]

    m_raw = thr_ref[:, :]
    rcol = jax.lax.broadcasted_iota(jnp.int32, (p, n), 1)
    active = (rcol >= active_lo) & (rcol < active_hi)
    m = jnp.where(active, m_raw, 0.0)

    plane_scr[:, :] = jnp.zeros((p + 2 * pd, n + 2 * pr), jnp.float32)
    plane_scr[pd : pd + p, pr : pr + n] = m
    x = plane_scr[:, :]

    a_r = g_r + w_r
    a_d = g_d + w_d
    outer = _cbox(_cbox(x, a_r, 1, max_ar), a_d, 0, max_ad)
    inner = _cbox(_cbox(x, g_r, 1, max_gr), g_d, 0, max_gd)
    train_sum = (outer - inner)[pd : pd + p, pr : pr + n]

    dcol = jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
    cnt_out = (_interval_count(rcol, a_r, active_lo, active_hi)
               * _interval_count(dcol, a_d, 0, p))
    cnt_in = (_interval_count(rcol, g_r, active_lo, active_hi)
              * _interval_count(dcol, g_d, 0, p))
    noise = train_sum / jnp.maximum(cnt_out - cnt_in, 1.0)
    thr = jnp.where(log_or_linear == 1, noise * scaler, noise + scaler)
    thr = jnp.where(active, thr, 0.0)
    peaks = (m > thr) & active
    thr_ref[:, :] = thr
    pk_ref[:, :] = peaks.astype(pk_ref.dtype)

    @pl.when(peak_grouping == 1)
    def _():
        # 8-neighbour local maxima: -inf outside the active frame
        ninf = jnp.float32(-jnp.inf)
        pcol = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) - pr
        prow = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) - pd
        in_frame = ((pcol >= active_lo) & (pcol < active_hi)
                    & (prow >= 0) & (prow < p))
        mrow = jnp.where(in_frame, x, ninf)
        pp, pn = x.shape
        is_max = peaks
        for dd in (-1, 0, 1):
            for dr in (-1, 0, 1):
                if dd == 0 and dr == 0:
                    continue
                nb = pltpu.roll(pltpu.roll(mrow, dd % pp, axis=0),
                                dr % pn, axis=1)[pd : pd + p, pr : pr + n]
                is_max = is_max & (m >= nb)
        pk_ref[:, :] = is_max.astype(pk_ref.dtype)


def _rd_kernel_2d(
    scal_ref, fscal_ref,
    xr_ref, xi_ref, wf_ref, wi_ref, h_ref, d_ref,
    thr_ref, pk_ref,
    y_scr,                   # [P, N + PAD] f32 (front-half scratch)
    plane_scr,               # [P + 2*pd, N + 2*pr] f32 (padded map plane)
    *,
    n: int, n1: int, p: int, row_group: int, col_tile: int, dot_impl: str,
    pd: int, pr: int, max_ar: int, max_ad: int, max_gr: int, max_gd: int,
):
    """The flagship RD chain with the 2-D map detector, ONE kernel per CPI:
    matched filter -> Doppler -> magnitude -> 2-D annulus CFAR, everything
    after the input read VMEM-resident (the XLA composition wrote the RD map
    to HBM and re-read it — VERDICT r2 item 8)."""
    mag_mode = scal_ref[7]
    _rd_front(xr_ref, xi_ref, wf_ref, wi_ref, h_ref, d_ref, thr_ref, pk_ref,
              y_scr, mag_mode, n=n, n1=n1, p=p, row_group=row_group,
              col_tile=col_tile, dot_impl=dot_impl, emit="cfar")
    _cfar2d_into(scal_ref, fscal_ref, thr_ref, pk_ref, plane_scr,
                 p=p, n=n, pd=pd, pr=pr, max_ar=max_ar, max_ad=max_ad,
                 max_gr=max_gr, max_gd=max_gd)


def fused_rd_2d_chain(
    x,
    rt: RuntimeConfig,
    rt2,
    taps: np.ndarray,
    cfg: ChainConfig,
    cfg2d,
    interpret: bool = False,
    *,
    dot_impl: str = "bf16x2",
    row_group: int | None = None,
    col_tile: int | None = None,
) -> CfarOutput:
    """Single-kernel RD chain + 2-D CA-CFAR: ``x`` [..., P, N] IQ pair,
    ``rt2`` a ``Cfar2dRuntime`` register record (traced — reconfiguration
    never recompiles). Requires ``rd_fusable`` shapes plus a 2-D window
    reach 2·(max_guard+max_ref)+2 within the lane pad per axis."""
    from ..cplx import as_pair

    mf_cfg = cfg.matched_filter or MatchedFilterConfig()
    dop_cfg = cfg.doppler or DopplerConfig()

    xp = as_pair(x)
    n = xp.shape[-1]
    p = xp.shape[-2]
    n1 = n // 128
    assert n == cfg.fft.max_size and n1 in (2, 4, 8), (n, cfg.fft.max_size)
    assert p == dop_cfg.num_pulses and (p & (p - 1)) == 0 and 8 <= p <= 512, p
    assert mf_cfg.method == "freq", mf_cfg.method
    max_ar = cfg2d.max_ref_range + cfg2d.max_guard_range
    max_ad = cfg2d.max_ref_doppler + cfg2d.max_guard_doppler
    pr = PAD
    assert 2 * max_ar + 2 <= pr, "2-D range reach exceeds the lane pad"
    pd = -(-(2 * max_ad + 2) // 8) * 8          # sublane-aligned Doppler pad

    rg = row_group or min(RD_ROW_GROUP, p)
    ct = col_tile or min(RD_COL_TILE, n)
    assert p % rg == 0 and n % ct == 0

    batch_shape = xp.shape[:-2]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    re = xp.re.astype(jnp.float32).reshape(b * p, n)
    im = xp.im.astype(jnp.float32).reshape(b * p, n)

    # 2-D register file (layout in _cfar2d_into; registers clamped to the
    # elaborated maxima like the 1-D kernels)
    scalars = jnp.stack([
        jnp.clip(rt2.ref_range, 1, cfg2d.max_ref_range).astype(jnp.int32),
        jnp.clip(rt2.guard_range, 0, cfg2d.max_guard_range).astype(jnp.int32),
        jnp.clip(rt2.ref_doppler, 1, cfg2d.max_ref_doppler).astype(jnp.int32),
        jnp.clip(rt2.guard_doppler, 0,
                 cfg2d.max_guard_doppler).astype(jnp.int32),
        rt2.log_or_linear.astype(jnp.int32),
        rt2.peak_grouping.astype(jnp.int32),
        jnp.minimum(rt2.active_range, n).astype(jnp.int32),
        rt.mag_mode.astype(jnp.int32),
        jnp.int32(0),                    # active_lo
    ])
    fscal = rt2.threshold_scaler.astype(jnp.float32).reshape(1)

    split = dot_impl == "bf16x2"
    wf = _chain_consts_folded(n, 1.0, split_bf16=split)
    wi = _inv_folded(n, split_bf16=split)
    h = _h_block(np.asarray(taps), n, mf_cfg.normalize)
    d = _doppler_triple(p, dop_cfg.window, dop_cfg.fft_shift, dop_cfg.scaling,
                        split_bf16=split)

    kernel = functools.partial(
        _rd_kernel_2d, n=n, n1=n1, p=p, row_group=rg, col_tile=ct,
        dot_impl=dot_impl, pd=pd, pr=pr, max_ar=max_ar, max_ad=max_ad,
        max_gr=cfg2d.max_guard_range, max_gd=cfg2d.max_guard_doppler)

    pk_dtype = jnp.uint8 if p >= 32 else jnp.int32
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((p, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wf.shape, lambda i, *_: (0,) * wf.ndim,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wi.shape, lambda i, *_: (0,) * wi.ndim,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(h.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(d.shape, lambda i, *_: (0,) * d.ndim,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((p, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((p, n + PAD), jnp.float32),
                pltpu.VMEM((p + 2 * pd, n + 2 * pr), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * p, n), jnp.float32),
            jax.ShapeDtypeStruct((b * p, n), pk_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(96 if p > 256 else 64) * 1024 * 1024),
        interpret=interpret,
    )(scalars, fscal, re, im, jnp.asarray(wf), jnp.asarray(wi),
      jnp.asarray(h), jnp.asarray(d))

    thr = outs[0].reshape(batch_shape + (p, n))
    pk = outs[1].reshape(batch_shape + (p, n))
    return CfarOutput(threshold=thr, peaks=pk.astype(jnp.bool_))


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def fused_rd_chain(
    x,
    rt: RuntimeConfig,
    taps: np.ndarray,
    cfg: ChainConfig,
    interpret: bool = False,
    *,
    emit: str = "cfar",
    dot_impl: str = "bf16x2",
    row_group: int | None = None,
    col_tile: int | None = None,
    tail_impl: str = "lean",
):
    """Whole range-Doppler chain for CA-family elaborations: ``x`` [..., P, N]
    IQ pair/complex (P = cfg.doppler.num_pulses, N = cfg.fft.max_size),
    returns ``CfarOutput`` over the [..., P, N] range-Doppler map.

    ``emit='map'`` stops after the Doppler transform and returns the complex
    RD map as a ``cplx.C`` pair — the front half for GOS/CASH elaborations,
    whose mag+CFAR runs in the VMEM-sort kernel (``presets`` routes this)."""
    from ..cplx import C, as_pair

    mf_cfg = cfg.matched_filter or MatchedFilterConfig()
    dop_cfg = cfg.doppler or DopplerConfig()
    cfar_cfg = cfg.cfar

    xp = as_pair(x)
    n = xp.shape[-1]
    p = xp.shape[-2]
    n1 = n // 128
    assert n == cfg.fft.max_size and n1 in (2, 4, 8), (n, cfg.fft.max_size)
    assert p == dop_cfg.num_pulses and (p & (p - 1)) == 0 and 8 <= p <= 512, p
    assert cfar_cfg.max_ref_window + cfar_cfg.max_guard_window + 1 <= PAD
    # the kernel implements the circular frequency-domain correlation only —
    # an overlap_save elaboration has linear (zero-history) edge semantics
    # and must keep the stage composition (rd_fusable gates this for presets;
    # direct callers get the same check)
    assert mf_cfg.method == "freq", mf_cfg.method

    rg = row_group or min(RD_ROW_GROUP, p)
    ct = col_tile or min(RD_COL_TILE, n)
    assert p % rg == 0 and n % ct == 0

    batch_shape = xp.shape[:-2]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    re = xp.re.astype(jnp.float32).reshape(b * p, n)
    im = xp.im.astype(jnp.float32).reshape(b * p, n)

    scalars, fscal = _chain_scalars(rt, cfar_cfg, n, None, None)
    split = dot_impl == "bf16x2"
    wf = _chain_consts_folded(n, 1.0, split_bf16=split)
    wi = _inv_folded(n, split_bf16=split)
    h = _h_block(np.asarray(taps), n, mf_cfg.normalize)
    d = _doppler_triple(p, dop_cfg.window, dop_cfg.fft_shift, dop_cfg.scaling,
                        split_bf16=split)

    kernel = functools.partial(
        _rd_kernel, n=n, n1=n1, p=p, row_group=rg, col_tile=ct,
        dot_impl=dot_impl, emit=emit, tail_impl=tail_impl,
        lag_bits=_bits_for(cfar_cfg.max_guard_window + 1),
        lead2_bits=_bits_for(2 * cfar_cfg.max_guard_window
                             + cfar_cfg.max_ref_window + 1))

    # uint8 outputs need the (32, 128) int8-family minimum tile (CLAUDE.md);
    # small-CPI elaborations (8/16 pulses) emit int32 peaks instead
    pk_dtype = jnp.uint8 if p >= 32 else jnp.int32
    out_dtypes = [jnp.float32, jnp.float32 if emit == "map" else pk_dtype]
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((p, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wf.shape, lambda i, *_: (0,) * wf.ndim,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wi.shape, lambda i, *_: (0,) * wi.ndim,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(h.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(d.shape, lambda i, *_: (0,) * d.ndim,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((p, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((p, n + PAD), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * p, n), dt) for dt in out_dtypes
        ],
        # the [P, N] channel tile plus constants exceed XLA's 16 MB default
        # scoped-vmem budget at P=256 (P=512 needs more still); v5e has
        # 128 MB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(96 if p > 256 else 64) * 1024 * 1024),
        interpret=interpret,
    )(scalars, fscal, re, im, jnp.asarray(wf), jnp.asarray(wi),
      jnp.asarray(h), jnp.asarray(d))

    o0 = outs[0].reshape(batch_shape + (p, n))
    o1 = outs[1].reshape(batch_shape + (p, n))
    if emit == "map":
        return C(o0, o1)
    return CfarOutput(threshold=o0, peaks=o1.astype(jnp.bool_))
