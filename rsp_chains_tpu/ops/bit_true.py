"""Bit-true integer chain path — exact 16-bit fixed-point stream emulation.

The reference computes *in* 16-bit fixed point with per-stage truncation:
``FixedPoint(16, 0.BP)`` data, ``expandLogic``/``keepMSBorLSB`` per FFT stage
(``/root/reference/src/main/scala/RspChain.scala:108-118``), RoundHalfUp
(``RspChainVanillaTester.scala:201``), and ±2-LSB golden tolerance
(``RspChainTesterUtils.scala:221-237``). The float fidelity mode
(``chain.py``/``numerics.py``) quantizes only at stage *boundaries*; this module
is the exact-arithmetic emulation: every value is an integer carried in int32,
every divider is an arithmetic shift with round-half-up, and packed int16 wire
streams are bit-exact against the independent numpy golden
(``golden.int_models``), not merely SNR-close.

Arithmetic spec (the DSP submodules are not vendored — the per-operation
ordering below is this framework's documented contract, chosen to match the
hardware conventions that ARE visible: RoundHalfUp everywhere, div-2 keepMSB
per non-expanding FFT stage, 16-bit twiddles/scaler fixed points):

* **FFT** (radix-2 DIF, natural-in / bit-reversed-out + final reorder):
  stage s on blocks of m = N>>s: ``y[j] = x[j] + x[j+m/2]``;
  ``y[j+m/2] = x[j] - x[j+m/2]``; then keepMSB halving ``(v + 1) >> 1`` when
  ``expandLogic[s] == 0`` (BEFORE the twiddle so 16-bit headroom is preserved);
  then the twiddle ``W_m^j`` quantized to 1.15 fixed point
  (``round(cos * 2^15)``, exact unity for W^0), product rounded
  ``(p + 2^14) >> 15``.
* **JPL magnitude**: u = max(|re|,|im|), v = min:
  ``max(u + (v >> 3), u - (u >> 3) + (v >> 1))`` with truncating shifts — the
  shift-add form of the float JPL ``max(u + v/8, 7u/8 + v/2)``.
* **CA CFAR**: integer window sums (exact adds); per-side divider
  ``sum >> divSum`` (non-negative, truncating — the hardware shifter);
  linear threshold ``(noise * round(scaler * 2^6) + 2^5) >> 6``
  (protoScaler FixedPoint(16, 6.BP), ``RspChainVanillaTester.scala:231``);
  log-domain threshold ``noise + round(scaler)``.

All ops are int32 jnp tensors under jit with the usual traced runtime
registers; gather-free (static rolls — the shifts are compile-time constants).
Perf note: this is the conformance path, not the throughput path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CfarConfig, FftConfig, RuntimeConfig
from ..cplx import C
from .cfar import CfarOutput


def rhu(v, k: int):
    """Round-half-up arithmetic right shift: floor((v + 2^(k-1)) / 2^k)."""
    if k == 0:
        return v
    return (v + (1 << (k - 1))) >> k


@functools.lru_cache(maxsize=None)
def stage_twiddles(n: int):
    """Per-stage 1.15 fixed-point twiddle lane vectors for the radix-2 DIF
    pipeline, and the final bit-reversal permutation. Lanes on the 'a' half of
    each butterfly get exact unity (2^15) so one uniform multiply-round per
    stage is exact for them."""
    p = int(np.log2(n))
    i = np.arange(n)
    stages = []
    for s in range(p):
        m = n >> s
        half = m >> 1
        j = i & (half - 1)
        w = np.exp(-2j * np.pi * j / m)
        wr = np.round(w.real * 32768.0).astype(np.int64)
        wi = np.round(w.imag * 32768.0).astype(np.int64)
        b_lane = (i & half) != 0
        wr = np.where(b_lane, wr, 32768)
        wi = np.where(b_lane, wi, 0)
        stages.append((wr.astype(np.int32), wi.astype(np.int32)))
    rev = np.zeros(n, np.int32)
    for k in range(n):
        rev[k] = int(format(k, f"0{p}b")[::-1], 2)
    return stages, rev


def wrap16(v):
    """Trim to the 16-bit two's-complement grid with WRAPAROUND overflow —
    the hardware's keepMSBorLSB = LSB stage trim (the grown MSB is dropped;
    dsptools Wrap overflow)."""
    return ((v + 32768) & 0xFFFF) - 32768


def _fft_int_fixed(xr, xi, n: int, expand_logic: Optional[tuple],
                   keep_msb: Optional[tuple] = None):
    """Static-size integer FFT of the first n lanes; returns int32 pair.

    ``keep_msb[s]`` (default all-True): on a non-expanding stage, True halves
    with RoundHalfUp (keep MSBs — the chains' tested setting); False keeps the
    LSBs with wraparound overflow (``FFTParams.keepMSBorLSB``,
    ``RspChainVanillaTester.scala:214``). LSB stages also wrap the post-
    twiddle product back to the 16-bit proto (their unhalved 17-bit butterfly
    can overflow it; MSB stages cannot)."""
    if expand_logic is not None and sum(1 for e in expand_logic if e) > 7:
        # the split-product twiddle path is int32-exact while the grown data
        # stays within ~23 bits (partial products reach ~46341·2^(8.5+g));
        # beyond 7 expanding stages the exact pipeline needs 64-bit products
        raise ValueError("bit-true FFT supports at most 7 expanding stages")

    def _rhu15_wide(a, b, wa, wb):
        """``rhu(a·wa + b·wb, 15)`` exactly in int32 for data operands wider
        than 16 bits (EXPANDING stages skip the pre-twiddle trim, so the
        direct product a·wa overflows int32 from the first grown stage on):
        an 8-bit split of the data keeps every partial within int32, and the
        floor-shift recombination is exact —
        floor((H·2^8 + T)/2^15) = floor((H + floor(T/2^8))/2^7)."""
        al = a & 255
        ah = (a - al) >> 8
        bl = b & 255
        bh = (b - bl) >> 8
        h = ah * wa + bh * wb
        t = al * wa + bl * wb + (1 << 14)
        return (h + (t >> 8)) >> 7

    stages, rev = stage_twiddles(n)
    grown = 0   # expanding stages so far: the data width grows PERSISTENTLY
    for s, (wr_np, wi_np) in enumerate(stages):
        half = (n >> s) >> 1
        # butterfly via static rolls: a-lanes (bit clear) add their +half
        # partner; b-lanes subtract themselves from their -half partner
        iota = np.arange(n)
        b_lane = jnp.asarray((iota & half) != 0)
        add_r = xr + jnp.roll(xr, -half, axis=-1)
        add_i = xi + jnp.roll(xi, -half, axis=-1)
        sub_r = jnp.roll(xr, half, axis=-1) - xr
        sub_i = jnp.roll(xi, half, axis=-1) - xi
        sr = jnp.where(b_lane, sub_r, add_r)
        si = jnp.where(b_lane, sub_i, add_i)
        lsb_stage = False
        expanding = expand_logic is not None and expand_logic[s]
        if not expanding:
            if keep_msb is None or keep_msb[s]:
                sr, si = rhu(sr, 1), rhu(si, 1)  # keepMSB: halve pre-twiddle
            else:
                sr, si = wrap16(sr), wrap16(si)  # keepLSB: wraparound trim
                lsb_stage = True
        wr = jnp.asarray(wr_np)
        wi = jnp.asarray(wi_np)
        if expanding:
            grown += 1
        if grown:
            # expansion is PERSISTENT: once any stage has grown the data past
            # 16 bits, every later stage's direct int32 product can overflow
            # (a non-expanding trim removes one butterfly bit, not the
            # accumulated growth) — use the split-product path, bit-identical
            # to int64 arithmetic
            xr = _rhu15_wide(sr, si, wr, -wi)
            xi = _rhu15_wide(sr, si, wi, wr)
        else:
            xr = rhu(sr * wr - si * wi, 15)
            xi = rhu(sr * wi + si * wr, 15)
        if lsb_stage:
            xr, xi = wrap16(xr), wrap16(xi)
    rev_j = jnp.asarray(rev)
    return jnp.take(xr, rev_j, axis=-1), jnp.take(xi, rev_j, axis=-1)


def _fft_int_branch(x: C, n: int, cfg: FftConfig) -> C:
    xr = x.re.astype(jnp.int32)[..., :n]
    xi = x.im.astype(jnp.int32)[..., :n]
    el = cfg.expand_logic
    km = cfg.keep_msb_or_lsb
    yr, yi = _fft_int_fixed(xr, xi, n, None if el is None else tuple(el),
                            None if km is None else tuple(km))
    pad = x.shape[-1] - n
    if pad:
        cfgpad = [(0, 0)] * (yr.ndim - 1) + [(0, pad)]
        yr, yi = jnp.pad(yr, cfgpad), jnp.pad(yi, cfgpad)
    return C(yr, yi)


def fft_int_op(
    x: C,
    log2_fft_size: Optional[jnp.ndarray] = None,
    cfg: FftConfig = FftConfig(),
) -> C:
    """Runtime-sized integer FFT stage: same elaborate-max / runtime-register
    contract as ``fft_op`` (lax.switch over compiled log2 sizes), but every
    branch is the exact-arithmetic pipeline above. Input pair values must be
    16-bit integers (int32 or integer-valued float32)."""
    assert x.shape[-1] == cfg.max_size
    if not cfg.runtime_size or log2_fft_size is None:
        return _fft_int_branch(x, cfg.max_size, cfg)
    lo, hi = cfg.min_log2_size, cfg.log2_max
    branches = [functools.partial(_fft_int_branch, n=1 << p, cfg=cfg)
                for p in range(lo, hi + 1)]
    idx = jnp.clip(log2_fft_size - lo, 0, hi - lo)
    return jax.lax.switch(idx, branches, x)


def jpl_mag_int(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    """Integer JPL magnitude (shift-add form, truncating shifts)."""
    ar, ai = jnp.abs(re), jnp.abs(im)
    u, v = jnp.maximum(ar, ai), jnp.minimum(ar, ai)
    return jnp.maximum(u + (v >> 3), u - (u >> 3) + (v >> 1))


def ca_cfar_int(
    mag: jnp.ndarray,
    rt: RuntimeConfig,
    cfg: CfarConfig = CfarConfig(),
) -> CfarOutput:
    """Integer CA/GO/SO CFAR with the exact hardware dividers: window sums by
    dyadic rolls (exact adds), per-side ``>> divSum``, threshold through the
    6-fractional-bit scaler. Peak grouping and active-frame masking follow
    ``cfar_op``. PARTIAL edges, CA family only (the bit-true conformance
    configuration)."""
    mag = mag.astype(jnp.int32)
    n = mag.shape[-1]
    n_active = jnp.minimum(rt.cfar_fft_size, n).astype(jnp.int32)
    g = jnp.clip(rt.guard_window_size, 0, cfg.max_guard_window).astype(jnp.int32)
    w = jnp.minimum(rt.ref_window_size, cfg.max_ref_window).astype(jnp.int32)
    log2w = jnp.round(jnp.log2(jnp.maximum(w, 1).astype(jnp.float32))).astype(jnp.int32)

    cell = jnp.arange(n, dtype=jnp.int32)
    active = cell < n_active
    m = jnp.where(active, mag, 0)
    # pad and dynamic-shift widths derive from the ELABORATED maxima (after
    # the clamps above, g + w <= max_guard + max_ref): a fixed 128/8-bit cap
    # would silently drop high shift bits of large elaborations and take the
    # window sums from the wrong cells
    max_shift = int(cfg.max_ref_window + cfg.max_guard_window)
    padw = max(128, max_shift + 1)
    shift_bits = max(8, max_shift.bit_length())
    z = jnp.zeros(m.shape[:-1] + (padw,), jnp.int32)
    row = jnp.concatenate([z, m, z], axis=-1)
    sel = row
    box = row
    for k in range(int(cfg.max_ref_window).bit_length() - 1):
        box = box + jnp.roll(box, 1 << k, axis=-1)
        sel = jnp.where(log2w == k + 1, box, sel)

    def roll_dyn(xv, s, left=False):
        for k in range(shift_bits):
            sh = -(1 << k) if left else (1 << k)
            xv = jnp.where(((s >> k) & 1) == 1, jnp.roll(xv, sh, axis=-1), xv)
        return xv

    lag = roll_dyn(sel, g + 1)[..., padw : padw + n]
    lead = roll_dyn(sel, g + w, left=True)[..., padw : padw + n]
    div = rt.div_sum.astype(jnp.int32)
    s_lag = jnp.right_shift(lag, div)     # non-negative: truncating shifter
    s_lead = jnp.right_shift(lead, div)
    mode = rt.cfar_mode
    noise = jnp.where(
        mode == 1, jnp.maximum(s_lag, s_lead),
        jnp.where(mode == 2, jnp.minimum(s_lag, s_lead),
                  (s_lag + s_lead) >> 1))

    scaler_q = jnp.round(rt.threshold_scaler * 64.0).astype(jnp.int32)
    thr_lin = rhu(noise * scaler_q, 6)
    thr_log = noise + jnp.round(rt.threshold_scaler).astype(jnp.int32)
    thr = jnp.where(rt.log_or_linear == 1, thr_lin, thr_log)
    thr = jnp.where(active, thr, 0)
    peaks = (mag > thr) & active

    big = jnp.int32(-(1 << 30))
    left_n = jnp.concatenate([jnp.full(mag.shape[:-1] + (1,), big), mag[..., :-1]], -1)
    right_n = jnp.concatenate([mag[..., 1:], jnp.full(mag.shape[:-1] + (1,), big)], -1)
    right_n = jnp.where(cell + 1 < n_active, right_n, big)
    grouped = peaks & (mag >= left_n) & (mag >= right_n)
    peaks = jnp.where(rt.peak_grouping == 1, grouped, peaks)
    return CfarOutput(threshold=thr, peaks=peaks)
