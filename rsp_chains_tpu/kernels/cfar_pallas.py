"""Fused magnitude + CA-family CFAR as a single Pallas TPU kernel.

Why: the chain is HBM-bandwidth-bound (bench: ~640 GB/s effective). The XLA tail
materializes the magnitude array, the prefix-sum array, and two gathered window
sums in HBM between fusions; this kernel reads the complex spectrum once and
writes threshold + peaks once — everything else lives in VMEM.

TPU-native formulation of the sliding reference windows (no gathers, no scans,
no unaligned slices — Mosaic requires lane-dimension slice offsets to be
128-aligned, so *all* runtime-sized window arithmetic is done with lane
rotations):

* Window sums of the (power-of-two, runtime-selected) reference window come from
  **dyadic box sums**: ``S_0 = x``; ``S_{k+1}[i] = S_k[i] + S_k[i - 2^k]`` — six
  static-shift ``pltpu.roll`` + add steps build every power-of-two window sum up
  to 64; the runtime ``refWindowSize`` register picks ``S_{log2 w}`` with a
  flat ``jnp.where`` ladder (all branches are cheap VPU adds).
* The lag/lead window *positions* (shift by runtime ``guard + 1`` / ``guard +
  w``) are **bit-decomposed rotations**: shift-by-s = the composition of
  conditional static rolls by 1, 2, 4, ... selected by the bits of the traced
  shift amount. Static rolls compile to lane shift networks; the selects are
  elementwise.
* A 128-lane zero pad on each side absorbs rotation wrap-around and reproduces
  ``EdgePolicy.PARTIAL`` (partial windows sum fewer cells, divided by the same
  ``divSum`` shifter — the hardware divider semantics,
  ``RspChainVanillaTester.scala:119-122``); the final extraction is a static,
  128-aligned slice.

Runtime registers arrive as scalar-prefetch operands (SMEM), so every register —
window sizes, guard, mode CA/GO/SO, divSum, scaler, log/linear, peak grouping,
active fftSize, magnitude mode — changes per call with no recompilation,
matching the AXI4 control plane. GOS/CASH variants stay on the XLA path
(sort-based; see ``ops.cfar``).

Grid: one program per frame-tile of ``BLOCK_FRAMES`` frames; full frame length in
lanes. Mirrors ``cfar_op``'s CA semantics bit-for-bit (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..configs import CfarConfig, RuntimeConfig
from ..ops.cfar import CfarOutput

BLOCK_FRAMES = 32         # tile: 32 sublanes so the uint8 peaks output meets the
                          # int8-family minimum tile of (32, 128)
MAX_LOG2_W = 6            # dyadic box sums up to 64-cell windows
PAD = 128                 # lane-aligned zero pad per side; must exceed
                          # max window + guard + 1 and every dynamic shift
SHIFT_BITS = 7            # dynamic shifts up to 127


def _roll_right(x, s, bits: int = SHIFT_BITS):
    """Rotate right (toward higher lane index) by traced amount ``s`` via
    bit-decomposed conditional static rolls: out[i] = x[(i - s) mod width].
    ``bits`` bounds the decomposition — callers whose shift is bounded by
    elaborated maxima pass fewer bits, dropping whole roll+select steps."""
    for k in range(bits):
        bit = ((s >> k) & 1) == 1
        x = jnp.where(bit, pltpu.roll(x, 1 << k, axis=1), x)
    return x


def _roll_left(x, s, bits: int = SHIFT_BITS):
    """Rotate left by traced ``s``: out[i] = x[(i + s) mod width]."""
    width = x.shape[-1]
    for k in range(bits):
        bit = ((s >> k) & 1) == 1
        x = jnp.where(bit, pltpu.roll(x, width - (1 << k), axis=1), x)
    return x


def _bits_for(max_value: int) -> int:
    """Number of shift bits needed for runtime shifts ≤ ``max_value``."""
    return max(int(np.ceil(np.log2(max_value + 1))), 1)


def _roll_right_gated(ref, s, bits: int):
    """In-place rotate right of a VMEM row tile by traced ``s``: each
    bit-decomposition step runs under ``pl.when`` on its bit, so a step whose
    bit is clear costs NOTHING — vs the value-based ``_roll_right`` whose every
    step pays roll+select whether or not the bit is set (r2l: the CA body is
    pure VPU passes; fewer/narrower passes are the whole game)."""
    for k in range(bits):
        @pl.when(((s >> k) & 1) == 1)
        def _(k=k):
            ref[:, :] = pltpu.roll(ref[:, :], 1 << k, axis=1)


def _roll_left_gated(ref, s, bits: int):
    """In-place gated rotate left (see ``_roll_right_gated``)."""
    width = ref.shape[-1]
    for k in range(bits):
        @pl.when(((s >> k) & 1) == 1)
        def _(k=k):
            ref[:, :] = pltpu.roll(ref[:, :], width - (1 << k), axis=1)


MAG_PASSTHROUGH = 4       # mag_mode register value: input re IS the magnitude
                          # (set by the RDMA-halo tail, which computes the
                          # magnitude inside kernels/pallas_halo.py overlapped
                          # with the inter-chip halo DMA)


def _magnitude(re, im, mag_mode):
    """The fused logMagMux menu (VPU): abs / sqr / JPL / log2(JPL), plus the
    internal passthrough code (input already a magnitude row)."""
    ar, ai = jnp.abs(re), jnp.abs(im)
    u, v = jnp.maximum(ar, ai), jnp.minimum(ar, ai)
    jpl = jnp.maximum(u + 0.125 * v, 0.875 * u + 0.5 * v)
    sqr = re * re + im * im
    absm = jnp.sqrt(sqr)
    log2m = jnp.log2(jnp.maximum(jpl, 1e-30))
    return jnp.where(
        mag_mode == 0, absm,
        jnp.where(mag_mode == 1, sqr,
                  jnp.where(mag_mode == 2, jpl,
                            jnp.where(mag_mode == 3, log2m, re))))


def _magnitude_into(out_ref, re, im, mag_mode):
    """``_magnitude`` with the transcendental modes (abs = sqrt, log2) gated
    behind ``pl.when`` on the runtime mode register, so the sqrt/log pipelines
    only execute when actually selected — a flat ``jnp.where`` ladder evaluates
    every branch every call (r2j: the 4-way ladder burns VPU on sqrt+log even
    for the JPL deployment default). Writes into ``out_ref`` (an output block
    doubling as scratch) and returns the loaded value."""
    ar, ai = jnp.abs(re), jnp.abs(im)
    u, v = jnp.maximum(ar, ai), jnp.minimum(ar, ai)
    jpl = jnp.maximum(u + 0.125 * v, 0.875 * u + 0.5 * v)
    out_ref[:, :] = jnp.where(
        mag_mode == 1, re * re + im * im,
        jnp.where(mag_mode == 2, jpl, re))

    @pl.when(mag_mode == 0)
    def _():
        out_ref[:, :] = jnp.sqrt(re * re + im * im)

    @pl.when(mag_mode == 3)
    def _():
        out_ref[:, :] = jnp.log2(jnp.maximum(jpl, 1e-30))

    return out_ref[:, :]


def _ca_cfar_body(mag, scal_ref, fscal_ref, n: int,
                  lag_bits: int = SHIFT_BITS, lead_bits: int = SHIFT_BITS):
    """The CA/GO/SO CFAR datapath on a magnitude tile [F, N] (values only).
    Returns (threshold f32 [F, N], peaks u8 [F, N]). Shared by the spectrum
    kernel (`_kernel`) and the fully-fused FFT chain kernel
    (kernels/chain_pallas.py).

    ``lag_bits``/``lead_bits`` bound the runtime-rotation decompositions by the
    elaborated maxima (lag shift ≤ max_guard+1, lead ≤ max_guard+max_ref) —
    the registers are clamped to those maxima before entering the kernel."""
    log2w = scal_ref[0]
    guard = scal_ref[1]
    div = scal_ref[2]
    mode = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    active_hi = scal_ref[6]
    active_lo = scal_ref[8]
    scaler = fscal_ref[0]
    f = mag.shape[0]

    # mask cells outside the active range [active_lo, active_hi) — the runtime
    # fftSize register for a standalone frame, or the halo-offset window of the
    # global frame on a range-sharded block (parallel.sharded)
    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    active = (col >= active_lo) & (col < active_hi)
    mag = jnp.where(active, mag, 0.0)

    # ---- dyadic box sums in a zero-padded row (all in registers/VMEM) ----
    zpad = jnp.zeros((f, PAD), jnp.float32)
    row = jnp.concatenate([zpad, mag, zpad], axis=1)     # [F, N + 2*PAD]
    sel = row                                            # box width 1
    box = row
    for k in range(MAX_LOG2_W):
        # box width 2^(k+1): add a copy rotated right by 2^k; the wrapped-in far
        # right cells are zero pads (total box reach 63 < PAD)
        box = box + pltpu.roll(box, 1 << k, axis=1)
        sel = jnp.where(log2w == k + 1, box, sel)
    # sel[j] = sum mag-row[j - w + 1 .. j]

    # ---- lag/lead window sums: runtime rotations ----
    w = (jnp.int32(1) << log2w)
    lag_row = _roll_right(sel, guard + 1, lag_bits)   # lag(i) = sel[i-guard-1]
    lead_row = _roll_left(sel, guard + w, lead_bits)  # lead(i) = sel[i+guard+w]
    lag = lag_row[:, PAD : PAD + n]           # static 128-aligned slice
    lead = lead_row[:, PAD : PAD + n]

    inv_div = jnp.exp2(-div.astype(jnp.float32))
    s_lag = lag * inv_div
    s_lead = lead * inv_div
    noise = jnp.where(
        mode == 1, jnp.maximum(s_lag, s_lead),
        jnp.where(mode == 2, jnp.minimum(s_lag, s_lead),
                  0.5 * (s_lag + s_lead)),
    )
    thr = jnp.where(log_or_linear == 1, noise * scaler, noise + scaler)
    thr = jnp.where(active, thr, 0.0)

    peaks = (mag > thr) & active

    # peak grouping: local maxima only; neighbors via static +/-1 rotations of a
    # -inf padded row so frame edges compare against -inf
    ninf = jnp.float32(-jnp.inf)
    mrow = jnp.concatenate(
        [jnp.full((f, PAD), ninf), jnp.where(active, mag, ninf),
         jnp.full((f, PAD), ninf)], axis=1)
    left = pltpu.roll(mrow, 1, axis=1)[:, PAD : PAD + n]
    right = pltpu.roll(mrow, mrow.shape[1] - 1, axis=1)[:, PAD : PAD + n]
    grouped = peaks & (mag >= left) & (mag >= right)
    # Mosaic cannot legalize selects on i1 vectors — select in uint8 domain
    pk_u8 = jnp.where(peak_grouping == 1, grouped.astype(jnp.uint8),
                      peaks.astype(jnp.uint8))
    return thr, pk_u8


def _ca_cfar_into(mag, scal_ref, fscal_ref, thr_ref, pk_ref, scr, n: int,
                  lag_bits: int, lead2_bits: int,
                  max_log2w: int = MAX_LOG2_W):
    """Runtime-GATED CA/GO/SO CFAR datapath writing straight into the output
    refs, with the working row living in the VMEM scratch ``scr``
    ([F, N + PAD] f32 — ONE pad block, used circularly).

    Same math as ``_ca_cfar_body`` (bit-identical: rolls are exact lane
    permutations and the box-sum addition order is unchanged), but every
    bit-decomposition step, every dyadic box doubling past the runtime window
    width, and the whole peak-grouping tail run under ``pl.when`` on the
    register values — steps that don't apply this call cost nothing. The lead
    row is produced by rolling the lag row onward (net left ``guard + w`` from
    the box row), so ``lead2_bits`` must cover ``2·max_guard + max_ref + 1``.

    Why one pad block suffices: the row is CIRCULAR under ``pltpu.roll``, and
    a circular window sum equals the zero-extended linear one whenever the
    window never spans both ends of the data through the pad — the 128 zeros
    between mag[n-1] and mag[0] guarantee that for windows ≤ max_ref ≤ 64.
    Wrapped box values landing in pad lanes [0, w) are exactly the virtual
    right-extension sums the lead window reads back through the wrap, and pad
    lanes [64, 128) stay true zero for the lag window's left extension."""
    log2w = scal_ref[0]
    guard = scal_ref[1]
    div = scal_ref[2]
    mode = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    active_hi = scal_ref[6]
    active_lo = scal_ref[8]
    scaler = fscal_ref[0]
    f = mag.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    active = (col >= active_lo) & (col < active_hi)
    mag = jnp.where(active, mag, 0.0)

    # ---- circular working row [pad | mag] in scratch; gated box build ----
    scr[:, :PAD] = jnp.zeros((f, PAD), jnp.float32)
    scr[:, PAD : PAD + n] = mag
    for k in range(max_log2w):
        @pl.when(log2w > k)
        def _(k=k):
            row = scr[:, :]
            scr[:, :] = row + pltpu.roll(row, 1 << k, axis=1)
    # scr[j] = sum mag-row[j - w + 1 .. j]

    # ---- lag, then lead by rolling the SAME row onward ----
    _roll_right_gated(scr, guard + 1, lag_bits)
    lag = scr[:, PAD : PAD + n]               # load: value survives the rolls
    w = jnp.int32(1) << log2w
    _roll_left_gated(scr, 2 * guard + w + 1, lead2_bits)
    lead = scr[:, PAD : PAD + n]

    inv_div = jnp.exp2(-div.astype(jnp.float32))
    s_lag = lag * inv_div
    s_lead = lead * inv_div
    noise = jnp.where(
        mode == 1, jnp.maximum(s_lag, s_lead),
        jnp.where(mode == 2, jnp.minimum(s_lag, s_lead),
                  0.5 * (s_lag + s_lead)),
    )
    thr = jnp.where(log_or_linear == 1, noise * scaler, noise + scaler)
    thr_ref[:, :] = jnp.where(active, thr, 0.0)

    peaks = (mag > thr) & active
    # cast to the ref's dtype: uint8 normally; int32 for callers whose row
    # count is below the (32, 128) int8-family minimum tile (rd_pallas)
    pk_ref[:, :] = peaks.astype(pk_ref.dtype)

    @pl.when(peak_grouping == 1)
    def _():
        # local maxima via width-N wraparound rolls with explicit edge fixes
        # (frame edges compare against -inf, like _ca_cfar_body's padded row)
        ninf = jnp.float32(-jnp.inf)
        m = jnp.where(active, mag, ninf)
        left = jnp.where(col == 0, ninf, pltpu.roll(m, 1, axis=1))
        right = jnp.where(col == n - 1, ninf, pltpu.roll(m, n - 1, axis=1))
        grouped = peaks & (mag >= left) & (mag >= right)
        pk_ref[:, :] = grouped.astype(pk_ref.dtype)


def _ca_cfar_into_lean(mag, scal_ref, fscal_ref, thr_ref, pk_ref, scr, n: int,
                       lag_bits: int, lead2_bits: int,
                       max_log2w: int = MAX_LOG2_W,
                       words_ref=None, bin_width: int = 0,
                       words_ablate_pack: bool = False):
    """The r4 'lean' CA/GO/SO tail: same box-sum/roll machinery as
    ``_ca_cfar_into`` but with the ~6 threshold/peak elementwise passes
    (VERDICT r3 weak-2: ~20% of the CA body) collapsed:

    * the power-of-two CA divider 2^-divSum, the CA-mean 1/2, and (linear
      mode) the threshold scaler fold into ONE scalar coefficient, so the
      whole threshold is a single multiply-add pass — BIT-IDENTICAL to the
      classic body because scaling by a power of two is exact and commutes
      with every rounding step, and max/min commute with positive scaling;
    * the CA/GO/SO mode select is three ``pl.when`` branches writing
      ``thr_ref`` directly (one executes) instead of a value ladder that
      evaluates max AND min AND mean every call;
    * the active-range masking (runtime cfar fftSize / sharded halo offsets)
      runs only on the non-full-frame path — the deployment hot path
      (active = [0, n)) pays zero masking passes, exact because
      ``where(active, x, 0) == x`` there;
    * peaks are emitted ONCE under the grouping register (the classic body
      wrote ungrouped peaks and overwrote them when grouping was on);
    * ``words_ref``: emit packed ``{threshold | bin | peak}`` wire words
      (``RspChainVanillaTester.scala:164-172``) straight from the peak pass —
      the ``fused_chain_ca_packed`` tail without the thr/pk scratch
      round-trips and standalone pack passes (VERDICT r3 item 3). ``pk_ref``
      is unused then; ``thr_ref`` is an [F, N] f32 scratch."""
    log2w = scal_ref[0]
    guard = scal_ref[1]
    div = scal_ref[2]
    mode = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    active_hi = scal_ref[6]
    active_lo = scal_ref[8]
    scaler = fscal_ref[0]
    f = mag.shape[0]

    full = (active_lo <= 0) & (active_hi >= n)
    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)

    scr[:, :PAD] = jnp.zeros((f, PAD), jnp.float32)
    # the magnitude store stays UNGATED (masked always): gating it under
    # pl.when(full) alongside the gated emit below crashes the Mosaic
    # backend (r4 probe: compile-helper subprocess abort at any grid >= 2;
    # either conditional alone compiles — see docs/KERNELS.md §1b)
    active = (col >= active_lo) & (col < active_hi)
    scr[:, PAD : PAD + n] = jnp.where(active, mag, 0.0)

    # gated dyadic box build + lag/lead rolls: identical to _ca_cfar_into
    for k in range(max_log2w):
        @pl.when(log2w > k)
        def _(k=k):
            row = scr[:, :]
            scr[:, :] = row + pltpu.roll(row, 1 << k, axis=1)
    _roll_right_gated(scr, guard + 1, lag_bits)
    lag = scr[:, PAD : PAD + n]
    w = jnp.int32(1) << log2w
    _roll_left_gated(scr, 2 * guard + w + 1, lead2_bits)
    lead = scr[:, PAD : PAD + n]

    # scalar folds: thr = combine(lag, lead) * c + a. Exactness argument:
    # inv_div = 2^-div and the CA 1/2 are powers of two (scaling by them is
    # exact and commutes with the rounding of +, so (lag+lead)*(d/2) ==
    # 0.5*(lag*d + lead*d) bitwise); c_pair = d*scaler is exact (power-of-two
    # times float shifts the exponent only), so x*(d*scaler) == (x*d)*scaler
    # bitwise whenever x*d is exact — it is, for x ∈ {lag, lead, max, min,
    # lag+lead rounded}. Log mode: x*d exact, + scaler rounds once — same as
    # the classic (x*d) + scaler.
    inv_div = jnp.exp2(-div.astype(jnp.float32))
    is_lin = log_or_linear == 1
    c_pair = jnp.where(is_lin, inv_div * scaler, inv_div)
    a_term = jnp.where(is_lin, jnp.float32(0.0), scaler)

    @pl.when((mode != 1) & (mode != 2))        # CA (and the mode-3 default)
    def _():
        thr_ref[:, :] = (lag + lead) * (0.5 * c_pair) + a_term

    @pl.when(mode == 1)                        # GO
    def _():
        thr_ref[:, :] = jnp.maximum(lag, lead) * c_pair + a_term

    @pl.when(mode == 2)                        # SO
    def _():
        thr_ref[:, :] = jnp.minimum(lag, lead) * c_pair + a_term

    thr = thr_ref[:, :]
    ninf = jnp.float32(-jnp.inf)

    def _emit(masked: bool):
        if masked:
            m = jnp.where(active, mag, 0.0)
            thr_m = jnp.where(active, thr, 0.0)
            pk = (m > thr_m) & active
        else:
            m = mag
            thr_m = thr
            pk = m > thr

        if words_ref is None:
            if masked:
                thr_ref[:, :] = thr_m

            @pl.when(peak_grouping == 0)
            def _():
                pk_ref[:, :] = pk.astype(pk_ref.dtype)

            @pl.when(peak_grouping == 1)
            def _():
                mm = jnp.where(active, mag, ninf) if masked else m
                left = jnp.where(col == 0, ninf, pltpu.roll(mm, 1, axis=1))
                right = jnp.where(col == n - 1, ninf,
                                  pltpu.roll(mm, n - 1, axis=1))
                pk_ref[:, :] = (pk & (m >= left)
                                & (m >= right)).astype(pk_ref.dtype)
        else:
            # {threshold | bin | peak} word — identical packing to the
            # classic _chain_kernel_packed epilogue
            if words_ablate_pack:     # profiling-only: word assembly ablated
                base = thr_m.astype(jnp.int32)
            else:
                thr_i = jnp.clip(thr_m, 0.0,
                                 float((1 << (31 - bin_width)) - 1)).astype(
                                     jnp.int32)
                base = (thr_i << (bin_width + 1)
                        | (col & ((1 << bin_width) - 1)) << 1)

            @pl.when(peak_grouping == 0)
            def _():
                words_ref[:, :] = base | pk.astype(jnp.int32)

            @pl.when(peak_grouping == 1)
            def _():
                mm = jnp.where(active, mag, ninf) if masked else m
                left = jnp.where(col == 0, ninf, pltpu.roll(mm, 1, axis=1))
                right = jnp.where(col == n - 1, ninf,
                                  pltpu.roll(mm, n - 1, axis=1))
                words_ref[:, :] = base | (pk & (m >= left)
                                          & (m >= right)).astype(jnp.int32)

    @pl.when(full)
    def _():
        _emit(False)

    @pl.when(jnp.logical_not(full))
    def _():
        _emit(True)


def _kernel(
    # scalar prefetch (SMEM)
    scal_ref,              # [9] int32: log2w, guard, div, mode, log_or_linear,
                           #            peak_grouping, active_hi, mag_mode,
                           #            active_lo
    fscal_ref,             # [1] float32: threshold scaler
    # VMEM operands
    re_ref, im_ref,        # [F, N] spectrum
    thr_ref, pk_ref,       # [F, N] outputs
    scr_ref,               # [F, N + PAD] f32 VMEM scratch (gated body row)
    *,
    n: int, max_guard: int, max_ref: int, gated: bool = True,
):
    mag_mode = scal_ref[7]
    # thr_ref doubles as the magnitude scratch (overwritten with the real
    # threshold below); transcendental modes run under pl.when
    mag = _magnitude_into(thr_ref, re_ref[:, :], im_ref[:, :], mag_mode)
    if gated:
        _ca_cfar_into(mag, scal_ref, fscal_ref, thr_ref, pk_ref, scr_ref, n,
                      lag_bits=_bits_for(max_guard + 1),
                      lead2_bits=_bits_for(2 * max_guard + max_ref + 1))
    else:
        thr, pk_u8 = _ca_cfar_body(mag, scal_ref, fscal_ref, n,
                                   _bits_for(max_guard + 1),
                                   _bits_for(max_guard + max_ref))
        thr_ref[:, :] = thr
        pk_ref[:, :] = pk_u8


def fused_mag_cfar(
    spectrum: jnp.ndarray,
    rt: RuntimeConfig,
    cfg: CfarConfig,
    interpret: bool = False,
    *,
    active_lo: jnp.ndarray | None = None,
    active_hi: jnp.ndarray | None = None,
    gated: bool = False,
) -> CfarOutput:
    """Fused logmag + CA/GO/SO CFAR over the last axis of a complex spectrum.

    ``gated`` selects the pl.when-gated body (``_ca_cfar_into``, bit-identical);
    measured SLOWER here (0.517 vs 0.466 ms at the [4096x1024] tail scale,
    results_r2.json) because this kernel's 32-frame tiles amortize the scalar
    branches poorly — while the 128-frame whole-chain kernel ships gated
    (1.277 vs 1.306 ms, profile_r2l). Both bodies stay tested.

    ``spectrum``: [..., N] pair (``cplx.C``) or complex array, N a multiple of
    128. Returns CfarOutput (threshold float32, peaks bool). Requires a
    CA-family configuration (the GOS/CASH sort paths run via ``ops.cfar``).
    ``active_lo``/``active_hi`` (traced int32) bound the valid cell range in
    local coordinates, as in ``ops.cfar.cfar_op`` — used by the range-sharded
    tail to exclude halo cells beyond the true frame edges."""
    from ..cplx import as_pair

    xp = as_pair(spectrum)
    n = xp.shape[-1]
    assert n % 128 == 0, "frame length must be a multiple of 128 lanes"
    assert cfg.max_ref_window <= 1 << MAX_LOG2_W
    assert cfg.max_ref_window + cfg.max_guard_window + 1 <= PAD
    batch_shape = xp.shape[:-1]
    flat = int(np.prod(batch_shape)) if batch_shape else 1
    re = xp.re.astype(jnp.float32).reshape(flat, n)
    im = xp.im.astype(jnp.float32).reshape(flat, n)

    f_pad = (-flat) % BLOCK_FRAMES
    if f_pad:
        re = jnp.pad(re, ((0, f_pad), (0, 0)))
        im = jnp.pad(im, ((0, f_pad), (0, 0)))
    f_tot = flat + f_pad

    if active_hi is None:
        active_hi = jnp.minimum(rt.cfar_fft_size, n)
    if active_lo is None:
        active_lo = jnp.int32(0)
    log2w = jnp.round(jnp.log2(jnp.clip(
        rt.ref_window_size, 1, cfg.max_ref_window).astype(jnp.float32))).astype(jnp.int32)
    scalars = jnp.stack([
        log2w,
        jnp.clip(rt.guard_window_size, 0, cfg.max_guard_window).astype(jnp.int32),
        rt.div_sum.astype(jnp.int32),
        rt.cfar_mode.astype(jnp.int32),
        rt.log_or_linear.astype(jnp.int32),
        rt.peak_grouping.astype(jnp.int32),
        jnp.asarray(active_hi, jnp.int32),
        rt.mag_mode.astype(jnp.int32),
        jnp.asarray(active_lo, jnp.int32),
    ])
    fscal = rt.threshold_scaler.astype(jnp.float32).reshape(1)

    grid = (f_tot // BLOCK_FRAMES,)
    kernel = functools.partial(
        _kernel, n=n, max_guard=cfg.max_guard_window,
        max_ref=cfg.max_ref_window, gated=gated)

    thr, pk = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BLOCK_FRAMES, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_FRAMES, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK_FRAMES, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_FRAMES, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((BLOCK_FRAMES, n + PAD), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((f_tot, n), jnp.float32),
            jax.ShapeDtypeStruct((f_tot, n), jnp.uint8),
        ],
        interpret=interpret,
    )(scalars, fscal, re, im)

    thr = thr[:flat].reshape(batch_shape + (n,))
    pk = pk[:flat].reshape(batch_shape + (n,)).astype(jnp.bool_)
    return CfarOutput(threshold=thr, peaks=pk)


# ---------------------------------------------------------------------------
# GOS variant: VMEM-resident windowed order statistics
#
# The XLA GOS path is floored at ~80 ms/bench-batch by the HBM-resident sort of
# the [batch, 64, N] window stack (21 bitonic rounds through HBM). This kernel
# keeps the stack in a VMEM scratch: the 64 window rows are built by lane
# rotations, sorted by a statically-unrolled bitonic network on the leading
# (row) axis, and rank-selected by a one-hot reduction — the stack never
# touches HBM. Range is tiled so the stack fits VMEM; each program reads the
# full padded magnitude row and rotates out its tile's windows.
#
# Covers the GOSCA elaboration: CA statistics (dyadic box sums) and GOS rank
# statistics are both computed, with the runtime CA/GOS register selecting, and
# modes CA/GO/SO combining. CASH falls back to the XLA path.
# ---------------------------------------------------------------------------

GOS_BLOCK_FRAMES = 8      # f32 sublane tile (outputs are f32/i32 here)
GOS_RANGE_TILE = 256


def _bitonic_rows(scr, n_rows, f, width):
    """Statically-unrolled bitonic sort of scr[0:n_rows] (ascending), where each
    row is a [f, width] tile. Leading-dim slices are static."""
    size = 2
    while size <= n_rows:
        stride = size // 2
        while stride >= 1:
            for bs in range(0, n_rows, 2 * stride):
                up = ((bs // size) % 2) == 0
                x = scr[bs : bs + stride]
                y = scr[bs + stride : bs + 2 * stride]
                lo = jnp.minimum(x, y)
                hi = jnp.maximum(x, y)
                scr[bs : bs + stride] = lo if up else hi
                scr[bs + stride : bs + 2 * stride] = hi if up else lo
            stride //= 2
        size *= 2


def _gos_kernel(
    scal_ref, fscal_ref,
    re_ref, im_ref,                  # [F, N] full rows
    thr_ref, pk_ref,                 # [F, T] tile outputs (pk int32)
    wstack,                          # scratch [Wmax, F, T]
    row_scr,                         # scratch [F, N + 2*PAD]
    tmp_scr,                         # scratch [F, N + 2*PAD] — staging for dynamic tile slices
    stat_scr,                        # scratch [6, F, T]: ca_lag/lead, os_lag/lead, cash_lag/lead
    cash_scr,                        # scratch [2*Wmax, F, T] — dyadic row sums (zero-padded)
    acc_scr,                         # scratch [Wmax, F, T] — CASH sub-window accumulation
    *,
    n: int, tile: int, wmax: int, max_log2_w: int, with_cash: bool,
):
    log2w = scal_ref[0]
    guard = scal_ref[1]
    div = scal_ref[2]
    mode = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    active_hi = scal_ref[6]
    mag_mode = scal_ref[7]
    algorithm = scal_ref[8]
    rank_lagg = scal_ref[9]
    rank_lead = scal_ref[10]
    sub_w = scal_ref[11]
    active_lo = scal_ref[12]
    scaler = fscal_ref[0]

    t_idx = pl.program_id(1)
    # tile start; multiple_of lets Mosaic prove lane-slice alignment
    ts = pl.multiple_of(t_idx * tile, 128)

    re = re_ref[:, :]
    im = im_ref[:, :]
    f = re.shape[0]

    mag = _magnitude(re, im, mag_mode)
    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    active_row = (col >= active_lo) & (col < active_hi)
    mag = jnp.where(active_row, mag, 0.0)

    # padded full row in scratch
    row_scr[:, :] = jnp.zeros((f, n + 2 * PAD), jnp.float32)
    row_scr[:, PAD : PAD + n] = mag

    w = jnp.int32(1) << log2w

    # ---- CA box sums for this tile (dyadic + runtime rotations) ----
    row = row_scr[:, :]
    sel = row
    box = row
    for k in range(max_log2_w):
        box = box + pltpu.roll(box, 1 << k, axis=1)
        sel = jnp.where(log2w == k + 1, box, sel)
    lag_row = _roll_right(sel, guard + 1)
    lead_row = _roll_left(sel, guard + w)
    inv_div = jnp.exp2(-div.astype(jnp.float32))
    # dynamic tile slices must go through a ref (Mosaic cannot slice values)
    tmp_scr[:, :] = lag_row
    stat_scr[0] = tmp_scr[:, pl.ds(PAD + ts, tile)] * inv_div
    tmp_scr[:, :] = lead_row
    stat_scr[1] = tmp_scr[:, pl.ds(PAD + ts, tile)] * inv_div

    # ---- GOS: build + sort the window stack per side ----
    ii_t = jax.lax.broadcasted_iota(jnp.int32, (f, tile), 1) + ts  # global cell idx

    # runtime clock gating: the expensive stack/sort/CASH sections only run
    # when the register file actually selects them (CA-only calls through a
    # GOSCA elaboration cost the same as the CA kernel)
    use_gos = algorithm == 1
    cash_active = (mode == 3) if with_cash else False
    sort_needed = use_gos & jnp.logical_not(mode == 3) if with_cash else use_gos
    stack_needed = (use_gos | cash_active) if with_cash else use_gos

    def side(base_row, lag_side: bool, out_slot: int, rank):
        # base_row[j] = padded[j - (g+w)] (lag) or padded[j + (g+1)] (lead)
        big = jnp.float32(jnp.inf)
        for k in range(wmax):
            rowk = pltpu.roll(base_row, base_row.shape[1] - k, axis=1)  # left by k
            tmp_scr[:, :] = rowk
            seg = tmp_scr[:, pl.ds(PAD + ts, tile)]
            # validity of window cell k for each tile cell
            if lag_side:
                pos = ii_t - guard - w + k
            else:
                pos = ii_t + guard + 1 + k
            valid = (k < w) & (pos >= active_lo) & (pos < active_hi)
            wstack[k] = jnp.where(valid, seg, big)

        # per-lane contiguous valid span [lo_k, hi_k) of window offsets
        if lag_side:
            lo_k = jnp.clip(active_lo + guard + w - ii_t, 0, w)
            hi_k = w
        else:
            lo_k = jnp.clip(active_lo - ii_t - guard - 1, 0, w)
            hi_k = jnp.clip(active_hi - ii_t - guard - 1, 0, w)

        if with_cash:
          # CASH per-side statistic: min over sliding sub-window means of the
          # runtime subWindowSize within the valid span, computed BEFORE the
          # sort. Dyadic row sums over the leading axis (static slice adds),
          # then the traced sub_w combines them via bit-decomposed shifted
          # reads of the zero-padded sum scratch.
          @pl.when(cash_active)
          def _cash():
            for k in range(wmax):
                vk = wstack[k]
                cash_scr[k] = jnp.where(jnp.isfinite(vk), vk, 0.0)
            cash_scr[wmax : 2 * wmax] = jnp.zeros((wmax, f, tile), jnp.float32)
            # bit-decomposed accumulation with ONLY static row slices: when bit
            # b of sub_w is set, add the current width-2^b dyadic sums and then
            # shift the dyadic array left by 2^b (conditionally, via pl.when),
            # so every read stays at offset 0. Then grow the dyadic width.
            acc_scr[:] = jnp.zeros((wmax, f, tile), jnp.float32)
            n_bits = wmax.bit_length()  # sub_w <= wmax
            for b in range(n_bits):
                bit = ((sub_w >> b) & 1) == 1
                d = 1 << b

                @pl.when(bit)
                def _(b=b, d=d):
                    acc_scr[:] = acc_scr[:] + cash_scr[0:wmax]
                    cash_scr[0 : 2 * wmax - d] = cash_scr[d : 2 * wmax]

                if b < n_bits - 1:
                    # grow dyadic sums: row[t] <- row[t] + row[t + 2^b]
                    cash_scr[0 : 2 * wmax - d] = (cash_scr[0 : 2 * wmax - d]
                                                  + cash_scr[d : 2 * wmax])
            acc = acc_scr[:]
            # acc[t] = sum of rows t .. t+sub_w-1
            est = jnp.full((f, tile), big)
            for t in range(wmax):
                ok = (t >= lo_k) & (t + sub_w <= hi_k)
                est = jnp.minimum(est, jnp.where(ok, acc[t], big))
            est = est / jnp.maximum(sub_w, 1).astype(jnp.float32)
            stat_scr[out_slot + 2] = jnp.where(jnp.isfinite(est), est, 0.0)

        @pl.when(sort_needed)
        def _gos():
            _bitonic_rows(wstack, wmax, f, tile)
            # number of valid cells per tile cell (analytic, no counting pass)
            if lag_side:
                # cells i-g-w .. i-g-1 clipped to [0, n_active)
                lo_pos = ii_t - guard - w
                hi_pos = ii_t - guard
            else:
                lo_pos = ii_t + guard + 1
                hi_pos = ii_t + guard + 1 + w
            nv = (jnp.clip(hi_pos, active_lo, active_hi)
                  - jnp.clip(lo_pos, active_lo, active_hi))
            nv = jnp.maximum(nv, 0)
            idx = jnp.clip(jnp.minimum(rank, nv - 1), 0, wmax - 1)
            acc = jnp.zeros((f, tile), jnp.float32)
            for k in range(wmax):
                acc = acc + jnp.where(idx == k, wstack[k], 0.0)
            stat_scr[out_slot] = jnp.where(nv > 0, acc, 0.0)

    @pl.when(stack_needed)
    def _sides():
        lag_base = _roll_right(row_scr[:, :], guard + w)
        side(lag_base, True, 2, rank_lagg)
        lead_base = _roll_left(row_scr[:, :], guard + 1)
        side(lead_base, False, 3, rank_lead)

    s_lag = jnp.where(use_gos, stat_scr[2], stat_scr[0])
    s_lead = jnp.where(use_gos, stat_scr[3], stat_scr[1])
    noise = jnp.where(
        mode == 1, jnp.maximum(s_lag, s_lead),
        jnp.where(mode == 2, jnp.minimum(s_lag, s_lead),
                  0.5 * (s_lag + s_lead)))
    if with_cash:
        noise = jnp.where(mode == 3, jnp.maximum(stat_scr[4], stat_scr[5]), noise)
    thr = jnp.where(log_or_linear == 1, noise * scaler, noise + scaler)
    active_t = (ii_t >= active_lo) & (ii_t < active_hi)
    thr = jnp.where(active_t, thr, 0.0)
    mag_t = row_scr[:, pl.ds(PAD + ts, tile)]
    peaks = (mag_t > thr) & active_t

    # peak grouping via the padded row (cells outside [lo, hi) compare as -inf)
    jcol = jax.lax.broadcasted_iota(jnp.int32, row_scr.shape, 1) - PAD
    mrow = jnp.where((jcol >= active_lo) & (jcol < active_hi),
                     row_scr[:, :], -jnp.inf)
    tmp_scr[:, :] = pltpu.roll(mrow, 1, axis=1)
    left = tmp_scr[:, pl.ds(PAD + ts, tile)]
    tmp_scr[:, :] = pltpu.roll(mrow, mrow.shape[1] - 1, axis=1)
    right = tmp_scr[:, pl.ds(PAD + ts, tile)]
    grouped = peaks & (mag_t >= left) & (mag_t >= right)
    pk_i32 = jnp.where(peak_grouping == 1, grouped.astype(jnp.int32),
                       peaks.astype(jnp.int32))

    thr_ref[:, :] = thr
    pk_ref[:, :] = pk_i32


# ---------------------------------------------------------------------------
# GOS kernel v2 — per-row values, combined-sides sort
#
# r1's kernel (above) moves every window row and every bitonic compare-exchange
# through VMEM scratch *refs* (4 ref accesses per exchange) and sorts the lag
# and lead stacks in two separate networks over full-width padded rows — the
# sort alone moves ~44 MB of VMEM traffic per program and dominates the 15+ ms
# bench-scale time. v2:
#
# * window rows are INDIVIDUAL [F, 2*tile] jnp values in a Python list — the
#   whole bitonic runs as min/max on values with zero mandatory ref traffic
#   (the register allocator spills only what it must; a first attempt that
#   jnp.stack/concat-ed the rows re-materialized the stack every round and
#   measured SLOWER than v1);
# * lag and lead tiles ride side by side in the lane dimension, so ONE network
#   (21 rounds at wmax=64) sorts both sides;
# * rows are built from a [F, tile + 2*MARGIN] slab (one dynamic ref slice,
#   one dynamic base rotation per side, wmax independent static rolls) —
#   not wmax full-padded-row roll+store+reload round trips per side;
# * CASH's dyadic accumulation runs over the same row list as values.
#
# Same register file, same outputs, golden-identical (tests/test_pallas.py).
# ---------------------------------------------------------------------------

GOS2_MARGIN = 256   # slab margin per side: >= dynamic shift (127) + box reach


def _bitonic_list(rows):
    """Ascending bitonic sort of a Python list of same-shaped values,
    in place (compare-exchanges on values; no stack materialization)."""
    n_rows = len(rows)
    size = 2
    while size <= n_rows:
        stride = size // 2
        while stride >= 1:
            for bs in range(0, n_rows, 2 * stride):
                up = ((bs // size) % 2) == 0
                for i in range(bs, bs + stride):
                    a, b = rows[i], rows[i + stride]
                    lo = jnp.minimum(a, b)
                    hi = jnp.maximum(a, b)
                    rows[i] = lo if up else hi
                    rows[i + stride] = hi if up else lo
            stride //= 2
        size *= 2


def _gos_kernel2(
    scal_ref, fscal_ref,
    re_ref, im_ref,                  # [F, N] full rows
    thr_ref, pk_ref,                 # [F, T] tile outputs (pk int32)
    row_scr,                         # scratch [F, N + 2*GOS2_MARGIN] — mag row
    ca_scr,                          # scratch [2, F, N + 2*GOS2_MARGIN] — CA rows
    nb_scr,                          # scratch [2, F, N + 2*GOS2_MARGIN] — peak nbrs
    stat_scr,                        # scratch [6, F, T]
    *,
    n: int, tile: int, wmax: int, max_log2_w: int, with_cash: bool,
):
    log2w = scal_ref[0]
    guard = scal_ref[1]
    div = scal_ref[2]
    mode = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    active_hi = scal_ref[6]
    mag_mode = scal_ref[7]
    algorithm = scal_ref[8]
    rank_lagg = scal_ref[9]
    rank_lead = scal_ref[10]
    sub_w = scal_ref[11]
    active_lo = scal_ref[12]
    scaler = fscal_ref[0]

    M = GOS2_MARGIN
    t_idx = pl.program_id(1)
    ts = pl.multiple_of(t_idx * tile, 128)

    f = re_ref.shape[0]
    w = jnp.int32(1) << log2w

    # ---- full-row work ONCE per frame block: the range-tile grid dimension
    # is sequential and scratch persists across it, so magnitude, the CA box
    # sums, and the peak-group neighbor rows are hoisted out of the per-tile
    # programs (they were recomputed n/tile times before) ----
    @pl.when(t_idx == 0)
    def _full_row():
        mag = _magnitude(re_ref[:, :], im_ref[:, :], mag_mode)
        col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
        active_row = (col >= active_lo) & (col < active_hi)
        mag = jnp.where(active_row, mag, 0.0)

        row_scr[:, :] = jnp.zeros((f, n + 2 * M), jnp.float32)
        row_scr[:, M : M + n] = mag

        # CA box sums (dyadic + runtime rotations over the padded row)
        row = row_scr[:, :]
        sel = row
        box = row
        for k in range(max_log2_w):
            box = box + pltpu.roll(box, 1 << k, axis=1)
            sel = jnp.where(log2w == k + 1, box, sel)
        inv_div = jnp.exp2(-div.astype(jnp.float32))
        ca_scr[0] = _roll_right(sel, guard + 1) * inv_div
        ca_scr[1] = _roll_left(sel, guard + w) * inv_div

        # peak-group neighbor rows (cells outside [lo, hi) compare as -inf)
        jcol = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1) - M
        mrow = jnp.where((jcol >= active_lo) & (jcol < active_hi),
                         row, -jnp.inf)
        nb_scr[0] = pltpu.roll(mrow, 1, axis=1)
        nb_scr[1] = pltpu.roll(mrow, mrow.shape[1] - 1, axis=1)

    ii_t = jax.lax.broadcasted_iota(jnp.int32, (f, tile), 1) + ts

    use_gos = algorithm == 1
    cash_active = (mode == 3) if with_cash else False
    sort_needed = use_gos & jnp.logical_not(mode == 3) if with_cash else use_gos
    stack_needed = (use_gos | cash_active) if with_cash else use_gos

    @pl.when(stack_needed)
    def _sides():
        big = jnp.float32(jnp.inf)
        # slab: tile plus M margin each side, one dynamic (128-aligned) slice
        slab = row_scr[:, pl.ds(ts, tile + 2 * M)]
        slab_w = tile + 2 * M
        lag_base = _roll_right(slab, guard + w)     # [j] = slab[j - g - w]
        lead_base = _roll_left(slab, guard + 1)     # [j] = slab[j + g + 1]

        # runtime window-size clock gating: only the 2^log2w-row stack is
        # built, summed, and sorted — the hardware's only-active-stages-toggle
        # philosophy. A w=32 call through a wmax=64 elaboration runs the
        # 15-round sort-32 network, not the 21-round sort-64.
        for L in range(1, max_log2_w + 1):
            wl = 1 << L
            if wl > wmax:
                break

            @pl.when(log2w == L)
            def _level(L=L, wl=wl):
                rows = []
                for k in range(wl):
                    # independent static rolls (an incremental roll-by-1 chain
                    # would serialize the VPU)
                    lag_k = (pltpu.roll(lag_base, slab_w - k, axis=1)
                             if k else lag_base)
                    lead_k = (pltpu.roll(lead_base, slab_w - k, axis=1)
                              if k else lead_base)
                    lseg = lag_k[:, M : M + tile]
                    useg = lead_k[:, M : M + tile]
                    lpos = ii_t - guard - wl + k
                    upos = ii_t + guard + 1 + k
                    lval = (lpos >= active_lo) & (lpos < active_hi)
                    uval = (upos >= active_lo) & (upos < active_hi)
                    rows.append(jnp.concatenate(
                        [jnp.where(lval, lseg, big),
                         jnp.where(uval, useg, big)], axis=-1))

                if with_cash:
                    @pl.when(cash_active)
                    def _cash():
                        # zero-padded dyadic-sum pyramid over the row list
                        c = [jnp.where(jnp.isfinite(r), r, 0.0) for r in rows]
                        zero = jnp.zeros_like(c[0])
                        c = c + [zero] * wl                  # length 2*wl
                        acc = [zero] * wl
                        n_bits = wl.bit_length()
                        for b in range(n_bits):
                            bit = ((sub_w >> b) & 1) == 1
                            d = 1 << b
                            acc = [jnp.where(bit, acc[t] + c[t], acc[t])
                                   for t in range(wl)]
                            c = [jnp.where(
                                bit, c[t + d] if t + d < 2 * wl else zero,
                                c[t]) for t in range(2 * wl)]
                            if b < n_bits - 1:
                                c = [c[t] + (c[t + d] if t + d < 2 * wl
                                             else zero)
                                     for t in range(2 * wl)]
                        # acc[t] = sum of window cells t .. t+sub_w-1
                        lo_k = jnp.concatenate(
                            [jnp.clip(active_lo + guard + wl - ii_t, 0, wl),
                             jnp.clip(active_lo - ii_t - guard - 1, 0, wl)],
                            axis=-1)
                        hi_k = jnp.concatenate(
                            [jnp.full(ii_t.shape, wl, jnp.int32),
                             jnp.clip(active_hi - ii_t - guard - 1, 0, wl)],
                            axis=-1)
                        est = jnp.full((f, 2 * tile), big)
                        for t in range(wl):
                            ok = (t >= lo_k) & (t + sub_w <= hi_k)
                            est = jnp.minimum(est, jnp.where(ok, acc[t], big))
                        est = est / jnp.maximum(sub_w, 1).astype(jnp.float32)
                        est = jnp.where(jnp.isfinite(est), est, 0.0)
                        stat_scr[4] = est[:, :tile]
                        stat_scr[5] = est[:, tile:]

                @pl.when(sort_needed)
                def _gos():
                    s = list(rows)
                    _bitonic_list(s)
                    lag_nv = (jnp.clip(ii_t - guard, active_lo, active_hi)
                              - jnp.clip(ii_t - guard - wl, active_lo,
                                         active_hi))
                    lead_nv = (jnp.clip(ii_t + guard + 1 + wl, active_lo,
                                        active_hi)
                               - jnp.clip(ii_t + guard + 1, active_lo,
                                          active_hi))
                    nv = jnp.maximum(
                        jnp.concatenate([lag_nv, lead_nv], axis=-1), 0)
                    rank = jnp.concatenate(
                        [jnp.broadcast_to(rank_lagg, ii_t.shape),
                         jnp.broadcast_to(rank_lead, ii_t.shape)], axis=-1)
                    idx = jnp.clip(jnp.minimum(rank, nv - 1), 0, wl - 1)
                    acc = jnp.zeros((f, 2 * tile), jnp.float32)
                    for k in range(wl):
                        acc = acc + jnp.where(idx == k, s[k], 0.0)
                    got = jnp.where(nv > 0, acc, 0.0)
                    stat_scr[2] = got[:, :tile]
                    stat_scr[3] = got[:, tile:]

    s_lag = jnp.where(use_gos, stat_scr[2], ca_scr[0, :, pl.ds(M + ts, tile)])
    s_lead = jnp.where(use_gos, stat_scr[3], ca_scr[1, :, pl.ds(M + ts, tile)])
    noise = jnp.where(
        mode == 1, jnp.maximum(s_lag, s_lead),
        jnp.where(mode == 2, jnp.minimum(s_lag, s_lead),
                  0.5 * (s_lag + s_lead)))
    if with_cash:
        noise = jnp.where(mode == 3, jnp.maximum(stat_scr[4], stat_scr[5]), noise)
    thr = jnp.where(log_or_linear == 1, noise * scaler, noise + scaler)
    active_t = (ii_t >= active_lo) & (ii_t < active_hi)
    thr = jnp.where(active_t, thr, 0.0)
    mag_t = row_scr[:, pl.ds(M + ts, tile)]
    peaks = (mag_t > thr) & active_t

    left = nb_scr[0, :, pl.ds(M + ts, tile)]
    right = nb_scr[1, :, pl.ds(M + ts, tile)]
    grouped = peaks & (mag_t >= left) & (mag_t >= right)
    pk_i32 = jnp.where(peak_grouping == 1, grouped.astype(jnp.int32),
                       peaks.astype(jnp.int32))

    thr_ref[:, :] = thr
    pk_ref[:, :] = pk_i32


# ---------------------------------------------------------------------------
# GOS kernel v3 — sliding-merge shared sort
#
# v2 sorts every cell's window independently: build 2·w masked rows, run a full
# bitonic (672 comparators at w=64) over lane-doubled tiles. But the w windows
# of adjacent cells share w−1 elements, and our lanes ARE the cells — the
# sorted stack is a function of the window START position, so sorted windows
# for ALL positions can be built by MERGING: S_{2m}[p] = merge(S_m[p],
# S_m[p+m]), where the counterpart is a static roll of the same stack. One
# bitonic MERGE of 2m rows costs m·log2(2m) comparators; the whole ladder to
# w=64 is Σ 2^L(L+1) = 321 comparators vs 672 — AND:
#   * no per-row build/mask pass (one +inf mask on the base row replaces 2·w
#     per-row validity wheres: invalid cells sort to the top, exactly v2's
#     semantics);
#   * ONE stack serves BOTH sides — lag and lead statistics are rank-selects
#     of the same stack at different runtime offsets (two bit-decomposed
#     rolls), where v2 sorted a lane-doubled [F, 2·tile] stack;
#   * CASH drops the per-row dyadic pyramid for sliding sums + a sliding MIN
#     of runtime width (dyadic mins + one runtime roll), independent of the
#     sort entirely.
# Runtime window gating as in v2: each elaborated log2w level is its own
# value-resident @pl.when branch. Golden-identical (tests/test_pallas.py).
# ---------------------------------------------------------------------------

GOS3_MARGIN = 128   # slab margin per side: window reach w−1 ≤ 63 plus the
                    # side-offset rolls guard+w ≤ 127 stay inside the margin


def _bitonic_merge_list(rows):
    """In-place ascending bitonic MERGE of a bitonic row list (ascending half
    followed by descending half): log2(n) stride rounds of compare-exchanges."""
    n_rows = len(rows)
    s = n_rows // 2
    while s >= 1:
        for bs in range(0, n_rows, 2 * s):
            for i in range(bs, bs + s):
                a, b = rows[i], rows[i + s]
                rows[i] = jnp.minimum(a, b)
                rows[i + s] = jnp.maximum(a, b)
        s //= 2


def _oe_merge_lists(a, b):
    """Batcher ODD-EVEN merge of two ascending row lists of equal power-of-two
    length m: returns the merged ascending 2m list. Comparator count
    m·log2(m)+1 vs the bitonic merge's m·(log2(m)+1) — ~20% fewer compare-
    exchange passes over the ladder (rows are Python-list VALUES, so the
    odd/even interleaved access is free)."""
    m = len(a)
    assert len(b) == m and (m & (m - 1)) == 0
    if m == 1:
        return [jnp.minimum(a[0], b[0]), jnp.maximum(a[0], b[0])]
    even = _oe_merge_lists(a[0::2], b[0::2])
    odd = _oe_merge_lists(a[1::2], b[1::2])
    # interleave even/odd then compare-exchange adjacent interior pairs
    out = [None] * (2 * m)
    out[0] = even[0]
    out[-1] = odd[-1]
    for i in range(m - 1):
        lo = jnp.minimum(odd[i], even[i + 1])
        hi = jnp.maximum(odd[i], even[i + 1])
        out[2 * i + 1] = lo
        out[2 * i + 2] = hi
    return out


@functools.lru_cache(maxsize=None)
def _oe_merge_schedule(m: int):
    """Static compare-exchange schedule of the Batcher odd-even merge of two
    sorted m-lists, grouped into data-parallel stages by dataflow depth
    (every CE in a stage consumes values produced strictly earlier). Returns
    ``(stages, out_ids)``: stages = list of lists of (in_lo, in_hi, out_lo,
    out_hi) value ids; inputs are ids 0..2m-1 (a then b); ``out_ids`` is the
    merged ascending order. Pure build-time Python — the network is identical
    to ``_oe_merge_lists``, only the execution grouping differs."""
    counter = [2 * m]
    depth = {i: 0 for i in range(2 * m)}
    ces = []

    def ce(x, y):
        d = max(depth[x], depth[y]) + 1
        lo, hi = counter[0], counter[0] + 1
        counter[0] += 2
        depth[lo] = depth[hi] = d
        ces.append((x, y, lo, hi, d))
        return lo, hi

    def merge(a, b):
        if len(a) == 1:
            return list(ce(a[0], b[0]))
        even = merge(a[0::2], b[0::2])
        odd = merge(a[1::2], b[1::2])
        out = [None] * (2 * len(a))
        out[0], out[-1] = even[0], odd[-1]
        for i in range(len(a) - 1):
            lo, hi = ce(odd[i], even[i + 1])
            out[2 * i + 1], out[2 * i + 2] = lo, hi
        return out

    out_ids = merge(list(range(m)), list(range(m, 2 * m)))
    staged = {}
    for x, y, lo, hi, d in ces:
        staged.setdefault(d, []).append((x, y, lo, hi))
    return tuple(tuple(staged[d]) for d in sorted(staged)), tuple(out_ids)


def _oe_merge_lists_batched(a, b):
    """``_oe_merge_lists`` with each dataflow stage executed as ONE batched
    min + ONE batched max over the sublane-stacked CE operands (the r4
    per-op-overhead hypothesis, same as the batched ladder rolls): the
    network and results are identical comparator-for-comparator; only the
    op granularity changes. The concat/split copies are the price."""
    m = len(a)
    assert len(b) == m and (m & (m - 1)) == 0
    stages, out_ids = _oe_merge_schedule(m)
    vals = dict(enumerate(list(a) + list(b)))
    f = a[0].shape[0]
    for ces in stages:
        if len(ces) == 1:
            x, y, lo, hi = ces[0]
            vals[lo] = jnp.minimum(vals[x], vals[y])
            vals[hi] = jnp.maximum(vals[x], vals[y])
            continue
        left = jnp.concatenate([vals[x] for x, _, _, _ in ces], axis=0)
        right = jnp.concatenate([vals[y] for _, y, _, _ in ces], axis=0)
        los = jnp.minimum(left, right)
        his = jnp.maximum(left, right)
        for i, (x, y, lo, hi) in enumerate(ces):
            vals[lo] = los[i * f:(i + 1) * f]
            vals[hi] = his[i * f:(i + 1) * f]
    return [vals[i] for i in out_ids]


def _rank_select_tree(rows, idx):
    """Value at per-lane rank ``idx`` from ascending-sorted ``rows`` via a
    binary selection tree (2^L − 1 selects, no adds)."""
    sel = list(rows)
    bits = len(rows).bit_length() - 1
    for bit in reversed(range(bits)):
        half = 1 << bit
        take_hi = ((idx >> bit) & 1) == 1
        sel = [jnp.where(take_hi, sel[i + half], sel[i]) for i in range(half)]
    return sel[0]


def _rank_select_tree_batched(rows, idx):
    """``_rank_select_tree`` with each tree level as ONE batched select over
    the sublane-stacked halves (same r4 per-op-overhead family as
    ``_oe_merge_lists_batched``); the predicate is the same [f, W] vector for
    every row at a level, so it tiles by concatenation. Bit-identical."""
    sel = list(rows)
    bits = len(rows).bit_length() - 1
    f = rows[0].shape[0]
    for bit in reversed(range(bits)):
        half = 1 << bit
        take_hi = ((idx >> bit) & 1) == 1
        if half == 1:
            sel = [jnp.where(take_hi, sel[1], sel[0])]
            continue
        lo = jnp.concatenate(sel[:half], axis=0)
        hi = jnp.concatenate(sel[half:2 * half], axis=0)
        takes = jnp.concatenate([take_hi] * half, axis=0)
        out = jnp.where(takes, hi, lo)
        sel = [out[i * f:(i + 1) * f] for i in range(half)]
    return sel[0]


def _gos_rows_init(mag, scal_ref, row_scr, ca_scr, nb_scr, *,
                   n: int, max_log2_w: int):
    """Per-frame-block full-row work of the v3 GOS kernel, from a NATURAL-order
    [F, N] magnitude VALUE: writes the zero-masked magnitude row, the CA
    lag/lead rows, and the peak-grouping neighbor rows into the persistent
    scratches. Shared by ``_gos_kernel3`` (mag from the spectrum operands) and
    the fused whole-chain GOS kernel (mag from the in-kernel FFT,
    ``chain_pallas._chain_gos_kernel``)."""
    log2w = scal_ref[0]
    guard = scal_ref[1]
    div = scal_ref[2]
    active_hi = scal_ref[6]
    active_lo = scal_ref[12]
    M = GOS3_MARGIN
    f = mag.shape[0]
    w = jnp.int32(1) << log2w

    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    active_row = (col >= active_lo) & (col < active_hi)
    mag = jnp.where(active_row, mag, 0.0)

    row_scr[:, :] = jnp.zeros((f, n + 2 * M), jnp.float32)
    row_scr[:, M : M + n] = mag

    # CA lag/lead rows are consumed only when the runtime algorithm register
    # selects CA (the tail's jnp.where discards ca_scr lanewise under GOS),
    # so the box ladder is register-gated (r5): a GOS-registered call skips
    # max_log2_w add+roll passes + two shift/scale passes. Bit-identical —
    # the branch runs exactly when its scratch is read.
    @pl.when(scal_ref[8] != 1)
    def _ca_rows():
        row = row_scr[:, :]
        sel = row
        box = row
        for k in range(max_log2_w):
            box = box + pltpu.roll(box, 1 << k, axis=1)
            sel = jnp.where(log2w == k + 1, box, sel)
        inv_div = jnp.exp2(-div.astype(jnp.float32))
        ca_scr[0] = _roll_right(sel, guard + 1) * inv_div
        ca_scr[1] = _roll_left(sel, guard + w) * inv_div

    # the peak-grouping neighbor rows are likewise dead unless the grouping
    # register is set (both tails read them only under peak_grouping == 1
    # or behind a jnp.where on it)
    @pl.when(scal_ref[5] == 1)
    def _nb_rows():
        row = row_scr[:, :]
        jcol = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1) - M
        mrow = jnp.where((jcol >= active_lo) & (jcol < active_hi),
                         row, -jnp.inf)
        nb_scr[0] = pltpu.roll(mrow, 1, axis=1)
        nb_scr[1] = pltpu.roll(mrow, mrow.shape[1] - 1, axis=1)


def _gos_kernel3(
    scal_ref, fscal_ref,
    re_ref, im_ref,                  # [F, N] full rows
    thr_ref, pk_ref,                 # [F, T] tile outputs (pk int32)
    row_scr,                         # scratch [F, N + 2*M] — zero-masked mag
    ca_scr,                          # scratch [2, F, N + 2*M] — CA lag/lead
    nb_scr,                          # scratch [2, F, N + 2*M] — peak nbrs
    stat_scr,                        # scratch [6, F, T]
    *,
    n: int, tile: int, wmax: int, max_log2_w: int, with_cash: bool,
    merge_impl: str = "bitonic", ablate: str = "", tail_impl: str = "lean",
    roll_impl: str = "per_row", select_impl: str = "tree",
):
    mag_mode = scal_ref[7]
    t_idx = pl.program_id(1)
    ts = pl.multiple_of(t_idx * tile, 128)

    # ---- hoisted full-row work (as v2; scratch persists across range tiles)
    @pl.when(t_idx == 0)
    def _full_row():
        mag = _magnitude(re_ref[:, :], im_ref[:, :], mag_mode)
        _gos_rows_init(mag, scal_ref, row_scr, ca_scr, nb_scr,
                       n=n, max_log2_w=max_log2_w)

    _gos_tail(scal_ref, fscal_ref, thr_ref, pk_ref, row_scr, ca_scr, nb_scr,
              stat_scr, ts, n=n, tile=tile, wmax=wmax,
              max_log2_w=max_log2_w, with_cash=with_cash,
              merge_impl=merge_impl, ablate=ablate, tail_impl=tail_impl,
              roll_impl=roll_impl, select_impl=select_impl)


def _gos_tail(
    scal_ref, fscal_ref, thr_ref, pk_ref,
    row_scr, ca_scr, nb_scr, stat_scr, ts, *,
    n: int, tile: int, wmax: int, max_log2_w: int, with_cash: bool,
    merge_impl: str = "bitonic", ablate: str = "", tail_impl: str = "lean",
    roll_impl: str = "per_row", select_impl: str = "tree",
):
    """The v3 GOS/CASH datapath for one range tile starting at lane ``ts``,
    reading the rows ``_gos_rows_init`` left in scratch.

    ``ablate`` (profiling-only; results are WRONG, never exposed through the
    chain API — the VERDICT r3 item-1 floor-proof instrumentation, mirroring
    the CA kernel's §1 ablation family): 'merge' skips the sliding-merge
    compare-exchanges (build rolls + rank selects remain), 'rank' replaces
    the two rank-select trees with a consume-all add reduction (selects
    ablated, the ladder NOT dead-code-eliminable), 'sort' skips the whole
    sorted-window section, 'tail' skips the threshold/peak epilogue (stats
    land in stat_scr only)."""
    # fail loudly on an unknown formulation: an unrecognized string would
    # silently fall through to the bitonic branch and publish numbers under
    # the wrong label (the removed 'oe3d' A/B taught this — profile_r5f)
    assert merge_impl in ("bitonic", "oe", "oe_batch"), merge_impl
    assert select_impl in ("tree", "batch"), select_impl
    assert roll_impl in ("per_row", "batch"), roll_impl

    log2w = scal_ref[0]
    guard = scal_ref[1]
    mode = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    active_hi = scal_ref[6]
    algorithm = scal_ref[8]
    rank_lagg = scal_ref[9]
    rank_lead = scal_ref[10]
    sub_w = scal_ref[11]
    active_lo = scal_ref[12]
    scaler = fscal_ref[0]

    M = GOS3_MARGIN
    f = thr_ref.shape[0]
    w = jnp.int32(1) << log2w

    ii_t = jax.lax.broadcasted_iota(jnp.int32, (f, tile), 1) + ts

    use_gos = algorithm == 1
    cash_active = (mode == 3) if with_cash else False
    sort_needed = use_gos & jnp.logical_not(mode == 3) if with_cash else use_gos
    if ablate == "sort":
        sort_needed = jnp.asarray(False)

    slab_w = tile + 2 * M
    # slab lane j holds global cell ts − M + j; all window math below runs in
    # window-START coordinates over the slab, shared by the lag and lead sides
    jg = (jax.lax.broadcasted_iota(jnp.int32, (f, slab_w), 1) + ts) - M

    @pl.when(sort_needed)
    def _sorted_windows():
        slab = row_scr[:, pl.ds(ts, slab_w)]
        base = jnp.where((jg >= active_lo) & (jg < active_hi), slab,
                         jnp.float32(jnp.inf))

        for L in range(1, max_log2_w + 1):
            wl = 1 << L
            if wl > wmax:
                break

            @pl.when(log2w == L)
            def _level(L=L, wl=wl):
                rows = [base]
                for lev in range(L):
                    m = 1 << lev
                    if roll_impl == "batch" and len(rows) > 1:
                        # one roll of the sublane-stacked level instead of
                        # 2^lev per-row rolls: every row at a level shifts by
                        # the SAME amount, so if the roll cost has a per-op
                        # component the batch amortizes it (r4 A/B; the
                        # concat/split copies are the price)
                        fr = rows[0].shape[0]
                        rolled = pltpu.roll(jnp.concatenate(rows, axis=0),
                                            slab_w - m, axis=1)
                        shifted = [rolled[i * fr:(i + 1) * fr]
                                   for i in range(len(rows))]
                    else:
                        shifted = [pltpu.roll(r, slab_w - m, axis=1)
                                   for r in rows]      # [p] = r[p + m]
                    if ablate == "merge":
                        rows = rows + shifted          # no compare-exchanges
                    elif merge_impl == "oe_batch":
                        rows = _oe_merge_lists_batched(rows, shifted)
                    elif merge_impl == "oe":
                        # Batcher odd-even merge: ~20% fewer comparators
                        rows = _oe_merge_lists(rows, shifted)
                    else:
                        merged = rows + shifted[::-1]  # bitonic: asc ++ desc
                        _bitonic_merge_list(merged)
                        rows = merged
                # rows[k][p] = k-th smallest of window cells [p, p+wl)
                nv = (jnp.clip(jg + wl, active_lo, active_hi)
                      - jnp.clip(jg, active_lo, active_hi))
                nv = jnp.maximum(nv, 0)
                if ablate == "rank":
                    # consume EVERY row with a cheap reduction so the
                    # merge ladder cannot be dead-code-eliminated (the
                    # r4a 'rank' ablation leaked: rows[0] alone let the
                    # compiler delete the whole sort; wl-1 adds replace
                    # the 2(wl-1) selects being ablated)
                    val = rows[0]
                    for r in rows[1:]:
                        val = val + r
                    stat_scr[2] = _roll_right(val, guard + wl)[:, M : M + tile]
                    stat_scr[3] = _roll_left(val, guard + 1)[:, M : M + tile]
                else:
                    tree = (_rank_select_tree_batched
                            if select_impl == "batch"
                            else _rank_select_tree)
                    # lag window of cell i starts at i − g − w
                    idx_g = jnp.clip(jnp.minimum(rank_lagg, nv - 1), 0, wl - 1)
                    val_g = jnp.where(nv > 0, tree(rows, idx_g), 0.0)
                    stat_scr[2] = _roll_right(val_g, guard + wl)[:, M : M + tile]

                    # shared-select amortization (r5, VERDICT item 2): when
                    # the two rank registers agree — the shipped register
                    # file (`RspChainVanillaTester.scala:137-141` writes one
                    # rank per side; the canonical test file uses the same
                    # value) — ONE selection tree serves both windows and
                    # only the side roll differs. Register-gated: unequal
                    # ranks pay the second tree, equal ranks skip it.
                    @pl.when(rank_lead == rank_lagg)
                    def _lead_shared(val_g=val_g):
                        stat_scr[3] = _roll_left(val_g, guard + 1)[
                            :, M : M + tile]

                    @pl.when(rank_lead != rank_lagg)
                    def _lead_tree(rows=rows, nv=nv, wl=wl):
                        idx_l = jnp.clip(jnp.minimum(rank_lead, nv - 1),
                                         0, wl - 1)
                        val_l = jnp.where(nv > 0, tree(rows, idx_l), 0.0)
                        stat_scr[3] = _roll_left(val_l, guard + 1)[
                            :, M : M + tile]

    if with_cash:
        @pl.when(cash_active)
        def _cash():
            slab = row_scr[:, pl.ds(ts, slab_w)]   # zero-masked: sums are safe
            # sliding sub-window sums: S(p, sub_w) by bit-composition with
            # ONLY static rolls — when bit b is set,
            # S(p, m+2^b) = R_b[p] + S(p+2^b, m)
            acc = jnp.zeros_like(slab)
            r_b = slab
            n_bits = wmax.bit_length()
            for b in range(n_bits):
                bit = ((sub_w >> b) & 1) == 1
                d = 1 << b
                acc = jnp.where(bit, r_b + pltpu.roll(acc, slab_w - d, axis=1),
                                acc)
                if b < n_bits - 1:
                    r_b = r_b + pltpu.roll(r_b, slab_w - d, axis=1)
            # a sub-window is valid iff entirely inside the active range
            big = jnp.float32(jnp.inf)
            bm = jnp.where((jg >= active_lo) & (jg + sub_w <= active_hi),
                           acc, big)
            # sliding MIN over the m = w − sub_w + 1 sub-window positions of
            # each reference window: dyadic mins + one runtime-roll compose
            m_len = jnp.maximum(w - sub_w + 1, 1)
            dy = bm
            mins = [dy]
            for k in range(max_log2_w):
                dy = jnp.minimum(dy, pltpu.roll(dy, slab_w - (1 << k), axis=1))
                mins.append(dy)
            msb = jnp.int32(0)
            for k in range(1, max_log2_w + 1):
                msb = jnp.where(m_len >= (1 << k), k, msb)
            msel = mins[0]
            for k in range(1, max_log2_w + 1):
                msel = jnp.where(msb == k, mins[k], msel)
            rest = _roll_left(msel, m_len - (jnp.int32(1) << msb))
            est = jnp.minimum(msel, rest) / jnp.maximum(sub_w, 1).astype(
                jnp.float32)
            est = jnp.where(jnp.isfinite(est), est, 0.0)
            # sub_w > w: no sub-window fits inside the reference window, so
            # the statistic is 0 (golden `_cash_stat`: sub_cnt == sub_w never
            # holds; v2: t + sub_w <= wl never holds) — without this the
            # m_len=1 clamp above would return a sum spanning guard cells
            # and the CUT
            est = jnp.where(sub_w <= w, est, 0.0)
            stat_scr[4] = _roll_right(est, guard + w)[:, M : M + tile]
            stat_scr[5] = _roll_left(est, guard + 1)[:, M : M + tile]

    if ablate == "tail":
        thr_ref[:, :] = stat_scr[2] + stat_scr[3]
        pk_ref[:, :] = jnp.zeros(pk_ref.shape, pk_ref.dtype)
        return

    if tail_impl == "classic":
        s_lag = jnp.where(use_gos, stat_scr[2],
                          ca_scr[0, :, pl.ds(M + ts, tile)])
        s_lead = jnp.where(use_gos, stat_scr[3],
                           ca_scr[1, :, pl.ds(M + ts, tile)])
        noise = jnp.where(
            mode == 1, jnp.maximum(s_lag, s_lead),
            jnp.where(mode == 2, jnp.minimum(s_lag, s_lead),
                      0.5 * (s_lag + s_lead)))
        if with_cash:
            noise = jnp.where(mode == 3,
                              jnp.maximum(stat_scr[4], stat_scr[5]), noise)
        thr = jnp.where(log_or_linear == 1, noise * scaler, noise + scaler)
        active_t = (ii_t >= active_lo) & (ii_t < active_hi)
        thr = jnp.where(active_t, thr, 0.0)
        mag_t = row_scr[:, pl.ds(M + ts, tile)]
        peaks = (mag_t > thr) & active_t

        left = nb_scr[0, :, pl.ds(M + ts, tile)]
        right = nb_scr[1, :, pl.ds(M + ts, tile)]
        grouped = peaks & (mag_t >= left) & (mag_t >= right)
        pk_i32 = jnp.where(peak_grouping == 1, grouped.astype(jnp.int32),
                           peaks.astype(jnp.int32))

        thr_ref[:, :] = thr
        pk_ref[:, :] = pk_i32
        return

    # ---- lean epilogue (r4): the r4a ablation put the ungated epilogue at
    # ~1.3 ms of the 5.3 ms GOS chain — mode select and peak grouping now run
    # as pl.when branches (one executes), with the linear-mode scaler and the
    # CA 1/2 folded into one multiply-add coefficient. Exactness mirrors the
    # CA lean tail's argument (power-of-two folds commute with rounding;
    # x*1.0 and x+0.0 are exact), asserted bit-identical in tests. ----
    s_lag = jnp.where(use_gos, stat_scr[2], ca_scr[0, :, pl.ds(M + ts, tile)])
    s_lead = jnp.where(use_gos, stat_scr[3], ca_scr[1, :, pl.ds(M + ts, tile)])
    is_lin = log_or_linear == 1
    c_pair = jnp.where(is_lin, scaler, jnp.float32(1.0))
    a_term = jnp.where(is_lin, jnp.float32(0.0), scaler)
    active_t = (ii_t >= active_lo) & (ii_t < active_hi)

    ca_cond = (mode != 1) & (mode != 2)
    if with_cash:
        ca_cond = ca_cond & (mode != 3)

    @pl.when(ca_cond)                          # CA mean
    def _():
        thr_ref[:, :] = jnp.where(
            active_t, (s_lag + s_lead) * (0.5 * c_pair) + a_term, 0.0)

    @pl.when(mode == 1)                        # GO
    def _():
        thr_ref[:, :] = jnp.where(
            active_t, jnp.maximum(s_lag, s_lead) * c_pair + a_term, 0.0)

    @pl.when(mode == 2)                        # SO
    def _():
        thr_ref[:, :] = jnp.where(
            active_t, jnp.minimum(s_lag, s_lead) * c_pair + a_term, 0.0)

    if with_cash:
        @pl.when(mode == 3)                    # CASH
        def _():
            thr_ref[:, :] = jnp.where(
                active_t,
                jnp.maximum(stat_scr[4], stat_scr[5]) * c_pair + a_term, 0.0)

    thr = thr_ref[:, :]
    mag_t = row_scr[:, pl.ds(M + ts, tile)]
    pk = (mag_t > thr) & active_t

    @pl.when(peak_grouping == 0)
    def _():
        pk_ref[:, :] = pk.astype(jnp.int32)

    @pl.when(peak_grouping == 1)
    def _():
        left = nb_scr[0, :, pl.ds(M + ts, tile)]
        right = nb_scr[1, :, pl.ds(M + ts, tile)]
        pk_ref[:, :] = (pk & (mag_t >= left)
                        & (mag_t >= right)).astype(jnp.int32)


def fused_mag_gos_cfar(
    spectrum,
    rt: RuntimeConfig,
    cfg: CfarConfig,
    interpret: bool = False,
    *,
    active_lo: jnp.ndarray | None = None,
    active_hi: jnp.ndarray | None = None,
    version: int = 3,
    block_frames: int | None = None,
    range_tile: int | None = None,
    merge_impl: str = "oe",
    ablate: str = "",
    tail_impl: str = "lean",
    roll_impl: str = "per_row",
    select_impl: str = "tree",
) -> CfarOutput:
    """Fused logmag + GOSCA CFAR (CA + order statistics, runtime-switchable,
    modes CA/GO/SO/CASH) with the window sort resident in VMEM.
    ``spectrum``: [..., N] pair or complex, N % 256 == 0.
    ``active_lo``/``active_hi``: see ``fused_mag_cfar``.

    Default v3 (sliding-merge shared sort): on-chip bit-identical to v2 and
    ~3x faster at the [4096x1024] tail scale (GOS 4.58 -> 1.55 ms, CASH
    5.51 -> 1.91 ms; benchmarks/results_r2p.json) — full-row tiles so the
    merge's slab margins amortize, 16-frame blocks."""
    from ..cplx import as_pair

    xp = as_pair(spectrum)
    n = xp.shape[-1]
    if range_tile is not None:
        tile = range_tile
    elif version == 3:
        # full-row tiles amortize the slab margins (1.97 -> 3.70 ms at tile
        # 256); cap at 1024 so the value-resident stack stays within the
        # 16 MB scoped-VMEM budget. The cap must hold for EVERY n — the
        # sharded tail calls with halo-extended n (e.g. 1280 = 1024 + 2·128),
        # so pick the largest divisor of n among {1024, 512, 256}.
        tile = next((t for t in (1024, 512, 256) if n % t == 0),
                    n if n < 256 else None)
        assert tile is not None, f"frame length {n} not a multiple of 256"
    else:
        tile = GOS_RANGE_TILE
    assert n % tile == 0, f"frame length must be a multiple of {tile}"
    wmax = cfg.max_ref_window
    assert wmax & (wmax - 1) == 0 and wmax <= 1 << MAX_LOG2_W
    assert wmax + cfg.max_guard_window + 1 <= PAD
    batch_shape = xp.shape[:-1]
    flat = int(np.prod(batch_shape)) if batch_shape else 1
    re = xp.re.astype(jnp.float32).reshape(flat, n)
    im = xp.im.astype(jnp.float32).reshape(flat, n)
    if block_frames is not None:
        bf = block_frames
    else:
        # r3i on-chip A/B: 32-frame blocks 1.236 vs 1.421 ms at the
        # [4096 x 1024] tail scale, bit-identical (matches the fused GOS
        # chain kernel's bf=32 pick, profile_r3d)
        bf = 32 if version == 3 else GOS_BLOCK_FRAMES
    f_pad = (-flat) % bf
    if f_pad:
        re = jnp.pad(re, ((0, f_pad), (0, 0)))
        im = jnp.pad(im, ((0, f_pad), (0, 0)))
    f_tot = flat + f_pad

    if active_hi is None:
        active_hi = jnp.minimum(rt.cfar_fft_size, n)
    if active_lo is None:
        active_lo = jnp.int32(0)
    log2w = jnp.round(jnp.log2(jnp.clip(
        rt.ref_window_size, 1, wmax).astype(jnp.float32))).astype(jnp.int32)
    scalars = jnp.stack([
        log2w,
        jnp.clip(rt.guard_window_size, 0, cfg.max_guard_window).astype(jnp.int32),
        rt.div_sum.astype(jnp.int32),
        rt.cfar_mode.astype(jnp.int32),
        rt.log_or_linear.astype(jnp.int32),
        rt.peak_grouping.astype(jnp.int32),
        jnp.asarray(active_hi, jnp.int32),
        rt.mag_mode.astype(jnp.int32),
        rt.cfar_algorithm.astype(jnp.int32),
        rt.index_lagg.astype(jnp.int32),
        rt.index_lead.astype(jnp.int32),
        jnp.clip(rt.sub_window_size, cfg.min_sub_window, wmax).astype(jnp.int32),
        jnp.asarray(active_lo, jnp.int32),
    ])
    fscal = rt.threshold_scaler.astype(jnp.float32).reshape(1)

    grid = (f_tot // bf, n // tile)
    if version == 3:
        kernel = functools.partial(_gos_kernel3, n=n, tile=tile, wmax=wmax,
                                   max_log2_w=MAX_LOG2_W,
                                   with_cash=cfg.include_cash,
                                   merge_impl=merge_impl, ablate=ablate,
                                   tail_impl=tail_impl, roll_impl=roll_impl,
                                   select_impl=select_impl)
        scratch = [
            pltpu.VMEM((bf, n + 2 * GOS3_MARGIN), jnp.float32),
            pltpu.VMEM((2, bf, n + 2 * GOS3_MARGIN), jnp.float32),
            pltpu.VMEM((2, bf, n + 2 * GOS3_MARGIN), jnp.float32),
            pltpu.VMEM((6, bf, tile), jnp.float32),
        ]
    elif version == 2:
        kernel = functools.partial(_gos_kernel2, n=n, tile=tile, wmax=wmax,
                                   max_log2_w=MAX_LOG2_W,
                                   with_cash=cfg.include_cash)
        scratch = [
            pltpu.VMEM((bf, n + 2 * GOS2_MARGIN), jnp.float32),
            pltpu.VMEM((2, bf, n + 2 * GOS2_MARGIN), jnp.float32),
            pltpu.VMEM((2, bf, n + 2 * GOS2_MARGIN), jnp.float32),
            pltpu.VMEM((6, bf, tile), jnp.float32),
        ]
    else:
        kernel = functools.partial(_gos_kernel, n=n, tile=tile, wmax=wmax,
                                   max_log2_w=MAX_LOG2_W,
                                   with_cash=cfg.include_cash)
        scratch = [
            pltpu.VMEM((wmax, bf, tile), jnp.float32),
            pltpu.VMEM((bf, n + 2 * PAD), jnp.float32),
            pltpu.VMEM((bf, n + 2 * PAD), jnp.float32),
            pltpu.VMEM((6, bf, tile), jnp.float32),
            pltpu.VMEM((2 * wmax, bf, tile), jnp.float32),
            pltpu.VMEM((wmax, bf, tile), jnp.float32),
        ]
    thr, pk = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bf, n), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bf, n), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bf, tile), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bf, tile), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((f_tot, n), jnp.float32),
            jax.ShapeDtypeStruct((f_tot, n), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, fscal, re, im)

    thr = thr[:flat].reshape(batch_shape + (n,))
    pk = (pk[:flat] != 0).reshape(batch_shape + (n,))
    return CfarOutput(threshold=thr, peaks=pk)


def fused_mag_gos_dispatch(
    spectrum,
    rt: RuntimeConfig,
    cfg: CfarConfig,
    interpret: bool = False,
    *,
    active_lo: jnp.ndarray | None = None,
    active_hi: jnp.ndarray | None = None,
) -> CfarOutput:
    """Runtime CA/GOS kernel dispatch for GOSCA elaborations.

    The reference switches the CA/GOS algorithm register at runtime
    (``RspChainVanillaTester.scala:124-132``); routing every call of a GOSCA
    elaboration through the sort kernel pays the full window-stack machinery
    even in CA mode (1.10 ms vs the dedicated CA kernel's ~0.45-0.57 ms at the
    [4096x1024] tail scale, benchmarks/results_r2.json). Both kernels live
    under ONE ``lax.cond`` on the register, so the no-recompile contract holds:
    CA algorithm + non-CASH mode takes the box-sum kernel, everything else the
    GOS/CASH kernel. The CA datapaths of both kernels compute identical dyadic
    box sums (each golden-validated against ``ops.cfar``)."""
    from ..configs import CfarVariant

    if cfg.variant is CfarVariant.GOS and not cfg.include_cash:
        # pure-GOS elaboration: the CA algorithm register is not compiled in
        return fused_mag_gos_cfar(spectrum, rt, cfg, interpret,
                                  active_lo=active_lo, active_hi=active_hi)
    ca_like = (rt.cfar_algorithm == 0) & (rt.cfar_mode != 3)
    return jax.lax.cond(
        ca_like,
        lambda s: fused_mag_cfar(s, rt, cfg, interpret,
                                 active_lo=active_lo, active_hi=active_hi),
        lambda s: fused_mag_gos_cfar(s, rt, cfg, interpret,
                                     active_lo=active_lo, active_hi=active_hi),
        spectrum,
    )


def fused_tail_kind(chain_cfg) -> str | None:
    """Which fused mag+CFAR kernel (if any) carries this elaboration's
    semantics: ``"ca"`` (box-sum kernel), ``"gos"`` (VMEM-sort kernel), or
    ``None`` (XLA tail required). Shared by the chain builder
    (``presets.tail_stages``) and the range-sharded tail
    (``parallel.sharded``) so both route identically.

    Fallback conditions (the kernels implement PARTIAL-edge, float, plain-out
    semantics only): CASH mode needs the GOS kernel's elaborated sub-window
    machinery; sendCut/emit_noise need extra outputs; WRAP/REFLECT edge
    policies, fixed-point fidelity boundaries, and the LUT-truncated log2 live
    on the XLA path. Frame-length alignment (N % 128 / % GOS_RANGE_TILE) is
    checked at the call site where N is known."""
    from ..configs import CfarVariant, EdgePolicy

    cfar = chain_cfg.cfar
    if not cfar.use_pallas:
        return None
    if cfar.send_cut or cfar.emit_noise:
        return None
    if cfar.edge_policy is not EdgePolicy.PARTIAL:
        return None
    if chain_cfg.fixed_point.enabled or chain_cfg.mag.use_lut_log:
        return None
    if cfar.max_ref_window + cfar.max_guard_window + 1 > PAD:
        # past the kernels' circular single-pad scratch bound — eligibility
        # must imply the kernel call succeeds (otherwise a legal elaboration
        # crashes at call time instead of composing the XLA tail)
        return None
    if cfar.variant is CfarVariant.CA and not cfar.include_cash:
        return "ca" if cfar.max_ref_window <= 1 << MAX_LOG2_W else None
    if cfar.variant in (CfarVariant.GOS, CfarVariant.GOSCA):
        return "gos"
    return None
