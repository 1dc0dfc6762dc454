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


def _roll_right(x, s):
    """Rotate right (toward higher lane index) by traced amount ``s`` via
    bit-decomposed conditional static rolls: out[i] = x[(i - s) mod width]."""
    for k in range(SHIFT_BITS):
        bit = ((s >> k) & 1) == 1
        x = jnp.where(bit, pltpu.roll(x, 1 << k, axis=1), x)
    return x


def _roll_left(x, s):
    """Rotate left by traced ``s``: out[i] = x[(i + s) mod width]."""
    width = x.shape[-1]
    for k in range(SHIFT_BITS):
        bit = ((s >> k) & 1) == 1
        x = jnp.where(bit, pltpu.roll(x, width - (1 << k), axis=1), x)
    return x


def _kernel(
    # scalar prefetch (SMEM)
    scal_ref,              # [8] int32: log2w, guard, div, mode, log_or_linear,
                           #            peak_grouping, n_active, mag_mode
    fscal_ref,             # [1] float32: threshold scaler
    # VMEM operands
    re_ref, im_ref,        # [F, N] spectrum
    thr_ref, pk_ref,       # [F, N] outputs
    *,
    n: int,
):
    log2w = scal_ref[0]
    guard = scal_ref[1]
    div = scal_ref[2]
    mode = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    n_active = scal_ref[6]
    mag_mode = scal_ref[7]
    scaler = fscal_ref[0]

    re = re_ref[:, :]
    im = im_ref[:, :]
    f = re.shape[0]

    # ---- magnitude (fused logMagMux, VPU) ----
    ar, ai = jnp.abs(re), jnp.abs(im)
    u, v = jnp.maximum(ar, ai), jnp.minimum(ar, ai)
    jpl = jnp.maximum(u + 0.125 * v, 0.875 * u + 0.5 * v)
    sqr = re * re + im * im
    absm = jnp.sqrt(sqr)
    log2m = jnp.log2(jnp.maximum(jpl, 1e-30))
    mag = jnp.where(
        mag_mode == 0, absm,
        jnp.where(mag_mode == 1, sqr, jnp.where(mag_mode == 2, jpl, log2m)),
    )

    # mask cells beyond the active frame (runtime fftSize register)
    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    active = col < n_active
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
    lag_row = _roll_right(sel, guard + 1)     # lag(i) = sel[i - guard - 1]
    lead_row = _roll_left(sel, guard + w)     # lead(i) = sel[i + guard + w]
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

    thr_ref[:, :] = thr
    pk_ref[:, :] = pk_u8


def fused_mag_cfar(
    spectrum: jnp.ndarray,
    rt: RuntimeConfig,
    cfg: CfarConfig,
    interpret: bool = False,
) -> CfarOutput:
    """Fused logmag + CA/GO/SO CFAR over the last axis of a complex spectrum.

    ``spectrum``: [..., N] pair (``cplx.C``) or complex array, N a multiple of
    128. Returns CfarOutput (threshold float32, peaks bool). Requires a
    CA-family configuration (the GOS/CASH sort paths run via ``ops.cfar``)."""
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

    log2w = jnp.round(jnp.log2(jnp.clip(
        rt.ref_window_size, 1, cfg.max_ref_window).astype(jnp.float32))).astype(jnp.int32)
    scalars = jnp.stack([
        log2w,
        rt.guard_window_size.astype(jnp.int32),
        rt.div_sum.astype(jnp.int32),
        rt.cfar_mode.astype(jnp.int32),
        rt.log_or_linear.astype(jnp.int32),
        rt.peak_grouping.astype(jnp.int32),
        jnp.minimum(rt.fft_size, n).astype(jnp.int32),
        rt.mag_mode.astype(jnp.int32),
    ])
    fscal = rt.threshold_scaler.astype(jnp.float32).reshape(1)

    grid = (f_tot // BLOCK_FRAMES,)
    kernel = functools.partial(_kernel, n=n)

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
