"""Matched filter / pulse compression (BASELINE config 2; north-star addition per
SURVEY §7 — the reference checkout has no matched filter, but its chirp front end
(PLFG+NCO) is exactly the waveform such a filter compresses).

Two TPU-native paths:

* ``matched_filter`` — per-frame frequency-domain correlation
  ``ifft(fft(x) * conj(fft(ref)))`` built on the four-step MXU FFT. One fused jit
  region: forward FFT, conjugate multiply (VPU, fused), inverse FFT.
* ``overlap_save_fir`` — streaming/continuous convolution over long sequences via
  overlap-save blocks; the (num_taps - 1)-sample left halo per block is exactly the
  shard-boundary halo the ``parallel`` layer exchanges over ICI when the range axis
  is sharded (SURVEY §2.15 / §5.7).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..configs import MatchedFilterConfig
from .fft import four_step_fft, ifft_op


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def matched_filter(
    x: jnp.ndarray,
    taps: jnp.ndarray,
    cfg: MatchedFilterConfig = MatchedFilterConfig(),
) -> jnp.ndarray:
    """Circular pulse compression along the last axis (frame-sized FFT).

    ``x``: [..., N] complex frames (N a power of two); ``taps``: [M] the transmit
    replica (M <= N). Output [..., N]: correlation of x with the replica, peak at
    the target delay. Matches ``golden.matched_filter_golden(mode="circular")``.
    """
    n = x.shape[-1]
    assert (n & (n - 1)) == 0, "frame length must be a power of two"
    h = jnp.zeros((n,), x.dtype).at[: taps.shape[0]].set(taps.astype(x.dtype))
    hf = jnp.conj(four_step_fft(h, n))
    if cfg.normalize:
        hf = hf / jnp.maximum(jnp.linalg.norm(taps), 1e-30)
    xf = four_step_fft(x, n)
    return ifft_op(xf * hf, n)


def overlap_save_fir(
    x: jnp.ndarray,
    taps: jnp.ndarray,
    block_size: int | None = None,
) -> jnp.ndarray:
    """Linear convolution of a long last axis with ``taps`` via overlap-save.

    ``x``: [..., T]; returns [..., T] (same-alignment output: y[t] =
    sum_m taps[m] * x[t - m], zero-padded history). Each block of length B reads a
    left halo of (M-1) samples — the halo that crosses chip boundaries when T is
    sharded (see ``parallel.halo``)."""
    m = taps.shape[0]
    t = x.shape[-1]
    b = block_size or max(_next_pow2(4 * m), 256)
    nfft = _next_pow2(b + m - 1)
    nblk = -(-t // b)
    pad_t = nblk * b

    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(m - 1, pad_t - t)])
    # gather overlapping blocks: block i covers xp[i*b : i*b + b + m - 1]
    idx = (jnp.arange(nblk)[:, None] * b + jnp.arange(b + m - 1)[None, :])
    blocks = jnp.take(xp, idx.reshape(-1), axis=-1).reshape(
        x.shape[:-1] + (nblk, b + m - 1)
    )
    blocks = jnp.pad(blocks, [(0, 0)] * (blocks.ndim - 1) + [(0, nfft - (b + m - 1))])

    h = jnp.zeros((nfft,), x.dtype).at[:m].set(taps.astype(x.dtype))
    hf = four_step_fft(h, nfft)
    yf = four_step_fft(blocks, nfft) * hf
    y = ifft_op(yf, nfft)[..., m - 1 : m - 1 + b]  # valid part of each block
    y = y.reshape(x.shape[:-1] + (pad_t,))[..., :t]
    return y


def mf_reference_taps(chirp: np.ndarray) -> np.ndarray:
    """Matched-filter taps for a transmit replica: time-reversed conjugate."""
    return np.conj(chirp[::-1]).astype(np.complex64)
