"""Beamforming over the channel axis (multi-channel front end).

The reference processes one channel per elaborated chain; multi-channel arrays
would be N chain instances (SURVEY §2.15 "data parallel over channels/beams").
On TPU the channel axis is where the MXU shines: conventional (Bartlett)
beamforming is one ``[beams, channels] x [channels, samples]`` complex matmul —
exactly the shape the systolic array wants — so beam formation is effectively
free inside the chain jit.

Conventions: channels along axis ``-2`` of ``[..., C, T]`` blocks (fast time /
range last, like everywhere else in the framework). Steering for a uniform
linear array (ULA) with half-wavelength spacing by default.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ula_steering(num_channels: int, angles_rad, spacing_wavelengths: float = 0.5) -> np.ndarray:
    """Steering matrix A [beams, channels] for a uniform linear array:
    A[b, c] = exp(-j 2 pi d c sin(theta_b))."""
    angles = np.atleast_1d(np.asarray(angles_rad, np.float64))
    c = np.arange(num_channels)
    phase = -2j * np.pi * spacing_wavelengths * np.outer(np.sin(angles), c)
    return np.exp(phase).astype(np.complex64)


def beamform(x: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted beam formation: ``x`` [..., C, T] complex, ``weights``
    [B, C] (conjugated internally, conventional beamformer). Returns [..., B, T].

    One complex matmul -> MXU; XLA fuses it with adjacent elementwise stages."""
    return jnp.einsum("bc,...ct->...bt", jnp.conj(weights), x)


def fft_beamform(x: jnp.ndarray) -> jnp.ndarray:
    """DFT across the channel axis: C uniformly spaced beams at spatial
    frequencies k/C (the spatial analog of the range FFT). ``x`` [..., C, T] ->
    [..., C, T] beam space."""
    from .fft import four_step_fft

    c = x.shape[-2]
    xt = jnp.swapaxes(x, -1, -2)
    if c & (c - 1) == 0:
        yt = four_step_fft(xt, c)
    else:
        a = jnp.asarray(
            np.exp(-2j * np.pi * np.outer(np.arange(c), np.arange(c)) / c)
            .astype(np.complex64))
        yt = jnp.einsum("kc,...c->...k", a, xt)
    return jnp.swapaxes(yt, -1, -2)
