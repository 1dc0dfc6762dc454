"""Doppler (slow-time) FFT over the pulse axis of a CPI (BASELINE config 3).

The reference processes a single range line per frame; the 2-D range-Doppler map is
the north-star extension (SURVEY §2.3: "Used twice in 2D: range FFT over fast time,
Doppler FFT over slow time"). The pulse axis is axis -2 of a ``[..., P, N]`` CPI
block. Implemented with the same four-step MXU FFT by transposing the pulse axis
last (a relayout XLA handles natively)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..configs import DopplerConfig, FftScaling
from .fft import four_step_fft
from .windows import window as make_window


def doppler_fft(cpi: jnp.ndarray, cfg: DopplerConfig = DopplerConfig()) -> jnp.ndarray:
    """Doppler transform of a CPI block over axis -2 (pulses).

    ``cpi``: complex [..., P, N] (P pulses, N range bins). Returns [..., P, N]
    Doppler-transformed (optionally windowed, fftshifted so zero Doppler is
    centered)."""
    p = cpi.shape[-2]
    assert (p & (p - 1)) == 0, "num_pulses must be a power of two"
    x = cpi
    if cfg.window is not None:
        w = jnp.asarray(make_window(cfg.window, p))
        x = x * w[..., :, None]
    xt = jnp.swapaxes(x, -1, -2)           # [..., N, P] — pulses last for the FFT
    yt = four_step_fft(xt, p)
    if cfg.scaling is FftScaling.DIV_N:
        yt = yt / p
    elif cfg.scaling is FftScaling.SQRT_N:
        yt = yt / float(np.sqrt(p))
    y = jnp.swapaxes(yt, -1, -2)           # back to [..., P, N]
    if cfg.fft_shift:
        y = jnp.roll(y, p // 2, axis=-2)
    return y
