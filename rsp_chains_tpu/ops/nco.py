"""NCO — numerically controlled oscillator (SURVEY §2.2).

TPU-native rebuild of ``AXI4NCOLazyModuleBlock`` (constructor ``RspChain.scala:42``,
``FixedNCOParams`` at ``RspChainVanillaTester.scala:192-204``). The hardware is a
``phase_width``-bit phase accumulator driven by the PLFG frequency-word stream
(``pincType = Streaming``: ``nco.freq := plfg.streamNode``, ``RspChain.scala:57``)
indexing a sine/cosine LUT of ``table_size`` entries (quadrant-folded; the tested
config has table_size=128, phase_width=9 => 512 phase positions = 4*table_size).

Phase contract: a constant word ``s`` yields a phase step of ``s / 2^phase_width`` =
``s / (4*table_size)`` cycles/sample, hence the reference's peak-bin formula
``s * N / (4*table_size)`` (``RspChainVanillaTester.scala:85``). Output is
``Complex(cos, sin)`` scaled to +/-2^(table_width-2) = 2^14, first sample emitted
*after* one accumulation step (the golden model indexes i = 1..N,
``RspChainTesterUtils.scala:174-181``).

TPU-first: the serial accumulator becomes ``jnp.cumsum`` over the word stream (an
O(log T) parallel scan under XLA) and the LUT becomes either an exact complex
exponential (fast float path — XLA fuses sin/cos into the surrounding pipeline) or
a quantized table gather (``quantized_lut`` fidelity mode reproducing 16-bit LUT
outputs)."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..configs import NcoConfig


@functools.lru_cache(maxsize=None)
def _lut_np(table_size: int, table_width: int) -> np.ndarray:
    """Full-cycle complex LUT with 4*table_size positions, values truncated to
    integers at amplitude 2^(table_width-2) like the hardware table."""
    n = 4 * table_size
    amp = 2.0 ** (table_width - 2)
    ph = 2 * np.pi * np.arange(n) / n
    return (np.trunc(amp * np.cos(ph)) + 1j * np.trunc(amp * np.sin(ph))).astype(
        np.complex64
    )


def nco(
    freq_words: jnp.ndarray,
    cfg: NcoConfig = NcoConfig(),
    phase_offset: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Convert a frequency-word stream into complex IQ samples.

    Args:
      freq_words: [..., T] float32/int32 phase increments (PLFG words, possibly
        including a traced runtime start value).
      cfg: static NCO parameters.
      phase_offset: ``poffType = Fixed`` phase offset in *phase-accumulator units*
        (same units as the words).

    Returns complex64 [..., T]: amplitude-2^(table_width-2) IQ samples.
    """
    words = jnp.asarray(freq_words, jnp.float32)
    modulus = float(2 ** cfg.phase_width)  # = 4 * table_size in the tested config
    if cfg.phase_acc_enable:
        phase = jnp.cumsum(words, axis=-1)  # inclusive: first output after 1 step
    else:
        phase = words
    phase = phase + jnp.asarray(phase_offset, jnp.float32)

    if cfg.quantized_lut:
        idx = jnp.mod(jnp.round(phase), modulus).astype(jnp.int32)
        lut = jnp.asarray(_lut_np(cfg.table_size, cfg.table_width))
        return jnp.take(lut, idx, axis=0)

    angle = (2.0 * np.pi / modulus) * jnp.mod(phase, modulus)
    amp = cfg.amplitude
    return (amp * jnp.cos(angle) + 1j * amp * jnp.sin(angle)).astype(jnp.complex64)
