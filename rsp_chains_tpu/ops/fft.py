"""Runtime-sized FFT — TPU-native rebuild of the SDF-FFT generator (SURVEY §2.3).

The reference's ``AXI4FFTBlock`` is a streaming radix-2 single-path delay-feedback
pipeline with a *runtime-variable* size register ("number of active stages",
``RspChainVanillaTester.scala:96``) bounded by the elaborated ``numPoints``
(``FFTParams.fixed`` at ``RspChainVanillaTester.scala:205-217``). Its tested scaling
configuration (expandLogic all-0, keepMSBorLSB all-MSB) divides by 2 per stage, so
the output equals FFT(x)/N — matching the tester golden
``fourierTr(...)/fftSize`` (``FftMagCfarChainTester.scala:77``).

TPU-first design decisions (NOT a translation of the SDF pipeline):

* The per-sample butterfly pipeline becomes a whole-array transform over frames of
  static shape ``[..., max_size]``.
* **MXU path**: the FFT is computed as a Bailey four-step factorization
  N = N1 x N2 -> two batched small complex matmuls against DFT matrices plus one
  twiddle multiply. For N = 1024 this is two [32x32] matmul sweeps: ~N*(N1+N2)
  complex MACs/frame, and every FLOP lands on the systolic array. XLA decomposes
  complex64 dots into real matmuls automatically. This beats both a scalar-style
  radix-2 network (VPU-bound, log-depth dependency chain) and a naive full DFT
  matmul (N^2 MACs).
* **Runtime size without recompile**: the "number of active stages" register maps to
  a ``lax.switch`` over all compiled log2 sizes in [min_log2_size, log2(max_size)].
  Every branch has static shapes (slice x[..., :n], transform, zero-pad to
  max_size), all branches are compiled exactly once; changing the traced
  ``log2_fft_size`` scalar between calls selects a branch with no recompilation.
  This mirrors the hardware's elaborate-max/configure-at-runtime split exactly.
* ``useBitReverse = true`` (natural-order output) is the only ordering offered —
  bit-reversed order is an artifact of the hardware SDF datapath.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import FftConfig, FftScaling
from .windows import window as make_window


@functools.lru_cache(maxsize=None)
def _dft_matrix_np(n: int) -> np.ndarray:
    k = np.arange(n)
    return np.exp(-2j * np.pi * np.outer(k, k) / n).astype(np.complex64)


def dft_matrix(n: int) -> np.ndarray:
    """The n-point DFT matrix W[k, m] = exp(-2j pi k m / n) (host constant)."""
    return _dft_matrix_np(n)


@functools.lru_cache(maxsize=None)
def _four_step_consts(n: int):
    """Precompute (F1 [N1,N1], F2 [N2,N2], twiddle [N1,N2]) for N = N1*N2."""
    p = int(np.log2(n))
    n1 = 1 << ((p + 1) // 2)
    n2 = 1 << (p // 2)
    f1 = _dft_matrix_np(n1)
    f2 = _dft_matrix_np(n2)
    k1 = np.arange(n1)[:, None]
    m2 = np.arange(n2)[None, :]
    tw = np.exp(-2j * np.pi * k1 * m2 / n).astype(np.complex64)
    return n1, n2, f1, f2, tw


def four_step_fft(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """n-point FFT of the last axis via the four-step (Cooley-Tukey N1xN2)
    factorization, as batched MXU matmuls. ``x.shape[-1] == n`` (static).

    Derivation: with input index m = N2*m1 + m2 and output index k = k1 + N1*k2,
      X[k1 + N1 k2] = sum_{m2} W_N^{m2 k1} W_{N2}^{m2 k2}
                      * (sum_{m1} x[N2 m1 + m2] W_{N1}^{m1 k1})
    i.e. DFT columns (length N1), twiddle, DFT rows (length N2), transpose.
    """
    if n <= 64:
        f = jnp.asarray(_dft_matrix_np(n))
        return jnp.einsum("km,...m->...k", f, x)
    n1, n2, f1, f2, tw = _four_step_consts(n)
    f1 = jnp.asarray(f1)
    f2 = jnp.asarray(f2)
    tw = jnp.asarray(tw)
    xm = x.reshape(x.shape[:-1] + (n1, n2))          # [..., m1, m2]
    a = jnp.einsum("km,...mj->...kj", f1, xm)        # DFT over m1 -> [..., k1, m2]
    b = a * tw                                       # twiddle
    c = jnp.einsum("lj,...kj->...kl", f2, b)         # DFT over m2 -> [..., k1, k2]
    # output index k = k1 + N1*k2 -> k2 must be the slower axis
    out = jnp.swapaxes(c, -1, -2).reshape(x.shape[:-1] + (n,))
    return out


def _scale_factor(n: int, scaling: FftScaling) -> float:
    if scaling is FftScaling.DIV_N:
        return 1.0 / n
    if scaling is FftScaling.SQRT_N:
        return 1.0 / float(np.sqrt(n))
    return 1.0


def _fixed_size_fft(x: jnp.ndarray, n: int, cfg: FftConfig) -> jnp.ndarray:
    """FFT of the first n samples of the last axis, zero-padded back to max size."""
    xa = x[..., :n]
    if cfg.window is not None:
        xa = xa * jnp.asarray(make_window(cfg.window, n))
    y = four_step_fft(xa, n) if cfg.use_mxu else jnp.fft.fft(xa, axis=-1)
    if cfg.expand_logic is not None:
        # per-stage growth enables (FFTParams.expandLogic): each active
        # non-expanding stage halves; only the first log2(n) stages are active
        # at runtime size n (the hardware bypasses the rest)
        stages = cfg.expand_logic[: int(np.log2(n))]
        y = y * float(2.0 ** -sum(1 for e in stages if not e))
    else:
        y = y * _scale_factor(n, cfg.scaling)
    pad = x.shape[-1] - n
    if pad:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad)])
    return y.astype(x.dtype)


def fft_op(
    x: jnp.ndarray,
    log2_fft_size: Optional[jnp.ndarray] = None,
    cfg: FftConfig = FftConfig(),
) -> jnp.ndarray:
    """The FFT stage. ``x``: complex [..., max_size] frames.

    With ``cfg.runtime_size`` (the reference's ``runTime = true``), the traced
    scalar ``log2_fft_size`` (the base+0 "active stages" register,
    ``RspChainVanillaTester.scala:96``) selects the active size n = 2^log2_fft_size;
    the first n samples of each frame are transformed and bins [n:max_size] are
    zero. With a static size the single branch is inlined.
    """
    assert x.shape[-1] == cfg.max_size, (
        f"frame length {x.shape[-1]} != elaborated max_size {cfg.max_size}"
    )
    if not cfg.runtime_size or log2_fft_size is None:
        return _fixed_size_fft(x, cfg.max_size, cfg)
    lo = cfg.min_log2_size
    hi = cfg.log2_max
    branches = [
        functools.partial(_fixed_size_fft, n=1 << p, cfg=cfg)
        for p in range(lo, hi + 1)
    ]
    idx = jnp.clip(log2_fft_size - lo, 0, hi - lo)
    return jax.lax.switch(idx, branches, x)


def ifft_op(x: jnp.ndarray, n: Optional[int] = None) -> jnp.ndarray:
    """Inverse FFT along the last axis via the forward four-step kernel:
    ifft(x) = conj(fft(conj(x))) / n. Used by the matched filter."""
    n = n if n is not None else x.shape[-1]
    return jnp.conj(four_step_fft(jnp.conj(x), n)) / n


def rfft_op(x: jnp.ndarray) -> jnp.ndarray:
    """Real-input FFT of the last axis (length n, power of two) -> n//2+1 bins.

    Real ADC streams (the reference's ``getTone`` real test vectors,
    ``RspChainTesterUtils.scala:39-41``) carry no imaginary part; feeding them
    through the complex path wastes half the HBM bandwidth of the chain's
    dominant stage. Standard pack trick: treat even/odd samples as one
    n/2-point complex sequence, transform, untangle with one twiddle pass —
    ~2x cheaper than the complex FFT of the zero-imag input."""
    n = x.shape[-1]
    assert (n & (n - 1)) == 0, "length must be a power of two"
    h = n // 2
    z = x[..., 0::2] + 1j * x[..., 1::2].astype(jnp.float32)
    zf = four_step_fft(z.astype(jnp.complex64), h)
    # untangle: X[k] = E[k] + e^{-2pi i k / n} O[k]
    zfc = jnp.conj(jnp.concatenate([zf[..., :1], zf[..., :0:-1]], axis=-1))
    e = 0.5 * (zf + zfc)
    o = -0.5j * (zf - zfc)
    k = jnp.arange(h)
    tw = jnp.exp(-2j * jnp.pi * k / n).astype(jnp.complex64)
    full = e + tw * o                      # bins 0..h-1
    nyq = (e[..., :1].real - o[..., :1].real
           + 0j).astype(jnp.complex64)    # bin h = E[0] - O[0]
    return jnp.concatenate([full, nyq], axis=-1)
