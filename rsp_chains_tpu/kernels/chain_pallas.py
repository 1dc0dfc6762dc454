"""Single-kernel FFT + magnitude + CA-CFAR chain (the r2 headline kernel).

r1 ran the four-step FFT as XLA matmuls and fused only mag+CFAR
(``cfar_pallas._kernel``); the spectrum made a full HBM round trip between the
two, and each un-fused matmul pass added its own. This kernel runs the WHOLE
principal chain per frame-tile with everything after the input read resident
in VMEM: the only HBM traffic is one read of the IQ pair and one write of
threshold + peaks — the minimum any implementation can do.

In-kernel FFT plan for n = n1·128 (n1 ∈ {2, 4, 8}; decimation m = 128·m1 + m2,
output split k = k1 + n1·k2 — the four-step factorization arranged so every
lane access is 128-aligned):

1. **radix-n1 pass** (VPU): a_{k1}[m2] = Σ_{m1} W_{n1}^{m1·k1} · x_{m1}[m2]
   over the n1 static 128-lane blocks — host-unrolled radix-2 Cooley-Tukey
   butterflies (n1·log2(n1)/2 of them) instead of the direct n1² coefficient
   sum; exact-zero/±1/±i twiddles are folded at build time.
2. **twiddle** (VPU): ⊙ W_N^{k1·m2}, a precomputed [2, n] operand.
3. **DFT-128 pass** (MXU): per k1 block, [F,128] @ F128 via Gauss's 3-real-
   matmul complex product; the chain's FFT scaling (DIV_N / expandLogic) is
   folded into the F128 constants.
4. **magnitude first, then output interleave**: X[k1 + n1·k2] sits at
   c[128·k1 + k2] — a bit-rotation of the lane index, realized as a sequence
   of bit-transposition roll/select steps built and exhaustively verified on
   the host (``_bit_perm_steps``). The magnitude is elementwise, so it
   commutes with the permutation: computing |·| in block order and permuting
   the ONE magnitude row costs half the roll/select traffic of permuting the
   re/im pair (the permutation is the kernel's largest VPU item). The
   per-lane take-left/take-right masks are host-precomputed int32 operands
   (``_perm_masks``), not in-kernel iota/shift/compare chains.
   ``perm_impl='fold'`` (the shipped default) shrinks this to log2(n1)
   steps: the pass-3 DFT COLUMN ORDER is free, and reordering it by
   ``_fold_sigma`` absorbs the within-block part of the rotation into the
   constants, leaving only the disjoint bit-field swaps (i <-> i+7,
   i < log2(n1)) — 3 steps at N=1024 instead of 9 (or the dense [N, N]
   permutation matmul), 5 at 4096 instead of 11, exact on f32 (no hi/lo
   split). On-chip (results_r3.json): headline 1.271 -> 0.961 ms
   (17.5 Gs/s, dthr 1.4e-6 / 0 flips vs the mxu form), pc4096
   0.524 -> 0.422 ms (bit-identical to 'roll').
5. the shared CA/GO/SO CFAR body (``cfar_pallas._ca_cfar_body``).

Runtime registers (same 9-scalar file as the spectrum kernel) stay traced —
no recompiles. The runtime FFT-size register is honored at the chain level:
the full-size branch runs this kernel, smaller sizes take the XLA FFT +
spectrum-kernel path under ``lax.cond`` (see ``fused_chain_ca_op``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..configs import CfarConfig, FftConfig, RuntimeConfig
from ..ops.cfar import CfarOutput
from .cfar_pallas import _ca_cfar_body, _magnitude

# frame-tile height: 128 sublanes measured 0.41 ms vs 0.78 ms at 32 for the
# bench CPI on v5e (bigger DMA bursts + fewer grid steps; benchmarks/profile_r2d).
# r3 drift-controlled A/B (profile_r3g, interleaved reps): 256 is a consistent
# ~8% further win at the headline shapes (0.88-1.01 vs 0.99-1.18 ms,
# bit-identical) — applied for n1 <= 8 by fused_chain_ca; 4096-point frames
# measured a wash and keep 128
CHAIN_BLOCK_FRAMES = 128
CHAIN_BLOCK_FRAMES_SMALL_N = 256

_EPS = 1e-12


@functools.lru_cache(maxsize=None)
def _bit_perm_steps(n: int, n1: int):
    """Roll/select steps realizing out[o] = c[s(o)] with
    s(o) = 128·(o mod n1) + (o div n1) — a bit-rotation of log2(n) index bits.

    Each step is a bit transposition (p, q), p < q: lanes with bit_p=1,bit_q=0
    take the value from distance +d (d = 2^q − 2^p, roll left), the mirrored
    group from −d. The step sequence is verified exhaustively here, at build
    time, against the target index map."""
    bits = int(np.log2(n))
    r = int(np.log2(n1))
    o = np.arange(n)
    s = 128 * (o % n1) + (o // n1)          # target: out[o] = c[s[o]]

    # bit map: bit b of s(o) equals bit beta(b) of o
    beta = np.zeros(bits, np.int64)
    for b in range(bits):
        src = s[1 << b]                      # s of the index with only bit b
        # find which single bit of o=2^b lands where: s is linear over bit
        # selection, s(2^b) is a power of two
        beta_pos = int(np.log2(src))
        beta[beta_pos] = b
    # decompose the bit permutation into transpositions (cycle following)
    perm = {i: int(beta[i]) for i in range(bits)}
    trans = []
    seen = set()
    for start in range(bits):
        if start in seen:
            continue
        cyc = [start]
        seen.add(start)
        j = perm[start]
        while j != start:
            cyc.append(j)
            seen.add(j)
            j = perm[j]
        for t in range(len(cyc) - 1, 0, -1):
            trans.append((cyc[0], cyc[t]))

    def apply_transposition(idx_map, p, q):
        i = np.arange(n)
        bp = (i >> p) & 1
        bq = (i >> q) & 1
        tau = i ^ (((bp ^ bq) << p) | ((bp ^ bq) << q))
        return idx_map[tau]

    # choose the order (forward/reverse) that composes to s; assert it
    for seq in (trans, trans[::-1]):
        cur = np.arange(n)
        for p, q in seq:
            cur = apply_transposition(cur, p, q)
        if np.array_equal(cur, s):
            steps = []
            for p, q in seq:
                p, q = min(p, q), max(p, q)
                steps.append((p, q, (1 << q) - (1 << p)))
            return tuple(steps)
    raise AssertionError("bit-permutation decomposition failed")


@functools.lru_cache(maxsize=None)
def _perm_masks(n: int, n1: int):
    """Host-precomputed per-step lane masks for the interleave: int32
    [n_steps, n] with 1 = take from lane i+d, 2 = take from lane i−d,
    0 = keep."""
    steps = _bit_perm_steps(n, n1)
    i = np.arange(n)
    m = np.zeros((len(steps), n), np.int32)
    for s, (p, q, _d) in enumerate(steps):
        bp = (i >> p) & 1
        bq = (i >> q) & 1
        m[s] = np.where((bp == 1) & (bq == 0), 1,
                        np.where((bp == 0) & (bq == 1), 2, 0))
    return m


@functools.lru_cache(maxsize=None)
def _perm_matrix(n: int, n1: int):
    """The interleave as a 0/1 permutation matrix P (bf16 — 0/1 is exact):
    ``(x @ P)[o] = x[s(o)]`` with s(o) = 128·(o mod n1) + o div n1. Each P
    column has exactly one 1, so ``hi @ P`` is an exact lane permutation — the
    hi/lo bf16 split of a f32 row permutes exactly up to the ~2⁻¹⁷ split
    residual. Two single-pass MXU matmuls replace the 9-step roll/select
    network when the MXU is otherwise idle (r2j: MXU ≈ 0.14 ms of a 1.7 ms
    VPU-bound kernel)."""
    import ml_dtypes

    o = np.arange(n)
    s = 128 * (o % n1) + (o // n1)
    p = np.zeros((n, n), np.float32)
    p[s, o] = 1.0
    return p.astype(ml_dtypes.bfloat16)


@functools.lru_cache(maxsize=None)
def _fold_sigma(n1: int):
    """Pass-3 column order that folds most of the output interleave into the
    DFT constants: within every k1 block, the DFT output placed at
    within-block lane l is k2 = sigma(l) = (l div n1) + (128/n1)·(l mod n1).
    With this layout the remaining natural-ordering permutation is exactly
    a = log2(n1) DISJOINT bit-field swaps (lane-index bits i <-> i+7,
    i < a) — 3 roll/select steps at N=1024 instead of the 9-step rotation
    network or the dense [N, N] permutation matmul (``_fold_perm_steps``)."""
    el = np.arange(128)
    return ((el // n1) + (128 // n1) * (el % n1)).astype(np.int64)


@functools.lru_cache(maxsize=None)
def _fold_perm_steps(n: int, n1: int):
    """The residual interleave steps under the ``_fold_sigma`` column order:
    swap lane-index bits (i, i+7) for i < log2(n1). Disjoint transpositions —
    order-independent. Verified exhaustively at build time: composing the
    steps over the sigma-reordered block layout must yield natural order."""
    a = int(np.log2(n1))
    steps = tuple((i, i + 7, (1 << (i + 7)) - (1 << i)) for i in range(a))

    # exhaustive check: block position 128·k1 + l holds X[k1 + n1·sigma(l)];
    # applying the steps (out[o] = c[tau(o)]) must leave X[o] at lane o
    sigma = _fold_sigma(n1)
    j = np.arange(n)
    held = (j // 128) + n1 * sigma[j % 128]       # X index held at lane j
    o = np.arange(n)
    for p, q, _d in steps:
        bp = (o >> p) & 1
        bq = (o >> q) & 1
        o = o ^ (((bp ^ bq) << p) | ((bp ^ bq) << q))
    assert np.array_equal(held[o], np.arange(n)), "fold decomposition failed"
    return steps


@functools.lru_cache(maxsize=None)
def _fold_masks(n: int, n1: int):
    """Host-precomputed per-step lane masks for the folded interleave
    (layout matching ``_perm_masks``: 1 = take +d, 2 = take −d, 0 = keep)."""
    steps = _fold_perm_steps(n, n1)
    i = np.arange(n)
    m = np.zeros((max(len(steps), 1), n), np.int32)
    for s, (p, q, _d) in enumerate(steps):
        bp = (i >> p) & 1
        bq = (i >> q) & 1
        m[s] = np.where((bp == 1) & (bq == 0), 1,
                        np.where((bp == 0) & (bq == 1), 2, 0))
    return m


@functools.lru_cache(maxsize=None)
def _sinv_map(n: int, n1: int):
    """Natural cell index held by BLOCK-order lane j: the inverse of the
    interleave s(o) = 128·(o mod n1) + o div n1, i.e.
    sinv(j) = (j div 128) + n1·(j mod 128)."""
    j = np.arange(n)
    return ((j // 128) + n1 * (j % 128)).astype(np.int32)


def _box_band_operand(n: int, n1: int, w, guard, inv_div, active_lo, active_hi,
                      ext: int | None = None):
    """The CFAR sliding-window sums as a runtime-built 0/1-band MXU operand.

    Returns a bf16 matrix B such that ``mag_block @ B`` yields the
    natural-order lag/lead reference-window sums directly from the BLOCK-order
    magnitude row — the output interleave is folded into the band (row j of B
    is the band row of natural cell ``sinv(j)``), and the CA divider shift
    2^-divSum is folded into the band *values* (a power of two — exact in
    bf16). Every runtime register (window size, guard, divSum, active range)
    lives in the operand's VALUES, so reconfiguration is plain data: no
    recompile, no pl.when gating, no bit-decomposed rolls.

    ``ext=None``: [N, 2N] — lag-sum columns then lead-sum columns.
    ``ext=E``:   [N, N+E] — lag sums for natural cells 0..N+E-1; the kernel
    derives the lead sums by a runtime rotation (lead(c) = lag(c+2g+w+1),
    exact because the extended columns carry the clipped sums past the frame
    edge) for 2/3 the matmul width.

    Row validity (cells outside [active_lo, active_hi) contribute nothing —
    ``EdgePolicy.PARTIAL`` zero-pad semantics, and the runtime CFAR fftSize
    register) is masked into the band rows, mirroring ``cfar_pallas``'s
    pre-masked magnitude row."""
    k_nat = jnp.asarray(_sinv_map(n, n1))[:, None]            # [N, 1]
    valid = (k_nat >= active_lo) & (k_nat < active_hi)
    if ext is None:
        c = jnp.arange(n, dtype=jnp.int32)[None, :]
        lag = (k_nat >= c - guard - w) & (k_nat <= c - guard - 1)
        lead = (k_nat >= c + guard + 1) & (k_nat <= c + guard + w)
        band = jnp.concatenate([lag & valid, lead & valid], axis=1)
    else:
        c = jnp.arange(n + ext, dtype=jnp.int32)[None, :]
        band = (k_nat >= c - guard - w) & (k_nat <= c - guard - 1) & valid
    return (band.astype(jnp.float32) * inv_div).astype(jnp.bfloat16)


def _ca_cfar_tail(mag, s_lag, s_lead, scal_ref, fscal_ref, n: int):
    """The CA/GO/SO tail after the window sums: mode select, threshold, CUT
    compare, peak grouping. ``mag`` is the natural-order magnitude row,
    ``s_lag``/``s_lead`` the divider-scaled window sums (from the MXU band
    matmul). Pure elementwise VPU + two static ±1 rolls."""
    mode = scal_ref[3]
    log_or_linear = scal_ref[4]
    peak_grouping = scal_ref[5]
    active_hi = scal_ref[6]
    active_lo = scal_ref[8]
    scaler = fscal_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1)
    active = (col >= active_lo) & (col < active_hi)
    mag = jnp.where(active, mag, 0.0)

    noise = jnp.where(
        mode == 1, jnp.maximum(s_lag, s_lead),
        jnp.where(mode == 2, jnp.minimum(s_lag, s_lead),
                  0.5 * (s_lag + s_lead)))
    thr = jnp.where(log_or_linear == 1, noise * scaler, noise + scaler)
    thr = jnp.where(active, thr, 0.0)
    peaks = (mag > thr) & active

    ninf = jnp.float32(-jnp.inf)
    m = jnp.where(active, mag, ninf)
    left = jnp.where(col == 0, ninf, pltpu.roll(m, 1, axis=1))
    right = jnp.where(col == n - 1, ninf, pltpu.roll(m, n - 1, axis=1))
    grouped = peaks & (mag >= left) & (mag >= right)
    pk_u8 = jnp.where(peak_grouping == 1, grouped.astype(jnp.uint8),
                      peaks.astype(jnp.uint8))
    return thr, pk_u8


def _apply_perm_mxu(x, p_ref, stack_hi_lo: bool = False):
    """Permute lanes of [F, n] f32 ``x`` via the hi/lo split and two bf16
    matmuls against the 0/1 permutation operand. ``stack_hi_lo`` issues the
    two split terms as ONE [2F, n] matmul (taller M amortizes the MXU's
    weight-load pipeline) and adds the halves after."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    p = p_ref[:, :]
    if stack_hi_lo:
        f = x.shape[0]
        out = jnp.dot(jnp.concatenate([xh, xl], axis=0), p,
                      preferred_element_type=jnp.float32)
        return out[:f, :] + out[f:, :]
    return (jnp.dot(xh, p, preferred_element_type=jnp.float32)
            + jnp.dot(xl, p, preferred_element_type=jnp.float32))


def _apply_bit_perm(x, pm, n: int, n1: int, steps=None):
    """Apply the verified interleave steps to a [F, n] value. ``pm`` is the
    `_perm_masks` operand value ([n_steps, n] int32), or None to rebuild the
    masks in-kernel from an iota (A/B fallback). ``steps`` overrides the
    default full-rotation step list (the 'fold' path passes its residual
    bit-swap steps, with ``pm`` built by ``_fold_masks``)."""
    if steps is None:
        steps = _bit_perm_steps(n, n1)
    i = None
    if pm is None:
        i = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s, (p, q, d) in enumerate(steps):
        if pm is None:
            bp = (i >> p) & 1
            bq = (i >> q) & 1
            take_left = (bp == 1) & (bq == 0)
            take_right = (bp == 0) & (bq == 1)
        else:
            sel = pm[s : s + 1, :]                     # [1, n], broadcasts
            take_left = sel == 1
            take_right = sel == 2
        left = pltpu.roll(x, x.shape[1] - d, axis=1)   # [j] = x[j + d]
        right = pltpu.roll(x, d, axis=1)               # [j] = x[j - d]
        x = jnp.where(take_left, left, jnp.where(take_right, right, x))
    return x


@functools.lru_cache(maxsize=None)
def _chain_consts(n: int, scale: float, split_bf16: bool = False,
                  fold_perm: bool = False):
    """Host constants: twiddle rows [2, n] and scaled Gauss triple of the
    128-point DFT [3, 128, 128] (Wr, Wi, Wr+Wi). With ``split_bf16`` the
    triple is returned as a [6, 128, 128] bf16 stack (hi parts then residual
    lo parts) for the two-term bf16 split-matmul path. ``fold_perm`` reorders
    the DFT columns by ``_fold_sigma`` (the ``perm_impl='fold'`` interleave;
    the twiddle multiplies the CONTRACTION axis so it is unaffected)."""
    n1 = n // 128
    j = np.arange(n)
    k1 = j // 128
    m2 = j % 128
    tw = np.exp(-2j * np.pi * (k1 * m2) / n)
    tw_rows = np.stack([tw.real, tw.imag]).astype(np.float32)

    km = np.outer(np.arange(128), np.arange(128))
    f128 = np.exp(-2j * np.pi * km / 128) * scale
    if fold_perm:
        f128 = f128[:, _fold_sigma(n1)]
    wr = f128.real.astype(np.float32)
    wi = f128.imag.astype(np.float32)
    triple = np.stack([wr, wi, wr + wi])
    if split_bf16:
        import ml_dtypes

        hi = triple.astype(ml_dtypes.bfloat16)
        lo = (triple - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return tw_rows, np.concatenate([hi, lo], axis=0)
    return tw_rows, triple


@functools.lru_cache(maxsize=None)
def _chain_consts_folded(n: int, scale: float, split_bf16: bool = False,
                         fold_perm: bool = False):
    """Per-block pass-3 constants with the four-step twiddle FOLDED IN:
    D_k1 = diag(W_N^{k1·m2}) · F128 · scale. The twiddle multiplies A's
    contraction axis elementwise, i.e. it row-scales the B matrix — so pass 2
    disappears into 8 per-block Gauss triples at zero extra MXU cost.
    ``fold_perm``: additionally reorder the DFT output columns by
    ``_fold_sigma`` (the ``perm_impl='fold'`` interleave — also free).

    Returns [n1, 3, 128, 128] f32 (Wr, Wi, Wr+Wi per block), or
    [n1, 6, 128, 128] bf16 (hi triple then lo triple) when ``split_bf16``."""
    n1 = n // 128
    m2 = np.arange(128)
    km = np.outer(m2, np.arange(128))
    f128 = np.exp(-2j * np.pi * km / 128) * scale
    if fold_perm:
        f128 = f128[:, _fold_sigma(n1)]
    blocks = []
    for k1 in range(n1):
        tw = np.exp(-2j * np.pi * (k1 * m2) / n)
        d = tw[:, None] * f128
        wr = d.real.astype(np.float32)
        wi = d.imag.astype(np.float32)
        blocks.append(np.stack([wr, wi, wr + wi]))
    stacked = np.stack(blocks)                      # [n1, 3, 128, 128]
    if split_bf16:
        import ml_dtypes

        hi = stacked.astype(ml_dtypes.bfloat16)
        lo = (stacked - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return np.concatenate([hi, lo], axis=1)     # [n1, 6, 128, 128]
    return stacked


def _dft_blocks(xr_list, xi_list, sign: int = -1):
    """Host-unrolled radix-2 DIT DFT across a list of [F, 128] block value
    pairs (length a power of two): returns the m-point DFT
    a_k = Σ_j W_m^{sign·j·k} x_j as block lists in natural k order (sign=-1:
    forward; sign=+1: the unscaled inverse — the structural-inverse pass 1 of
    ``rd_pallas``). Exact-valued twiddles (1, ±i) are folded; the rest cost
    4 mults + 2 adds."""
    m = len(xr_list)
    if m == 1:
        return list(xr_list), list(xi_list)
    er, ei = _dft_blocks(xr_list[0::2], xi_list[0::2], sign)
    odr, odi = _dft_blocks(xr_list[1::2], xi_list[1::2], sign)
    h = m // 2
    out_r = [None] * m
    out_i = [None] * m
    for k in range(h):
        c = np.exp(sign * 2j * np.pi * k / m)
        cr = float(c.real) if abs(c.real) > _EPS else 0.0
        ci = float(c.imag) if abs(c.imag) > _EPS else 0.0
        if cr == 1.0 and ci == 0.0:
            tr, ti = odr[k], odi[k]
        elif cr == 0.0 and ci == -1.0:           # × −i
            tr, ti = odi[k], -odr[k]
        elif cr == 0.0 and ci == 1.0:            # × +i
            tr, ti = -odi[k], odr[k]
        else:
            tr = cr * odr[k] - ci * odi[k]
            ti = cr * odi[k] + ci * odr[k]
        out_r[k] = er[k] + tr
        out_i[k] = ei[k] + ti
        out_r[k + h] = er[k] - tr
        out_i[k + h] = ei[k] - ti
    return out_r, out_i


def _dft_blocks_direct(xr_list, xi_list):
    """Direct n1² coefficient-sum DFT across blocks (the r1 formulation;
    kept as the pass-1 A/B baseline)."""
    m = len(xr_list)
    out_r, out_i = [], []
    for k1 in range(m):
        ar = None
        ai = None

        def acc(t, u):
            return u if t is None else t + u

        for m1 in range(m):
            c = np.exp(-2j * np.pi * (k1 * m1) / m)
            cr = float(c.real) if abs(c.real) > _EPS else 0.0
            ci = float(c.imag) if abs(c.imag) > _EPS else 0.0
            if cr:
                re_t = xr_list[m1] if cr == 1.0 else (
                    -xr_list[m1] if cr == -1.0 else cr * xr_list[m1])
                im_t = xi_list[m1] if cr == 1.0 else (
                    -xi_list[m1] if cr == -1.0 else cr * xi_list[m1])
                ar = acc(ar, re_t)
                ai = acc(ai, im_t)
            if ci:
                re_t = -xi_list[m1] if ci == 1.0 else (
                    xi_list[m1] if ci == -1.0 else -ci * xi_list[m1])
                im_t = xr_list[m1] if ci == 1.0 else (
                    -xr_list[m1] if ci == -1.0 else ci * xr_list[m1])
                ar = acc(ar, re_t)
                ai = acc(ai, im_t)
        out_r.append(ar)
        out_i.append(ai)
    return out_r, out_i


def _dot_pass3(br, bi, w_ref, dot_impl: str):
    """The per-block DFT-128 Gauss product under the selected MXU strategy.

    * ``f32``     — float32 matmuls (Mosaic's multi-pass exact path).
    * ``hi3``     — float32 operands with ``Precision.HIGH`` (3-pass bf16).
    * ``bf16x2``  — two-term bf16 split of BOTH operands: a ≈ a_hi + a_lo with
      each term exactly representable in bf16, w precomputed as hi+lo on the
      host; the (lo·lo) term is dropped (≈2⁻¹⁶ relative — far below the chain's
      int16-grade inputs). 9 single-pass bf16 matmuls replace 3 multi-pass
      f32 ones.
    * ``bf16``    — single-pass bf16 (fastest, ~8-bit mantissa; A/B probe).
    Returns (c_re, c_im) for the block."""
    if dot_impl == "f32":
        wr, wi, wri = w_ref[0], w_ref[1], w_ref[2]
        t1 = jnp.dot(br, wr, preferred_element_type=jnp.float32)
        t2 = jnp.dot(bi, wi, preferred_element_type=jnp.float32)
        t3 = jnp.dot(br + bi, wri, preferred_element_type=jnp.float32)
    elif dot_impl == "hi3":
        prec = jax.lax.Precision.HIGH
        wr, wi, wri = w_ref[0], w_ref[1], w_ref[2]
        t1 = jnp.dot(br, wr, preferred_element_type=jnp.float32,
                     precision=prec)
        t2 = jnp.dot(bi, wi, preferred_element_type=jnp.float32,
                     precision=prec)
        t3 = jnp.dot(br + bi, wri, preferred_element_type=jnp.float32,
                     precision=prec)
    elif dot_impl == "bf16":
        wr, wi, wri = w_ref[0], w_ref[1], w_ref[2]
        bh_r = br.astype(jnp.bfloat16)
        bh_i = bi.astype(jnp.bfloat16)
        bh_s = (br + bi).astype(jnp.bfloat16)
        t1 = jnp.dot(bh_r, wr.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        t2 = jnp.dot(bh_i, wi.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        t3 = jnp.dot(bh_s, wri.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    elif dot_impl == "bf16x2":
        wrh, wih, wrih = w_ref[0], w_ref[1], w_ref[2]   # bf16 hi
        wrl, wil, wril = w_ref[3], w_ref[4], w_ref[5]   # bf16 lo

        def split(a):
            hi = a.astype(jnp.bfloat16)
            lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        def dot2(ah, al, wh, wl):
            return (jnp.dot(ah, wh, preferred_element_type=jnp.float32)
                    + jnp.dot(ah, wl, preferred_element_type=jnp.float32)
                    + jnp.dot(al, wh, preferred_element_type=jnp.float32))

        rh, rl = split(br)
        ih, il = split(bi)
        sh, sl = split(br + bi)
        t1 = dot2(rh, rl, wrh, wrl)
        t2 = dot2(ih, il, wih, wil)
        t3 = dot2(sh, sl, wrih, wril)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown dot_impl {dot_impl!r}")
    return t1 - t2, t3 - t1 - t2


def _chain_core(xr, xi, tw_ref, w_ref, pm_ref, scal_ref, fscal_ref,
                n: int, n1: int, perm_mag_only: bool = True,
                pass1_radix2: bool = True, dot_impl: str = "f32",
                fold_twiddle: bool = False, ablate: str = "",
                lag_bits: int = 7, lead_bits: int = 7, mag_ref=None,
                perm_impl: str = "roll", gated_refs=None, lead2_bits: int = 8,
                boxsum_impl: str = "vpu", stack_hi_lo: bool = False,
                h_ref=None, tail_impl: str = "lean",
                words_ref=None, bin_width: int = 0,
                words_ablate_pack: bool = False):
    """FFT + magnitude + CA-CFAR on a [F, N] IQ value pair; returns
    (threshold f32, peaks u8).

    ``fold_twiddle``: pass 2 is folded into per-block pass-3 constants
    (``_chain_consts_folded``; ``tw_ref`` must be None).
    ``boxsum_impl``: 'vpu' — the dyadic-roll CA body (``cfar_pallas``);
    'mxu' — window sums by the [N, 3N] band matmul (``_box_band_operand``,
    interleave + lag + lead in one operand); 'mxu2' — [N, 2N+ext] lag-only
    band with the lead sums derived by a runtime rotation.
    ``h_ref``: optional [2, N] BLOCK-order spectral weights multiplied into
    the spectrum before the magnitude (the collapsed pulse-compression chain:
    FFT(MF(x)) = FFT(x)·H; see ``rd_pallas._h_block``).
    ``ablate``: profiling-only switches that skip a stage (results are WRONG;
    never exposed through the chain API): 'pass1' / 'twiddle' / 'mxu' /
    'perm' / 'cfar'."""
    mag_mode = scal_ref[7]

    # ---- pass 1: radix-n1 over the 128-lane blocks (VPU butterflies) ----
    xrb = [xr[:, 128 * m1 : 128 * (m1 + 1)] for m1 in range(n1)]
    xib = [xi[:, 128 * m1 : 128 * (m1 + 1)] for m1 in range(n1)]
    if ablate == "pass1":
        ar_blocks, ai_blocks = xrb, xib
    else:
        dft = _dft_blocks if pass1_radix2 else _dft_blocks_direct
        ar_blocks, ai_blocks = dft(xrb, xib)

    if fold_twiddle:
        b_re_blocks, b_im_blocks = ar_blocks, ai_blocks
    else:
        # ---- pass 2: twiddle (VPU) ----
        a_re = jnp.concatenate(ar_blocks, axis=1)  # [F, N], block k1 layout
        a_im = jnp.concatenate(ai_blocks, axis=1)
        if ablate == "twiddle":
            b_re, b_im = a_re, a_im
        else:
            twr = tw_ref[0, :]
            twi = tw_ref[1, :]
            b_re = a_re * twr - a_im * twi
            b_im = a_re * twi + a_im * twr
        b_re_blocks = [b_re[:, 128 * k : 128 * (k + 1)] for k in range(n1)]
        b_im_blocks = [b_im[:, 128 * k : 128 * (k + 1)] for k in range(n1)]

    # ---- pass 3: per-block DFT-128 on the MXU (Gauss 3-matmul) ----
    c_re_blocks, c_im_blocks = [], []
    for k1 in range(n1):
        br = b_re_blocks[k1]
        bi = b_im_blocks[k1]
        if ablate == "mxu":
            cr, ci = br, bi
        else:
            wk = w_ref[k1] if fold_twiddle else w_ref
            cr, ci = _dot_pass3(br, bi, wk, dot_impl)
        c_re_blocks.append(cr)
        c_im_blocks.append(ci)
    c_re = jnp.concatenate(c_re_blocks, axis=1)
    c_im = jnp.concatenate(c_im_blocks, axis=1)

    if h_ref is not None:
        hr = h_ref[0, :]
        hi = h_ref[1, :]
        c_re, c_im = c_re * hr - c_im * hi, c_re * hi + c_im * hr

    def magnitude(re, im):
        if mag_ref is None:
            return _magnitude(re, im, mag_mode)
        from .cfar_pallas import _magnitude_into

        return _magnitude_into(mag_ref, re, im, mag_mode)

    def perm(v):
        if ablate == "perm":
            return v
        if perm_impl == "mxu":
            return _apply_perm_mxu(v, pm_ref, stack_hi_lo=stack_hi_lo)
        steps = _fold_perm_steps(n, n1) if perm_impl == "fold" else None
        if steps is not None and not steps:        # n1 == 1: already natural
            return v
        return _apply_bit_perm(v, pm_ref[:, :] if pm_ref is not None else None,
                               n, n1, steps=steps)

    if boxsum_impl != "vpu" and not ablate:
        # ---- interleave + CFAR window sums as ONE wide band matmul: the
        # hi/lo-split block-order magnitude against [P | bands] yields the
        # natural-order magnitude AND the divider-scaled lag/lead sums in a
        # single MXU pass; the VPU keeps only the slim compare/group tail ----
        mag_b = _magnitude(c_re, c_im, mag_mode)
        big = _apply_perm_mxu(mag_b, pm_ref, stack_hi_lo=stack_hi_lo)
        mag = big[:, :n]
        if boxsum_impl == "mxu":
            s_lag = big[:, n : 2 * n]
            s_lead = big[:, 2 * n : 3 * n]
        else:  # 'mxu2': lead(c) = extended-lag(c + 2·guard + w + 1)
            from .cfar_pallas import _roll_left

            lagext = big[:, n:]
            w = jnp.int32(1) << scal_ref[0]
            s_lead = _roll_left(lagext, 2 * scal_ref[1] + w + 1,
                                lead2_bits)[:, :n]
            s_lag = lagext[:, :n]
        thr, pk_u8 = _ca_cfar_tail(mag, s_lag, s_lead, scal_ref, fscal_ref, n)
        if gated_refs is not None:
            thr_ref, pk_ref, _scr = gated_refs
            thr_ref[:, :] = thr
            pk_ref[:, :] = pk_u8
            return None
        return thr, pk_u8

    if perm_mag_only:
        # ---- magnitude in block order (elementwise — commutes with the
        # interleave), then ONE natural-order permutation of the mag row ----
        mag = perm(magnitude(c_re, c_im))
    else:
        y_re = perm(c_re)
        y_im = perm(c_im)
        mag = magnitude(y_re, y_im)

    # ---- CFAR (shared body) ----
    if ablate == "cfar":
        return mag, (mag > fscal_ref[0]).astype(jnp.uint8)
    if gated_refs is not None:
        from .cfar_pallas import _ca_cfar_into, _ca_cfar_into_lean

        thr_ref, pk_ref, scr_ref = gated_refs
        if tail_impl == "lean":
            _ca_cfar_into_lean(mag, scal_ref, fscal_ref, thr_ref, pk_ref,
                               scr_ref, n, lag_bits=lag_bits,
                               lead2_bits=lead2_bits,
                               words_ref=words_ref, bin_width=bin_width,
                               words_ablate_pack=words_ablate_pack)
        else:
            assert words_ref is None, "packed-word emission needs tail 'lean'"
            _ca_cfar_into(mag, scal_ref, fscal_ref, thr_ref, pk_ref, scr_ref,
                          n, lag_bits=lag_bits, lead2_bits=lead2_bits)
        return None
    return _ca_cfar_body(mag, scal_ref, fscal_ref, n, lag_bits, lead_bits)


def _chain_kernel(
    scal_ref, fscal_ref,
    xr_ref, xi_ref,          # [F, N] time-domain IQ pair
    tw_ref,                  # [2, N] twiddle rows
    w_ref,                   # [3, 128, 128] scaled Gauss triple of DFT-128
    pm_ref,                  # [n_steps, N] int32 interleave masks
    *rest,                   # optional h_ref [2, N], then outputs + scratch
    n: int, n1: int, perm_mag_only: bool = True, mask_operand: bool = True,
    pass1_radix2: bool = True, dot_impl: str = "f32",
    fold_twiddle: bool = False, ablate: str = "",
    lag_bits: int = 7, lead_bits: int = 7, lead2_bits: int = 8,
    gate_mag: bool = True, perm_impl: str = "roll", gated_cfar: bool = True,
    row_groups: int = 1, boxsum_impl: str = "vpu", stack_hi_lo: bool = False,
    with_h: bool = False, tail_impl: str = "lean",
):
    """``row_groups`` > 1 partitions the tile's frames into independent
    groups, each running the full FFT->mag->perm->CFAR chain: the groups share
    no data, so Mosaic's scheduler is free to overlap group i's VPU-bound CFAR
    with group i+1's MXU-bound FFT/permutation — the single-group kernel is one
    serial dependency chain whose VPU and MXU halves can never run
    concurrently (r2m: VPU ~0.9 ms + MXU ~0.58 ms ≈ the 1.35 ms total)."""
    if with_h:
        h_ref, thr_ref, pk_ref, scr_ref = rest
    else:
        h_ref = None
        thr_ref, pk_ref, scr_ref = rest
    use_pm = perm_impl == "mxu" or mask_operand
    f = xr_ref.shape[0]
    gsz = f // row_groups
    for g in range(row_groups):
        sl = slice(g * gsz, (g + 1) * gsz)
        thr_g = thr_ref.at[sl] if row_groups > 1 else thr_ref
        pk_g = pk_ref.at[sl] if row_groups > 1 else pk_ref
        scr_g = scr_ref.at[sl] if row_groups > 1 else scr_ref
        gated_refs = (thr_g, pk_g, scr_g) \
            if (gated_cfar or boxsum_impl != "vpu") and not ablate else None
        out = _chain_core(xr_ref[sl, :], xi_ref[sl, :], tw_ref, w_ref,
                          pm_ref if use_pm else None,
                          scal_ref, fscal_ref, n, n1,
                          perm_mag_only=perm_mag_only,
                          pass1_radix2=pass1_radix2, dot_impl=dot_impl,
                          fold_twiddle=fold_twiddle, ablate=ablate,
                          lag_bits=lag_bits, lead_bits=lead_bits,
                          mag_ref=thr_g if gate_mag else None,
                          perm_impl=perm_impl, gated_refs=gated_refs,
                          lead2_bits=lead2_bits, boxsum_impl=boxsum_impl,
                          stack_hi_lo=stack_hi_lo, h_ref=h_ref,
                          tail_impl=tail_impl)
        if out is not None:
            thr, pk_u8 = out
            thr_g[:, :] = thr
            pk_g[:, :] = pk_u8


def _chain_kernel_packed(
    scal_ref, fscal_ref,
    xw_ref,                  # [F, N] int32 beat words (re[31:16], im[15:0])
    tw_ref, w_ref, pm_ref,
    out_ref,                 # [F, N] int32 CFAR output words
    *rest,                   # scratches (see fused_chain_ca_packed)
    n: int, n1: int, bin_width: int, dot_impl: str = "f32",
    fold_twiddle: bool = False, lag_bits: int = 7, lead_bits: int = 7,
    lead2_bits: int = 8, perm_impl: str = "roll", gated_cfar: bool = True,
    tail_impl: str = "lean", ablate: str = "",
):
    """Wire-format variant: packed IQ beat words in, packed CFAR words out —
    the RxFftMagCfarTxChain data plane as ONE kernel. Halves the input HBM
    read and shrinks the output write 5x vs the float pair form. The 'lean'
    tail (default since r4) emits the ``{thr | bin | peak}`` words straight
    from the peak pass — no thr/pk scratch round-trips, no standalone pack
    passes (VERDICT r3 item 3).

    ``ablate`` (profiling-only, results WRONG): 'unpack' skips the sign-
    extension shifts (keeps the int->float converts the FFT needs), 'pack'
    emits the peak flags alone instead of the assembled word — the two
    measure the wire format's structural VPU cost over the pair form."""
    w32 = xw_ref[:, :]
    if ablate == "unpack":
        xr = w32.astype(jnp.float32)
        xi = xr
    else:
        xr = (w32 >> 16).astype(jnp.float32)         # arithmetic shift: sign
        xi = ((w32 << 16) >> 16).astype(jnp.float32)  # sign-extend low half
    if tail_impl == "lean":
        thr_scr, scr_ref = rest
        _chain_core(xr, xi, tw_ref, w_ref, pm_ref,
                    scal_ref, fscal_ref, n, n1, dot_impl=dot_impl,
                    fold_twiddle=fold_twiddle,
                    lag_bits=lag_bits, lead_bits=lead_bits,
                    lead2_bits=lead2_bits,
                    perm_impl=perm_impl,
                    gated_refs=(thr_scr, None, scr_ref),
                    tail_impl="lean", words_ref=out_ref, bin_width=bin_width,
                    words_ablate_pack=ablate == "pack")
        return
    thr_scr, pk_scr, scr_ref = rest
    gated_refs = (thr_scr, pk_scr, scr_ref) if gated_cfar else None
    out = _chain_core(xr, xi, tw_ref, w_ref, pm_ref,
                      scal_ref, fscal_ref, n, n1, dot_impl=dot_impl,
                      fold_twiddle=fold_twiddle,
                      lag_bits=lag_bits, lead_bits=lead_bits,
                      lead2_bits=lead2_bits,
                      perm_impl=perm_impl, gated_refs=gated_refs,
                      tail_impl="classic")
    if out is None:
        thr, pk_u8 = thr_scr[:, :], pk_scr[:, :]
    else:
        thr, pk_u8 = out
    # {threshold | bin | peak} word (RspChainVanillaTester.scala:164-172)
    thr_i = jnp.clip(thr, 0.0, float((1 << (31 - bin_width)) - 1)).astype(jnp.int32)
    bins = jax.lax.broadcasted_iota(jnp.int32, thr.shape, 1) & ((1 << bin_width) - 1)
    out_ref[:, :] = ((thr_i << (bin_width + 1)) | (bins << 1)
                     | pk_u8.astype(jnp.int32))


def _fft_scale(n: int, cfg: FftConfig) -> float:
    # LSB-keep stages (wraparound overflow) have no float analog; the float
    # kernels must not silently ignore them (ops.fft.fft_op raises the
    # user-facing error; presets route such elaborations off the kernels)
    assert cfg.keep_msb_or_lsb is None or all(cfg.keep_msb_or_lsb), (
        "keepMSBorLSB = LSB has no float analog (bit-true pipeline only)")
    if cfg.expand_logic is not None:
        stages = cfg.expand_logic[: int(np.log2(n))]
        return float(2.0 ** -sum(1 for e in stages if not e))
    from ..ops.fft import _scale_factor

    return _scale_factor(n, cfg.scaling)


def _chain_scalars(rt, cfar_cfg, n, active_lo, active_hi):
    if active_hi is None:
        active_hi = jnp.minimum(rt.cfar_fft_size, n)
    if active_lo is None:
        active_lo = jnp.int32(0)
    log2w = jnp.round(jnp.log2(jnp.clip(
        rt.ref_window_size, 1, cfar_cfg.max_ref_window
    ).astype(jnp.float32))).astype(jnp.int32)
    scalars = jnp.stack([
        log2w,
        jnp.clip(rt.guard_window_size, 0,
                 cfar_cfg.max_guard_window).astype(jnp.int32),
        rt.div_sum.astype(jnp.int32),
        rt.cfar_mode.astype(jnp.int32),
        rt.log_or_linear.astype(jnp.int32),
        rt.peak_grouping.astype(jnp.int32),
        jnp.asarray(active_hi, jnp.int32),
        rt.mag_mode.astype(jnp.int32),
        jnp.asarray(active_lo, jnp.int32),
    ])
    fscal = rt.threshold_scaler.astype(jnp.float32).reshape(1)
    return scalars, fscal


def fused_chain_ca(
    x,
    rt: RuntimeConfig,
    fft_cfg: FftConfig,
    cfar_cfg: CfarConfig,
    interpret: bool = False,
    *,
    active_lo: jnp.ndarray | None = None,
    active_hi: jnp.ndarray | None = None,
    block_frames: int | None = None,
    perm_mag_only: bool = True,
    mask_operand: bool = True,
    pass1_radix2: bool = True,
    dot_impl: str = "bf16x2",
    fold_twiddle: bool = True,
    ablate: str = "",
    gate_mag: bool = False,
    perm_impl: str = "fold",
    gated_cfar: bool = True,
    row_groups: int = 1,
    boxsum_impl: str = "vpu",
    stack_hi_lo: bool = True,
    h_block=None,
    tail_impl: str | None = None,
) -> CfarOutput:
    """Whole-chain kernel at the full elaborated FFT size: ``x`` [..., N] IQ
    pair/complex, N = fft_cfg.max_size ∈ {256, 512, 1024} (headline shapes)
    or {2048, 4096} (pulse-compression frames; the scoped-VMEM budget is
    raised, and a 'mxu' override downgrades to 'roll' — the [N, N]
    permutation operand no longer fits VMEM). The default interleave is the
    folded log2(n1)-step bit-swap network (``_fold_sigma``). The runtime
    size register is handled by ``fused_chain_ca_op``.

    ``h_block``: optional host [2, N] float32 BLOCK-order spectral weights
    (``rd_pallas._h_block``) multiplied into the spectrum before the
    magnitude — the collapsed pulse-compression chain in one kernel.

    The keyword switches are kernel-formulation A/Bs (benchmarks/profile_r2g
    through r2k); the defaults are the shipped configuration, chosen on-chip:
    ``dot_impl='bf16x2'`` because Mosaic lowers f32 dots to SINGLE-PASS bf16
    (discovered r2i: a pure-bf16 A/B was bit-identical to "f32"), so the
    two-term split is what actually delivers f32-grade FFT accuracy (~1.5e-6
    rel, vs ~1.4e-3 for the 1-pass dots — ~47 int16 LSBs, outside the
    reference's ±2-LSB bar) at ~4% cost; ``perm_impl='fold'`` because the
    σ-reordered pass-3 columns shrink the interleave to log2(n1) disjoint
    bit-swaps — the r3 on-chip A/B: 0.961 ms vs 1.271 for the 'mxu'
    permutation matmul (itself ~0.3 ms faster than the 9-step 'roll' network,
    r2k) at 64x256x1024, dthr 1.4e-6 / 0 flips; ``fold_twiddle=True`` because folding
    pass 2 into per-block pass-3 constants removes 4 VPU passes for zero MXU
    cost (r2m: 1.290 vs 1.354 ms, rel err 3.7e-6, 0 peak flips);
    ``gated_cfar=True`` for the pl.when-gated CA body (r2l, bit-identical);
    ``stack_hi_lo=True`` issues the permutation's hi/lo split as one [2F, N]
    matmul (bit-identical, r2p: 1.257 vs 1.272 ms). ``boxsum_impl`` keeps the
    VPU dyadic body: the MXU band-matmul variants measured slower (r2o: 'mxu'
    1.43, 'mxu2' 1.29 vs 1.25 ms — the [F,K]@[K,W] matmuls run ~2.4x off MXU
    peak at these shapes), shipped as formulation switches with rel ~2e-7
    on-chip numerics for future hardware."""
    from ..cplx import as_pair

    xp = as_pair(x)
    n = xp.shape[-1]
    n1 = n // 128
    assert n == fft_cfg.max_size and n1 in (2, 4, 8, 16, 32), n
    assert cfar_cfg.max_ref_window + cfar_cfg.max_guard_window + 1 <= 128
    if tail_impl is None:
        # shape-aware default (r4e/r4f interleaved A/B): the lean tail wins
        # at the headline N<=1024 (0.870 vs 0.958 ms, r4d) but LOSES at the
        # 4096-lane pulse-compression frames (classic ~0.42 ms — the r3
        # shipped rate — vs lean 0.73-0.87 in the same sessions)
        tail_impl = "lean" if n1 <= 8 else "classic"
    if block_frames is None:
        block_frames = (CHAIN_BLOCK_FRAMES_SMALL_N if n1 <= 8
                        else CHAIN_BLOCK_FRAMES)
    if n1 > 8 and perm_impl == "mxu":
        # the [N, N] permutation operand is n²·2 bytes — past VMEM at 2048+;
        # the roll/select networks scale as O(log n) passes
        perm_impl = "roll"
    if perm_impl != "mxu":
        boxsum_impl = "vpu"

    batch_shape = xp.shape[:-1]
    flat = int(np.prod(batch_shape)) if batch_shape else 1
    re = xp.re.astype(jnp.float32).reshape(flat, n)
    im = xp.im.astype(jnp.float32).reshape(flat, n)
    bf = block_frames
    f_pad = (-flat) % bf
    if f_pad:
        re = jnp.pad(re, ((0, f_pad), (0, 0)))
        im = jnp.pad(im, ((0, f_pad), (0, 0)))
    f_tot = flat + f_pad

    scalars, fscal = _chain_scalars(rt, cfar_cfg, n, active_lo, active_hi)
    split = dot_impl == "bf16x2"
    fold_perm = perm_impl == "fold"
    tw_rows, _ = _chain_consts(n, _fft_scale(n, fft_cfg))
    if fold_twiddle:
        triple = _chain_consts_folded(n, _fft_scale(n, fft_cfg),
                                      split_bf16=split, fold_perm=fold_perm)
    else:
        _, triple = _chain_consts(n, _fft_scale(n, fft_cfg), split_bf16=split,
                                  fold_perm=fold_perm)
    tw_j = jnp.asarray(tw_rows)
    w_j = jnp.asarray(triple)
    if perm_impl == "mxu":
        pm = _perm_matrix(n, n1)
    elif fold_perm:
        pm = _fold_masks(n, n1)
    else:
        pm = _perm_masks(n, n1)
    pm_j = jnp.asarray(pm)
    band_ext = -(-(2 * cfar_cfg.max_guard_window + cfar_cfg.max_ref_window + 1)
                 // 128) * 128
    if boxsum_impl != "vpu":
        assert perm_impl == "mxu", "band matmul subsumes the mxu interleave"
        assert not ablate, "ablation switches assume the vpu CFAR body"
        w_rt = jnp.int32(1) << scalars[0]
        inv_div = jnp.exp2(-scalars[2].astype(jnp.float32))
        band = _box_band_operand(
            n, n1, w_rt, scalars[1], inv_div, scalars[8], scalars[6],
            ext=band_ext if boxsum_impl == "mxu2" else None)
        pm_j = jnp.concatenate([pm_j, band], axis=1)

    grid = (f_tot // bf,)
    from .cfar_pallas import _bits_for

    kernel = functools.partial(
        _chain_kernel, n=n, n1=n1,
        perm_mag_only=perm_mag_only,
        mask_operand=mask_operand,
        pass1_radix2=pass1_radix2,
        dot_impl=dot_impl,
        fold_twiddle=fold_twiddle, ablate=ablate, gate_mag=gate_mag,
        perm_impl=perm_impl, gated_cfar=gated_cfar, row_groups=row_groups,
        boxsum_impl=boxsum_impl, stack_hi_lo=stack_hi_lo,
        with_h=h_block is not None, tail_impl=tail_impl,
        lag_bits=_bits_for(cfar_cfg.max_guard_window + 1),
        lead_bits=_bits_for(cfar_cfg.max_guard_window
                            + cfar_cfg.max_ref_window),
        lead2_bits=_bits_for(2 * cfar_cfg.max_guard_window
                             + cfar_cfg.max_ref_window + 1))
    from .cfar_pallas import PAD as _CPAD
    in_specs = [
        pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, n), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(triple.shape,
                     lambda i, *_ , _nd=triple.ndim: (0,) * _nd,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pm_j.shape[0], pm_j.shape[1]),
                     lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [scalars, fscal, re, im, tw_j, w_j, pm_j]
    if h_block is not None:
        h_j = jnp.asarray(h_block, jnp.float32)
        assert h_j.shape == (2, n), h_j.shape
        if fold_perm:
            # the spectrum's within-block layout is sigma-reordered under
            # 'fold'; permute the block-order weights to match
            h_j = h_j.reshape(2, n1, 128)[:, :, _fold_sigma(n1)].reshape(2, n)
        in_specs.append(pl.BlockSpec((2, n), lambda i, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(h_j)
    extra = {}
    if n1 > 8:
        # [bf, 4096] tiles: in/out windows + folded constants exceed the
        # default 16 MB scoped budget (v5e: 128 MB physical VMEM)
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    thr, pk = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((bf, n + _CPAD), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((f_tot, n), jnp.float32),
            jax.ShapeDtypeStruct((f_tot, n), jnp.uint8),
        ],
        interpret=interpret,
        **extra,
    )(*operands)

    thr = thr[:flat].reshape(batch_shape + (n,))
    pk = pk[:flat].reshape(batch_shape + (n,)).astype(jnp.bool_)
    return CfarOutput(threshold=thr, peaks=pk)


def fused_chain_ca_packed(
    words: jnp.ndarray,
    rt: RuntimeConfig,
    fft_cfg: FftConfig,
    cfar_cfg: CfarConfig,
    interpret: bool = False,
    *,
    block_frames: int | None = None,
    dot_impl: str = "bf16x2",
    fold_twiddle: bool = True,
    perm_impl: str = "fold",
    gated_cfar: bool = True,
    tail_impl: str = "lean",
    ablate: str = "",
) -> jnp.ndarray:
    """Wire-format whole-chain kernel: packed uint32 IQ beat words [..., N] in,
    packed ``{threshold | bin | peak}`` words out — the full
    ``RxFftMagCfarTxChain`` data plane in one kernel, with half the input HBM
    read and a 5x smaller output write than the float-pair form. Default
    formulation follows the pair kernel (256-frame tiles for n1 <= 8, lean
    tail with in-pass word emission — VERDICT r3 item 3)."""
    n = words.shape[-1]
    n1 = n // 128
    assert n == fft_cfg.max_size and n1 in (2, 4, 8), n
    if block_frames is None:
        block_frames = (CHAIN_BLOCK_FRAMES_SMALL_N if n1 <= 8
                        else CHAIN_BLOCK_FRAMES)
    batch_shape = words.shape[:-1]
    flat = int(np.prod(batch_shape)) if batch_shape else 1
    # int32 view: Mosaic's integer ops are int32; the kernel sign-extends
    w_in = jax.lax.bitcast_convert_type(
        jnp.asarray(words, jnp.uint32), jnp.int32).reshape(flat, n)
    bf = block_frames
    f_pad = (-flat) % bf
    if f_pad:
        w_in = jnp.pad(w_in, ((0, f_pad), (0, 0)))
    f_tot = flat + f_pad

    scalars, fscal = _chain_scalars(rt, cfar_cfg, n, None, None)
    split = dot_impl == "bf16x2"
    fold_perm = perm_impl == "fold"
    tw_rows, _ = _chain_consts(n, _fft_scale(n, fft_cfg))
    if fold_twiddle:
        triple = _chain_consts_folded(n, _fft_scale(n, fft_cfg),
                                      split_bf16=split, fold_perm=fold_perm)
    else:
        _, triple = _chain_consts(n, _fft_scale(n, fft_cfg), split_bf16=split,
                                  fold_perm=fold_perm)
    if perm_impl == "mxu":
        pm = _perm_matrix(n, n1)
    elif fold_perm:
        pm = _fold_masks(n, n1)
    else:
        pm = _perm_masks(n, n1)

    grid = (f_tot // bf,)
    from .cfar_pallas import _bits_for

    kernel = functools.partial(
        _chain_kernel_packed, n=n, n1=n1,
        bin_width=int(np.log2(n)), dot_impl=dot_impl,
        fold_twiddle=fold_twiddle, perm_impl=perm_impl,
        gated_cfar=gated_cfar, tail_impl=tail_impl, ablate=ablate,
        lag_bits=_bits_for(cfar_cfg.max_guard_window + 1),
        lead_bits=_bits_for(cfar_cfg.max_guard_window
                            + cfar_cfg.max_ref_window),
        lead2_bits=_bits_for(2 * cfar_cfg.max_guard_window
                             + cfar_cfg.max_ref_window + 1))
    from .cfar_pallas import PAD as _CPAD
    if tail_impl == "lean":
        scratch_shapes = [
            pltpu.VMEM((bf, n), jnp.float32),
            pltpu.VMEM((bf, n + _CPAD), jnp.float32),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((bf, n), jnp.float32),
            pltpu.VMEM((bf, n), jnp.uint8),
            pltpu.VMEM((bf, n + _CPAD), jnp.float32),
        ]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(np.asarray(triple).shape,
                             lambda i, *_, _nd=np.asarray(triple).ndim: (0,) * _nd,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.shape[0], n), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch_shapes,
        ),
        out_shape=jax.ShapeDtypeStruct((f_tot, n), jnp.int32),
        interpret=interpret,
    )(scalars, fscal, w_in, jnp.asarray(tw_rows), jnp.asarray(triple),
      jnp.asarray(pm))

    out = jax.lax.bitcast_convert_type(out[:flat], jnp.uint32)
    return out.reshape(batch_shape + (n,))


def _fft_block_order(xr, xi, w_ref, n1: int, dot_impl: str):
    """The in-kernel four-step FFT front in BLOCK order: host-unrolled radix
    pass 1 + per-block folded-twiddle DFT-128 pass 3 (``_chain_consts_folded``
    constants). Returns (c_re, c_im) [F, N] with lane 128·k1+k2 holding bin
    k1 + n1·sigma(k2) under ``fold_perm`` constants (natural order after the
    ``_fold_perm_steps`` bit swaps). Used by the fused GOS chain kernel; the
    CA core (``_chain_core``) keeps its own front because it also carries the
    A/B instrumentation (ablate/dot_impl/fold_twiddle switches) this slim
    helper deliberately omits — an FFT-front change must touch BOTH."""
    xrb = [xr[:, 128 * m1 : 128 * (m1 + 1)] for m1 in range(n1)]
    xib = [xi[:, 128 * m1 : 128 * (m1 + 1)] for m1 in range(n1)]
    ar_blocks, ai_blocks = _dft_blocks(xrb, xib)
    c_re_blocks, c_im_blocks = [], []
    for k1 in range(n1):
        cr, ci = _dot_pass3(ar_blocks[k1], ai_blocks[k1], w_ref[k1], dot_impl)
        c_re_blocks.append(cr)
        c_im_blocks.append(ci)
    return (jnp.concatenate(c_re_blocks, axis=1),
            jnp.concatenate(c_im_blocks, axis=1))


def _chain_gos_kernel(
    scal_ref, fscal_ref,     # the 13-scalar GOS register file (+1 float)
    xr_ref, xi_ref,          # [F, N] time-domain IQ pair
    w_ref,                   # [n1, 6, 128, 128] bf16 folded pass-3 constants
    pm_ref,                  # [n_steps, N] int32 fold interleave masks
    thr_ref, pk_ref,         # [F, N] outputs (pk int32)
    row_scr, ca_scr, nb_scr, stat_scr,   # the v3 GOS scratches
    *,
    n: int, n1: int, dot_impl: str, wmax: int, max_log2_w: int,
    with_cash: bool, merge_impl: str = "bitonic", ablate: str = "",
    tail_impl: str = "lean", roll_impl: str = "per_row",
    select_impl: str = "tree",
):
    """Whole FFT + magnitude + GOS/GOSCA/CASH chain in ONE kernel: the
    spectrum never touches HBM (VERDICT r2 item 1 — GOS elaborations used to
    compose the XLA FFT with the sort-tail kernel). FFT front and fold
    interleave are the CA chain kernel's (``fused_chain_ca`` shipped
    formulation); the tail is the v3 sliding-merge shared sort
    (``cfar_pallas._gos_rows_init`` + ``_gos_tail``) with tile = N."""
    from .cfar_pallas import _gos_rows_init, _gos_tail

    mag_mode = scal_ref[7]
    if ablate == "fft":
        mag = xr_ref[:, :]       # profiling-only: raw I row as the magnitude
    else:
        c_re, c_im = _fft_block_order(xr_ref[:, :], xi_ref[:, :], w_ref, n1,
                                      dot_impl)
        # magnitude in block order (elementwise — commutes with the
        # interleave), then the log2(n1)-step fold permutation to natural
        mag_b = _magnitude(c_re, c_im, mag_mode)
        steps = _fold_perm_steps(n, n1)
        mag = (_apply_bit_perm(mag_b, pm_ref[:, :], n, n1, steps=steps)
               if steps else mag_b)
    _gos_rows_init(mag, scal_ref, row_scr, ca_scr, nb_scr,
                   n=n, max_log2_w=max_log2_w)
    _gos_tail(scal_ref, fscal_ref, thr_ref, pk_ref, row_scr, ca_scr, nb_scr,
              stat_scr, pl.multiple_of(0, 128), n=n, tile=n, wmax=wmax,
              max_log2_w=max_log2_w, with_cash=with_cash,
              merge_impl=merge_impl, ablate=ablate, tail_impl=tail_impl,
              roll_impl=roll_impl, select_impl=select_impl)


GOS_CHAIN_BLOCK_FRAMES = 32   # r3 on-chip A/B (benchmarks/profile_r3d): 32
                              # frames amortize the ladder's slab margins —
                              # 5.14 ms vs 6.22 (bf16) / 8.19 (bf8) at the
                              # headline CPI; bf64 exceeds scoped VMEM with
                              # the wmax=64 value-resident stack


def fused_chain_gos(
    x,
    rt: RuntimeConfig,
    fft_cfg: FftConfig,
    cfar_cfg: CfarConfig,
    interpret: bool = False,
    *,
    block_frames: int = GOS_CHAIN_BLOCK_FRAMES,
    dot_impl: str = "bf16x2",
    merge_impl: str = "oe_batch",
    ablate: str = "",
    tail_impl: str = "lean",
    roll_impl: str = "batch",
    select_impl: str = "batch",
) -> CfarOutput:
    """Single-kernel FFT + mag + GOS/GOSCA(+CASH) chain at the full elaborated
    FFT size, N ∈ {256, 512, 1024}: one HBM read of the IQ pair, one write of
    threshold + peaks — the GOS analog of ``fused_chain_ca``. Runtime
    registers (the full 13-scalar GOS file) stay traced.

    Default formulation = the fastest interleaved-session pick (r4d,
    benchmarks/results_r4.json): batched level rolls + batched odd-even merge
    stages + batched rank-select trees, 4.43 vs 4.99 ms for the per-row/tree
    form at 64x256x1024 — every variant bit-identical (tests/test_pallas.py
    ``test_gos_batched_formulations_bit_identical``)."""
    from ..cplx import as_pair
    from .cfar_pallas import GOS3_MARGIN, MAX_LOG2_W, PAD

    xp = as_pair(x)
    n = xp.shape[-1]
    n1 = n // 128
    assert n == fft_cfg.max_size and n1 in (2, 4, 8), n
    wmax = cfar_cfg.max_ref_window
    assert wmax & (wmax - 1) == 0 and wmax <= 1 << MAX_LOG2_W
    assert wmax + cfar_cfg.max_guard_window + 1 <= PAD

    batch_shape = xp.shape[:-1]
    flat = int(np.prod(batch_shape)) if batch_shape else 1
    re = xp.re.astype(jnp.float32).reshape(flat, n)
    im = xp.im.astype(jnp.float32).reshape(flat, n)
    bf = block_frames
    f_pad = (-flat) % bf
    if f_pad:
        re = jnp.pad(re, ((0, f_pad), (0, 0)))
        im = jnp.pad(im, ((0, f_pad), (0, 0)))
    f_tot = flat + f_pad

    log2w = jnp.round(jnp.log2(jnp.clip(
        rt.ref_window_size, 1, wmax).astype(jnp.float32))).astype(jnp.int32)
    scalars = jnp.stack([
        log2w,
        jnp.clip(rt.guard_window_size, 0,
                 cfar_cfg.max_guard_window).astype(jnp.int32),
        rt.div_sum.astype(jnp.int32),
        rt.cfar_mode.astype(jnp.int32),
        rt.log_or_linear.astype(jnp.int32),
        rt.peak_grouping.astype(jnp.int32),
        jnp.minimum(rt.cfar_fft_size, n).astype(jnp.int32),
        rt.mag_mode.astype(jnp.int32),
        rt.cfar_algorithm.astype(jnp.int32),
        rt.index_lagg.astype(jnp.int32),
        rt.index_lead.astype(jnp.int32),
        jnp.clip(rt.sub_window_size, cfar_cfg.min_sub_window,
                 wmax).astype(jnp.int32),
        jnp.int32(0),                    # active_lo
    ])
    fscal = rt.threshold_scaler.astype(jnp.float32).reshape(1)

    triple = _chain_consts_folded(n, _fft_scale(n, fft_cfg),
                                  split_bf16=(dot_impl == "bf16x2"),
                                  fold_perm=True)
    pm = _fold_masks(n, n1)

    kernel = functools.partial(
        _chain_gos_kernel, n=n, n1=n1, dot_impl=dot_impl, wmax=wmax,
        max_log2_w=MAX_LOG2_W, with_cash=cfar_cfg.include_cash,
        merge_impl=merge_impl, ablate=ablate, tail_impl=tail_impl,
        roll_impl=roll_impl, select_impl=select_impl)
    M = GOS3_MARGIN
    extra = {}
    if (n1 >= 8 and bf >= 16) or bf >= 32:
        # window stack (wmax value rows of [bf, n + 2M]) + FFT constants
        # overflow the 16 MB default scoped budget at N=1024
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    thr, pk = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(f_tot // bf,),
            in_specs=[
                pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(np.asarray(triple).shape,
                             lambda i, *_, _nd=np.asarray(triple).ndim:
                             (0,) * _nd,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.shape[0], pm.shape[1]),
                             lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bf, n), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((bf, n + 2 * M), jnp.float32),
                pltpu.VMEM((2, bf, n + 2 * M), jnp.float32),
                pltpu.VMEM((2, bf, n + 2 * M), jnp.float32),
                pltpu.VMEM((6, bf, n), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((f_tot, n), jnp.float32),
            jax.ShapeDtypeStruct((f_tot, n), jnp.int32),
        ],
        interpret=interpret,
        **extra,
    )(scalars, fscal, re, im, jnp.asarray(triple), jnp.asarray(pm))

    thr = thr[:flat].reshape(batch_shape + (n,))
    pk = (pk[:flat] != 0).reshape(batch_shape + (n,))
    return CfarOutput(threshold=thr, peaks=pk)


def fused_chain_gos_op(
    x,
    rt: RuntimeConfig,
    fft_cfg: FftConfig,
    cfar_cfg: CfarConfig,
    interpret: bool = False,
) -> CfarOutput:
    """The GOSCA whole-chain stage honoring BOTH runtime dispatch registers:

    * CA algorithm + non-CASH mode takes the (faster) CA whole-chain kernel —
      the reference switches CA/GOS per run on one bitstream
      (``RspChainVanillaTester.scala:124-132``);
    * GOS algorithm or CASH mode takes the fused GOS chain kernel;
    * runtime FFT sizes below the elaborated max keep the XLA FFT + fused
      GOS-dispatch tail.

    All branches live under ``lax.cond`` on traced registers — one compiled
    executable, no recompiles (the same contract as ``fused_chain_ca_op``)."""
    from ..configs import CfarVariant
    from ..cplx import as_pair
    from ..ops.fft import fft_op
    from .cfar_pallas import fused_mag_gos_dispatch

    xp = as_pair(x)

    if cfar_cfg.variant is CfarVariant.GOS and not cfar_cfg.include_cash:
        # pure-GOS elaboration: the CA algorithm register is not compiled in
        def full_branch(xi):
            return fused_chain_gos(xi, rt, fft_cfg, cfar_cfg,
                                   interpret=interpret)
    else:
        ca_like = (rt.cfar_algorithm == 0) & (rt.cfar_mode != 3)

        def full_branch(xi):
            return jax.lax.cond(
                ca_like,
                lambda v: fused_chain_ca(v, rt, fft_cfg, cfar_cfg,
                                         interpret=interpret),
                lambda v: fused_chain_gos(v, rt, fft_cfg, cfar_cfg,
                                          interpret=interpret),
                xi)

    def small_branch(xi):
        spec = fft_op(xi, rt.log2_fft_size, fft_cfg)
        return fused_mag_gos_dispatch(spec, rt, cfar_cfg, interpret=interpret)

    if not fft_cfg.runtime_size:
        return full_branch(xp)
    is_full = rt.log2_fft_size >= fft_cfg.log2_max
    return jax.lax.cond(is_full, full_branch, small_branch, xp)


def fused_chain_ca_op(
    x,
    rt: RuntimeConfig,
    fft_cfg: FftConfig,
    cfar_cfg: CfarConfig,
    interpret: bool = False,
) -> CfarOutput:
    """The chain stage honoring the runtime FFT-size register: the full-size
    setting (the deployment hot path) runs the single fused kernel; smaller
    runtime sizes take the XLA FFT + spectrum-kernel tail. Both branches live
    under one ``lax.cond`` so the register stays a traced scalar."""
    from ..cplx import as_pair
    from ..ops.fft import fft_op
    from .cfar_pallas import fused_mag_cfar

    xp = as_pair(x)

    def full_branch(xi):
        return fused_chain_ca(xi, rt, fft_cfg, cfar_cfg, interpret=interpret)

    def small_branch(xi):
        spec = fft_op(xi, rt.log2_fft_size, fft_cfg)
        return fused_mag_cfar(spec, rt, cfar_cfg, interpret=interpret)

    if not fft_cfg.runtime_size:
        return full_branch(xp)
    is_full = rt.log2_fft_size >= fft_cfg.log2_max
    return jax.lax.cond(is_full, full_branch, small_branch, xp)


def fused_wire_chain_op(
    words: jnp.ndarray,
    rt: RuntimeConfig,
    fft_cfg: FftConfig,
    cfar_cfg: CfarConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Wire chain honoring the runtime FFT-size register: full size runs the
    packed single kernel; smaller sizes unpack + XLA FFT + spectrum kernel +
    pack (one executable, traced register)."""
    from .. import packing
    from ..ops.fft import fft_op
    from .cfar_pallas import fused_mag_cfar

    def full_branch(w):
        return fused_chain_ca_packed(w, rt, fft_cfg, cfar_cfg,
                                     interpret=interpret)

    def small_branch(w):
        p = packing.unpack_iq_pair(w)
        spec = fft_op(p, rt.log2_fft_size, fft_cfg)
        out = fused_mag_cfar(spec, rt, cfar_cfg, interpret=interpret)
        return packing.pack_cfar_words(out.threshold, out.peaks,
                                       fft_cfg.log2_max)

    if not fft_cfg.runtime_size:
        return full_branch(words)
    is_full = rt.log2_fft_size >= fft_cfg.log2_max
    return jax.lax.cond(is_full, full_branch, small_branch, words)
