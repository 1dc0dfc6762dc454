"""Sharded chain execution (SURVEY §2.15; BASELINE configs 3-5).

Three levels, in order of communication cost:

1. **Channel sharding** (``channel_sharded``): N hardware chain instances become a
   leading ``ch`` mesh axis; zero collectives. The preferred scaling axis.
2. **Range sharding of the window stages** (``range_sharded_mag_cfar``,
   ``range_sharded_fir``): the post-FFT magnitude spectrum (or time-domain stream)
   is sharded over ``rng``; CFAR guard+reference windows / FIR history cross shard
   edges via one neighbor ``ppermute`` halo exchange per direction over ICI.
3. **Full pipeline** (``make_sharded_pipeline``): one jitted program — per-channel
   FFT (no comms), a resharding constraint that makes XLA scatter the range axis,
   then the halo-exchanged CFAR tail under ``shard_map``. This is the TPU shape of
   the reference's whole streaming fabric.

Exactness: every sharded path is tested for bit-equality (up to float
accumulation) with its unsharded op on the 8-device CPU mesh (tests/test_sharded.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs import CfarConfig, ChainConfig, RuntimeConfig
from ..ops.cfar import CfarOutput, cfar_op
from ..ops.fft import fft_op
from ..ops.logmag import logmag
from .halo import exchange_halo, extend_with_halo
from .mesh import CHANNEL_AXIS, RANGE_AXIS


def channel_sharded(fn: Callable, mesh: jax.sharding.Mesh, batch_ndim: int = 1):
    """Shard a chain over its leading channel axis — the analog of elaborating N
    independent chain instances. ``fn(x, rt)`` with x: [C, ..., N]."""
    spec = P(CHANNEL_AXIS, *([None] * batch_ndim))
    in_sharding = NamedSharding(mesh, spec)
    jf = jax.jit(fn, in_shardings=(in_sharding, None))
    return jf


def cfar_halo_shard(
    mag_local: jnp.ndarray,
    rt: RuntimeConfig,
    cfg: CfarConfig,
    axis_name: str = RANGE_AXIS,
) -> CfarOutput:
    """CFAR on a range-sharded magnitude array: runs inside ``shard_map``.

    Exchanges halo = max_guard + max_ref cells with ring neighbors (sized for the
    elaborated maximum so runtime window growth never re-shards — SURVEY §7 hard
    part (d)), then runs the standard ``cfar_op`` on the extended block with the
    valid global cell range mapped into local coordinates."""
    halo = cfg.max_ref_window + cfg.max_guard_window
    n_loc = mag_local.shape[-1]
    r = lax.axis_index(axis_name)
    start = r * n_loc
    ext = extend_with_halo(mag_local, halo, axis_name)
    n_ext = ext.shape[-1]
    active_lo = jnp.clip(halo - start, 0, n_ext).astype(jnp.int32)
    active_hi = jnp.clip(rt.cfar_fft_size - start + halo, 0, n_ext).astype(jnp.int32)
    out = cfar_op(ext, rt, cfg, active_lo=active_lo, active_hi=active_hi)
    sl = lambda a: None if a is None else a[..., halo : halo + n_loc]
    return CfarOutput(sl(out.threshold), sl(out.peaks), sl(out.noise), sl(out.cut))


def cfar_2d_halo_shard(
    mag_local: jnp.ndarray,
    rt2,
    cfg2d,
    axis_name: str = RANGE_AXIS,
) -> CfarOutput:
    """2-D (range x Doppler) CA-CFAR on a range-sharded RD map: runs inside
    ``shard_map``. The Doppler axis is shard-local (maps shard per channel /
    range, never per pulse), so only the range axis exchanges a halo of
    ``max_guard_range + max_ref_range`` cells — sized for the elaborated
    maxima like the 1-D tail, so runtime window growth never re-shards."""
    from ..ops.cfar_2d import cfar_2d_op

    halo = cfg2d.max_ref_range + cfg2d.max_guard_range
    n_loc = mag_local.shape[-1]
    r = lax.axis_index(axis_name)
    start = r * n_loc
    ext = extend_with_halo(mag_local, halo, axis_name)
    n_ext = ext.shape[-1]
    lo = jnp.clip(halo - start, 0, n_ext).astype(jnp.int32)
    hi = jnp.clip(rt2.active_range - start + halo, 0, n_ext).astype(jnp.int32)
    out = cfar_2d_op(ext, rt2, cfg2d, active_lo=lo, active_hi=hi)
    sl = lambda a: None if a is None else a[..., halo : halo + n_loc]
    return CfarOutput(sl(out.threshold), sl(out.peaks), None, None)


def _cfar_out_specs(cfg: CfarConfig, spec):
    """shard_map out_specs matching CfarOutput's elaborated emission set."""
    return CfarOutput(
        spec, spec,
        spec if cfg.emit_noise else None,
        spec if cfg.send_cut else None,
    )


def _tail_check_vma(cfg: ChainConfig, n_loc: int) -> bool:
    """Whether the static varying-axes (replication) check can run on a tail
    shard_map. ``pallas_call`` carries no varying-axes type — its ``out_shape``
    ShapeDtypeStructs have ``vma=None``, which ``check_vma=True`` rejects
    outright (SURVEY §5.2 audit, r3) — so the check is only available when the
    local body lowers through XLA. Every Pallas-tail routing is instead pinned
    by sharded==unsharded equality tests (tests/test_sharded.py)."""
    return _fused_tail_local(cfg, n_loc) is None


def _fused_tail_local(cfg: ChainConfig, n_loc: int, axis_name: str = RANGE_AXIS):
    """Fused Pallas mag+CFAR tail for a range-sharded *spectrum* block, or
    ``None`` when the elaboration/shapes need the XLA tail.

    The r1 sharded path always ran the XLA ``cfar_op`` datapaths (3.8–78 ms at
    bench scale) while the unsharded chain used the 0.8 ms-class fused kernels;
    this routes the sharded tail through the same kernels. The halo is one
    kernel pad (128 lanes ≥ max window reach), so the extended block stays
    lane-aligned; the kernels' ``active_lo``/``active_hi`` registers mask halo
    cells beyond the true frame edges exactly like ``cfar_halo_shard``."""
    import jax as _jax

    from ..kernels.cfar_pallas import (
        GOS_RANGE_TILE, PAD, fused_mag_cfar, fused_mag_gos_dispatch,
        fused_tail_kind,
    )

    kind = fused_tail_kind(cfg)
    if kind is None:
        return None
    halo = PAD
    if n_loc < halo or n_loc % 128 != 0:
        return None
    if cfg.cfar.max_ref_window + cfg.cfar.max_guard_window + 1 > halo:
        return None
    n_ext = n_loc + 2 * halo
    if kind == "gos" and n_ext % GOS_RANGE_TILE != 0:
        return None
    fn = fused_mag_cfar if kind == "ca" else fused_mag_gos_dispatch
    interpret = _jax.default_backend() != "tpu"

    def tail(spec_local, rt: RuntimeConfig) -> CfarOutput:
        import dataclasses

        from ..cplx import C

        start = lax.axis_index(axis_name) * n_loc
        lo = jnp.clip(halo - start, 0, n_ext).astype(jnp.int32)
        hi = jnp.clip(rt.cfar_fft_size - start + halo, 0, n_ext).astype(jnp.int32)
        if cfg.cfar.use_rdma_halo:
            # halo spectra over Pallas RDMA, overlapped with the magnitude
            # computation; the CFAR kernel then runs in passthrough mode
            from ..kernels.cfar_pallas import MAG_PASSTHROUGH
            from ..kernels.pallas_halo import mag_extend_rdma

            mag_ext = mag_extend_rdma(spec_local.re, spec_local.im, halo,
                                      rt.mag_mode, axis_name,
                                      interpret=interpret)
            rt_pass = dataclasses.replace(
                rt, mag_mode=jnp.asarray(MAG_PASSTHROUGH, jnp.int32))
            out = fn(C(mag_ext, jnp.zeros_like(mag_ext)), rt_pass, cfg.cfar,
                     interpret=interpret, active_lo=lo, active_hi=hi)
        else:
            re_ext = extend_with_halo(spec_local.re, halo, axis_name)
            im_ext = extend_with_halo(spec_local.im, halo, axis_name)
            out = fn(C(re_ext, im_ext), rt, cfg.cfar, interpret=interpret,
                     active_lo=lo, active_hi=hi)
        sl = lambda a: a[..., halo : halo + n_loc]
        return CfarOutput(sl(out.threshold), sl(out.peaks), None, None)

    return tail


def _spectrum_tail_local(cfg: ChainConfig, n_loc: int,
                         axis_name: str = RANGE_AXIS):
    """Local (per-shard) logmag+CFAR over a range-sharded spectrum block:
    the fused Pallas kernel when the elaboration allows, else XLA
    logmag + ``cfar_halo_shard``."""
    fused = _fused_tail_local(cfg, n_loc, axis_name)
    if fused is not None:
        return fused

    def tail(spec_local, rt: RuntimeConfig) -> CfarOutput:
        mag = logmag(spec_local, rt.mag_mode, cfg.mag)
        return cfar_halo_shard(mag, rt, cfg.cfar, axis_name)

    return tail


def range_sharded_mag_cfar(cfg: ChainConfig, mesh: jax.sharding.Mesh):
    """logmag+CFAR over a spectrum sharded on the range axis. Returns a jitted
    ``f(spectrum, rt) -> CfarOutput`` with spectrum [..., N] sharded over rng."""
    def local_fn(spec_local, rt):
        return _spectrum_tail_local(cfg, spec_local.shape[-1])(spec_local, rt)

    def wrapped(spectrum, rt):
        nb = spectrum.ndim - 1
        spec = P(*([None] * nb), RANGE_AXIS)
        n_loc = spectrum.shape[-1] // mesh.shape.get(RANGE_AXIS, 1)
        sm = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(spec, P()),
            out_specs=_cfar_out_specs(cfg.cfar, spec),
            check_vma=_tail_check_vma(cfg, n_loc),
        )
        return sm(spectrum, rt)

    return jax.jit(wrapped)


def range_sharded_fir(taps, mesh: jax.sharding.Mesh, block_size: Optional[int] = None):
    """Overlap-save FIR over a range-sharded time axis: each shard pulls a
    (num_taps - 1)-sample left halo from its neighbor, then runs the local
    overlap-save convolution. Returns jitted ``f(x) -> y`` (x [..., T] sharded)."""
    from ..ops.matched_filter import overlap_save_fir

    taps = jnp.asarray(taps)
    m = taps.shape[0]

    def local_fn(x_local):
        left, _ = exchange_halo(x_local, m - 1, RANGE_AXIS)
        ext = jnp.concatenate([left, x_local], axis=-1)
        y = overlap_save_fir(ext, taps, block_size)
        return y[..., m - 1 :]

    def wrapped(x):
        nb = x.ndim - 1
        spec = P(*([None] * nb), RANGE_AXIS)
        # XLA-only body (ppermute halo + overlap-save FIR): the static
        # varying-axes check runs
        return jax.shard_map(
            local_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=True,
        )(x)

    return jax.jit(wrapped)


def make_sharded_pipeline(cfg: ChainConfig, mesh: jax.sharding.Mesh):
    """Full fft->mag->cfar pipeline over a (ch, rng) mesh in ONE jitted program.

    Input x: [C, ..., N] complex frames, sharded over ``ch`` (fast-time axis
    replicated within a channel group). The FFT runs per channel shard with no
    communication; a sharding constraint then scatters the spectrum's range axis
    over ``rng`` (XLA inserts the ICI collective); the CFAR tail runs under
    shard_map with halo exchange."""

    # pure channel sharding + a chain-fusable elaboration: every shard runs
    # the single whole-chain kernel (kernels/chain_pallas.py) — the same
    # datapath as the single-chip headline, no spectrum HBM round trip. The
    # range-sharded mesh keeps the FFT-then-scatter shape (the FFT needs the
    # full frame; only the window tail shards over rng).
    from ..kernels.cfar_pallas import fused_tail_kind
    from ..presets import _fusable_fft

    kind = fused_tail_kind(cfg)
    if (mesh.shape.get(RANGE_AXIS, 1) == 1
            and kind in ("ca", "gos") and _fusable_fft(cfg)):
        import jax as _jax

        from ..kernels.chain_pallas import fused_chain_ca_op, fused_chain_gos_op

        chain_op = fused_chain_ca_op if kind == "ca" else fused_chain_gos_op
        interpret = _jax.default_backend() != "tpu"

        def step_fused(x, rt: RuntimeConfig):
            from ..cplx import as_pair

            xp = as_pair(x)
            nb = xp.ndim - 1
            spec = P(CHANNEL_AXIS, *([None] * nb))
            sm = jax.shard_map(
                lambda xl, rt_: chain_op(xl, rt_, cfg.fft, cfg.cfar,
                                         interpret=interpret),
                mesh=mesh,
                in_specs=(spec, P()),
                out_specs=_cfar_out_specs(cfg.cfar, spec),
                # pallas_call body: no varying-axes type (see _tail_check_vma)
                check_vma=False,
            )
            return sm(xp, rt)

        return jax.jit(step_fused)

    def step(x, rt: RuntimeConfig):
        y = fft_op(x, rt.log2_fft_size, cfg.fft)
        nb = y.ndim - 1
        spec = P(CHANNEL_AXIS, *([None] * (nb - 1)), RANGE_AXIS)
        y = lax.with_sharding_constraint(y, NamedSharding(mesh, spec))

        def tail(spec_local, rt_):
            return _spectrum_tail_local(cfg, spec_local.shape[-1])(spec_local, rt_)

        n_loc = y.shape[-1] // mesh.shape.get(RANGE_AXIS, 1)
        sm = jax.shard_map(
            tail, mesh=mesh,
            in_specs=(spec, P()),
            out_specs=_cfar_out_specs(cfg.cfar, spec),
            check_vma=_tail_check_vma(cfg, n_loc),
        )
        return sm(y, rt)

    return jax.jit(step)


def make_sharded_rd_pipeline(cfg: ChainConfig, mesh: jax.sharding.Mesh, taps):
    """Flagship multi-chip step: the 2-D range-Doppler chain over a (ch, rng) mesh
    in ONE jitted program (BASELINE configs 3-5).

    Input x: [C, P, N] CPI blocks (C channels, P pulses, N fast-time samples),
    sharded over ``ch``. Per-channel stages (matched filter, Doppler FFT) run with
    zero communication; a sharding constraint scatters the range axis over ``rng``
    (XLA emits the ICI all-to-all); the CFAR tail runs under shard_map with
    ppermute halo exchange at shard edges.

    When the elaboration is fusable (``kernels/rd_pallas.py`` constraints) and
    ``use_pallas``, the zero-communication front half runs the fused MF+Doppler
    map kernel per channel shard (``emit='map'``) instead of the XLA stages —
    the multi-chip step then uses the same single-kernel datapath as the
    single-chip flagship."""
    from ..kernels.cfar_pallas import fused_tail_kind
    from ..kernels.rd_pallas import rd_fusable
    from ..ops.doppler import doppler_fft
    from ..ops.matched_filter import matched_filter
    import numpy as _np

    taps = _np.asarray(taps)  # host-side; the op splits to a real pair
    mf_cfg = cfg.matched_filter
    dop_cfg = cfg.doppler
    fused_front = fused_tail_kind(cfg) is not None and rd_fusable(cfg, taps)

    def step(x, rt: RuntimeConfig):
        if fused_front:
            import jax as _jax

            from ..cplx import as_pair
            from ..kernels.rd_pallas import fused_rd_chain

            interpret = _jax.default_backend() != "tpu"
            ch_spec = P(CHANNEL_AXIS, None, None)
            xp = as_pair(x)
            y = jax.shard_map(
                lambda xl, rt_: fused_rd_chain(xl, rt_, taps, cfg,
                                               interpret=interpret,
                                               emit="map"),
                mesh=mesh, in_specs=(ch_spec, P()),
                # pallas_call body: no varying-axes type (see _tail_check_vma)
                out_specs=ch_spec, check_vma=False,
            )(xp, rt)
        else:
            if mf_cfg is None:
                y = x
            elif mf_cfg.method == "overlap_save":
                # honor the method register like the single-device preset —
                # the circular filter has different (wraparound) edge
                # semantics and would break sharded==unsharded equality
                from ..ops.matched_filter import matched_filter_os

                y = matched_filter_os(x, taps, mf_cfg)
            else:
                y = matched_filter(x, taps, mf_cfg)
            if dop_cfg is not None:
                y = doppler_fft(y, dop_cfg)
        nb = y.ndim - 1
        spec = P(CHANNEL_AXIS, *([None] * (nb - 1)), RANGE_AXIS)
        y = lax.with_sharding_constraint(y, NamedSharding(mesh, spec))

        def tail(y_local, rt_):
            return _spectrum_tail_local(cfg, y_local.shape[-1])(y_local, rt_)

        n_loc = y.shape[-1] // mesh.shape.get(RANGE_AXIS, 1)
        sm = jax.shard_map(
            tail, mesh=mesh,
            in_specs=(spec, P()),
            out_specs=_cfar_out_specs(cfg.cfar, spec),
            check_vma=_tail_check_vma(cfg, n_loc),
        )
        return sm(y, rt)

    return jax.jit(step)
