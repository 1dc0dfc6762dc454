"""Inter-chip halo exchange as Pallas RDMA kernels (SURVEY §2.15/§5.8).

The collective path (``parallel/halo.py``) expresses the CFAR/FIR halo exchange
as two ``lax.ppermute``s that XLA schedules around the surrounding compute.
This module is the explicit-overlap upgrade: ``make_async_remote_copy`` sends
the spectrum halos to the ring neighbors and the kernel computes the local
magnitude row *while the DMA is in flight* — the halo latency is hidden behind
guaranteed useful work instead of left to the scheduler.

Semantics match ``parallel.halo.exchange_halo`` exactly: the ring wraps on-chip
but the wrapper zeroes the left halo of the first shard and the right halo of
the last (ppermute's absent-source semantics), which composes with the CFAR
kernels' ``active_lo``/``active_hi`` masking to reproduce frame-edge behaviour.

Hardware status: validated in interpret mode on the 8-device CPU mesh
(tests/test_pallas_halo.py) — this environment has one TPU chip, so the
compiled multi-chip path is flag-guarded behind ``CfarConfig.use_rdma_halo``
and carries a neighbor barrier (``pltpu.get_barrier_semaphore``) so a fast
device cannot write into a neighbor still occupying its previous kernel.

Whole-block kernels (no frame grid): the sharded CFAR tail calls these on
[frames, n_local] blocks that are VMEM-resident at realistic shard sizes; a
frame-tiled variant with per-tile double buffering is the follow-up once
multi-chip hardware is available to profile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cfar_pallas import _magnitude

# distinguishes this collective family from any other collective kernels
_HALO_COLLECTIVE_ID = 11


def _neighbor_ids(axis_name: str):
    my = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    right = lax.rem(my + 1, n)
    left = lax.rem(my + n - 1, n)
    return my, n, left, right


def _start_halo_rdma(refs, halo: int, axis_name: str, send_sem, recv_sem,
                     barrier: bool, logical: bool):
    """Start the 2*len(refs) ring RDMAs: for each (src_ref, left_out,
    right_out) triple, send the local tail to the right neighbor's ``left_out``
    and the local head to the left neighbor's ``right_out``. Returns the list
    of in-flight copies (call ``.wait()`` on each)."""
    _, _, left_nb, right_nb = _neighbor_ids(axis_name)

    if logical:
        # interpret mode: the jax discharge rule supports only scalar LOGICAL
        # ids on a single-named-axis mesh
        left_id, right_id = left_nb, right_nb
        id_type = pltpu.DeviceIdType.LOGICAL
    else:
        # compiled path: MESH-typed ids ({axis: coord}) address the ring
        # neighbor along the range axis while every other mesh axis keeps this
        # device's coordinate — required on multi-axis (ch, rng) meshes
        left_id = {axis_name: left_nb}
        right_id = {axis_name: right_nb}
        id_type = pltpu.DeviceIdType.MESH

    if barrier:
        # neighbor barrier: both neighbors must have entered this kernel (and
        # therefore own their output buffers) before any remote write lands
        bsem = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(bsem, inc=1, device_id=left_id,
                               device_id_type=id_type)
        pltpu.semaphore_signal(bsem, inc=1, device_id=right_id,
                               device_id_type=id_type)
        pltpu.semaphore_wait(bsem, 2)

    dmas = []
    for i, (src, left_out, right_out) in enumerate(refs):
        n_loc = src.shape[-1]
        to_right = pltpu.make_async_remote_copy(
            src_ref=src.at[:, pl.ds(n_loc - halo, halo)],
            dst_ref=left_out,
            send_sem=send_sem.at[2 * i],
            recv_sem=recv_sem.at[2 * i],
            device_id=right_id,
            device_id_type=id_type,
        )
        to_left = pltpu.make_async_remote_copy(
            src_ref=src.at[:, pl.ds(0, halo)],
            dst_ref=right_out,
            send_sem=send_sem.at[2 * i + 1],
            recv_sem=recv_sem.at[2 * i + 1],
            device_id=left_id,
            device_id_type=id_type,
        )
        to_right.start()
        to_left.start()
        dmas += [to_right, to_left]
    return dmas


def _exchange_kernel(x_ref, left_ref, right_ref, send_sem, recv_sem, *,
                     halo: int, axis_name: str, barrier: bool, logical: bool):
    dmas = _start_halo_rdma([(x_ref, left_ref, right_ref)], halo, axis_name,
                            send_sem, recv_sem, barrier, logical)
    for d in dmas:
        d.wait()


def _edge_zero(left, right, axis_name: str):
    """ppermute absent-source semantics: zero halos at the global frame ends."""
    my = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    left = jnp.where(my == 0, jnp.zeros_like(left), left)
    right = jnp.where(my == n - 1, jnp.zeros_like(right), right)
    return left, right


def halo_exchange_rdma(x: jnp.ndarray, halo: int, axis_name: str,
                       *, interpret: bool = False):
    """RDMA drop-in for ``parallel.halo.exchange_halo`` inside ``shard_map``:
    returns (left_halo, right_halo) of the ring neighbors, zeros at the global
    edges. ``x``: local block [..., n_local]; halo and n_local lane-aligned on
    the compiled path."""
    shape = x.shape
    n_loc = shape[-1]
    assert halo <= n_loc, "halo cannot exceed the local block"
    flat = 1
    for d in shape[:-1]:
        flat *= d
    x2 = x.reshape(flat, n_loc)
    kernel = functools.partial(_exchange_kernel, halo=halo,
                               axis_name=axis_name, barrier=not interpret,
                               logical=interpret)
    left, right = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((flat, halo), x.dtype)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=_HALO_COLLECTIVE_ID),
        interpret=interpret,
    )(x2)
    left, right = _edge_zero(left, right, axis_name)
    hs = shape[:-1] + (halo,)
    return left.reshape(hs), right.reshape(hs)


def _mag_extend_kernel(mscal_ref, re_ref, im_ref, out_ref,
                       lre_ref, lim_ref, rre_ref, rim_ref,
                       send_sem, recv_sem, *,
                       halo: int, n: int, axis_name: str, barrier: bool,
                       logical: bool):
    """Start the four halo RDMAs (re/im x left/right), compute the local
    magnitude while they fly, then the halo magnitudes."""
    mag_mode = mscal_ref[0]
    dmas = _start_halo_rdma(
        [(re_ref, lre_ref, rre_ref), (im_ref, lim_ref, rim_ref)],
        halo, axis_name, send_sem, recv_sem, barrier, logical)
    # overlapped useful work: the local block's magnitude (the bulk of the row)
    out_ref[:, halo : halo + n] = _magnitude(re_ref[:, :], im_ref[:, :],
                                             mag_mode)
    for d in dmas:
        d.wait()
    out_ref[:, 0:halo] = _magnitude(lre_ref[:, :], lim_ref[:, :], mag_mode)
    out_ref[:, halo + n : halo + n + halo] = _magnitude(
        rre_ref[:, :], rim_ref[:, :], mag_mode)


def mag_extend_rdma(re: jnp.ndarray, im: jnp.ndarray, halo: int,
                    mag_mode: jnp.ndarray, axis_name: str,
                    *, interpret: bool = False) -> jnp.ndarray:
    """Extended magnitude row [..., halo + n_local + halo] of a range-sharded
    spectrum, with the halo spectra fetched over RDMA *overlapped* with the
    local magnitude computation. Equivalent to
    ``extend_with_halo(logmag(spec), halo)`` (halo cells at the global edges
    are zero)."""
    shape = re.shape
    n_loc = shape[-1]
    assert halo <= n_loc
    flat = 1
    for d in shape[:-1]:
        flat *= d
    re2 = re.reshape(flat, n_loc).astype(jnp.float32)
    im2 = im.reshape(flat, n_loc).astype(jnp.float32)
    mscal = jnp.asarray(mag_mode, jnp.int32).reshape(1)
    kernel = functools.partial(_mag_extend_kernel, halo=halo, n=n_loc,
                               axis_name=axis_name, barrier=not interpret,
                               logical=interpret)
    out, lre, lim, rre, rim = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=[pltpu.SemaphoreType.DMA((4,)),
                            pltpu.SemaphoreType.DMA((4,))],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((flat, n_loc + 2 * halo), jnp.float32),
            # the received halo spectra are kernel outputs only because the
            # remote writes need stable destination buffers; callers ignore them
            jax.ShapeDtypeStruct((flat, halo), jnp.float32),
            jax.ShapeDtypeStruct((flat, halo), jnp.float32),
            jax.ShapeDtypeStruct((flat, halo), jnp.float32),
            jax.ShapeDtypeStruct((flat, halo), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=_HALO_COLLECTIVE_ID),
        interpret=interpret,
    )(mscal, re2, im2)

    # zero the global-edge halos (ppermute absent-source semantics); the mag of
    # a wrapped-in block is otherwise valid neighbor data on interior shards
    my = lax.axis_index(axis_name)
    nsh = lax.axis_size(axis_name)
    col = lax.broadcasted_iota(jnp.int32, out.shape, out.ndim - 1)
    out = jnp.where((my == 0) & (col < halo), 0.0, out)
    out = jnp.where((my == nsh - 1) & (col >= halo + n_loc), 0.0, out)
    return out.reshape(shape[:-1] + (n_loc + 2 * halo,))
