"""RDMA halo-exchange kernels (kernels/pallas_halo.py) vs the ppermute path —
interpret mode on the 8-device CPU mesh (SURVEY §2.15 inter-chip row).

Shapes stay small: interpret-mode Pallas dominates suite time (CLAUDE.md)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from rsp_chains_tpu.configs import (
    CfarConfig, CfarVariant, ChainConfig, FftConfig, RuntimeConfig,
)
from rsp_chains_tpu.parallel import make_mesh
from rsp_chains_tpu.parallel.halo import exchange_halo, extend_with_halo
from rsp_chains_tpu.parallel.mesh import RANGE_AXIS
from rsp_chains_tpu.kernels.pallas_halo import halo_exchange_rdma, mag_extend_rdma


@pytest.fixture(scope="module")
def mesh8():
    # interpret-mode remote DMA supports a single named mesh axis (the jax
    # discharge rule raises NotImplementedError for more); the compiled Mosaic
    # path takes MESH-typed ids on multi-axis meshes. Test on an rng-only ring.
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()).reshape(8), (RANGE_AXIS,))


def _shard_map_pair(mesh, fn, n_out=2):
    spec = P(None, RANGE_AXIS)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,), out_specs=(spec,) * n_out,
        check_vma=False,
    ))


def test_halo_exchange_rdma_equals_ppermute(mesh8):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1024).astype(np.float32)
    halo = 128

    def rdma_fn(xl):
        return halo_exchange_rdma(xl, halo, RANGE_AXIS, interpret=True)

    def pp_fn(xl):
        return exchange_halo(xl, halo, RANGE_AXIS)

    l_r, r_r = _shard_map_pair(mesh8, rdma_fn)(jnp.asarray(x))
    l_p, r_p = _shard_map_pair(mesh8, pp_fn)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(l_r), np.asarray(l_p))
    np.testing.assert_array_equal(np.asarray(r_r), np.asarray(r_p))


def test_mag_extend_rdma_equals_mag_then_exchange(mesh8):
    """The overlap kernel (mag computed while halos fly) equals the compose of
    logmag and the ppermute extension."""
    from rsp_chains_tpu.ops.logmag import logmag
    from rsp_chains_tpu.cplx import C

    rng = np.random.RandomState(1)
    re = rng.randn(2, 1024).astype(np.float32)
    im = rng.randn(2, 1024).astype(np.float32)
    halo = 128
    mag_mode = jnp.asarray(2, jnp.int32)  # JPL

    def rdma_fn(rel, iml):
        out = mag_extend_rdma(rel, iml, halo, mag_mode, RANGE_AXIS,
                              interpret=True)
        return (out,)

    def pp_fn(rel, iml):
        mag = logmag(C(rel, iml), mag_mode)
        return (extend_with_halo(mag, halo, RANGE_AXIS),)

    spec = P(None, RANGE_AXIS)
    run = lambda f: jax.jit(jax.shard_map(
        f, mesh=mesh8, in_specs=(spec, spec), out_specs=(spec,),
        check_vma=False))(jnp.asarray(re), jnp.asarray(im))[0]
    got = np.asarray(run(rdma_fn))
    want = np.asarray(run(pp_fn))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sharded_tail_rdma_halo_equals_unsharded(mesh8):
    """Full range-sharded tail with use_rdma_halo: fused kernel + RDMA halo
    equals the unsharded XLA op."""
    from rsp_chains_tpu.ops.cfar import cfar_op
    from rsp_chains_tpu.ops.logmag import logmag
    from rsp_chains_tpu.parallel.sharded import range_sharded_mag_cfar
    from rsp_chains_tpu.cplx import as_pair

    cfg = ChainConfig(
        fft=FftConfig(max_size=1024),
        cfar=CfarConfig(max_ref_window=64, max_guard_window=8,
                        variant=CfarVariant.CA, include_cash=False,
                        use_pallas=True, use_rdma_halo=True),
    )
    rt = RuntimeConfig.make(fft_size=1024, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    rng = np.random.RandomState(2)
    spec = (rng.randn(2, 1024) + 1j * rng.randn(2, 1024)).astype(np.complex64)
    out_s = range_sharded_mag_cfar(cfg, mesh8)(as_pair(spec), rt)
    mag = logmag(jnp.asarray(spec), rt.mag_mode, cfg.mag)
    out_u = cfar_op(mag, rt, cfg.cfar)
    np.testing.assert_allclose(np.asarray(out_s.threshold),
                               np.asarray(out_u.threshold), rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_s.peaks), np.asarray(out_u.peaks))
