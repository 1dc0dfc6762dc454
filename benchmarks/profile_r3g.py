"""r3 drift-controlled A/B: the candidates are measured INTERLEAVED
(A,B,C,A,B,C,...) so session-to-session relay drift (~30% observed between
r3e and r3f) cannot masquerade as a formulation win. Also measures each
candidate at two loop lengths to sanity-check the slope. Run ALONE."""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from bench import measure_per_call
    from rsp_chains_tpu import (
        CfarConfig, CfarVariant, FftConfig, RuntimeConfig,
    )
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import fused_chain_ca
    from rsp_chains_tpu.kernels.rd_pallas import _h_block
    from rsp_chains_tpu.utils.device import acquire_device

    dev = acquire_device(600)
    print(f"device: {dev}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)

    n2 = 4096
    cfg2 = CfarConfig(max_ref_window=64, max_fft_size=n2,
                      variant=CfarVariant.CA, include_cash=False)
    fft2 = FftConfig(max_size=n2)
    from rsp_chains_tpu.golden import lfm_chirp

    hb2 = _h_block(np.asarray(lfm_chirp(128, 0.0, 0.25)), n2, True)
    rt2 = RuntimeConfig.make(fft_size=n2, ref_window_size=32,
                             guard_window_size=4, threshold_scaler=8.0)
    x2 = C(jnp.asarray(rng.randn(4, 256, n2) * 100, jnp.float32),
           jnp.asarray(rng.randn(4, 256, n2) * 100, jnp.float32))

    cands = {
        "ship_bf128": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg)), x, rt),
        "bf256": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, block_frames=256)), x, rt),
        "bf256_gatemag": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, block_frames=256, gate_mag=True)), x, rt),
        "pc4096_bf128": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft2, cfg2, h_block=hb2)), x2, rt2),
        "pc4096_bf256": (jax.jit(lambda a, r: fused_chain_ca(
            a, r, fft2, cfg2, h_block=hb2, block_frames=256)), x2, rt2),
    }
    # warm every compile first so measurement passes are back to back
    for name, (f, xx, rr) in cands.items():
        out = f(xx, rr)
        jax.block_until_ready(out)
        print(f"warm {name}", file=sys.stderr, flush=True)

    results = {k: [] for k in cands}
    for rep in range(4):
        for name, (f, xx, rr) in cands.items():
            ms = measure_per_call(f, xx, rr) * 1e3
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
