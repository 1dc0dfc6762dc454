"""r3 measured-floor evidence (VERDICT item 2 'written, measured proof'):
interleaved (drift-controlled) stage ablations of the CA chain kernel in the
UNGATED family (ablation switches bypass the gated body), plus the gated ship
form and the GOS chain under the same drift for a clean GOS/CA ratio.
Ablated results are WRONG by construction — timing only. Run ALONE."""

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
    from rsp_chains_tpu import CfarConfig, CfarVariant, FftConfig, RuntimeConfig
    from rsp_chains_tpu.cplx import C
    from rsp_chains_tpu.kernels.chain_pallas import (
        fused_chain_ca, fused_chain_gos,
    )
    from rsp_chains_tpu.utils.device import acquire_device

    dev = acquire_device(600)
    print(f"device: {dev}", file=sys.stderr, flush=True)

    n = 1024
    fft_cfg = FftConfig(max_size=n)
    ca_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.CA,
                        include_cash=False, max_fft_size=n)
    gos_cfg = CfarConfig(max_ref_window=64, variant=CfarVariant.GOSCA,
                         include_cash=True, max_fft_size=n)
    rng = np.random.RandomState(0)
    x = C(jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32),
          jnp.asarray(rng.randn(64, 256, n) * 100, jnp.float32))
    rt = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                            guard_window_size=4, threshold_scaler=3.5,
                            div_sum=5)
    rt_gos = RuntimeConfig.make(fft_size=n, ref_window_size=32,
                                guard_window_size=4, threshold_scaler=3.5,
                                div_sum=5, cfar_algorithm=1,
                                index_lagg=16, index_lead=16)

    def ca(**kw):
        return jax.jit(lambda a, r, _kw=kw: fused_chain_ca(
            a, r, fft_cfg, ca_cfg, **_kw))

    cands = {
        "ship_gated_bf128": (ca(), rt),
        "ship_gated_bf256": (ca(block_frames=256), rt),
        "full_ungated": (ca(gated_cfar=False), rt),
        "ablate_cfar": (ca(ablate="cfar", gated_cfar=False), rt),
        "ablate_perm": (ca(ablate="perm", gated_cfar=False), rt),
        "ablate_mxu": (ca(ablate="mxu", gated_cfar=False), rt),
        "ablate_pass1": (ca(ablate="pass1", gated_cfar=False), rt),
        "gos_oe_bf32": (jax.jit(lambda a, r: fused_chain_gos(
            a, r, fft_cfg, gos_cfg)), rt_gos),
    }
    for name, (f, rr) in cands.items():
        try:
            jax.block_until_ready(f(x, rr))
            print(f"warm {name}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"warm {name} FAILED: {e}"[:200], file=sys.stderr, flush=True)

    results = {k: [] for k in cands}
    for rep in range(4):
        for name, (f, rr) in cands.items():
            try:
                ms = measure_per_call(f, x, rr) * 1e3
            except Exception:  # noqa: BLE001
                ms = float("nan")
            results[name].append(round(ms, 4))
            print(f"rep{rep} {name}: {ms:.4f} ms", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
