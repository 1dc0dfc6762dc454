"""Test harness: force an 8-device CPU platform so sharded (ICI-analog) paths are
testable without a pod (SURVEY §4 — the multi-chip coverage the reference lacks)."""

import os

# must happen before jax initializes a backend. NOTE: this image's sitecustomize
# force-registers the axon TPU plugin and prepends "axon" to jax_platforms, so the
# env var alone is not enough — override the config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream no matter
    # which other tests ran before it (a session-scoped stream made marginal
    # SNR asserts order-dependent)
    return np.random.RandomState(11110)
