"""Test config: force CPU with a virtual 8-device mesh (SURVEY §4 implication).

The axon sitecustomize imports jax and registers the TPU backend in *every*
python process before conftest runs, so plain env vars are too late — we
update the live jax config and clear already-initialized backends instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:  # pragma: no cover - jax version differences
    pass

assert jax.devices()[0].platform == "cpu"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
