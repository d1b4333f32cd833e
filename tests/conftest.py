"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the driver separately dry-runs the multichip
path on real meshes).

Note: this environment pre-imports jax at interpreter startup (site hook for
the TPU tunnel), so JAX_PLATFORMS in os.environ is too late — we use
jax.config.update before any backend is initialized instead. XLA_FLAGS is
read at client creation, so setting it here still takes effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_graph(rng, n=60, p=0.08):
    import scipy.sparse as sp
    a = (rng.random((n, n)) < p).astype(float)
    a = np.triu(a, 1)
    a = a + a.T
    return sp.csr_matrix(a)
