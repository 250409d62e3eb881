"""Test configuration: force CPU backend with 8 virtual devices.

Must run before jax initializes a backend, hence the env mutation at import
time. Multi-chip sharding logic is exercised on the virtual CPU mesh; the
driver separately dry-runs the multi-chip path (see __graft_entry__.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Plugins (e.g. jaxtyping's pytest plugin) may import jax before this
# conftest runs, in which case jax captured JAX_PLATFORMS from the original
# environment. config.update still works any time before backend init.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
assert jax.device_count() >= 8, (
    "xla_force_host_platform_device_count=8 did not take effect")

from maxk_tpu.ops.graph import CSRGraph


def random_graph(n_nodes: int, avg_degree: float, seed: int = 0,
                 power_law: bool = False, self_loops: bool = False,
                 weighted: bool = True) -> CSRGraph:
    """Seeded random graph generator used across the test suite."""
    rng = np.random.default_rng(seed)
    n_edges = int(n_nodes * avg_degree)
    src = rng.integers(0, n_nodes, size=n_edges)
    if power_law:
        # Skewed destination distribution -> power-law-ish in-degrees.
        dst = (n_nodes * rng.power(0.3, size=n_edges)).astype(np.int64)
        dst = np.minimum(dst, n_nodes - 1)
    else:
        dst = rng.integers(0, n_nodes, size=n_edges)
    vals = rng.uniform(0.0, 1.0, size=n_edges).astype(np.float32) \
        if weighted else None
    g = CSRGraph.from_coo(src, dst.astype(np.int32), n_nodes, values=vals)
    if self_loops:
        g = g.add_self_loops()
    return g


@pytest.fixture
def small_graph():
    return random_graph(n_nodes=100, avg_degree=8.0, seed=1)


@pytest.fixture
def skewed_graph():
    return random_graph(n_nodes=300, avg_degree=20.0, seed=2, power_law=True)
