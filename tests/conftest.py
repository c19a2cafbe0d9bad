"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy (single-node Catch2 matrix,
tests/ut/CMakeLists.txt) adapted per SURVEY.md §4: multi-chip behavior is
validated on a fake CPU mesh via --xla_force_host_platform_device_count; real
TPU runs happen in bench.py / the driver's compile checks.
"""

import os

# Must be set before jax is imported anywhere. Tests always run on a virtual
# 8-device CPU mesh, even when a real TPU is attached (bench.py uses the TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A site hook in this image forces jax_platforms="axon,cpu" regardless of the
# env var; override after import so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
