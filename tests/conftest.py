"""Test configuration: force a virtual 8-device CPU mesh for JAX tests.

Real-TPU benchmarking happens in bench.py, not here; tests must run
anywhere, so we pin JAX to CPU with 8 virtual devices before any JAX
import to exercise the multi-chip sharding paths.
"""
import os
import sys

# Force CPU: the ambient environment may point JAX at a remote TPU
# (JAX_PLATFORMS=axon) whose remote-compile path is far too slow for tests.
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: the scan kernels take ~30s each to compile on
# CPU XLA; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize (PYTHONPATH, runs at interpreter start — i.e.
# BEFORE this file) registers the remote-TPU plugin and sets the
# jax_platforms CONFIG to "axon,cpu", which takes precedence over the
# JAX_PLATFORMS env var set above.  Setting the config back is the only
# way to actually pin tests to CPU in that environment.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

TEST_DATA = "/root/reference/pgr-db/test/test_data"


@pytest.fixture(scope="session")
def test_data_dir():
    return TEST_DATA
