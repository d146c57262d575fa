"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax initializes its backends, so this sits in conftest.py and
sets the env vars at import time.  Multi-chip sharding tests run on the
virtual CPU mesh; real-TPU benchmarking is done by bench.py, not the tests.
"""

import os

# Force CPU regardless of the ambient JAX_PLATFORMS (the dev box points it at
# a remote TPU tunnel; tests must be hermetic and run on the virtual mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The ambient sitecustomize registers a remote-TPU PJRT plugin and forces
# jax_platforms=axon; override via config (stronger than the env var) before
# any backend initializes so tests stay on the local virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    if not REFERENCE_DIR.exists():
        pytest.skip("reference tree not mounted")
    return REFERENCE_DIR
