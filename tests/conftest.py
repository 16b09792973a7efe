"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env before the first jax import (standard JAX fake-backend trick;
see SURVEY §4).
"""

import os

# NOTE: the axon TPU plugin overrides the JAX_PLATFORMS *env var*; only the
# in-process config update reliably selects the CPU backend. Without it,
# every test process silently grabs the single TPU chip and concurrent
# processes deadlock on the device tunnel.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Persistent compilation cache: model-sized XLA CPU compiles take minutes;
# cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_demo_dataset():
    """Path to the reference's frozen 2-patient demo dataset, if present."""
    import pathlib

    p = pathlib.Path(REFERENCE_DIR) / "demo" / "MSLesSeg-Dataset" / "train"
    if not p.exists():
        pytest.skip("reference demo dataset not available")
    return p
