"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Per SURVEY.md section 4: multi-device sharding paths are exercised on
virtual CPU devices so no TPU is required. Note: a pytest plugin in this
image imports jax before conftest runs, so env vars are too late —
``jax.config.update`` is authoritative here.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
