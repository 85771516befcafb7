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


# Inner-loop tier: `pytest -m quick` (<5 min) — fast, high-signal modules
# covering the math/config/IO core. The full suite (~35 min, serialized)
# stays the merge gate. Central allowlist so the tier is visible in one
# place rather than scattered pytestmarks.
_QUICK_MODULES = {
    "test_config",
    "test_quaternion",
    "test_losses_metrics",
    "test_resize",
    "test_pos_embed",
    "test_augment",
    "test_debug_utils",
    "test_logging_io",
    "test_tools",
    "test_native_png",
    "test_eval_edge_cases",
    "test_token_merge",
    "test_remat",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
