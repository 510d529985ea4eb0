"""Test harness config: force the CPU backend with 8 virtual devices so
multi-chip sharding paths run without TPU hardware (the JAX-native analog of
multi-GPU simulation; SURVEY.md section 4)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tests.fixtures import make_blender_scene  # noqa: E402


@pytest.fixture(scope="session")
def blender_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("lego_mini")
    make_blender_scene(str(root), n_train=4, n_val=2, n_test=2, size=40)
    return str(root)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
