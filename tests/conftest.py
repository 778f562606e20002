"""Test environment: run everything on a virtual 8-device CPU platform so
sharding/pjit paths are exercised without a TPU pod (the standard JAX
fake-backend trick; SURVEY.md §4)."""

import os

# The harness presets JAX_PLATFORMS=axon (the tunneled real TPU) and the
# axon plugin's register() re-forces jax_platforms='axon,cpu' in-process,
# so both the env var AND the config must be overridden: running the
# suite over the tunnel is ~100x slower (82s backend init alone) and the
# sharding tests need 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402


REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    return REFERENCE_ROOT


@pytest.fixture(scope="session")
def cornell_scene():
    """scenes/0.txt: Cornell box (18 tris) + cube (12 tris), 2 emissive."""
    from inverse_path_tracer_tpu.scene.build import load_scene

    return load_scene(
        os.path.join(REFERENCE_ROOT, "scenes/0.txt"), asset_root=REFERENCE_ROOT
    )


@pytest.fixture(scope="session")
def cornell_only_scene():
    """Just the Cornell box object of scenes/0.txt (18 triangles)."""
    from inverse_path_tracer_tpu.scene.build import build_scene
    from inverse_path_tracer_tpu.scene.dsl import load_params

    params = load_params(os.path.join(REFERENCE_ROOT, "scenes/0.txt"))[:1]
    return build_scene(params, asset_root=REFERENCE_ROOT)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
