"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device (data-parallel / sharding) paths are exercised without TPU
hardware via XLA's host-platform device-count override, per SURVEY.md §4.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize imports jax (registering the axon TPU plugin)
# before conftest runs, so the env var alone is too late — override the
# already-read config value as well (backends are still uninitialized here).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DATA = pathlib.Path("/root/reference/datasets/500_100_100")

import pytest


@pytest.fixture(scope="session")
def reference_cgan_dir():
    d = REFERENCE_DATA / "cgan"
    if not d.exists():
        pytest.skip("reference dataset not mounted")
    return d
