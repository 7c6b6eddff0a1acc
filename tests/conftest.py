"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (the standard JAX way to test
multi-device code; SURVEY.md §4).

The container's sitecustomize pre-imports jax with the axon TPU platform,
so env vars are too late — but jax backends initialize lazily, so
flipping the `jax_platforms` config here (before any jax computation)
reliably pins tests to CPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")
FIXTURES = REFERENCE_ROOT / "tests" / "data"
DATASETS = REFERENCE_ROOT / "examples" / "data"


@pytest.fixture(scope="session")
def fixtures_dir():
    if not FIXTURES.exists():
        pytest.skip("reference test fixtures not available")
    return FIXTURES


@pytest.fixture(scope="session")
def datasets_dir():
    if not DATASETS.exists():
        pytest.skip("reference datasets not available")
    return DATASETS
