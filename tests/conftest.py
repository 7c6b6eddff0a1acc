"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (the standard JAX way to test
multi-device code; SURVEY.md §4).

The container's sitecustomize pre-imports jax with the axon TPU platform
before any test code runs, so platform env vars set here are too late —
conftest re-execs pytest once with the right environment.
"""

import os
import sys

if os.environ.get("CORA_TPU_TEST_CHILD") != "1":
    env = dict(os.environ)
    env["CORA_TPU_TEST_CHILD"] = "1"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

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
