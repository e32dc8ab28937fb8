"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and run without TPU hardware."""

import os

# force CPU regardless of the ambient platform (e.g. a session-level
# JAX_PLATFORMS=axon pointing at real TPU hardware): the test suite wants a
# deterministic virtual 8-device mesh and fast local compiles
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import jax
import pytest

# the axon sitecustomize force-sets jax_platforms="axon,cpu" at import,
# overriding the env var; override it back before any backend initializes
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the batch-pipeline tests trigger several
# moderately large XLA compiles; cache them across test runs (repo-local:
# /tmp does not survive container restarts between sessions)
from vorbispizza_tpu.utils.cache import configure as _configure_cache

_configure_cache(jax)

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_TESTFILES = pathlib.Path("/root/reference/TestFiles")


@pytest.fixture(scope="session")
def testfiles():
    if not REFERENCE_TESTFILES.exists():
        pytest.skip("reference test files not available")
    return sorted(REFERENCE_TESTFILES.glob("*.ogg"))


@pytest.fixture(scope="session")
def testfile1():
    p = REFERENCE_TESTFILES / "1test.ogg"
    if not p.exists():
        pytest.skip("1test.ogg not available")
    return p
