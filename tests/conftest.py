"""Test configuration: force JAX onto CPU with 8 virtual devices.

This lets multi-chip sharding tests run on any host (SURVEY.md §4: JAX can
fake an 8-device mesh with xla_force_host_platform_device_count) and keeps
unit tests independent of TPU availability.
"""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# which makes every tiny unit-test compile a slow remote compile — and runs
# f32 tests on bf16 MXUs. The env var alone is not enough: the axon
# sitecustomize imports jax before conftest runs, so also set the config
# explicitly (backends are initialized lazily, so this still takes effect).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Make the reference implementation importable for golden-parity tests.
# The reference is read-only public code used purely as a numerical oracle.
REFERENCE_PATH = "/root/reference"
if os.path.isdir(REFERENCE_PATH) and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


def has_reference():
    return os.path.isdir(REFERENCE_PATH)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference implementation not available"
)
