"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, so this happens at conftest import
time (pytest imports conftest before test modules).
"""

import os
import sys

# The image's sitecustomize pins JAX_PLATFORMS=axon (TPU); tests must run on
# a virtual 8-device CPU mesh with fp32 math, so override both the env var
# and the already-materialized config value.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
