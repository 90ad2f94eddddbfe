"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends (SURVEY.md §4's
TPU-native test strategy: multi-device tests without a real cluster).
"""

import os

# The session env pins JAX_PLATFORMS=axon (the real TPU tunnel); unit tests
# must run on the virtual CPU mesh, so override unconditionally. Set
# UNET_TPU_TEST_PLATFORM=axon to deliberately run the suite on hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("UNET_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize calls register() at interpreter start, which sets
# jax_platforms="axon,cpu" via jax.config — overriding the env var above.
# A config update after import wins (backends are not yet initialized here).
jax.config.update(
    "jax_platforms", os.environ.get("UNET_TPU_TEST_PLATFORM", "cpu")
)
jax.config.update("jax_default_matmul_precision", "highest")
