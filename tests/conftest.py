"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set flags before jax is imported anywhere (SURVEY.md §4: multi-host tests
use fake-device CPU meshes; real-TPU checks happen in bench.py / the driver).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS at import time;
# force CPU again post-import so tests get the virtual 8-device host mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
