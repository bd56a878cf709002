"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends; conftest is
imported before any test module, and the flags only take effect if no
backend has been created yet.
"""

import os

# Force: the machine presets JAX_PLATFORMS=axon (real TPU); tests must run
# on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
