"""Test harness: run JAX on a virtual 8-device CPU mesh.

The machine presets a real-TPU plugin (registered from sitecustomize at
interpreter start), which overrides the JAX_PLATFORMS env var. Forcing the
platform through jax.config *after* import wins, as long as no backend has
been initialized yet — conftest is imported before any test module.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
