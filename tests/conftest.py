"""Test configuration.

Numerical-parity tests run on the CPU backend in float64; distributed tests
use 8 virtual CPU devices (the fake-backend mechanism for row-partitioned
SpMV / psum paths, per SURVEY.md §4).

Note: the environment's sitecustomize registers a remote-TPU PJRT plugin and
force-sets ``jax_platforms``; we override it *after* jax import (backends are
created lazily, so XLA_FLAGS set here is still honored by the CPU client).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
