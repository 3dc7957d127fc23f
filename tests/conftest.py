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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The full suite compiles ~1000 distinct XLA programs in one process.
# With several hundred live compiled executables, jaxlib 0.9's CPU
# backend_compile nondeterministically segfaults or deadlocks (observed
# reproducibly around test #730, always inside
# jax/_src/compiler.py:backend_compile_and_load on an otherwise-innocent
# program that compiles fine in isolation; natives/callbacks ruled out
# by KRYLOV_TPU_NO_NATIVE=1 runs).  Dropping executable references
# periodically keeps the live count bounded and avoids the trigger; the
# recompiles cost a few percent of suite time.
_TESTS_SINCE_CLEAR = {"n": 0}


@pytest.fixture(autouse=True)
def _bound_live_executables():
    yield
    _TESTS_SINCE_CLEAR["n"] += 1
    if _TESTS_SINCE_CLEAR["n"] % 150 == 0:
        jax.clear_caches()
