"""Test harness: force an 8-device CPU mesh before any JAX computation.

This is the "fake backend" the reference never had (SURVEY.md section 4):
multi-device sharding tests run on virtual CPU devices, no TPU required.

Note: this environment's ``sitecustomize`` registers a TPU ('axon') PJRT
plugin at interpreter startup and pins ``JAX_PLATFORMS=axon``, so an env-var
``setdefault`` in conftest is too late — we must override through
``jax.config`` before the first backend query.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop JAX's in-process executable caches after every test module.

    A single-process run of the full suite accumulates hundreds of
    compiled CPU executables; at the ~45-minute mark XLA's compiler has
    been observed to segfault inside ``backend_compile_and_load``
    (state-dependent — the same tests pass in half-suite runs).  Clearing
    per module bounds the live-executable population at a small
    recompile cost for cross-module jit reuse.
    """
    yield
    import jax

    jax.clear_caches()
