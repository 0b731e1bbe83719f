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
