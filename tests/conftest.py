"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's single-host multi-process MPI testing gap
(SURVEY.md §4): we test multi-device sharding without TPU hardware by
forcing the CPU backend with 8 virtual devices.

Note: the environment's sitecustomize pins JAX_PLATFORMS=axon (TPU), so
the backend must be overridden through jax.config, not the env var.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
