"""Test env: force CPU backend with 8 fake devices (SURVEY.md §4.9).

This machine pre-sets JAX_PLATFORMS=axon (the experimental TPU platform) and
the env var wins over in-process edits, so the reliable override is
jax.config.update after import.  The 8 virtual CPU devices let the shard_map
domain-decomposition tests run on a 1×8 mesh without real multi-chip
hardware.
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
