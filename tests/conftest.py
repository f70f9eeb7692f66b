"""Test env: force CPU backend with 8 fake devices (SURVEY.md §4.9).

Must run before any jax import — pytest loads conftest first.  The 8 virtual
CPU devices let the `shard_map` domain-decomposition tests run on a 1×8 mesh
without real multi-chip hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
