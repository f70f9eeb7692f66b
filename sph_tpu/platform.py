"""Backend bootstrap: survive stale JAX_PLATFORMS env values.

This machine reaches its TPU through an out-of-tree PJRT plugin whose
*platform name has changed across sessions* (round 1: the env preset
``JAX_PLATFORMS=axon`` matched a registered "axon" backend; round 2 the same
plugin registers plain "tpu", and jax dies at first use with
``Backend 'axon' is not in the list of known backends: ['cpu', 'tpu']``).
The driver runs bench.py/__graft_entry__ with the environment as-is, so
every entry point calls :func:`ensure_backend` before doing real work:
if the env-requested platform set cannot initialize, fall back to
automatic platform selection ("" = pick the best available backend).

Harmless when the env is healthy: the happy path is one jax.devices() call.
"""

from __future__ import annotations


def ensure_backend() -> str:
    """Make sure *some* jax backend initializes; return its platform name.

    Must run before any jax operation touches a device (it may reset the
    platform selection, which is only possible while no backend exists).
    """
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError:
        # Env names a platform jax doesn't know (stale JAX_PLATFORMS).
        # Clear the selection and let jax pick from what actually exists.
        import jax.extend as jex

        jax.config.update("jax_platforms", "")
        try:
            jex.backend.clear_backends()
        except Exception:  # noqa: BLE001 — nothing initialized yet is fine
            pass
        return jax.devices()[0].platform
