"""Determinism (SURVEY.md §4.7): same seed → bitwise-identical trajectories
across runs and across dispatch-batching choices (guards against accidental
cross-step fusion reordering)."""

import numpy as np

from helpers import small_scene

from sph_tpu.state import init
from sph_tpu.step import make_advance, make_step


def test_rerun_bitwise_identical():
    scene = small_scene(dim=2, seed=7)
    adv = make_advance(scene, "naive", steps_per_dispatch=50)
    s1 = adv(init(scene))
    s2 = adv(init(scene))
    for a, b in [(s1.x, s2.x), (s1.v, s2.v), (s1.rho, s2.rho)]:
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_dispatch_batching_bitwise_identical():
    """S=1 per dispatch vs S=60 per dispatch must agree bitwise."""
    scene = small_scene(dim=2, seed=8)
    s_batched = make_advance(scene, "naive", steps_per_dispatch=60)(init(scene))
    import jax

    step1 = jax.jit(make_step(scene, "naive"))
    s_single = init(scene)
    for _ in range(60):
        s_single = step1(s_single)
    assert np.array_equal(np.asarray(s_batched.x), np.asarray(s_single.x))
    assert np.array_equal(np.asarray(s_batched.v), np.asarray(s_single.v))
    assert int(s_batched.step) == int(s_single.step) == 60


def test_init_deterministic():
    scene = small_scene(dim=2, seed=9)
    a, b = init(scene), init(scene)
    assert np.array_equal(np.asarray(a.x), np.asarray(b.x))
    assert np.array_equal(np.asarray(a.emit_step), np.asarray(b.emit_step))
