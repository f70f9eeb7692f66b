"""Static boundary particles (SURVEY.md C12, BASELINE config 4): frozen
particles (kind=1) contribute to density/pressure but never move."""

import numpy as np
import pytest

from sph_tpu.params import Block, Scene, SimParams, calibrate
from sph_tpu.state import init
from sph_tpu.step import make_advance


def _floor_scene(method="naive"):
    p = SimParams(boundary_mode="penalty", dt=5e-4)
    spacing = p.h * 0.55
    scene = Scene(
        params=p,
        lo=(0.0, 0.0),
        hi=(400.0, 400.0),
        blocks=(
            # fluid block falling onto...
            Block(lo=(120.0, 120.0), hi=(280.0, 240.0)),
            # ...a static two-layer floor of boundary particles
            Block(
                lo=(40.0, 40.0),
                hi=(360.0, 40.0 + 2 * spacing),
                kind=1,
            ),
        ),
        seed=80,
    )
    return calibrate(scene)


@pytest.mark.parametrize("method", ["naive", "grid"])
def test_boundary_particles_never_move(method):
    scene = _floor_scene()
    state = init(scene)
    kind = np.asarray(state.kind)
    x0 = np.asarray(state.x)[kind == 1].copy()
    adv = make_advance(scene, method, steps_per_dispatch=100)
    for _ in range(3):
        state = adv(state)
    x1 = np.asarray(state.x)[kind == 1]
    v1 = np.asarray(state.v)[kind == 1]
    assert np.array_equal(x0, x1)       # bitwise frozen
    assert np.all(v1 == 0)


def test_boundary_particles_repel_fluid():
    """Falling fluid is stopped by the particle floor well above the domain
    wall (the floor's density contribution creates pressure)."""
    scene = _floor_scene()
    state = init(scene)
    kind = np.asarray(state.kind)
    floor_top = np.asarray(state.x)[kind == 1][:, 1].max()
    adv = make_advance(scene, "grid", steps_per_dispatch=200)
    for _ in range(5):  # 1000 steps ≈ 0.5 s of fall
        state = adv(state)
    act = np.asarray(state.active)
    fluid = act & (kind == 0)
    y = np.asarray(state.x)[fluid][:, 1]
    assert np.all(np.isfinite(y))
    # all fluid stays above (floor_top - spacing): the floor holds
    spacing = scene.params.h * 0.55
    assert y.min() > floor_top - spacing


def test_boundary_particles_have_density():
    scene = _floor_scene()
    state = init(scene)
    adv = make_advance(scene, "grid", steps_per_dispatch=5)
    state = adv(state)
    kind = np.asarray(state.kind)
    rho_b = np.asarray(state.rho)[kind == 1]
    # interior floor particles see a half-filled support: rho in a sane band
    assert np.all(rho_b > 0.2 * scene.params.rest_density)
    assert np.all(rho_b < 2.0 * scene.params.rest_density)
