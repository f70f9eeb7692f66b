"""Physical invariants (SURVEY.md §4.6)."""

import numpy as np

from helpers import small_scene

from sph_tpu.params import Block, Scene, SimParams, calibrate
from sph_tpu.state import init
from sph_tpu.step import make_advance


def test_momentum_conservation_no_gravity_no_walls():
    """With gravity off and no wall contact, pairwise antisymmetry makes
    total momentum Σ m v exactly conserved up to fp roundoff."""
    p = SimParams(
        gravity=(0.0, 0.0),
        boundary_mode="penalty",
        viscosity=0.0,  # viscosity also conserves momentum, but keep it pure
        dt=2e-4,
    )
    scene = Scene(
        params=p,
        lo=(-1e4, -1e4),
        hi=(1e4, 1e4),
        blocks=(Block(lo=(0.0, 0.0), hi=(100.0, 100.0)),),
        seed=4,
    )
    scene = calibrate(scene)
    state = init(scene)
    adv = make_advance(scene, "naive", steps_per_dispatch=100)
    mom0 = np.sum(np.asarray(state.v), axis=0) * p.mass
    for _ in range(10):  # 1000 steps
        state = adv(state)
    mom1 = np.sum(np.asarray(state.v), axis=0) * p.mass
    vmax = np.max(np.abs(np.asarray(state.v))) + 1e-9
    n = state.capacity
    assert np.all(np.abs(mom1 - mom0) < 1e-3 * p.mass * vmax * n)
    assert np.all(np.isfinite(np.asarray(state.x)))


def test_viscous_momentum_conservation():
    """Viscosity force (vⱼ−vᵢ) pairs are antisymmetric only when ρ is equal;
    the standard form still conserves momentum well in practice — assert a
    loose bound over 500 steps."""
    p = SimParams(gravity=(0.0, 0.0), boundary_mode="penalty", dt=2e-4)
    scene = Scene(
        params=p,
        lo=(-1e4, -1e4),
        hi=(1e4, 1e4),
        blocks=(Block(lo=(0.0, 0.0), hi=(100.0, 100.0), velocity=(5.0, 0.0)),),
        seed=5,
    )
    scene = calibrate(scene)
    state = init(scene)
    adv = make_advance(scene, "naive", steps_per_dispatch=100)
    n_act = int(state.n_active())
    mom0 = np.sum(np.asarray(state.v), axis=0) * p.mass
    for _ in range(5):
        state = adv(state)
    mom1 = np.sum(np.asarray(state.v), axis=0) * p.mass
    assert np.all(np.abs(mom1 - mom0) < 0.05 * np.abs(mom0[0]) + 1e-3 * n_act)


def test_dam_break_stays_bounded():
    """The default 2D dam-break neither explodes nor escapes the box."""
    scene = small_scene(dim=2)
    state = init(scene)
    adv = make_advance(scene, "naive", steps_per_dispatch=200)
    for _ in range(5):  # 1000 steps
        state = adv(state)
    x = np.asarray(state.x)[np.asarray(state.active)]
    v = np.asarray(state.v)[np.asarray(state.active)]
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(v))
    lo = np.asarray(scene.lo) + scene.params.wall_eps - 1e-3
    hi = np.asarray(scene.hi) - scene.params.wall_eps + 1e-3
    assert np.all(x >= lo[None, :]) and np.all(x <= hi[None, :])
    # settled-ish: speeds are modest compared to shallow-water scale
    assert np.max(np.abs(v)) < 500.0


def test_hydrostatic_stratification():
    """A pool under gravity stratifies: density increases with depth, with
    the EOS-consistent order of magnitude (SURVEY.md §4.6).

    Bounds are deliberately loose: the Müller-family ideal-gas formulation
    (which the reference uses) never fully settles — its tensile/pairing
    instability keeps median speeds at tens of px/s — so only the
    qualitative stratification and a coarse slope band are robust."""
    p = SimParams(
        gravity=(0.0, -200.0),
        dt=3e-4,
        viscosity=500.0,
        boundary_damping=-0.1,
        pressure_floor=True,
    )
    scene = calibrate(
        Scene(
            params=p,
            lo=(0.0, 0.0),
            hi=(220.0, 500.0),
            blocks=(Block(lo=(20.0, 20.0), hi=(200.0, 240.0)),),
            seed=6,
        )
    )
    state = init(scene)
    adv = make_advance(scene, "grid", steps_per_dispatch=1000)
    for _ in range(12):
        state = adv(state)
    act = np.asarray(state.active)
    y = np.asarray(state.x)[act][:, 1]
    rho = np.asarray(state.rho)[act]
    h = scene.params.h
    sel = (y > y.min() + 2 * h) & (y < y.max() - 2 * h)
    y, rho = y[sel], rho[sel]
    corr = np.corrcoef(y, rho)[0, 1]
    assert corr < -0.3, f"no hydrostatic stratification (corr={corr:.2f})"
    slope = np.polyfit(y, rho, 1)[0]
    expected_slope = -rho.mean() * 200.0 / scene.params.stiffness
    assert 0.5 < slope / expected_slope < 8.0, (slope, expected_slope)


def test_mass_conserved():
    scene = small_scene(dim=2)
    state = init(scene)
    n0 = int(state.n_active())
    adv = make_advance(scene, "naive", steps_per_dispatch=50)
    state = adv(state)
    assert int(state.n_active()) == n0
