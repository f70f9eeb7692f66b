"""Seeded fuzz: random scenes through all three neighbor paths — the paths
must agree with each other and stay finite (robustness net over the whole
config space, SURVEY.md §4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sph_tpu import neighbors, pallas_step, physics
from sph_tpu.params import Block, Scene, SimParams, calibrate
from sph_tpu.state import init
from sph_tpu.step import make_step, prime


def _random_scene(rng):
    dim = int(rng.choice([2, 3]))
    h = float(rng.uniform(8.0, 24.0))
    extent = float(rng.uniform(8, 20)) * h
    lo = tuple(0.0 for _ in range(dim))
    hi = tuple(extent for _ in range(dim))
    b_lo = tuple(float(rng.uniform(h + 4, extent * 0.4)) for _ in range(dim))
    b_hi = tuple(
        float(min(b + rng.uniform(2 * h, extent * 0.5), extent - h - 4))
        for b in b_lo
    )
    p = SimParams(
        dim=dim,
        h=h,
        gravity=tuple([0.0] * (dim - 1) + [-float(rng.uniform(5, 400))]),
        dt=float(rng.uniform(1e-4, 6e-4)),
        viscosity=float(rng.uniform(50, 500)),
        eos=str(rng.choice(["ideal", "tait"])),
        integrator=str(rng.choice(["euler", "leapfrog"])),
        kernel_norm=str(rng.choice(["proper", "legacy3d"])),
        boundary_mode=str(rng.choice(["clamp", "penalty"])),
        wall_eps=h,
    )
    return calibrate(
        Scene(
            params=p,
            lo=lo,
            hi=hi,
            blocks=(Block(lo=b_lo, hi=b_hi),),
            seed=int(rng.integers(0, 1 << 16)),
        )
    )


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_random_scene_paths_agree_and_stay_finite(seed):
    rng = np.random.default_rng(seed)
    scene = _random_scene(rng)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = prime(scene, state, method="grid")

    grid = neighbors.GridSpec.for_scene(scene)
    x, v, act = state.x, state.v, state.active
    rho_n = physics.density_naive(x, act, scene.params)
    rho_g, p_g, f_g = neighbors.grid_rho_p_f(x, v, act, scene.params, grid)
    rho_p, p_p, f_p = pallas_step.pallas_rho_p_f(x, v, act, scene.params, grid)

    rho_n, rho_g, rho_p = map(np.asarray, (rho_n, rho_g, rho_p))
    assert np.allclose(rho_g, rho_n, rtol=1e-5), scene.params
    assert np.allclose(rho_p, rho_g, rtol=1e-5), scene.params
    fs = np.max(np.abs(np.asarray(f_g))) + 1e-9
    assert np.max(np.abs(np.asarray(f_p) - np.asarray(f_g))) / fs < 1e-4

    # a short trajectory stays finite on the grid path
    step = make_step(scene, "grid")
    for _ in range(20):
        state = step(state)
    assert np.all(np.isfinite(np.asarray(state.x)))
    assert np.all(np.isfinite(np.asarray(state.v)))


@pytest.mark.parametrize("seed", [515, 616])
def test_random_scene_resident_matches_classic_reuse(seed):
    """Fuzz the fast path: slot-resident block integration must stay
    bitwise-equal (x, rho; v to ulp) to the classic sort_every path on
    random scenes, with zero skin/cap violations."""
    from sph_tpu.step import make_advance

    rng = np.random.default_rng(seed)
    scene = _random_scene(rng)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = prime(scene, state, method="pallas")
    kw = dict(steps_per_dispatch=8, sort_every=4)
    s_a, viol_a = make_advance(scene, "pallas", **kw)(state)
    s_b, viol_b = make_advance(
        scene, "pallas", slot_resident=True, **kw
    )(state)
    assert int(viol_a) == 0 and int(viol_b) == 0, scene.params
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.rho), np.asarray(s_b.rho))
    assert np.allclose(
        np.asarray(s_a.v), np.asarray(s_b.v), rtol=1e-5, atol=1e-5
    )
    assert np.all(np.isfinite(np.asarray(s_b.x)))
