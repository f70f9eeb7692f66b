"""Grid == naive exactness (SURVEY.md §4.4).

Compact support makes grid search exact: identical neighbor *sets* (integer
test, exact) and density/forces matching the naive path to fp-reduction
tolerance, across edge cases — empty cells, overfull cells, particles on
cell borders, everything in one cell, out-of-domain stragglers.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import random_cloud, small_scene

from sph_tpu import neighbors, physics
from sph_tpu.params import Block, Scene, SimParams, calibrate
from sph_tpu.state import init
from sph_tpu.step import make_advance, make_step


def _grid_for(scene, **kw):
    return neighbors.GridSpec.for_scene(scene, **kw)


def _neighbor_sets_naive(x, active, h):
    d = x[:, None, :] - x[None, :, :]
    r2 = np.sum(d * d, axis=-1)
    return (r2 < h * h) & active[None, :] & active[:, None]


def _neighbor_sets_grid(x, active, grid):
    """Dense [N, N] adjacency recovered from the candidate tiles."""
    n = x.shape[0]
    ci, flat = neighbors.cell_index(jnp.asarray(x), jnp.asarray(active), grid)
    tile, _, _, _ = neighbors.build_tiles(flat, grid)
    rows = neighbors._neighbor_rows(ci, grid)
    idx = np.asarray(tile[rows].reshape(n, -1))  # [N, K]
    xj = np.concatenate([x, np.full((1, x.shape[1]), 1e18, np.float32)])[idx]
    r2 = np.sum((x[:, None, :] - xj) ** 2, axis=-1)
    within = (idx < n) & (r2 < grid.cell * grid.cell)
    adj = np.zeros((n, n), bool)
    ii = np.repeat(np.arange(n), idx.shape[1])
    jj = idx.ravel()
    keep = within.ravel()
    adj[ii[keep], jj[keep]] = True
    return adj & active[:, None]


CASES = {
    "uniform": lambda n, d: random_cloud(n, d, 0.0, 200.0, seed=11),
    "clustered": lambda n, d: (
        np.concatenate(
            [
                random_cloud(n // 2, d, 0.0, 30.0, seed=12)[0],
                random_cloud(n - n // 2, d, 150.0, 190.0, seed=13)[0],
            ]
        ),
        np.zeros((n, d), np.float32),
    ),
    # all particles inside ONE cell (h = 16)
    "one_cell": lambda n, d: random_cloud(n, d, 40.0, 55.0, seed=14),
    # exactly on cell borders (multiples of h)
    "borders": lambda n, d: (
        (np.round(random_cloud(n, d, 0.0, 200.0, seed=15)[0] / 16.0) * 16.0).astype(
            np.float32
        ),
        np.zeros((n, d), np.float32),
    ),
    # stragglers outside the domain (penalty overshoot)
    "outside": lambda n, d: (
        random_cloud(n, d, -40.0, 240.0, seed=16)[0],
        np.zeros((n, d), np.float32),
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize("dim", [2, 3])
def test_neighbor_sets_exact(case, dim):
    n = 200
    x, _ = CASES[case](n, dim)
    x = x[:, :dim].astype(np.float32)
    active = np.ones(n, bool)
    active[180:] = False
    p = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0,) * dim, hi=(200.0,) * dim)
    grid = _grid_for(scene, cap=max(256, n))  # cap >= n: no overflow anywhere
    got = _neighbor_sets_grid(x, active, grid)
    want = _neighbor_sets_naive(x, active, p.h)
    assert np.array_equal(got, want), f"{case}: neighbor sets differ"


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize("dim", [2, 3])
def test_grid_rho_f_match_naive(case, dim):
    n = 200
    x, v = CASES[case](n, dim)
    x = x[:, :dim].astype(np.float32)
    v = (v[:, :dim] if v.shape[1] >= dim else np.zeros_like(x)).astype(np.float32)
    rng = np.random.default_rng(17)
    v = rng.uniform(-5, 5, x.shape).astype(np.float32)
    active = np.ones(n, bool)
    active[180:] = False
    p = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0,) * dim, hi=(200.0,) * dim)
    grid = _grid_for(scene, cap=max(256, n), chunk=64)

    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)
    rho_g, p_g, f_g = neighbors.grid_rho_p_f(xa, va, aa, p, grid)
    rho_n = physics.density_naive(xa, aa, p)
    p_n = physics.eos_pressure(rho_n, p)
    f_n = physics.forces_naive(xa, va, rho_n, p_n, aa, p)

    rho_g, f_g, rho_n, f_n = map(np.asarray, (rho_g, f_g, rho_n, f_n))
    assert np.allclose(rho_g, rho_n, rtol=3e-6, atol=1e-8), case
    scale = np.max(np.abs(f_n)) + 1e-6
    assert np.max(np.abs(f_g - f_n)) / scale < 3e-5, case


def test_overflow_detection():
    """cell_overflow reports positive when a cell exceeds cap."""
    p = SimParams(gravity=(0.0, 0.0))
    scene = Scene(params=p, lo=(0.0, 0.0), hi=(100.0, 100.0))
    grid = _grid_for(scene, cap=8)
    x = np.full((64, 2), 50.0, np.float32)  # 64 particles in one cell
    active = np.ones(64, bool)
    over = int(neighbors.cell_overflow(jnp.asarray(x), jnp.asarray(active), grid))
    assert over == 64 - 8


def test_grid_step_trajectory_matches_naive():
    """Full dam-break trajectories, grid vs naive step, stay locked."""
    scene = small_scene(dim=2, seed=20)
    state_n = init(scene)
    state_g = init(scene)
    adv_n = make_advance(scene, "naive", steps_per_dispatch=50)
    adv_g = make_advance(scene, "grid", steps_per_dispatch=50)
    for k in range(4):  # 200 steps
        state_n = adv_n(state_n)
        state_g = adv_g(state_g)
        xn, xg = np.asarray(state_n.x), np.asarray(state_g.x)
        vn, vg = np.asarray(state_n.v), np.asarray(state_g.v)
        ps = np.max(np.abs(xn)) + 1e-6
        vs = np.max(np.abs(vn)) + 1e-3
        assert np.max(np.abs(xn - xg)) / ps < 1e-4, f"dispatch {k}"
        assert np.max(np.abs(vn - vg)) / vs < 1e-3, f"dispatch {k}"


def test_grid_overflow_drop_is_graceful():
    """With a tiny cap the step still runs and stays finite (documented
    degradation: dropped candidates, not corruption)."""
    scene = small_scene(dim=2, seed=21)
    from sph_tpu import step as step_mod

    grid = neighbors.GridSpec.for_scene(scene, cap=8, chunk=64)
    state = init(scene)
    x, v, a = state.x, state.v, state.active
    rho, p, f = neighbors.grid_rho_p_f(x, v, a, scene.params, grid)
    assert np.all(np.isfinite(np.asarray(rho)))
    assert np.all(np.isfinite(np.asarray(f)))
