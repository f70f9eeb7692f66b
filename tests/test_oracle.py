"""Production naive path vs frozen NumPy oracle (SURVEY.md §4.3).

XLA fusion changes rounding, so the comparison is tight-tolerance, not
bitwise: ~1e-6 relative on density, ~1e-4 on forces (cancellation-heavy).
"""

import numpy as np
import pytest

import oracle_numpy as oracle
from helpers import pdict, random_cloud, small_scene

from sph_tpu import physics
from sph_tpu.params import SimParams
from sph_tpu.state import init
from sph_tpu.step import make_step, prime

import jax.numpy as jnp


def _rel(a, b, floor=1e-6):
    return np.max(np.abs(a - b) / (np.maximum(np.abs(b), floor) + floor))


@pytest.mark.parametrize(
    "dim,kernel_norm,eos",
    [(2, "legacy3d", "ideal"), (2, "proper", "ideal"), (3, "proper", "tait")],
)
def test_density_pressure_vs_oracle(dim, kernel_norm, eos):
    p = SimParams(
        dim=dim,
        kernel_norm=kernel_norm,
        eos=eos,
        gravity=(0.0, -9.81) if dim == 2 else (0.0, -9.81, 0.0),
    )
    x, v = random_cloud(300, dim, 0.0, 100.0, seed=1)
    active = np.ones(300, bool)
    active[250:] = False  # some inactive slots in the mix
    rho = np.asarray(physics.density_naive(jnp.asarray(x), jnp.asarray(active), p))
    rho_o = oracle.density(x, active, pdict(p))
    assert _rel(rho[active], rho_o[active]) < 1e-5

    pr = np.asarray(physics.eos_pressure(jnp.asarray(rho_o), p))
    pr_o = oracle.eos(rho_o, pdict(p))
    assert np.allclose(pr, pr_o, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("dim", [2, 3])
def test_forces_vs_oracle(dim):
    p = SimParams(
        dim=dim,
        kernel_norm="proper",
        gravity=(0.0, -9.81) if dim == 2 else (0.0, -9.81, 0.0),
    )
    # Dense cloud so there are real neighbors: ~2 h spacing box
    x, v = random_cloud(256, dim, 0.0, 80.0, seed=2)
    active = np.ones(256, bool)
    pd = pdict(p)
    rho_o = oracle.density(x, active, pd)
    pr_o = oracle.eos(rho_o, pd)
    f = np.asarray(
        physics.forces_naive(
            jnp.asarray(x),
            jnp.asarray(v),
            jnp.asarray(rho_o),
            jnp.asarray(pr_o),
            jnp.asarray(active),
            p,
        )
    )
    f_o = oracle.forces(x, v, rho_o, pr_o, active, pd)
    scale = np.max(np.abs(f_o)) + 1e-6
    assert np.max(np.abs(f - f_o)) / scale < 1e-4


@pytest.mark.parametrize(
    "dim,integrator,boundary_mode",
    [
        (2, "euler", "clamp"),
        (2, "euler", "penalty"),
        (2, "leapfrog", "penalty"),
        (3, "leapfrog", "penalty"),
    ],
)
def test_full_step_trajectory_vs_oracle(dim, integrator, boundary_mode):
    """20 full steps of a tutorial-style scene track the frozen oracle."""
    scene = small_scene(
        dim=dim, integrator=integrator, boundary_mode=boundary_mode, seed=3
    )
    state = init(scene)
    if integrator == "leapfrog":
        state = prime(scene, state)
    n = state.capacity
    x = np.asarray(state.x)
    v = np.asarray(state.v)
    acc = np.asarray(state.acc)
    active = np.asarray(state.active)
    kind = np.asarray(state.kind)
    pd = pdict(scene.params)

    step = make_step(scene, "naive")
    for k in range(20):
        state = step(state)
        x, v, acc, rho_o, pr_o = oracle.step(
            x, v, acc, active, kind, scene.lo, scene.hi, pd
        )
        xs = np.asarray(state.x)[active]
        vs = np.asarray(state.v)[active]
        pos_scale = np.max(np.abs(x[active])) + 1e-6
        vel_scale = np.max(np.abs(v[active])) + 1e-3
        assert np.max(np.abs(xs - x[active])) / pos_scale < 5e-4, f"step {k}"
        assert np.max(np.abs(vs - v[active])) / vel_scale < 5e-3, f"step {k}"
        # keep trajectories locked together to stop error compounding:
        x[active] = xs
        v[active] = vs
        acc[active] = np.asarray(state.acc)[active]
