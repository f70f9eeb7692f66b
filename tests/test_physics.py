"""Unit tests — EOS, integrator, boundary (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np

from sph_tpu import physics
from sph_tpu.params import Block, Scene, SimParams
from sph_tpu.state import init
from sph_tpu.step import make_step


def test_eos_zero_at_rest_density():
    for eos in ("ideal", "tait"):
        p = SimParams(eos=eos)
        rho0 = jnp.asarray([p.rest_density], jnp.float32)
        assert abs(float(physics.eos_pressure(rho0, p)[0])) < 1e-3


def test_tait_monotone():
    p = SimParams(eos="tait")
    rho = jnp.linspace(0.5 * p.rest_density, 2.0 * p.rest_density, 64)
    pr = np.asarray(physics.eos_pressure(rho, p))
    assert np.all(np.diff(pr) > 0)


def test_pressure_floor():
    p = SimParams(pressure_floor=True)
    rho = jnp.asarray([0.5 * p.rest_density], jnp.float32)
    assert float(physics.eos_pressure(rho, p)[0]) == 0.0


def test_single_particle_free_fall():
    """One isolated particle matches the closed form under gravity.

    Semi-implicit Euler: v_k = k g dt, x_k = x_0 + dt² g k(k+1)/2.
    """
    p = SimParams(boundary_mode="penalty", dt=1e-3, gravity=(0.0, -10.0))
    scene = Scene(
        params=p,
        lo=(-1e5, -1e5),
        hi=(1e5, 1e5),
        blocks=(Block(lo=(0.0, 0.0), hi=(1.0, 1.0)),),
        spacing=10.0,  # bigger than the block: exactly one lattice point
        jitter=0.0,
    )
    state = init(scene)
    assert int(state.n_active()) == 1
    x0 = np.asarray(state.x[0]).copy()
    step = make_step(scene, "naive")
    k = 50
    for _ in range(k):
        state = step(state)
    dt, g = p.dt, -10.0
    v_expected = k * g * dt
    x_expected = x0[1] + dt * dt * g * k * (k + 1) / 2
    assert abs(float(state.v[0, 1]) - v_expected) < 1e-4
    assert abs(float(state.x[0, 1]) - x_expected) < 1e-4
    assert abs(float(state.v[0, 0])) < 1e-6  # no lateral drift


def test_leapfrog_free_fall():
    """Leapfrog KDK free fall: exact for constant acceleration.
    v_k = k g dt; x_k = x_0 + g dt² k²/2."""
    p = SimParams(
        boundary_mode="penalty", integrator="leapfrog", dt=1e-3, gravity=(0.0, -10.0)
    )
    scene = Scene(
        params=p,
        lo=(-1e5, -1e5),
        hi=(1e5, 1e5),
        blocks=(Block(lo=(0.0, 0.0), hi=(1.0, 1.0)),),
        spacing=10.0,
        jitter=0.0,
    )
    from sph_tpu.step import prime

    state = prime(scene, init(scene))
    x0 = np.asarray(state.x[0]).copy()
    step = make_step(scene, "naive")
    k = 50
    for _ in range(k):
        state = step(state)
    dt, g = p.dt, -10.0
    assert abs(float(state.v[0, 1]) - k * g * dt) < 1e-4
    assert abs(float(state.x[0, 1]) - (x0[1] + 0.5 * g * (k * dt) ** 2)) < 1e-4


def test_wall_penalty_pushes_inward_only():
    p = SimParams(boundary_mode="penalty")
    lo, hi = (0.0, 0.0), (100.0, 100.0)
    # particle penetrating the min-x wall (inset at wall_eps=16)
    x = jnp.asarray([[10.0, 50.0]], jnp.float32)
    v = jnp.zeros((1, 2), jnp.float32)
    f = np.asarray(physics.wall_penalty_force(x, v, lo, hi, p))
    assert f[0, 0] > 0 and f[0, 1] == 0
    # penetrating max-y wall
    x = jnp.asarray([[50.0, 95.0]], jnp.float32)
    f = np.asarray(physics.wall_penalty_force(x, v, lo, hi, p))
    assert f[0, 1] < 0 and f[0, 0] == 0
    # interior particle: no force
    x = jnp.asarray([[50.0, 50.0]], jnp.float32)
    f = np.asarray(physics.wall_penalty_force(x, v, lo, hi, p))
    assert np.all(f == 0)


def test_clamp_boundary_reflects_and_damps():
    p = SimParams(boundary_mode="clamp", boundary_damping=-0.5)
    lo, hi = (0.0, 0.0), (100.0, 100.0)
    x = jnp.asarray([[5.0, 50.0]], jnp.float32)   # past lo+eps=16
    v = jnp.asarray([[-4.0, 2.0]], jnp.float32)
    xc, vc = physics.clamp_boundary(x, v, lo, hi, p)
    assert float(xc[0, 0]) == 16.0
    assert float(vc[0, 0]) == 2.0     # -4 * -0.5
    assert float(vc[0, 1]) == 2.0     # tangential untouched
    assert float(xc[0, 1]) == 50.0


def test_density_self_contribution():
    """A lone particle's density is m·W(0) > 0 (self-term included)."""
    from sph_tpu.kernels import kernel_constants, poly6

    p = SimParams()
    x = jnp.zeros((1, 2), jnp.float32)
    active = jnp.ones((1,), bool)
    rho = physics.density_naive(x, active, p)
    cp, _, _ = kernel_constants(p.dim, p.h, p.kernel_norm)
    expected = p.mass * float(poly6(jnp.float32(0.0), p.h, cp))
    assert abs(float(rho[0]) - expected) < 1e-6 * expected
