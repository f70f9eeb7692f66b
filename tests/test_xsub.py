"""x-cell subdivision (GridSpec.xsub) — the round-2 cap²-padding fix.

xsub splits each lane-axis cell into `xsub` slot-cells of cap/xsub, so the
candidate window's dead margin shrinks from one cap-wide cell per side to
cap/xsub lanes per side.  The margin stays exactly one FULL cell wide
(xsub slots), so the compact-support / Verlet-skin guarantee is unchanged
— results must match the xsub=1 path to reduction-order tolerance and the
grid oracle exactly as before (SURVEY.md §4.5).

Runs in Pallas interpreter mode on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import random_cloud, small_scene

from sph_tpu import neighbors, pallas_step
from sph_tpu.params import Scene, SimParams
from sph_tpu.state import init
from sph_tpu.step import make_advance, prime


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("xsub", [2, 4])
def test_xsub_matches_grid(dim, xsub):
    n = 200
    x = random_cloud(n, dim, 0.0, 120.0, seed=51)[0][:, :dim].astype(
        np.float32
    )
    rng = np.random.default_rng(52)
    v = rng.uniform(-5, 5, (n, dim)).astype(np.float32)
    active = np.ones(n, bool)
    active[180:] = False
    p = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0,) * dim, hi=(120.0,) * dim)
    grid = neighbors.GridSpec.for_scene(scene, cap=64, xsub=xsub)

    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)
    rho_g, _, f_g = neighbors.grid_rho_p_f(xa, va, aa, p, grid)
    rho_p, _, f_p = pallas_step.pallas_rho_p_f(xa, va, aa, p, grid)
    rho_g, f_g, rho_p, f_p = map(np.asarray, (rho_g, f_g, rho_p, f_p))

    assert np.allclose(rho_p, rho_g, rtol=1e-5, atol=1e-6)
    scale = np.max(np.abs(f_g)) + 1e-9
    assert np.max(np.abs(f_p - f_g)) / scale < 3e-5


def test_xsub_resident_bitwise_vs_classic_reuse():
    """Slot-resident == classic sort_every under xsub (3D leapfrog WCSPH,
    the flagship physics): x, rho bitwise; v to 1-2 ulp (fma variance, as
    in test_slot_resident_bitwise_leapfrog_3d)."""
    scene = small_scene(
        dim=3, eos="tait", integrator="leapfrog",
        boundary_mode="penalty", dt=4e-4, seed=79,
    )
    state = prime(scene, init(scene), method="pallas")
    kw = dict(steps_per_dispatch=8, sort_every=4, xsub=2)
    s_a, viol_a = make_advance(scene, "pallas", **kw)(state)
    s_b, viol_b = make_advance(
        scene, "pallas", slot_resident=True, **kw
    )(state)
    assert int(viol_a) == 0 and int(viol_b) == 0
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.rho), np.asarray(s_b.rho))
    assert np.allclose(
        np.asarray(s_a.v), np.asarray(s_b.v), rtol=1e-5, atol=1e-5
    )


def test_xsub_slot_cap_overflow_reported():
    """Sub-cell cap = cap/xsub: a cluster overfilling one slot-cell must
    show up in the overflow audit (the lopsided-cell hazard xsub adds)."""
    p = SimParams(dim=2, gravity=(0.0, 0.0))
    scene = Scene(params=p, lo=(0.0, 0.0), hi=(120.0, 120.0))
    grid = neighbors.GridSpec.for_scene(scene, cap=8, xsub=2)  # slot cap 4
    sg = pallas_step.slot_grid(grid)
    # 6 particles inside ONE slot-cell (sub-cell width = cell/2)
    x = jnp.asarray(
        [[33.0 + 0.1 * i, 40.0] for i in range(6)], jnp.float32
    )
    active = jnp.ones(6, bool)
    cell_over, row_over = pallas_step.slot_overflow(x, active, grid, sg)
    assert int(cell_over) + int(row_over) == 2  # 6 into a 4-slot sub-cell
    addr = pallas_step.build_addr(x, active, grid, sg)
    assert int(addr.overflow) == 2
