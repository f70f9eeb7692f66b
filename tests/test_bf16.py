"""precision="bf16" mode: bf16 CELL-RELATIVE candidate features, fp32
accumulation (SURVEY.md §2.1 numerical-fidelity notes; arXiv 2401.08586
pattern; VERDICT.md round-1 item 3).

Tolerances are DELIBERATELY loose and documented: bf16 has an 8-bit
mantissa, so cell-relative positions carry ~0.4% of a cell (~0.07 px at
h=16) of rounding — densities land within ~1% and pairwise forces within
a few % of the fp32 path.  That is a physics-accuracy trade the mode's
docstring owns; fp32 stays the default and the oracle chain stays fp32.

Runs in Pallas interpreter mode on CPU like the rest of the §4.5 suite.
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
def test_bf16_matches_fp32_loose(dim):
    """Classic pallas path, bf16 vs fp32: rho within ~1%, forces within a
    few % of the fp32 force scale."""
    n = 200
    x = random_cloud(n, dim, 0.0, 120.0, seed=41)[0][:, :dim].astype(
        np.float32
    )
    rng = np.random.default_rng(42)
    v = rng.uniform(-5, 5, (n, dim)).astype(np.float32)
    active = np.ones(n, bool)
    active[180:] = False
    p32 = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    pbf = p32.replace(precision="bf16")
    scene = Scene(params=p32, lo=(0.0,) * dim, hi=(120.0,) * dim)
    grid = neighbors.GridSpec.for_scene(scene, cap=64)

    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)
    rho_a, _, f_a = pallas_step.pallas_rho_p_f(xa, va, aa, p32, grid)
    rho_b, _, f_b = pallas_step.pallas_rho_p_f(xa, va, aa, pbf, grid)
    rho_a, f_a, rho_b, f_b = map(np.asarray, (rho_a, f_a, rho_b, f_b))

    assert np.isfinite(rho_b).all() and np.isfinite(f_b).all()
    assert np.allclose(rho_b, rho_a, rtol=2e-2), np.max(
        np.abs(rho_b / rho_a - 1)
    )
    scale = np.max(np.abs(f_a)) + 1e-9
    assert np.max(np.abs(f_b - f_a)) / scale < 6e-2


def test_bf16_self_pair_exact():
    """A particle's self-pair distance is exactly 0 in bf16 (the same
    stored value is read on both sides), so an isolated particle's density
    equals the fp32 self-contribution exactly."""
    p32 = SimParams(dim=2, gravity=(0.0, 0.0), kernel_norm="proper")
    pbf = p32.replace(precision="bf16")
    scene = Scene(params=p32, lo=(0.0, 0.0), hi=(120.0, 120.0))
    grid = neighbors.GridSpec.for_scene(scene, cap=8)
    # one particle per far-apart cell, deliberately OFF-center so the
    # relative coordinate is nonzero and actually rounds in bf16
    x = jnp.asarray([[7.3, 9.1], [100.2, 101.7]], jnp.float32)
    v = jnp.zeros_like(x)
    a = jnp.ones(2, bool)
    rho32, _, _ = pallas_step.pallas_rho_p_f(x, v, a, p32, grid)
    rhobf, _, _ = pallas_step.pallas_rho_p_f(x, v, a, pbf, grid)
    assert np.array_equal(np.asarray(rho32), np.asarray(rhobf))


@pytest.mark.parametrize("dim", [2, 3])
def test_bf16_resident_bitwise_vs_classic_reuse(dim):
    """bf16 slot-resident == bf16 classic sort_every path BITWISE while no
    cap overflows: both subtract the same build-time cell centers before
    the bf16 round, and integration is elementwise either way."""
    if dim == 2:
        scene = small_scene(dim=2, seed=76, precision="bf16")
        state = init(scene)
    else:
        scene = small_scene(
            dim=3, eos="tait", integrator="leapfrog",
            boundary_mode="penalty", dt=4e-4, seed=77, precision="bf16",
        )
        state = prime(scene, init(scene), method="pallas")
    kw = dict(steps_per_dispatch=8, sort_every=4)
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


def test_bf16_trajectory_tracks_fp32():
    """A short 2D dam-break trajectory in bf16 stays finite and within a
    loose envelope of the fp32 trajectory (divergence is expected — this
    guards against gross frame/offset bugs, where positions would be off
    by whole cells immediately)."""
    scene32 = small_scene(dim=2, seed=78)
    scenebf = scene32.replace(params=scene32.params.replace(precision="bf16"))
    state = init(scene32)
    kw = dict(steps_per_dispatch=12, sort_every=4, slot_resident=True)
    s32, v32 = make_advance(scene32, "pallas", **kw)(state)
    sbf, vbf = make_advance(scenebf, "pallas", **kw)(state)
    assert int(v32) == 0 and int(vbf) == 0
    x32, xbf = np.asarray(s32.x), np.asarray(sbf.x)
    assert np.isfinite(xbf).all()
    # after 12 steps at dt=7e-4 nothing should have drifted even a
    # fraction of a cell apart between the two precisions
    assert np.max(np.abs(xbf - x32)) < 1.0
