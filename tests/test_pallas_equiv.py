"""Pallas fused kernel == XLA grid path (SURVEY.md §4.5).

Runs in interpreter mode on CPU — same kernel logic as the TPU build.
Comparison is tight-tolerance (reduction orders differ), across the edge
cases of §4.5: empty cells, overfull cells (cap overflow parity), border
particles, everything in one cell, inactive particles mixed in.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import random_cloud, small_scene

from sph_tpu import neighbors, pallas_step
from sph_tpu.params import Scene, SimParams
from sph_tpu.state import init
from sph_tpu.step import make_advance


CASES = {
    "uniform": lambda n, d: random_cloud(n, d, 0.0, 120.0, seed=31)[0],
    "one_cell": lambda n, d: random_cloud(n, d, 40.0, 55.0, seed=32)[0],
    "borders": lambda n, d: (
        np.round(random_cloud(n, d, 0.0, 120.0, seed=33)[0] / 16.0) * 16.0
    ).astype(np.float32),
    "outside": lambda n, d: random_cloud(n, d, -30.0, 150.0, seed=34)[0],
}


FTOL = 3e-5  # relative force tolerance (reduction orders differ)


@pytest.mark.parametrize("case", sorted(CASES))
@pytest.mark.parametrize("dim", [2, 3])
def test_pallas_matches_grid(case, dim):
    n = 200
    x = CASES[case](n, dim)[:, :dim].astype(np.float32)
    rng = np.random.default_rng(35)
    v = rng.uniform(-5, 5, (n, dim)).astype(np.float32)
    active = np.ones(n, bool)
    active[180:] = False
    p = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0,) * dim, hi=(120.0,) * dim)
    # cap=64 keeps even the one-cell case overflow-free (64 | 128 fails —
    # pallas needs cap | 128, so 64 is fine)
    grid = neighbors.GridSpec.for_scene(scene, cap=64)

    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)
    rho_g, p_g, f_g = neighbors.grid_rho_p_f(xa, va, aa, p, grid)
    rho_p, p_p, f_p = pallas_step.pallas_rho_p_f(xa, va, aa, p, grid)
    rho_g, f_g, rho_p, f_p = map(np.asarray, (rho_g, f_g, rho_p, f_p))

    assert np.allclose(rho_p, rho_g, rtol=1e-5, atol=1e-6), case
    scale = np.max(np.abs(f_g)) + 1e-9
    assert np.max(np.abs(f_p - f_g)) / scale < FTOL, case


def test_pallas_overflow_parity_with_grid():
    """With a tiny cap both paths drop the same overflow particles (same
    stable rank rule), so they still agree with each other."""
    n, dim = 128, 2
    x = random_cloud(n, dim, 40.0, 60.0, seed=36)[0].astype(np.float32)
    v = np.zeros((n, dim), np.float32)
    active = np.ones(n, bool)
    p = SimParams(dim=dim, gravity=(0.0, 0.0), kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0, 0.0), hi=(120.0, 120.0))
    grid = neighbors.GridSpec.for_scene(scene, cap=8)

    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)
    rho_g, _, f_g = neighbors.grid_rho_p_f(xa, va, aa, p, grid)
    rho_p, _, f_p = pallas_step.pallas_rho_p_f(xa, va, aa, p, grid)
    # overflowed particles: grid path computes their rho from the (dropped)
    # tiles they can still SEE; pallas assigns rest density.  Compare only
    # the in-tile particles — and check the overflow counter fires.
    sg = pallas_step.slot_grid(grid)
    cell_over, _ = pallas_step.slot_overflow(xa, aa, grid, sg)
    assert int(cell_over) > 0
    addr = pallas_step.build_addr(xa, aa, grid, sg)
    ok = np.asarray(addr.valid)
    assert np.allclose(
        np.asarray(rho_p)[ok], np.asarray(rho_g)[ok], rtol=3e-6
    )


def test_pallas_step_trajectory_matches_grid():
    """Full dam-break trajectories, pallas vs grid step, stay locked."""
    scene = small_scene(dim=2, seed=37)
    state_g = init(scene)
    state_p = init(scene)
    adv_g = make_advance(scene, "grid", steps_per_dispatch=25)
    adv_p = make_advance(scene, "pallas", steps_per_dispatch=25)
    for k in range(3):  # 75 steps
        state_g = adv_g(state_g)
        state_p = adv_p(state_p)
        xg, xp = np.asarray(state_g.x), np.asarray(state_p.x)
        vg, vp = np.asarray(state_g.v), np.asarray(state_p.v)
        ps = np.max(np.abs(xg)) + 1e-6
        vs = np.max(np.abs(vg)) + 1e-3
        assert np.max(np.abs(xg - xp)) / ps < 1e-4, f"dispatch {k}"
        assert np.max(np.abs(vg - vp)) / vs < 1e-3, f"dispatch {k}"


def test_pallas_3d_wcsph_leapfrog_trajectory():
    """BASELINE config-3 physics (3D, Tait, leapfrog, penalty walls):
    pallas vs grid trajectories stay locked."""
    from sph_tpu.step import prime

    scene = small_scene(
        dim=3,
        eos="tait",
        integrator="leapfrog",
        boundary_mode="penalty",
        dt=4e-4,
        seed=39,
    )
    sg = init(scene)
    sg = prime(scene, sg, method="grid")
    sp = init(scene)
    sp = prime(scene, sp, method="pallas")
    adv_g = make_advance(scene, "grid", steps_per_dispatch=20)
    adv_p = make_advance(scene, "pallas", steps_per_dispatch=20)
    for k in range(2):
        sg = adv_g(sg)
        sp = adv_p(sp)
        xg, xp = np.asarray(sg.x), np.asarray(sp.x)
        ps = np.max(np.abs(xg)) + 1e-6
        assert np.max(np.abs(xg - xp)) / ps < 1e-4, f"dispatch {k}"


def test_row_compaction_cap():
    """c_rows smaller than occupied rows: overflow reported, no NaNs."""
    n, dim = 256, 2
    x = random_cloud(n, dim, 0.0, 120.0, seed=38)[0].astype(np.float32)
    v = np.zeros((n, dim), np.float32)
    active = np.ones(n, bool)
    p = SimParams(dim=dim, gravity=(0.0, 0.0), kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0, 0.0), hi=(120.0, 120.0))
    grid = neighbors.GridSpec.for_scene(scene)
    sg = pallas_step.slot_grid(grid, c_rows=2)
    xa, aa = jnp.asarray(x), jnp.asarray(active)
    _, row_over = pallas_step.slot_overflow(xa, aa, grid, sg)
    assert int(row_over) > 0
    rho, pp, f = pallas_step.pallas_rho_p_f(
        xa, jnp.asarray(v), aa, p, grid, c_rows=2
    )
    assert np.all(np.isfinite(np.asarray(rho)))
    assert np.all(np.isfinite(np.asarray(f)))


def test_row_overflow_zero_pair_force_fallback():
    """Neighbor rows dropped by c_rows overflow contribute ZERO pair force —
    not garbage.  Regression (ADVICE r1): the force kernel used to pair the
    dropped rows' REAL positions with an unrelated row's rho/p strip, where
    empty lanes gave rho=0 → 1/rho=1e12 → astronomic forces on NON-dropped
    particles."""
    n, dim = 256, 2
    x = random_cloud(n, dim, 0.0, 120.0, seed=42)[0].astype(np.float32)
    rng = np.random.default_rng(43)
    v = rng.uniform(-5, 5, (n, dim)).astype(np.float32)
    active = np.ones(n, bool)
    p = SimParams(dim=dim, gravity=(0.0, 0.0), kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0, 0.0), hi=(120.0, 120.0))
    grid = neighbors.GridSpec.for_scene(scene)
    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)

    _, _, f_full = pallas_step.pallas_rho_p_f(xa, va, aa, p, grid)
    sg = pallas_step.slot_grid(grid, c_rows=2)
    _, row_over = pallas_step.slot_overflow(xa, aa, grid, sg)
    assert int(row_over) > 0
    _, _, f_over = pallas_step.pallas_rho_p_f(xa, va, aa, p, grid, c_rows=2)

    scale = np.max(np.abs(np.asarray(f_full))) + 1e-9
    # dropping contributions can shift force balance a bit, but never by
    # orders of magnitude (the bug produced ~1e9× scale)
    assert np.max(np.abs(np.asarray(f_over))) < 10.0 * scale


# ---------------------------------------------------------------------------
# sort_every addr reuse (Verlet skin, SURVEY.md §7 hard-part 2)
# ---------------------------------------------------------------------------


def test_sort_every_matches_per_step_rebuild():
    """Reusing the slot addressing for sort_every steps (cells h+skin)
    tracks the per-step-rebuild trajectory tightly while drift stays under
    skin/2, conserves momentum exactly (stale slots keep pair antisymmetry),
    and reports zero skin violations."""
    from sph_tpu.step import default_skin

    scene = small_scene(dim=2, seed=70)
    state = init(scene)
    skin = default_skin(scene, 4)
    base = neighbors.GridSpec.for_scene(scene)
    grid = neighbors.GridSpec.for_scene(scene, cap=base.cap, skin=skin)

    adv_ref = make_advance(scene, "pallas", steps_per_dispatch=12, grid=grid)
    adv_reuse = make_advance(
        scene, "pallas", steps_per_dispatch=12, sort_every=4, skin=skin
    )
    ref = adv_ref(state)
    out, viol = adv_reuse(state)
    assert int(viol) == 0
    xr, xo = np.asarray(ref.x), np.asarray(out.x)
    act = np.asarray(ref.active)
    scale = np.max(np.abs(xr[act])) + 1e-6
    assert np.max(np.abs(xo[act] - xr[act])) / scale < 1e-5


def test_sort_every_reports_skin_violations():
    """A jet fast enough to leave its build cells inside the reuse window
    (with a skin too small to cover it) makes the reuse bound genuinely
    unsatisfiable — the advance must report it rather than silently
    compute wrong physics.  (A small skin ALONE no longer reports: the
    membership-relaxed audit recognizes that drifted particles still
    inside their build cells keep the pair physics exact — see
    test_membership_relaxed_audit_is_exact.)"""
    from sph_tpu.params import Block

    base = small_scene(dim=2, seed=71)
    jet = base.replace(
        blocks=(Block(lo=base.blocks[0].lo, hi=base.blocks[0].hi,
                      velocity=(2500.0, 0.0)),),
    )
    state = init(jet)
    _, viol = make_advance(
        jet, "pallas", steps_per_dispatch=12, sort_every=12, skin=1e-4
    )(state)
    assert int(viol) > 0


def test_membership_relaxed_audit_is_exact():
    """Drift past skin/2 with every particle still INSIDE its build cell:
    the relaxed audit reports zero violations AND the reused addressing
    really is exact — the trajectory matches the per-step-rebuild path to
    fp tolerance (the ±1-cell window captures every r < h pair as long as
    each endpoint is in its own bin OR within skin/2 of its build
    position; see step.py's membership-audit notes).  The strict audit
    (membership_audit=False) flags the same run, demonstrating the
    relaxation is the only difference."""
    scene = small_scene(dim=2, seed=71)
    state = init(scene)
    kw = dict(steps_per_dispatch=12, sort_every=12, skin=1e-4)
    out, viol = make_advance(scene, "pallas", **kw)(state)
    assert int(viol) == 0
    _, viol_strict = make_advance(
        scene, "pallas", membership_audit=False, **kw
    )(state)
    assert int(viol_strict) > 0  # drift alone trips the old audit
    ref = make_advance(scene, "pallas", steps_per_dispatch=12)(state)
    xr, xo = np.asarray(ref.x), np.asarray(out.x)
    act = np.asarray(ref.active)
    scale = np.max(np.abs(xr[act])) + 1e-6
    assert np.max(np.abs(xo[act] - xr[act])) / scale < 1e-5


def test_sort_every_conserves_momentum():
    """Pair antisymmetry survives stale addressing: total momentum of an
    unforced cloud stays at fp-noise level across a reuse window."""
    p = SimParams(gravity=(0.0, 0.0), boundary_mode="clamp", dt=5e-4)
    from sph_tpu.params import Block, calibrate

    scene = calibrate(
        Scene(
            params=p,
            lo=(0.0, 0.0),
            hi=(400.0, 400.0),
            blocks=(Block(lo=(140.0, 140.0), hi=(260.0, 260.0)),),
            seed=72,
        )
    )
    state = init(scene)
    out, viol = make_advance(
        scene, "pallas", steps_per_dispatch=12, sort_every=4
    )(state)
    assert int(viol) == 0
    mom = np.asarray(jnp.sum(out.v * out.active[:, None], axis=0))
    # force-density scale ~ stiffness; fp32 noise bound, matched to
    # test_invariants.py's momentum tolerance style
    vmax = np.max(np.abs(np.asarray(out.v)))
    assert np.all(np.abs(mom) < max(vmax, 1.0) * 1e-2)


def test_slot_resident_bitwise_euler():
    """Slot-resident block integration == non-resident sort_every path,
    BITWISE, while no static cap overflows: integration is elementwise
    (layout-independent) and the kernels see identical inputs."""
    scene = small_scene(dim=2, seed=73)
    state = init(scene)
    kw = dict(steps_per_dispatch=12, sort_every=4)
    s_a, viol_a = make_advance(scene, "pallas", **kw)(state)
    s_b, viol_b = make_advance(
        scene, "pallas", slot_resident=True, **kw
    )(state)
    assert int(viol_a) == 0 and int(viol_b) == 0
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.v), np.asarray(s_b.v))
    assert np.array_equal(np.asarray(s_a.rho), np.asarray(s_b.rho))
    assert np.array_equal(np.asarray(s_a.acc), np.asarray(s_b.acc))
    assert int(s_b.step) == 12


def test_slot_resident_bitwise_leapfrog_3d():
    """Same contract for the 3D WCSPH leapfrog + penalty-wall config
    (BASELINE config-3 physics) with static boundary particles: x, acc,
    rho bitwise; v to 1-2 ulp (XLA contracts the final half-kick's
    mul+add into an fma differently across the two program structures —
    the same variance the DP leapfrog test documents)."""
    from sph_tpu.step import prime

    scene = small_scene(
        dim=3, eos="tait", integrator="leapfrog",
        boundary_mode="penalty", dt=4e-4, seed=74,
    )
    state = prime(scene, init(scene), method="pallas")
    kw = dict(steps_per_dispatch=8, sort_every=4)
    s_a, viol_a = make_advance(scene, "pallas", **kw)(state)
    s_b, viol_b = make_advance(
        scene, "pallas", slot_resident=True, **kw
    )(state)
    assert int(viol_a) == 0 and int(viol_b) == 0
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.acc), np.asarray(s_b.acc))
    assert np.array_equal(np.asarray(s_a.rho), np.asarray(s_b.rho))
    assert np.allclose(
        np.asarray(s_a.v), np.asarray(s_b.v), rtol=1e-5, atol=1e-5
    )


def test_slot_resident_force_fields():
    """Scheduled force fields apply inside the slot-resident block (the
    slot-space body_forces mirrors physics.force_field_force bitwise)."""
    from sph_tpu.params import ForceField

    base = small_scene(dim=2, seed=75)
    scene = base.replace(
        force_fields=(
            ForceField(pos=(60.0, 60.0), strength=5e4, radius=80.0,
                       start_step=0, stop_step=8),
        )
    )
    state = init(scene)
    kw = dict(steps_per_dispatch=12, sort_every=4)
    s_a, _ = make_advance(scene, "pallas", **kw)(state)
    s_b, _ = make_advance(scene, "pallas", slot_resident=True, **kw)(state)
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    # and the field did something vs the plain scene
    s_c, _ = make_advance(base, "pallas", **kw)(state)
    assert not np.array_equal(np.asarray(s_a.x), np.asarray(s_c.x))


def test_sort_every_fallback_recovers_exactly(capsys):
    """When the skin audit fires mid-run, the audited advance re-runs the
    violating blocks on the per-step-rebuild path from their held input
    states (in-dispatch, lax.cond) — the result must equal the plain
    pallas path bitwise (fast when valid, exact when not)."""
    from sph_tpu.params import Block
    from sph_tpu.step import run

    base = small_scene(dim=2, seed=91)
    # a fast jet: |v| >> c0 makes the default skin provably insufficient,
    # so every reuse dispatch trips the drift audit
    fast = base.replace(
        blocks=(Block(lo=base.blocks[0].lo, hi=base.blocks[0].hi,
                      velocity=(2000.0, 0.0)),),
    )
    s_fast = run(fast, 8, method="pallas", steps_per_dispatch=8,
                 sort_every=4, slot_resident=True)
    err = capsys.readouterr().err
    assert "skin/cap violations" in err and "re-ran exactly" in err
    s_exact = run(fast, 8, method="pallas", steps_per_dispatch=8)
    assert np.array_equal(np.asarray(s_fast.x), np.asarray(s_exact.x))
    assert np.array_equal(np.asarray(s_fast.v), np.asarray(s_exact.v))


@pytest.mark.parametrize("dim", [2, 3])
def test_row_pair_bitwise(dim):
    """row_pair programs (2 compacted rows per kernel program) produce
    BITWISE the single-row results: identical pair blocks and accumulation
    order per row, only the program->row mapping changes."""
    n = 220
    x = random_cloud(n, dim, 0.0, 120.0, seed=41)[0][:, :dim].astype(
        np.float32
    )
    rng = np.random.default_rng(42)
    v = rng.uniform(-5, 5, (n, dim)).astype(np.float32)
    active = np.ones(n, bool)
    active[200:] = False
    p = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0,) * dim, hi=(120.0,) * dim)
    grid = neighbors.GridSpec.for_scene(scene, cap=16)
    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)
    rho_a, p_a, f_a = pallas_step.pallas_rho_p_f(xa, va, aa, p, grid)
    rho_b, p_b, f_b = pallas_step.pallas_rho_p_f(
        xa, va, aa, p, grid, row_pair=True
    )
    assert np.array_equal(np.asarray(rho_a), np.asarray(rho_b))
    assert np.array_equal(np.asarray(p_a), np.asarray(p_b))
    assert np.array_equal(np.asarray(f_a), np.asarray(f_b))


def test_row_pair_resident_bitwise():
    """The slot-resident advance with row_pair=True matches the default
    resident advance bitwise (same slot arrays, paired programs)."""
    scene = small_scene(dim=2, seed=76)
    state = init(scene)
    kw = dict(steps_per_dispatch=12, sort_every=4, slot_resident=True)
    s_a, viol_a = make_advance(scene, "pallas", **kw)(state)
    s_b, viol_b = make_advance(scene, "pallas", row_pair=True, **kw)(state)
    assert int(viol_a) == 0 and int(viol_b) == 0
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.v), np.asarray(s_b.v))
    assert np.array_equal(np.asarray(s_a.rho), np.asarray(s_b.rho))


def test_heal_counts_and_noop_on_calm_scene():
    """heal=True: a calm scene heals nothing and stays bitwise equal to the
    unhealed resident path; the jet scene heals every block and equals the
    per-step-rebuild path bitwise (block-granular exact fallback)."""
    from sph_tpu.params import Block

    calm = small_scene(dim=2, seed=92)
    state = init(calm)
    kw = dict(steps_per_dispatch=12, sort_every=4, slot_resident=True)
    s_a, viol_a, healed_a = make_advance(calm, "pallas", heal=True, **kw)(state)
    s_b, viol_b = make_advance(calm, "pallas", **kw)(state)
    assert int(viol_a) == 0 and int(healed_a) == 0 and int(viol_b) == 0
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.v), np.asarray(s_b.v))

    jet = calm.replace(
        blocks=(Block(lo=calm.blocks[0].lo, hi=calm.blocks[0].hi,
                      velocity=(2000.0, 0.0)),),
    )
    state_j = init(jet)
    s_h, viol_h, healed_h = make_advance(jet, "pallas", heal=True, **kw)(
        state_j
    )
    assert int(viol_h) == 0          # residual is zero: every bad block healed
    assert int(healed_h) == 3        # 12 steps / sort_every=4
    s_e = make_advance(jet, "pallas", steps_per_dispatch=12)(state_j)
    assert np.array_equal(np.asarray(s_h.x), np.asarray(s_e.x))
    assert np.array_equal(np.asarray(s_h.v), np.asarray(s_e.v))


def test_adaptive_cap_policy(capsys):
    """make_audited_advance(adaptive_cap=True): a calm scene runs the cap-8
    fast path (no switch, results ≈ cap-16 to fp tolerance); a jet scene
    heals every block and switches to the default cap, staying exact
    (bitwise vs the per-step path)."""
    from sph_tpu.step import make_audited_advance, run

    calm = small_scene(dim=2, seed=94)
    state = init(calm)
    adv = make_audited_advance(
        calm, "pallas", 12, sort_every=4, slot_resident=True,
        adaptive_cap=True,
    )
    s_a = adv(state)
    err = capsys.readouterr().err
    assert "switching" not in err  # cap-8 held
    s_ref, viol = make_advance(
        calm, "pallas", steps_per_dispatch=12, sort_every=4,
        slot_resident=True,
    )(state)
    assert int(viol) == 0
    # cap-8 vs cap-16 grids: same pair sets/order, different padded
    # reduction grouping → tolerance, not bitwise
    assert np.allclose(np.asarray(s_a.x), np.asarray(s_ref.x),
                       rtol=1e-5, atol=1e-4)

    from sph_tpu.params import Block

    jet = calm.replace(
        blocks=(Block(lo=calm.blocks[0].lo, hi=calm.blocks[0].hi,
                      velocity=(2000.0, 0.0)),),
    )
    state_j = init(jet)
    adv_j = make_audited_advance(
        jet, "pallas", 12, sort_every=4, slot_resident=True,
        adaptive_cap=True,
    )
    s_j = adv_j(state_j)
    err = capsys.readouterr().err
    assert "switching" in err  # every block healed -> outgrown
    s_e = make_advance(jet, "pallas", steps_per_dispatch=12)(state_j)
    assert np.array_equal(np.asarray(s_j.x), np.asarray(s_e.x))


def test_adaptive_cap_skin_narrows_to_fit(capsys):
    """Occupancy-aware cap-8 lattice: a 9-particle cluster that lands in
    ONE cell of the skin(4) lattice but straddles a cell boundary of the
    skin(2) lattice makes the adaptive policy narrow the skin instead of
    burning every block on heals and switching to cap-16 (the measured
    dam2d_10k failure — bench/probe_r3f.py)."""
    import dataclasses

    from sph_tpu.step import default_skin, make_audited_advance

    scene = small_scene(dim=2, seed=94)
    state = init(scene)
    s4 = default_skin(scene, 4)
    g4 = neighbors.GridSpec.for_scene(scene, cap=8, skin=s4)
    g2 = neighbors.GridSpec.for_scene(scene, cap=8, skin=s4 / 2)
    c4, c2 = g4.cell, g2.cell
    # each lattice starts a cell at its own lo (one-cell margin below
    # scene.lo); pick a narrow-lattice boundary b2 strictly inside a
    # wide-lattice cell so the 9-cluster straddles narrow, not wide
    lo4, lo2 = float(g4.lo[0]), float(g2.lo[0])
    b2 = lo2 + 3 * c2
    k4 = int(np.floor((b2 - lo4) / c4))
    cell4_lo, cell4_hi = lo4 + k4 * c4, lo4 + (k4 + 1) * c4
    assert cell4_lo + 0.5 < b2 < cell4_hi - 0.5, (b2, cell4_lo, cell4_hi)
    xs = np.asarray(state.x).copy()
    kinds = np.asarray(state.kind).copy()
    y = float(g4.lo[1]) + 350.0  # far corner, away from the fluid block
    for i in range(9):
        xs[i] = (b2 - 0.4 + 0.1 * i, y)  # 5 below b2, 4 at/above
        kinds[i] = 1  # static boundary: immobile, no dynamics to heal
    state = dataclasses.replace(
        state, x=jnp.asarray(xs), kind=jnp.asarray(kinds)
    )
    adv = make_audited_advance(
        scene, "pallas", 12, sort_every=4, slot_resident=True,
        adaptive_cap=True,
    )
    out = adv(state)
    err = capsys.readouterr().err
    assert "narrowed" in err
    assert "switching" not in err
    assert adv.mode == "cap8"
    assert int(out.step) == 12
    assert np.isfinite(np.asarray(out.x)).all()


def test_constant_heal_demotes_to_perstep(monkeypatch, capsys):
    """CONSTANT-HEAL DEMOTION (round 5, the vortex2d regime): when every
    block of DEMOTE_PATIENCE consecutive dispatches heals — the flow
    permanently outruns the Verlet drift budget — the audited advance
    demotes to the plain per-step path (bitwise what heal-every-block
    already computes, minus the failed fast attempts), re-probes the fast
    path on a bounded cadence, and RECOVERS it once the flow calms."""
    import dataclasses

    from sph_tpu import step as step_mod
    from sph_tpu.step import default_skin, make_audited_advance

    monkeypatch.setattr(step_mod, "PERSTEP_REPROBE_EVERY", 2)
    scene = small_scene(dim=2, seed=17)
    state = init(scene)
    adv = make_audited_advance(scene, "pallas", 8, sort_every=4,
                               slot_resident=True)
    assert adv.mode == "resident"
    budget = default_skin(scene, 4) / 2.0
    kick = 3.0 * budget / (4 * scene.params.dt)
    signs = jnp.where(jnp.arange(state.capacity)[:, None] % 2 == 0,
                      1.0, -1.0)

    def kicked(st):
        return dataclasses.replace(
            st, v=jnp.where(st.active[:, None], kick * signs, 0.0)
            * jnp.ones_like(st.v),
        )

    st = adv(kicked(state))          # all blocks heal → streak 1
    assert adv.mode == "resident"
    st = adv(kicked(st))             # streak 2 = DEMOTE_PATIENCE → demote
    assert adv.mode == "perstep"
    assert "demoting to the per-step path" in capsys.readouterr().err
    h_demote = adv.healed
    st = adv(kicked(st))             # re-probe cadence: still violent
    assert adv.mode == "perstep"
    assert adv.healed > h_demote     # the failed re-probe healed its blocks

    def calmed(s):                   # kill the kick so drift fits again
        return dataclasses.replace(s, v=jnp.zeros_like(s.v))

    st = adv(calmed(st))             # calm dispatch (perstep, off-cadence)
    assert adv.mode == "perstep"
    st = adv(calmed(st))             # calm re-probe → fast path recovered
    assert adv.mode == "resident"
    assert "resuming the resident fast path" in capsys.readouterr().err
    assert int(st.step) == 40
    assert np.isfinite(np.asarray(st.x)[np.asarray(st.active)]).all()


def test_heal_with_cap8_overflow_grid():
    """An aggressive cap that overflows at build time triggers healing (not
    silent pair-dropping): the healed result equals the default-cap
    per-step path bitwise.  This is the round-3 cap-8 safety contract."""
    scene = small_scene(dim=2, seed=93)
    state = init(scene)
    from sph_tpu.step import default_skin

    skin = default_skin(scene, 4)
    # 2D rest occupancy on the skinned lattice is ~4.4, so cap=4 reliably
    # overflows at build time (the 3D cap-8 situation scaled down)
    g_tiny = neighbors.GridSpec.for_scene(scene, cap=4, skin=skin)
    sg = pallas_step.slot_grid(g_tiny)
    addr = pallas_step.build_addr(state.x, state.active, g_tiny, sg)
    assert int(addr.overflow) > 0
    s_h, viol, healed = make_advance(
        scene, "pallas", steps_per_dispatch=8, grid=g_tiny,
        sort_every=4, slot_resident=True, heal=True,
    )(state)
    assert int(viol) == 0 and int(healed) == 2
    s_e = make_advance(scene, "pallas", steps_per_dispatch=8)(state)
    assert np.array_equal(np.asarray(s_h.x), np.asarray(s_e.x))
    assert np.array_equal(np.asarray(s_h.v), np.asarray(s_e.v))


# ---------------------------------------------------------------------------
# Auto-rebuild resident advance (round 3)
# ---------------------------------------------------------------------------


def test_auto_rebuild_forced_every_block_bitwise():
    """rebuild_frac=0 forces a rebuild at every block top — the auto
    advance then IS the classic resident block (materialize ∘ enter_slots
    round-trips bitwise), so results must match bitwise."""
    scene = small_scene(dim=2, seed=95)
    state = init(scene)
    kw = dict(steps_per_dispatch=16, sort_every=4, slot_resident=True)
    s_a, viol_a, healed_a, rebuilds = make_advance(
        scene, "pallas", auto_rebuild=True, rebuild_frac=0.0, **kw
    )(state)
    s_b, viol_b = make_advance(scene, "pallas", **kw)(state)
    assert int(viol_a) == 0 and int(healed_a) == 0 and int(viol_b) == 0
    assert int(rebuilds) == 4  # initial + blocks 2..4
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.v), np.asarray(s_b.v))
    assert np.array_equal(np.asarray(s_a.rho), np.asarray(s_b.rho))
    assert int(s_a.step) == 16


def test_auto_rebuild_calm_scene_stretches_and_matches():
    """Default rebuild_frac on a calm scene: fewer rebuilds than blocks,
    zero violations/heals, and trajectories match the classic resident
    path to fp tolerance (the reused addressing bins drifted particles
    by their BUILD positions — the exact Verlet-skin contract)."""
    scene = small_scene(dim=2, seed=96)
    state = init(scene)
    kw = dict(steps_per_dispatch=32, sort_every=4, slot_resident=True)
    s_a, viol, healed, rebuilds = make_advance(
        scene, "pallas", auto_rebuild=True, **kw
    )(state)
    assert int(viol) == 0 and int(healed) == 0
    assert int(rebuilds) < 8  # stretched past one rebuild per block
    s_b, viol_b = make_advance(scene, "pallas", **kw)(state)
    assert int(viol_b) == 0
    xa, xb = np.asarray(s_a.x), np.asarray(s_b.x)
    scale = np.max(np.abs(xb)) + 1e-9
    assert np.max(np.abs(xa - xb)) / scale < 1e-4
    # physical sanity: momentum near zero (gravity-free scene is not —
    # use boundedness instead)
    assert np.isfinite(xa).all()


def test_auto_rebuild_heals_jet_exactly():
    """A jet that outruns the skin every block: every block heals, and
    the result is bitwise the per-step-rebuild path."""
    from sph_tpu.params import Block

    base = small_scene(dim=2, seed=97)
    jet = base.replace(
        blocks=(Block(lo=base.blocks[0].lo, hi=base.blocks[0].hi,
                      velocity=(2000.0, 0.0)),),
    )
    state = init(jet)
    s_a, viol, healed, rebuilds = make_advance(
        jet, "pallas", steps_per_dispatch=12, sort_every=4,
        slot_resident=True, auto_rebuild=True,
    )(state)
    assert int(viol) == 0 and int(healed) == 3
    s_e = make_advance(jet, "pallas", steps_per_dispatch=12)(state)
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_e.x))
    assert np.array_equal(np.asarray(s_a.v), np.asarray(s_e.v))


def test_auto_rebuild_emitter_activation():
    """Emitter activations force a rebuild: scheduled particles join the
    pair physics within sort_every steps of their schedule (same latency
    contract as the classic resident block)."""
    from sph_tpu.params import Emitter

    base = small_scene(dim=2, seed=98)
    scene = base.replace(
        emitters=(
            Emitter(pos=(200.0, 300.0), velocity=(0.0, -60.0), width=3,
                    start_step=5, stop_step=6),
        ),
        capacity=int(init(base).capacity) + 64,
    )
    state = init(scene)
    n0 = int(state.n_active())
    s_a, viol, healed, rebuilds = make_advance(
        scene, "pallas", steps_per_dispatch=24, sort_every=4,
        slot_resident=True, auto_rebuild=True,
    )(state)
    assert int(viol) == 0
    assert int(s_a.n_active()) > n0          # emission happened
    assert int(rebuilds) >= 2                # activation forced a rebuild
    # classic resident path as the reference
    s_b, viol_b = make_advance(
        scene, "pallas", steps_per_dispatch=24, sort_every=4,
        slot_resident=True,
    )(state)
    assert int(s_a.n_active()) == int(s_b.n_active())
    xa = np.asarray(s_a.x)[np.asarray(s_a.active)]
    xb = np.asarray(s_b.x)[np.asarray(s_b.active)]
    scale = np.max(np.abs(xb)) + 1e-9
    assert np.max(np.abs(np.sort(xa, 0) - np.sort(xb, 0))) / scale < 1e-4


def test_auto_reactive_theta0_bitwise():
    """reactive_theta=0 rebuilds at every block whose residency has any
    measured drift — from a scene at rest that is every block after the
    first, exactly the velocity predictor's rebuild_frac=0 schedule — so
    results must match the classic resident block bitwise."""
    scene = small_scene(dim=2, seed=95)
    state = init(scene)
    kw = dict(steps_per_dispatch=16, sort_every=4, slot_resident=True)
    s_a, viol_a, healed_a, rebuilds = make_advance(
        scene, "pallas", auto_rebuild=True, reactive_theta=0.0, **kw
    )(state)
    s_b, viol_b = make_advance(scene, "pallas", **kw)(state)
    assert int(viol_a) == 0 and int(healed_a) == 0 and int(viol_b) == 0
    assert int(rebuilds) == 4  # initial + blocks 2..4
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_b.x))
    assert np.array_equal(np.asarray(s_a.v), np.asarray(s_b.v))
    assert np.array_equal(np.asarray(s_a.rho), np.asarray(s_b.rho))


def test_auto_reactive_calm_scene_stretches_and_matches():
    """Reactive policy on a calm scene: no more rebuilds than the STRICT
    velocity predictor (no projection term), zero violations/heals, and
    trajectories match the classic resident path to fp tolerance.  The
    membership-relaxed default predicate is sharper than both (it also
    requires a predicted bin EXIT), so it is the ≤ floor of the three."""
    scene = small_scene(dim=2, seed=96)
    state = init(scene)
    kw = dict(steps_per_dispatch=32, sort_every=4, slot_resident=True)
    s_a, viol, healed, rebuilds_r = make_advance(
        scene, "pallas", auto_rebuild=True, reactive_theta=0.7, **kw
    )(state)
    assert int(viol) == 0 and int(healed) == 0
    _, _, _, rebuilds_v = make_advance(
        scene, "pallas", auto_rebuild=True, membership_audit=False, **kw
    )(state)
    _, viol_m, healed_m, rebuilds_m = make_advance(
        scene, "pallas", auto_rebuild=True, **kw
    )(state)
    assert int(rebuilds_r) <= int(rebuilds_v)
    assert int(rebuilds_m) <= int(rebuilds_r)
    assert int(viol_m) == 0 and int(healed_m) == 0
    assert int(rebuilds_r) < 8
    s_b, viol_b = make_advance(scene, "pallas", **kw)(state)
    assert int(viol_b) == 0
    xa, xb = np.asarray(s_a.x), np.asarray(s_b.x)
    scale = np.max(np.abs(xb)) + 1e-9
    assert np.max(np.abs(xa - xb)) / scale < 1e-4


def test_auto_reactive_jet_heals_exactly():
    """Reactive policy never rebuilds pre-emptively, so a jet outrunning
    the skin heals EVERY block — and the result is bitwise the
    per-step-rebuild path (the audit+heal backstop carries the exactness
    contract alone)."""
    from sph_tpu.params import Block

    base = small_scene(dim=2, seed=97)
    jet = base.replace(
        blocks=(Block(lo=base.blocks[0].lo, hi=base.blocks[0].hi,
                      velocity=(2000.0, 0.0)),),
    )
    state = init(jet)
    s_a, viol, healed, rebuilds = make_advance(
        jet, "pallas", steps_per_dispatch=12, sort_every=4,
        slot_resident=True, auto_rebuild=True, reactive_theta=0.7,
    )(state)
    assert int(viol) == 0 and int(healed) == 3
    s_e = make_advance(jet, "pallas", steps_per_dispatch=12)(state)
    assert np.array_equal(np.asarray(s_a.x), np.asarray(s_e.x))
    assert np.array_equal(np.asarray(s_a.v), np.asarray(s_e.v))


# ---------------------------------------------------------------------------
# Minority slot repair (round-3 late; step.py repair_k)
# ---------------------------------------------------------------------------


def _dart_scene(seed, target=False):
    """Calm dam + a small fast dart: a risky MINORITY (the repair target).
    target=True aims the dart INTO the dam so repaired movers interact."""
    from sph_tpu.params import Block

    base = small_scene(dim=2, seed=seed)
    b0 = base.blocks[0]
    dart = (
        Block(lo=(80.0, 40.0), hi=(90.0, 50.0), velocity=(-450.0, 0.0))
        if target
        else Block(lo=(250.0, 250.0), hi=(262.0, 262.0),
                   velocity=(420.0, 0.0))
    )
    return base.replace(
        blocks=(Block(lo=b0.lo, hi=(b0.lo[0] + 60, b0.lo[1] + 100)), dart)
    )


def test_repair_noop_on_calm_scene_bitwise():
    """repair_k on a calm scene: nothing risky, so the advance is bitwise
    the plain auto advance (repair is pure extra machinery until it
    actually triggers)."""
    scene = small_scene(dim=2, seed=96)
    state = init(scene)
    kw = dict(steps_per_dispatch=16, sort_every=4, slot_resident=True,
              auto_rebuild=True)
    a = make_advance(scene, "pallas", **kw)(state)
    r = make_advance(scene, "pallas", repair_k=64, **kw)(state)
    assert int(r[4]) == 0
    assert int(r[3]) == int(a[3])
    assert np.array_equal(np.asarray(a[0].x), np.asarray(r[0].x))
    assert np.array_equal(np.asarray(a[0].v), np.asarray(r[0].v))


def test_repair_fast_dart_replaces_rebuilds_exactly():
    """A small fast dart trips the predicate while the bulk stays valid:
    the repair re-homes just the dart (repairs > 0, strictly fewer full
    rebuilds than the rebuild-only policy) and the trajectory matches the
    per-step-rebuild path."""
    scene = _dart_scene(97)
    state = init(scene)
    kw = dict(steps_per_dispatch=32, sort_every=4, slot_resident=True,
              auto_rebuild=True)
    a = make_advance(scene, "pallas", **kw)(state)
    r = make_advance(scene, "pallas", repair_k=256, **kw)(state)
    assert int(r[1]) == 0
    assert int(r[4]) >= 1                       # repairs fired
    assert int(r[3]) < int(a[3])                # replacing full rebuilds
    e = make_advance(scene, "pallas", steps_per_dispatch=32)(state)
    xr, xe = np.asarray(r[0].x), np.asarray(e.x)
    act = np.asarray(r[0].active)
    scale = np.max(np.abs(xe[act])) + 1e-9
    assert np.max(np.abs(xr[act] - xe[act])) / scale < 1e-4


def test_repair_into_dam_heals_and_stays_exact():
    """Dart aimed INTO the dam: repairs fire en route, the impact block
    still heals exactly (the audit backstop composes with repair), and
    the result tracks the per-step path."""
    scene = _dart_scene(99, target=True)
    state = init(scene)
    kw = dict(steps_per_dispatch=32, sort_every=4, slot_resident=True,
              auto_rebuild=True)
    r = make_advance(scene, "pallas", repair_k=256, **kw)(state)
    assert int(r[1]) == 0 and int(r[4]) >= 1
    e = make_advance(scene, "pallas", steps_per_dispatch=32)(state)
    xr, xe = np.asarray(r[0].x), np.asarray(e.x)
    act = np.asarray(r[0].active)
    scale = np.max(np.abs(xe[act])) + 1e-9
    assert np.max(np.abs(xr[act] - xe[act])) / scale < 1e-4


def test_repair_anchor_advances_no_phantom_risky():
    """A repaired particle's plan anchor must advance to its re-home
    position (shadow.x patch in _apply_repair): otherwise it stays
    phantom-risky against its OLD cell/anchor in every later plan, and
    the moment any OTHER particle triggers a plan, the phantom inflates
    n_risky past repair_k and forces a needless full rebuild.

    Deterministic 4-block timeline (zero jitter; cell 18.52, budget
    1.26, move(420) = 1.41/block): dart A (margin 1.6 off a cell face,
    into a wall 0.9 past it) is repaired at blocks 2 and 3, bounces off
    the wall to half speed, and is genuinely safe by block 4 — where
    dart B first turns risky.  With repair_k=1 the block-4 plan must
    see ONLY B: repairs == 3, rebuilds == 1 (entry).  A stale anchor
    instead counts A as a second risky particle → rebuilds == 2,
    repairs == 2.  The buoy keeps A's landing row in the compacted set
    (an empty target row is a designed rebuild fallback, not phantom
    behavior)."""
    from sph_tpu.params import Block

    we = 28.7  # wall at 371.3 = cell face 370.4 + 0.9 (dart A's stop)
    base = small_scene(dim=2, seed=97, wall_eps=we)
    dam = Block(lo=(we + 4, we + 4), hi=(we + 64, we + 104))
    dart_a = Block(lo=(367.8, 360.0), hi=(369.8, 362.0),
                   velocity=(420.0, 0.0))
    dart_b = Block(lo=(272.6, 249.0), hi=(274.6, 251.0),
                   velocity=(420.0, 0.0))
    buoy = Block(lo=(371.0, 99.0), hi=(373.0, 101.0))
    scene = base.replace(blocks=(dam, dart_a, dart_b, buoy), jitter=0.0)
    state = init(scene)
    r = make_advance(
        scene, "pallas", repair_k=1, steps_per_dispatch=16, sort_every=4,
        slot_resident=True, auto_rebuild=True,
    )(state)
    assert int(r[1]) == 0 and int(r[2]) == 0
    assert int(r[3]) == 1 and int(r[4]) == 3
    e = make_advance(scene, "pallas", steps_per_dispatch=16)(state)
    xr, xe = np.asarray(r[0].x), np.asarray(e.x)
    act = np.asarray(r[0].active)
    scale = np.max(np.abs(xe[act])) + 1e-9
    assert np.max(np.abs(xr[act] - xe[act])) / scale < 1e-4


def test_repair_overflow_falls_back_to_rebuild_bitwise():
    """More risky particles than repair_k (a whole jet): every fix falls
    back to the full rebuild, so the advance is bitwise the plain auto
    advance — including its heals."""
    from sph_tpu.params import Block

    base = small_scene(dim=2, seed=97)
    jet = base.replace(
        blocks=(Block(lo=base.blocks[0].lo, hi=base.blocks[0].hi,
                      velocity=(2000.0, 0.0)),),
    )
    state = init(jet)
    kw = dict(steps_per_dispatch=12, sort_every=4, slot_resident=True,
              auto_rebuild=True)
    a = make_advance(jet, "pallas", **kw)(state)
    r = make_advance(jet, "pallas", repair_k=4, **kw)(state)
    assert int(r[4]) == 0 and int(r[2]) == int(a[2])
    assert np.array_equal(np.asarray(a[0].x), np.asarray(r[0].x))


def test_repair_emitter_activation_rebuilds_bitwise():
    """Emitter activations bypass repair (new particles need a real
    build): bitwise the plain auto advance."""
    from sph_tpu.params import Emitter

    base = small_scene(dim=2, seed=98)
    scene = base.replace(
        emitters=(Emitter(pos=(200.0, 300.0), velocity=(0.0, -60.0),
                          width=3, start_step=5, stop_step=6),),
        capacity=int(init(base).capacity) + 64,
    )
    state = init(scene)
    kw = dict(steps_per_dispatch=24, sort_every=4, slot_resident=True,
              auto_rebuild=True)
    a = make_advance(scene, "pallas", **kw)(state)
    r = make_advance(scene, "pallas", repair_k=64, **kw)(state)
    assert int(a[0].n_active()) == int(r[0].n_active())
    assert np.array_equal(np.asarray(a[0].x), np.asarray(r[0].x))


def test_repair_full_cells_fall_back_exactly():
    """cap-4 grid: the dense dam's cells have no free lanes, so a dart
    re-homing INTO the dam cannot place and the fix falls back to the
    full rebuild — physics stays exact against the same-grid auto path."""
    from sph_tpu import neighbors
    from sph_tpu.step import default_skin

    scene = _dart_scene(99, target=True)
    state = init(scene)
    skin = default_skin(scene, 4)
    g4 = neighbors.GridSpec.for_scene(scene, cap=4, skin=skin)
    kw = dict(steps_per_dispatch=32, sort_every=4, slot_resident=True,
              auto_rebuild=True, grid=g4)
    a = make_advance(scene, "pallas", **kw)(state)
    r = make_advance(scene, "pallas", repair_k=256, **kw)(state)
    act = np.asarray(r[0].active)
    xa, xr = np.asarray(a[0].x), np.asarray(r[0].x)
    scale = np.max(np.abs(xa[act])) + 1e-9
    assert np.max(np.abs(xr[act] - xa[act])) / scale < 1e-4
    assert int(r[2]) >= 1 or int(r[3]) >= 2     # healed or re-built


def test_auto_rebuild_block_lengths_match_per_step():
    """sort_every ∈ {2, 8} auto-resident (the probe_r3h part-3 block-length
    sweep rows) match the per-step-rebuild trajectory to fp tolerance with
    zero violations — the Verlet-skin contract holds at every block
    length, not just the flagship 4."""
    from sph_tpu.step import make_audited_advance

    scene = small_scene(dim=2, seed=97)
    state = init(scene)
    s_ref = make_advance(scene, "pallas", steps_per_dispatch=16)(state)
    for se in (2, 8):
        s, viol, healed, rebuilds = make_advance(
            scene, "pallas", steps_per_dispatch=16, sort_every=se,
            slot_resident=True, auto_rebuild=True,
        )(state)
        assert int(viol) == 0 and int(healed) == 0, se
        xa, xb = np.asarray(s.x), np.asarray(s_ref.x)
        scale = np.max(np.abs(xb)) + 1e-9
        assert np.max(np.abs(xa - xb)) / scale < 1e-4, se
        assert int(s.step) == 16


def test_run_exposes_audit_policy_knobs(monkeypatch):
    """run() plumbs membership_audit / repair_k through to the audited
    advance on BOTH the single-chip and decomposed paths (VERDICT r3
    item 7: the CLI exposed --strict-audit/--repair-k but run() hid
    them), and the strict-policy run stays exact end-to-end."""
    import sph_tpu.step as step_mod
    from sph_tpu import decomp
    from sph_tpu.step import make_advance, run

    scene = small_scene(dim=2, seed=98)

    seen = {}
    real = step_mod.make_audited_advance

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(step_mod, "make_audited_advance", spy)
    s = run(scene, 8, method="pallas", steps_per_dispatch=8,
            sort_every=4, slot_resident=True,
            membership_audit=False, repair_k=0)
    assert seen["membership_audit"] is False and seen["repair_k"] == 0
    s_ref = make_advance(scene, "pallas", steps_per_dispatch=8)(init(scene))
    assert np.array_equal(np.asarray(s.x), np.asarray(s_ref.x))

    seen_sp = {}
    real_sp = decomp.make_audited_spatial_advance

    def spy_sp(*a, **kw):
        seen_sp.update(kw)
        return real_sp(*a, **kw)

    monkeypatch.setattr(decomp, "make_audited_spatial_advance", spy_sp)
    run(scene, 4, method="pallas", steps_per_dispatch=4, sort_every=4,
        slot_resident=True, shards=2, membership_audit=False, repair_k=0)
    assert seen_sp["membership_audit"] is False and seen_sp["repair_k"] == 0


@pytest.mark.parametrize("dim", [2, 3])
def test_packed_scatter_transport(dim):
    """packed_scatter=True (bf16-pair rebuild transport, round 4): the
    trajectory matches the default auto advance to the bf16 transport
    tolerance (~0.4% of a cell per rebuild round-trip, amplified a few x
    by a short integration window), background slots stay phantom (no
    density blowup), and counters are unchanged."""
    from sph_tpu.step import make_advance

    scene = small_scene(dim=dim, seed=99)
    state = init(scene)
    kw = dict(steps_per_dispatch=8, sort_every=4, slot_resident=True,
              auto_rebuild=True)
    s_ref, v0, h0, r0 = make_advance(scene, "pallas", **kw)(state)
    s_pk, v1, h1, r1 = make_advance(scene, "pallas", packed_scatter=True,
                                    **kw)(state)
    assert int(v1) == 0 and int(h1) == int(h0) and int(r1) == int(r0)
    xa, xb = np.asarray(s_pk.x), np.asarray(s_ref.x)
    act = np.asarray(s_pk.emit_step) <= 8
    assert np.isfinite(xa[act]).all()
    # bf16 cell-relative quantum is ~2^-9 * cell; allow integration
    # amplification but catch any phantom-neighbor blowup (those would
    # shift positions by O(spacing))
    from sph_tpu.neighbors import GridSpec

    cell = GridSpec.for_scene(scene).cell
    assert np.max(np.abs(xa[act] - xb[act])) < 0.1 * cell
    ra, rb = np.asarray(s_pk.rho), np.asarray(s_ref.rho)
    assert np.allclose(ra[act], rb[act], rtol=5e-2)


def test_packed_scatter_flag_validation():
    from sph_tpu.step import make_advance

    scene = small_scene(dim=2, seed=99)
    with pytest.raises(ValueError, match="packed_scatter"):
        make_advance(scene, "pallas", steps_per_dispatch=8, sort_every=4,
                     slot_resident=True, packed_scatter=True)


def test_repair_default_capacity_gate():
    """repair_k=None resolves to DEFAULT_REPAIR_K only at scales where the
    repair machinery pays (probe_r4a: 16/25 blocks repaired at 10k-2D for
    a 20% loss; neutral at 100k; 1.23x win at the settled 1M)."""
    from sph_tpu.params import preset
    from sph_tpu.step import DEFAULT_REPAIR_K, default_repair_k

    assert default_repair_k(preset("dam2d_10k"), auto=True) == 0
    assert default_repair_k(preset("dam3d_100k"), auto=True) \
        == DEFAULT_REPAIR_K
    assert default_repair_k(preset("splash3d_1m"), auto=False) == 0


@pytest.mark.parametrize("dim", [2, 3])
def test_batch_skip_bitwise(dim):
    """batch_skip (per-xb-batch i-occupancy skip, round 4): per-PARTICLE
    outputs are bitwise-identical to the plain kernels.  Raw slot arrays
    are deliberately NOT compared — a skipped batch holds only
    never-gathered background lanes, where the non-skip path computes a
    nonzero phantom rho (coincident 1e18 sentinels: d=0, q=h²>0) while
    the skip writes 0 (ADVICE r4: the old raw-slot-array comparison was
    vacuous AND would fail on any scene that actually skips).

    The scene is built so the skip condition provably occurs: two
    clusters far apart along x SHARING their (z,)y rows — each cluster's
    128-lane group contains real particles in one xb-batch and only
    background in another — and the test counts those skippable batches
    from the scattered features before comparing."""
    from sph_tpu import pallas_step
    from sph_tpu.neighbors import GridSpec
    from sph_tpu.params import Scene, SimParams

    params = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    h = params.h  # 16.0 → cell edge 16
    lo = (0.0,) * dim
    hi = (8 * h,) * (dim - 1) + (20 * h,)
    scene = Scene(params=params, lo=lo, hi=hi)
    grid = GridSpec.for_scene(scene, cap=16)  # production cap: xc=8, xb=4

    # two x-clusters (2 cells each, 8 particles/cell — under cap) sharing
    # the same y(/z) band, ~14 cells apart: each cluster's group has a
    # fully-background sibling batch
    rng = np.random.default_rng(101)
    pts = []
    for cell_x in (0, 1, 16, 17):
        for _ in range(8):
            p = rng.uniform(0.2 * h, 0.8 * h, size=dim)
            p[-1] = cell_x * h + rng.uniform(0.2 * h, 0.8 * h)
            pts.append(p)
    x = jnp.asarray(np.array(pts, np.float32))
    v = jnp.asarray(rng.uniform(-5, 5, x.shape).astype(np.float32))
    active = jnp.ones((x.shape[0],), bool)

    # prove the skip precondition fires: >= 1 all-background xb-batch
    # inside an occupied group (the kernel's exact predicate, computed
    # here from the scattered features + per-group occupancy)
    sg = pallas_step.slot_grid(grid, batch_skip=True)
    addr = pallas_step.build_addr(x, active, grid, sg)
    feat = np.asarray(
        pallas_step.scatter_slots(addr, pallas_step._pack_rows6(x, v), sg)
    )
    gcounts = np.asarray(addr.gcounts)[:, 0, :]        # [c_rows, n_groups]
    featx = feat[:, 0, :]                              # [c_rows, lanes]
    cap, xb = sg.cap, sg.xb
    n_skippable = 0
    for r in range(1, sg.c_rows):
        for g in range(1, sg.n_groups - 1):
            if gcounts[r, g] <= 0:
                continue  # group-level skip catches these, not batch_skip
            blk = featx[r, g * 128:(g + 1) * 128]
            for k in range(0, sg.xc, xb):
                if (blk[k * cap:(k + xb) * cap] >= 1e17).all():
                    n_skippable += 1
    assert n_skippable >= 1, "scene exercises no skippable batch"

    outs = []
    for skip in (False, True):
        rho, p, f = pallas_step.pallas_rho_p_f(
            x, v, active, params, grid, batch_skip=skip
        )
        outs.append((np.asarray(rho), np.asarray(p), np.asarray(f)))
    for a, b in zip(outs[0], outs[1]):
        assert np.array_equal(a, b)
