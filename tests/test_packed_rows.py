"""Packed-row kernel layout (pallas_step.SlotGrid.packed, round 5) — the
sparse-scene mode: per-row contiguous particle packing, whole-neighbor-row
candidate windows (measured 3.05× the slot kernels at the settled
emitters3d, bench/probe_r5b.py).  Tests mirror the slot-mode pyramid:
grid-path agreement, multi-block extras, overflow audit, resident ==
per-step-reuse bitwise, auto-rebuild + emitter activation, flag gates."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import small_scene

from sph_tpu import neighbors, pallas_step
from sph_tpu.params import Emitter, Scene, SimParams
from sph_tpu.state import init
from sph_tpu.step import default_repair_k, make_advance

FTOL = 3e-5


def _cloud(n, dim, lo, hi, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(lo, hi, (n, dim)).astype(np.float32)
    v = rng.uniform(-5, 5, (n, dim)).astype(np.float32)
    return x, v


@pytest.mark.parametrize("dim", [2, 3])
def test_packed_matches_grid(dim):
    n = 300
    x, v = _cloud(n, dim, 0.0, 120.0, seed=7)
    active = np.ones(n, bool)
    active[280:] = False
    p = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0,) * dim, hi=(120.0,) * dim)
    grid = neighbors.GridSpec.for_scene(scene, cap=16)
    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)
    rho_g, _, f_g = neighbors.grid_rho_p_f(xa, va, aa, p, grid)
    rho_p, _, f_p = pallas_step.pallas_rho_p_f(
        xa, va, aa, p, grid, packed_rows=True
    )
    rho_g, f_g, rho_p, f_p = map(np.asarray, (rho_g, f_g, rho_p, f_p))
    assert np.allclose(rho_p, rho_g, rtol=1e-5, atol=1e-6)
    scale = np.max(np.abs(f_g)) + 1e-9
    assert np.max(np.abs(f_p - f_g)) / scale < FTOL


def test_packed_multiblock_and_overflow():
    """Rows of > 128 particles exercise the extra-block (jblocks) path;
    a too-small row_lanes must COUNT its drops, never drop silently."""
    dim, n = 2, 520
    rng = np.random.default_rng(11)
    x = np.empty((n, dim), np.float32)
    x[:, 0] = rng.uniform(2, 40, n)
    x[:, 1] = rng.uniform(0, 400, n)
    v = rng.uniform(-5, 5, (n, dim)).astype(np.float32)
    active = np.ones(n, bool)
    active[500:] = False
    p = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0, 0.0), hi=(48.0, 400.0))
    grid = neighbors.GridSpec.for_scene(scene, cap=64)
    xa, va, aa = jnp.asarray(x), jnp.asarray(v), jnp.asarray(active)

    sg = pallas_step.packed_grid(grid, row_lanes=384)
    addr = pallas_step.build_addr(xa, aa, grid, sg)
    jb = np.asarray(pallas_step._jblocks(addr, sg))
    assert jb.max() >= 2, "extras path not exercised"
    assert int(addr.overflow) == 0

    rho_g, _, f_g = neighbors.grid_rho_p_f(xa, va, aa, p, grid)
    rho_p, _, f_p = pallas_step.pallas_rho_p_f(
        xa, va, aa, p, grid, packed_rows=True, row_lanes=384
    )
    rho_g, f_g, rho_p, f_p = map(np.asarray, (rho_g, f_g, rho_p, f_p))
    assert np.allclose(rho_p, rho_g, rtol=1e-5, atol=1e-6)
    scale = np.max(np.abs(f_g)) + 1e-9
    assert np.max(np.abs(f_p - f_g)) / scale < FTOL

    addr2 = pallas_step.build_addr(
        xa, aa, grid, pallas_step.packed_grid(grid, row_lanes=128)
    )
    assert int(addr2.overflow) > 0


def _emitter_scene(dim=3):
    from sph_tpu.params import Block, calibrate

    p = SimParams(dim=dim, kernel_norm="proper", boundary_mode="penalty",
                  gravity=(0.0, -9.81, 0.0)[:dim])
    return calibrate(Scene(
        params=p,
        lo=(0.0,) * dim,
        hi=(240.0,) * dim,
        blocks=(Block(lo=(20.0,) * dim, hi=(90.0,) * dim),),
        emitters=(Emitter(pos=(150.0,) * dim,
                          velocity=(0.0, -30.0, 0.0)[:dim],
                          width=2, start_step=4),),
        capacity=4096,
        seed=40,
    ))


def test_packed_resident_matches_reuse_bitwise():
    """Slot-resident integration in the packed layout == the packed
    per-step-scatter reuse path, bitwise (same addressing, same kernels) —
    the same contract the slot mode's resident path carries."""
    scene = _emitter_scene()
    state = init(scene)
    from sph_tpu.step import prime

    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    kw = dict(steps_per_dispatch=8, sort_every=4, packed_rows=True)
    s_res, viol_r, healed = make_advance(
        scene, "pallas", slot_resident=True, heal=True, **kw
    )(state)
    s_reuse, viol_u = make_advance(scene, "pallas", **kw)(state)
    assert int(viol_r) == 0 and int(viol_u) == 0 and int(healed) == 0
    # x/acc/rho bitwise; v to 1-2 ulp (the same fma-contraction variance
    # the slot-mode leapfrog test documents)
    assert np.array_equal(np.asarray(s_res.x), np.asarray(s_reuse.x))
    assert np.array_equal(np.asarray(s_res.rho), np.asarray(s_reuse.rho))
    assert np.array_equal(np.asarray(s_res.acc), np.asarray(s_reuse.acc))
    assert np.allclose(np.asarray(s_res.v), np.asarray(s_reuse.v),
                       rtol=1e-5, atol=1e-5)


def test_packed_auto_rebuild_with_emitters():
    """The auto-rebuild resident advance runs the packed layout through
    emitter activations (rebuild triggers) and stays finite + exact
    (viol == 0; heal path covers any budget overrun)."""
    scene = _emitter_scene()
    state = init(scene)
    from sph_tpu.step import prime

    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    adv = make_advance(scene, "pallas", steps_per_dispatch=16, sort_every=4,
                       slot_resident=True, auto_rebuild=True,
                       packed_rows=True)
    out = adv(state)
    s2, viol, healed, rebuilds = out[:4]
    assert int(viol) == 0
    n2 = int(s2.n_active())
    assert n2 > int(state.n_active())  # emitter activated under packed
    x = np.asarray(s2.x)[np.asarray(s2.active)]
    assert np.isfinite(x).all()
    # physics sanity vs the SLOT-layout auto path (same machinery/
    # activation semantics; only the kernel layout differs, so any gap is
    # summation-order noise)
    slot = make_advance(scene, "pallas", steps_per_dispatch=16, sort_every=4,
                        slot_resident=True, auto_rebuild=True)(state)
    xa = np.asarray(slot[0].x)[np.asarray(slot[0].active)]
    assert x.shape == xa.shape
    assert np.max(np.abs(x - xa)) < 1e-3 * scene.params.h


def test_packed_membership_row_only():
    """Packed membership exempts the x axis: a slot that drifts far in x
    but stays in its (z,)y row is NOT a violation (the window is
    x-complete), while a y exit past skin/2 IS."""
    from sph_tpu.step import _membership_bad, _slot_bin_refs

    dim = 2
    p = SimParams(dim=dim, gravity=(0.0,) * dim, kernel_norm="proper")
    scene = Scene(params=p, lo=(0.0, 0.0), hi=(120.0, 120.0))
    grid = neighbors.GridSpec.for_scene(scene, cap=16, skin=4.0)
    sg = pallas_step.packed_grid(grid, 128)
    x = jnp.asarray([[50.0, 10.0], [50.0, 50.0]], jnp.float32)
    active = jnp.ones((2,), bool)
    addr = pallas_step.build_addr(x, active, grid, sg)
    refs = _slot_bin_refs(addr, sg)
    assert refs[-1] is None
    # place slot positions: particle 0 moved +60 in x (same row), particle
    # 1 moved +60 in y (row exit)
    feat = pallas_step.scatter_slots(
        addr, pallas_step._pack_rows6(x, jnp.zeros_like(x)), sg
    )
    xs = feat[:, 0:dim, :]
    xs = xs.at[:, 1, :].add(
        jnp.where(feat[:, 0, :] == 50.0, 0.0, 0.0)
    )  # no-op keep shape
    # move every real slot +60 in x: no violation
    real = feat[:, 0, :] < 1e17
    xs_x = jnp.where(real, xs[:, 1, :] + 60.0, xs[:, 1, :])
    xs2 = jnp.stack([xs[:, 0, :], xs_x], axis=1)
    bad = jnp.ones((sg.c_rows, 1, sg.lanes), bool)  # strict audit fired
    relaxed = _membership_bad(bad, xs2, addr, sg, grid)
    assert not bool(jnp.any(relaxed & real[:, None, :]))
    # move +60 in y instead: violation stands
    xs_y = jnp.where(real, xs[:, 0, :] + 60.0, xs[:, 0, :])
    xs3 = jnp.stack([xs_y, xs[:, 1, :]], axis=1)
    relaxed_y = _membership_bad(bad, xs3, addr, sg, grid)
    assert bool(jnp.any(relaxed_y & real[:, None, :]))


def test_packed_auto_policy_probe():
    """make_audited_advance(packed_rows=None): emitter scenes probe the
    CURRENT state — a sparse spray runs packed, a rest-packed pool (mean
    occupancy ~12 > PACKED_MAX_OCC) runs the slot layout."""
    from sph_tpu.step import make_audited_advance, prime

    spray = dataclasses.replace(_emitter_scene(), blocks=())
    st = jax.jit(lambda s: prime(spray, s, method="pallas"))(init(spray))
    adv = make_audited_advance(spray, "pallas", 8, sort_every=4,
                               slot_resident=True)
    s2 = adv(st)
    assert adv.mode == "packed"
    assert np.isfinite(np.asarray(s2.x)[np.asarray(s2.active)]).all()

    dense = _emitter_scene()
    st_d = jax.jit(lambda s: prime(dense, s, method="pallas"))(init(dense))
    adv_d = make_audited_advance(dense, "pallas", 8, sort_every=4,
                                 slot_resident=True)
    adv_d(st_d)
    assert adv_d.mode == "slot"


def test_packed_outgrown_switches_to_slot():
    """The packed→slot MID-RUN switch (make_audited_advance packed auto
    policy): when in-dispatch healing exceeds break-even (> blocks/8 per
    dispatch — the cap-8 switch pattern), the policy abandons the packed
    layout permanently and later dispatches run the slot fast path.
    Trigger: velocities far above the Verlet drift budget heal every
    block (the vortex2d constant-heal regime, round-5 soak)."""
    import dataclasses as _dc

    from sph_tpu.step import make_audited_advance, prime

    spray = dataclasses.replace(_emitter_scene(), blocks=())
    st = jax.jit(lambda s: prime(spray, s, method="pallas"))(init(spray))
    adv = make_audited_advance(spray, "pallas", 8, sort_every=4,
                               slot_resident=True)
    st = adv(st)
    assert adv.mode == "packed"
    healed0 = adv.healed
    # blow past the drift budget in BOTH blocks: alternating-sign
    # velocities just above skin/2-per-window keep particles off the
    # walls (a uniform kick slams them into the boundary in block 1 and
    # the damped rebound never violates block 2), so every block heals
    # (healed=2 > max(1, blocks//8)=1) → the policy must switch
    from sph_tpu.step import default_skin

    budget = default_skin(spray, 4) / 2.0
    kick = 3.0 * budget / (4 * spray.params.dt)
    signs = jnp.where(jnp.arange(st.capacity)[:, None] % 2 == 0, 1.0, -1.0)
    st = _dc.replace(st, v=jnp.where(st.active[:, None], kick * signs, 0.0)
                     * jnp.ones_like(st.v))
    st = adv(st)
    assert adv.mode == "slot"
    assert adv.healed > healed0
    # switched advance keeps running (slot fast path) and stays finite
    st = adv(st)
    assert adv.mode == "slot"
    x = np.asarray(st.x)[np.asarray(st.active)]
    assert np.isfinite(x).all()


def test_packed_flag_gates():
    scene = small_scene(dim=2, seed=3)
    with pytest.raises(ValueError, match="packed_rows"):
        make_advance(scene, "grid", steps_per_dispatch=4, packed_rows=True)
    with pytest.raises(ValueError, match="packed_rows"):
        make_advance(scene, "pallas", steps_per_dispatch=4, sort_every=4,
                     slot_resident=True, packed_rows=True, row_pair=True)
    with pytest.raises(ValueError, match="repair"):
        make_advance(scene, "pallas", steps_per_dispatch=8, sort_every=4,
                     slot_resident=True, auto_rebuild=True,
                     packed_rows=True, repair_k=64)
    scene3 = _emitter_scene()
    assert default_repair_k(scene3, auto=True, packed_rows=True) == 0
