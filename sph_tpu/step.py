"""Compose one jitted simulation step + the scan driver (SURVEY.md C1, §3.5).

The reference's `update(dt)` (density→pressure→forces→integrate→boundaries,
SURVEY.md §3.2) becomes a single pure function `step(state) -> state`, traced
once with static shapes and scanned on device: `advance()` runs S steps per
dispatch with `lax.scan`, so host↔device crossings are one dispatch + one
fetch per S steps — measured on this platform a dispatch round-trip costs
~35–110 ms while a step costs ~1 ms, so per-step dispatch would be ~100×
slower than the physics (SURVEY.md §3.5 [M]).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from sph_tpu import physics
from sph_tpu.params import Scene
from sph_tpu.state import State


def _rho_p_f(
    x, v, active, movable, scene: Scene, method: str, grid=None, step=None,
    addr=None, row_pair: bool = False, packed_rows: bool = False,
    row_lanes=None,
):
    """Density → EOS → pairwise forces + gravity + wall penalty + external
    force fields, one x eval.  Returns (rho, p, f); `addr` (pallas only)
    reuses a prebuilt slot addressing (sort_every Verlet-skin reuse)."""
    params = scene.params
    if method == "naive":
        with jax.named_scope("sph_density"):
            rho = physics.density_naive(x, active, params)
            p = physics.eos_pressure(rho, params)
        with jax.named_scope("sph_forces"):
            f = physics.forces_naive(x, v, rho, p, active, params)
    elif method == "grid":
        from sph_tpu import neighbors

        with jax.named_scope("sph_grid"):
            rho, p, f = neighbors.grid_rho_p_f(x, v, active, params, grid)
    elif method == "pallas":
        from sph_tpu import pallas_step

        with jax.named_scope("sph_pallas"):
            rho, p, f = pallas_step.pallas_rho_p_f(
                x, v, active, params, grid, addr=addr, row_pair=row_pair,
                batch_skip=(bool(scene.emitters)
                            and params.precision != "bf16"
                            and not packed_rows),
                packed_rows=packed_rows, row_lanes=row_lanes,
            )
    else:
        raise ValueError(f"unknown neighbor method {method!r}")
    with jax.named_scope("sph_body_forces"):
        f = f + physics.gravity_force(rho, params)
        if params.boundary_mode == "penalty":
            f = f + physics.wall_penalty_force(
                x, v, scene.lo, scene.hi, params
            )
        if scene.force_fields and step is not None:
            f = f + physics.force_field_force(x, step, scene.force_fields)
    return rho, p, f


def make_step(
    scene: Scene, method: str = "naive", grid=None, with_addr: bool = False,
    row_pair: bool = False, packed_rows: bool = False, row_lanes=None,
) -> Callable[[State], State]:
    """Build the pure step function for `scene` (closes over all statics).

    method: "naive" (O(N²), C9) | "grid" (cell-hash, C10) | "pallas" (C11).
    `grid` overrides the default GridSpec (cap/chunk tuning).
    with_addr (pallas only): the returned function is
    `step(state, addr) -> state`, reusing a prebuilt SlotAddr (sort_every).
    row_pair (pallas): 2 compacted rows per kernel program
    (pallas_step.SlotGrid.row_pair).
    """
    params = scene.params
    dt = params.dt
    if grid is None and method in ("grid", "pallas"):
        from sph_tpu import neighbors

        grid = neighbors.GridSpec.for_scene(scene)

    def step_impl(state: State, addr=None):
        active = state.active
        movable = active & (state.kind == 0)
        mov = movable[:, None].astype(state.x.dtype)
        x, v, acc = state.x, state.v, state.acc

        if params.integrator == "leapfrog":
            # KDK with stored acceleration: one force eval per step.
            v = v + (0.5 * dt) * acc * mov
            x = x + dt * v * mov
            rho, p, f = _rho_p_f(
                x, v, active, movable, scene, method, grid, step=state.step,
                addr=addr, row_pair=row_pair, packed_rows=packed_rows,
                row_lanes=row_lanes,
            )
            a = f / jnp.maximum(rho, 1e-12)[:, None]
            v = v + (0.5 * dt) * a * mov
            acc = jnp.where(movable[:, None], a, 0.0)
        elif params.integrator == "euler":
            # Semi-implicit (symplectic) Euler: v += dt f/ρ; x += dt v.
            rho, p, f = _rho_p_f(
                x, v, active, movable, scene, method, grid, step=state.step,
                addr=addr, row_pair=row_pair, packed_rows=packed_rows,
                row_lanes=row_lanes,
            )
            a = f / jnp.maximum(rho, 1e-12)[:, None]
            v = v + dt * a * mov
            x = x + dt * v * mov
            acc = jnp.where(movable[:, None], a, 0.0)
        else:
            raise ValueError(f"unknown integrator {params.integrator!r}")

        if params.boundary_mode == "clamp":
            xc, vc = physics.clamp_boundary(x, v, scene.lo, scene.hi, params)
            x = jnp.where(movable[:, None], xc, x)
            v = jnp.where(movable[:, None], vc, v)

        new_state = State(
            x=x,
            v=v,
            acc=acc,
            rho=jnp.where(active, rho, state.rho),
            p=jnp.where(active, p, state.p),
            kind=state.kind,
            emit_step=state.emit_step,
            step=state.step + 1,
        )
        return new_state

    if with_addr:
        if method != "pallas":
            raise ValueError("with_addr requires method='pallas'")
        return step_impl
    return step_impl


def prime(scene: Scene, state: State, method: str = "naive") -> State:
    """Fill `state.acc` (and rho/p) from the current positions.

    Leapfrog KDK needs a valid acceleration *before* its first half-kick; a
    cold start from acc = 0 shifts the trajectory by half a step.  `run`
    calls this automatically at step 0.
    """
    params = scene.params
    grid = None
    if method in ("grid", "pallas"):
        from sph_tpu import neighbors

        grid = neighbors.GridSpec.for_scene(scene)
    active = state.active
    movable = active & (state.kind == 0)
    rho, p, f = _rho_p_f(
        state.x, state.v, active, movable, scene, method, grid, step=state.step
    )
    a = f / jnp.maximum(rho, 1e-12)[:, None]
    return State(
        x=state.x,
        v=state.v,
        acc=jnp.where(movable[:, None], a, 0.0),
        rho=jnp.where(active, rho, state.rho),
        p=jnp.where(active, p, state.p),
        kind=state.kind,
        emit_step=state.emit_step,
        step=state.step,
    )


# Observed platform limit (axon, TPU v5 lite): a single compiled program
# containing more than ~200 Pallas kernel launches (2 per step) crashes the
# TPU worker process outright; <=100 scanned steps per dispatch is reliably
# safe and dispatch overhead is negligible at that grain.
MAX_PALLAS_STEPS_PER_DISPATCH = 100


def default_skin(scene: Scene, sort_every: int) -> float:
    """Default Verlet-skin width for `sort_every`-step addr reuse: covers a
    particle moving at the EOS sound speed for the whole reuse window
    (WCSPH sizes c₀ ≥ ~10× the expected flow speed, so this is a
    conservative bound; the advance loop still counts actual violations).

    EMITTER scenes get a wider skin (×3/×2 where h still dominates the
    cell): jets keep the flow PERMANENTLY near the drift budget — fresh
    near-sonic particles arrive forever, unlike a splash's transient
    impact — so the base skin rebuilds ~every other block and heals the
    >c₀ spikes.  Measured (bench/probe_r4e.py, settled emitters3d at
    n=20k, h=16): base skin 22.7 ms/step (16 rebuilds + 2 heals /25
    blocks) → ×2 18.2 (6 rebuilds, 0 heals) → ×3 14.9 (2 rebuilds,
    0 heals, 1.53×).  The h/2 bound keeps the widened cell within ~30%
    of h-dominated (cell growth is what made narrow skins win on the
    skin-dominated 1M lattice — probe_r3f); exactness is audit-guaranteed
    at any skin."""
    base = 2.0 * sort_every * scene.params.dt * scene.params.sound_speed
    if scene.emitters:
        h = scene.params.h
        spacing = scene.spacing or h * 0.55
        for mult in (3.0, 2.0):
            skin = mult * base
            # widened cells must stay h-dominated AND keep rest-lattice
            # occupancy within the standard cap-16 slot grid (80%
            # headroom for impact compression; overflow would only heal,
            # but healing is the cost this multiplier removes)
            occ = ((h + skin) / spacing) ** scene.params.dim
            if skin <= 0.5 * h and occ <= 12.8:
                return skin
    return base


# --- Membership-relaxed Verlet audit -------------------------------------
#
# The classic reuse audit requires every particle within skin/2 of its
# BUILD position.  That is sufficient but not necessary: with cells of
# edge (h + skin), a pair with |xi − xj| < h is captured by the ±1-cell
# candidate window whenever EACH endpoint satisfies (a) it still bins
# into its build cell, OR (b) it is within skin/2 of its build position.
# Proof per axis (floor bins; clip is monotone so clipped bins only get
# closer):
#   (a,a): xi ∈ bin_i, xj ∈ bin_j, |xi−xj| < h < cell  ⇒ bins ≤ 1 apart.
#   (a,b): |xi − x0j| ≤ |xi−xj| + skin/2 < h + skin/2 < cell, xi ∈ bin_i
#          and x0j ∈ bin_j                              ⇒ bins ≤ 1 apart.
#   (b,b): |x0i − x0j| < h + skin = cell (the classic Verlet argument).
# So a drift violation is REAL only when the particle has ALSO left its
# build cell — acoustic oscillation at settle (drift crosses skin/2 while
# the particle never leaves its cell) stops tripping rebuilds/heals, with
# zero change to the physics contract (bench/probe_r3h.py measurements).
# Restricted to xsub == 1 (slot-cell margins differ; xsub is a measured
# dead end and default-off) — callers fall back to the strict audit.


def _slot_bin_refs(addr, sg):
    """Per-axis BUILD-cell indices of every slot, broadcastable against a
    [c_rows, lanes] plane.  Row 0 (dummy) and pad rows carry the safe
    interior code from build_addr; their slots are masked by `movb`
    wherever these refs are consumed.

    Packed-row layouts (sg.packed) have NO per-lane x cell — their kernel
    windows span whole neighbor rows, so the x axis is membership-exempt:
    its ref is None and the membership helpers below skip it.  The pair-
    coverage lemma still holds row-only: a pair within h is captured while
    each endpoint is inside its build (z, y) cell or within skin/2 of its
    build position — the per-axis floor-bin argument applies to the row
    axes, and x needs no bound because every row window is x-complete."""
    code = addr.row_code.astype(jnp.int32)            # [c_rows]
    refs = []
    if sg.dim == 3:
        refs.append((code // sg.h1 - 1)[:, None])     # axis 0 (z): rows
    refs.append(((code % sg.h1 if sg.dim == 3 else code) - 1)[:, None])
    if sg.packed:
        refs.append(None)                             # x unconstrained
    else:
        refs.append(
            (jnp.arange(sg.lanes, dtype=jnp.int32) // sg.cap
             - sg.xc)[None, :]
        )                                             # last axis (x): lanes
    return refs


def _slot_inside_bin(xs, refs, grid, ci_offset=None):
    """[c_rows, 1, lanes] bool: the slot's CURRENT position still bins into
    the cell the addressing assigned at build (same floor+clip arithmetic
    as neighbors.cell_index, so 'inside' is exactly 'a rebuild would bin
    it identically').  `ci_offset` ([D] int32) is the slab-local index
    shift of a decomposition grid (decomp.py) — refs are LOCAL indices.
    A None ref marks a membership-exempt axis (packed rows: x)."""
    ins = None
    for a in range(xs.shape[1]):
        if refs[a] is None:
            continue
        ci = jnp.floor(
            (xs[:, a, :] - grid.lo[a]) / grid.cell
        ).astype(jnp.int32)
        if ci_offset is not None:
            ci = ci - ci_offset[a]
        ci = jnp.clip(ci, 0, grid.shape[a] - 1)
        eq = ci == refs[a]
        ins = eq if ins is None else ins & eq
    return ins[:, None, :]


def _slot_bin_margin(xs, refs, grid, ci_offset=None):
    """[c_rows, 1, lanes] float: distance to the nearest face of the slot's
    BUILD cell (negative once outside) — the membership side of the auto
    rebuild predicate (predict a bin EXIT, not mere drift).  A None ref
    (packed rows: x) contributes no face — the axis cannot force a
    rebuild."""
    m = None
    for a in range(xs.shape[1]):
        ref = refs[a]
        if ref is None:
            continue
        if ci_offset is not None:
            ref = ref + ci_offset[a]
        lo_c = ref.astype(jnp.float32) * grid.cell + grid.lo[a]
        ma = jnp.minimum(xs[:, a, :] - lo_c, lo_c + grid.cell - xs[:, a, :])
        m = ma if m is None else jnp.minimum(m, ma)
    return m[:, None, :]


def _membership_risky(c, addr, sg, grid, dd2, dt, sort_every, budget,
                      ci_offset=None, extra_margin=None):
    """[c_rows, 1, lanes] bool: the membership rebuild predicate's per-slot
    AND — risky iff the next block's 1.2×-projected move can BOTH take the
    slot out of its build cell (or past `extra_margin`, the decomp slab-face
    distance — leaver strictness) AND past the drift budget.  The ONE
    definition of the lemma's predicate side for the single-chip and decomp
    auto advances (they must never diverge silently)."""
    speed = jnp.sqrt(jnp.sum(c["vs"] * c["vs"], axis=1, keepdims=True))
    move = (1.2 * dt * sort_every) * speed
    refs = _slot_bin_refs(addr, sg)
    marg = _slot_bin_margin(c["xs"], refs, grid, ci_offset)
    if extra_margin is not None:
        marg = jnp.minimum(marg, extra_margin)
    return (
        c["movb"] & (marg < move) & (jnp.sqrt(dd2) + move > budget)
    )


def _membership_bad(bad, xs, addr, sg, grid, ci_offset=None, beyond=None):
    """Relax a strict drift-audit mask by membership: a violation is real
    only once the slot ALSO left its build cell — except where `beyond`
    (the decomp beyond-slab-face mask) holds, which keeps the strict form
    (leaver strictness).  The ONE definition of the lemma's audit side."""
    ins = _slot_inside_bin(xs, _slot_bin_refs(addr, sg), grid, ci_offset)
    keep = ~ins if beyond is None else (~ins | beyond)
    return bad & keep


def make_repair_tools(grid, sg, d, dt, sort_every, budget, repair_k,
                      gather, ci_off=None):
    """(plan, apply) for MINORITY SLOT REPAIR — shared by the single-chip
    and decomp auto advances (see _make_resident_auto_advance's repair_k
    docstring for semantics).  Planned in PARTICLE space: `x0_p` holds
    every particle's BUILD anchor (the shadow's x — callers must advance
    it for repaired particles, see the phantom-risky note in apply), and
    `addr` its slot.  `ci_off` is a decomp slab grid's integer index
    shift; `face_fn(x_now) -> (face_margin, allowed)` lets the decomp
    caller fold slab-face distance into the risky margin (leaver
    strictness) and veto non-interior repairs (a band particle has ghost
    copies on a neighbor whose addressing a local repair cannot patch).
    The risky test is the PARTICLE-space mirror of _membership_risky —
    keep the two in lockstep, incl. the 1.2× projection factor."""
    from sph_tpu import neighbors, pallas_step

    n_codes = sg.h0 * sg.h1
    usable_rows = sg.c_rows - 1
    BIGI = jnp.int32(2**30)
    lane_w = pallas_step.LANE

    def plan(c, x0_p, act0, movable0, face_fn=None):
        addr = c["addr"]
        cap_n = x0_p.shape[0]
        ok = (addr.valid & (addr.row_pos > 0))[:cap_n]
        x_now = gather(c["xs"], d, addr)[:cap_n]               # [N, d]
        v_now = gather(c["vs"], d, addr)[:cap_n]
        speed_p = jnp.sqrt(jnp.sum(v_now * v_now, axis=1))
        move_p = (1.2 * dt * sort_every) * speed_p
        dd = x_now - x0_p                                      # x0 anchors
        drift_p = jnp.sqrt(jnp.sum(dd * dd, axis=1))
        ci0, _ = neighbors.cell_index(x0_p, act0, grid, ci_off)
        if ci_off is not None:
            ci0 = ci0 + ci_off[None, :]                        # global bins
        lo = jnp.asarray(grid.lo, jnp.float32)
        lo_c = lo[None, :] + ci0.astype(jnp.float32) * grid.cell
        margin_p = jnp.min(
            jnp.minimum(x_now - lo_c, lo_c + grid.cell - x_now), axis=1
        )
        allowed = None
        if face_fn is not None:
            face_m, allowed = face_fn(x_now)
            margin_p = jnp.minimum(margin_p, face_m)
        risky = (
            movable0 & ok
            & (margin_p < move_p)
            & (drift_p + move_p > budget)
        )
        n_risky = jnp.sum(risky.astype(jnp.int32))
        pids = jnp.nonzero(risky, size=repair_k, fill_value=cap_n)[0]
        vm = pids < cap_n
        pid_s = jnp.minimum(pids, cap_n - 1)
        x_m = x_now[pid_s]
        old_row = addr.row_pos[pid_s]
        old_pos = addr.pos[pid_s]

        # target cell of each mover = the bin of its CURRENT position
        ci_m, _ = neighbors.cell_index(x_m, vm, grid, ci_off)
        if d == 3:
            code_m = (ci_m[:, 0] + 1) * sg.h1 + (ci_m[:, 1] + 1)
        else:
            code_m = ci_m[:, 0] + 1
        hx_m = ci_m[:, -1] + sg.xc

        # code → compacted row (the build's row_inv, rebuilt from addr)
        iu = jnp.arange(usable_rows, dtype=jnp.int32)
        in_range = iu < addr.n_occ[0]
        targets = jnp.where(in_range, addr.row_code[1:], n_codes)
        row_inv = (
            jnp.zeros((n_codes + 1,), jnp.int32)
            .at[targets]
            .set(jnp.where(in_range, 1 + iu, 0))
        )
        new_row = row_inv[jnp.clip(code_m, 0, n_codes)]

        # free lanes AFTER evicting the movers (so a same-cell re-home can
        # reuse its own lane); j-th mover into a cell takes its j-th free
        occ = (c["xs"][:, 0, :] < 1e17).reshape(-1)
        occ = occ.at[
            jnp.where(vm, old_row * sg.lanes + old_pos, BIGI)
        ].set(False, mode="drop")
        occ3 = occ.reshape(sg.c_rows * sg.h2, sg.cap)
        cumfree = jnp.cumsum((~occ3).astype(jnp.int32), axis=1)
        cellkey = new_row * sg.h2 + hx_m
        key = jnp.where(vm, cellkey, BIGI)
        order = jnp.argsort(key)
        ksort = key[order]
        first = jnp.searchsorted(ksort, ksort, side="left")
        rank = (
            jnp.zeros((repair_k,), jnp.int32)
            .at[order]
            .set(jnp.arange(repair_k, dtype=jnp.int32)
                 - first.astype(jnp.int32))
        )
        rowsel = jnp.clip(cellkey, 0, sg.c_rows * sg.h2 - 1)
        occ_row = occ3[rowsel]                                 # [K, cap]
        cf_row = cumfree[rowsel]
        onehot = (~occ_row) & (cf_row == (rank + 1)[:, None])
        placeable = jnp.any(onehot, axis=1)
        lane_in = jnp.argmax(onehot, axis=1).astype(jnp.int32)
        new_pos = hx_m * sg.cap + lane_in

        can = (
            (n_risky <= repair_k)
            & (n_risky > 0)
            & ~jnp.any(vm & ((new_row == 0) | ~placeable))
        )
        if allowed is not None:
            can = can & ~jnp.any(risky & ~allowed)
        return dict(
            can=can, n_risky=n_risky, pids=pids, vm=vm, x_m=x_m,
            old_row=old_row, old_pos=old_pos,
            new_row=new_row, new_pos=new_pos,
        )

    def apply(c, plan_d):
        """Patched slot planes + addr (pure re-addressing: the particle
        state this carry materializes is bitwise unchanged).  Does NOT
        touch the caller's shadow — the caller must advance shadow.x to
        x_m at the repaired pids, or they stay phantom-risky against
        their old anchors in every later plan."""
        import dataclasses as _dc

        addr = c["addr"]
        vm = plan_d["vm"]
        old_row, old_pos = plan_d["old_row"], plan_d["old_pos"]
        new_row, new_pos = plan_d["new_row"], plan_d["new_pos"]

        def flat(row, col, pos, ncols):
            return jnp.where(
                vm, (row * ncols + col) * sg.lanes + pos, BIGI
            )

        def move(arr, new_vals, old_vals):
            """Per-axis slot move: sentinel the old slots FIRST so a
            same-cell re-home landing on its own lane keeps the value."""
            ncols = arr.shape[1]
            flat_a = arr.reshape(-1)
            for a in range(ncols):
                flat_a = flat_a.at[flat(old_row, a, old_pos, ncols)].set(
                    old_vals[a], mode="drop"
                )
            for a in range(ncols):
                flat_a = flat_a.at[flat(new_row, a, new_pos, ncols)].set(
                    new_vals[a], mode="drop"
                )
            return flat_a.reshape(arr.shape)

        def take(arr, row, pos):
            ncols = arr.shape[1]
            flat_a = arr.reshape(-1)
            return [
                flat_a[jnp.where(vm, (row * ncols + a) * sg.lanes + pos, 0)]
                for a in range(ncols)
            ]

        x_cols = [plan_d["x_m"][:, a] for a in range(d)]
        v_cols = take(c["vs"], old_row, old_pos)
        a_cols = take(c["acc"], old_row, old_pos)
        rp_cols = take(c["rp"], old_row, old_pos)
        far = jnp.full((repair_k,), 1e18, jnp.float32)
        zero = jnp.zeros((repair_k,), jnp.float32)

        xs = move(c["xs"], x_cols, [far] * d)
        vs = move(c["vs"], v_cols, [zero] * d)
        acc = move(c["acc"], a_cols, [zero] * d)
        x0s = move(c["x0s"], x_cols, [far] * d)
        rp = move(c["rp"], rp_cols, [zero, zero])
        movb = move(
            c["movb"],
            [jnp.ones((repair_k,), bool)],
            [jnp.zeros((repair_k,), bool)],
        )

        gfl = addr.gcounts.reshape(-1)
        gfl = gfl.at[
            jnp.where(vm, old_row * sg.n_groups + old_pos // lane_w, BIGI)
        ].add(-1, mode="drop")
        gfl = gfl.at[
            jnp.where(vm, new_row * sg.n_groups + new_pos // lane_w, BIGI)
        ].add(1, mode="drop")
        sidx = jnp.where(vm, plan_d["pids"], BIGI)
        addr2 = _dc.replace(
            addr,
            pos=addr.pos.at[sidx].set(new_pos, mode="drop"),
            row_pos=addr.row_pos.at[sidx].set(new_row, mode="drop"),
            gcounts=gfl.reshape(addr.gcounts.shape),
        )
        return {
            **c, "addr": addr2, "xs": xs, "vs": vs, "acc": acc,
            "x0s": x0s, "rp": rp, "movb": movb,
        }

    return plan, apply


class _SlotPhysics:
    """Elementwise physics in [c_rows, d, lanes] SLOT space — the exact
    per-element arithmetic of physics.gravity_force / wall_penalty_force /
    force_field_force / clamp_boundary (bitwise parity with the
    per-particle layout), shared by the single-chip slot-resident advance
    and the decomp slot-resident block (sph_tpu/decomp.py)."""

    def __init__(self, scene: Scene, grid, sg):
        params = scene.params
        self.scene = scene
        self.params = params
        self.grid = grid
        self.sg = sg
        self.d = params.dim
        self.g3 = jnp.asarray(params.gravity, jnp.float32).reshape(
            1, self.d, 1
        )
        self.lo_w = (
            jnp.asarray(scene.lo, jnp.float32).reshape(1, self.d, 1)
            + params.wall_eps
        )
        self.hi_w = (
            jnp.asarray(scene.hi, jnp.float32).reshape(1, self.d, 1)
            - params.wall_eps
        )

    def body_forces(self, xs, vs, rho_s, f_s, step_i):
        params, d = self.params, self.d
        f = f_s + rho_s * self.g3
        if params.boundary_mode == "penalty":
            k_w, c_w = params.wall_stiffness, params.wall_damping
            d_lo = jnp.maximum(self.lo_w - xs, 0.0)
            d_hi = jnp.maximum(xs - self.hi_w, 0.0)
            f = f + (k_w * d_lo - c_w * vs) * (d_lo > 0) - (
                k_w * d_hi - c_w * (-vs)
            ) * (d_hi > 0)
        for ff in self.scene.force_fields:
            c = jnp.asarray(ff.pos, jnp.float32).reshape(1, d, 1)
            dx = c - xs
            r = jnp.sqrt(jnp.sum(dx * dx, axis=1, keepdims=True))
            fall = jnp.maximum(1.0 - r / ff.radius, 0.0)
            live = jnp.logical_and(
                step_i >= ff.start_step, step_i < ff.stop_step
            ).astype(xs.dtype)
            dirn = dx / jnp.maximum(r, 1e-6)
            f = f + (ff.strength * live) * fall * dirn
        return f

    def clamp_slot(self, xs, vs, movb):
        hit = (xs < self.lo_w) | (xs > self.hi_w)
        vs2 = jnp.where(hit, vs * self.params.boundary_damping, vs)
        xs2 = jnp.clip(xs, self.lo_w, self.hi_w)
        return jnp.where(movb, xs2, xs), jnp.where(movb, vs2, vs)

    def slot_centers(self, addr):
        """[c_rows, d, lanes] fp32 cell centers of every slot, from the
        slot's lane (x cell) and compacted row code (z, y cells) — the
        bf16 cell-relative reference frame (pallas_step._rel_rows uses
        the same lattice on the per-particle side)."""
        grid, sg, d = self.grid, self.sg, self.d
        cell_f = jnp.float32(grid.cell)
        lane_i = jnp.arange(sg.lanes, dtype=jnp.int32)
        cx = jnp.float32(grid.lo[-1]) + (
            ((lane_i // sg.cap) - sg.xc).astype(jnp.float32) + 0.5
        ) * jnp.float32(grid.cell / sg.xsub)  # lane axis: SLOT-cell width
        code = addr.row_code
        shape3 = (sg.c_rows, 1, sg.lanes)
        cx_b = jnp.broadcast_to(cx[None, None, :], shape3)
        if d == 3:
            cz = jnp.float32(grid.lo[0]) + (
                (code // sg.h1).astype(jnp.float32) - 0.5
            ) * cell_f
            cy = jnp.float32(grid.lo[1]) + (
                (code % sg.h1).astype(jnp.float32) - 0.5
            ) * cell_f
            parts = [
                jnp.broadcast_to(cz[:, None, None], shape3),
                jnp.broadcast_to(cy[:, None, None], shape3),
                cx_b,
            ]
        else:
            cy = jnp.float32(grid.lo[0]) + (
                code.astype(jnp.float32) - 0.5
            ) * cell_f
            parts = [jnp.broadcast_to(cy[:, None, None], shape3), cx_b]
        return jnp.concatenate(parts, axis=1)

    def gather(self, slot, ncomp, addr):
        # feature-minor transpose + ONE contiguous row-gather per particle
        # (see pallas_step.slot_rows_view: element-gathers cost per row
        # fetched, so C strided gathers were ~C× this)
        from sph_tpu import pallas_step

        rows = pallas_step.slot_rows_view(slot)
        base = addr.row_pos * self.sg.lanes + addr.pos
        return rows[base][:, :ncomp]

    def mk_feat_builder(self, addr, feat0):
        """feat-refresh closure for a block: bf16 mode rebuilds a
        cell-relative bf16 view each step; fp32 splices xs/vs into the
        block-top feat (pad + flag columns never change)."""
        d, sg = self.d, self.sg
        if self.params.precision == "bf16":
            centers = self.slot_centers(addr)
            zrow = jnp.zeros((sg.c_rows, 3 - d, sg.lanes), jnp.float32)
            z2 = jnp.zeros((sg.c_rows, 2, sg.lanes), jnp.float32)

            def mk_feat(xs_, vs_):
                return jnp.concatenate(
                    [xs_ - centers, zrow, vs_, zrow, z2], axis=1
                ).astype(jnp.bfloat16)

        else:

            def mk_feat(xs_, vs_):
                pad = feat0[:, d : 3, :] * 0.0
                return jnp.concatenate(
                    [xs_, pad, vs_, pad, feat0[:, 6:, :]], axis=1
                )

        return mk_feat


def _make_resident_advance(
    scene: Scene, grid, sg, sort_every: int, blocks: int, skin: float,
    heal: bool = False, membership_audit: bool = True,
):
    """Slot-resident block advance: the particle state LIVES in the slot
    arrays for `sort_every` steps — integration is elementwise in slot
    space — so the per-step costs of the classic path (the N×6 feature
    scatter, the per-particle result gathers, and the sort) are paid once
    per block instead of once per step.  Measured at 1M those three are
    ~110 ms of the 250 ms step; at sort_every=4 they amortize to ~27 ms.

    Bitwise-identical to the non-resident sort_every path while no static
    cap overflows (integration is elementwise — layout-independent — and
    the kernels see identical inputs); tested in test_pallas_equiv.py.
    Semantics at the documented degradation edges:
      - cap/row-overflow particles FREEZE for the block (they are not in
        slots); the classic paths move them ballistically.  Benches assert
        overflow == 0 either way.
      - mid-block emitter activations freeze until the next block top
        (classic sort_every already excludes them from pair physics).

    heal=True — IN-DISPATCH per-block exact fallback (the round-3 form of
    the audited-fallback policy): each block audits its own skin drift and
    build-time cap overflow, and a violating block is re-run from its held
    input state on the per-step-rebuild path (`make_step` on the default
    bare grid) under `lax.cond` — no host round-trip, and the repair cost
    is one block (sort_every steps) instead of the whole dispatch (~25 s
    at 1M for the round-2 host-side policy; VERDICT r2 weakness 5).  The
    returned advance is `advance(state) -> (state, residual_viol, healed)`
    where residual_viol counts violations in blocks that were NOT healed
    (always 0 — every violating block is healed) and healed counts
    repaired blocks.  Healing also makes aggressive static caps safe: a
    cap-8 grid that overflows only in the splash-impact window degrades to
    exact per-step physics for those blocks instead of dropping pairs.
    """
    from sph_tpu import pallas_step, physics

    params = scene.params
    dt = params.dt
    d = params.dim
    half2 = (0.5 * skin) ** 2
    use_mem = membership_audit and sg.xsub == 1
    leap = params.integrator == "leapfrog"
    sp = _SlotPhysics(scene, grid, sg)
    body_forces = sp.body_forces
    clamp_slot = sp.clamp_slot
    gather = sp.gather
    bf16 = params.precision == "bf16"
    if heal:
        # exact per-step rebuild on the DEFAULT bare grid (default cap):
        # identical to the plain `method="pallas"` path, so a healed block
        # is bitwise the classic result regardless of the fast grid's cap
        exact_step = make_step(scene, "pallas")

    @jax.jit
    def advance(state: State):
        def block(carry, _):
            s, viol, healed = carry
            act0 = s.active
            movable0 = act0 & (s.kind == 0)
            addr = pallas_step.build_addr(s.x, act0, grid, sg)
            # per-BLOCK audit (see advance_reuse: per-rebuild cap overflow
            # folds in with the skin-drift violations)
            viol_blk = addr.overflow
            zpad = jnp.zeros((s.capacity, 3 - d), jnp.float32)
            # leapfrog: the block-top HALF-KICK is pre-applied in particle
            # space (identical elementwise arithmetic, just before the
            # scatter instead of after), which deletes the whole 3-col acc
            # scatter — its only consumer was this kick.  Measured ~55 ms
            # per rebuild at 1M (bench log in ROADMAP round-3).
            movf = movable0[:, None].astype(jnp.float32)
            v_in = s.v + (0.5 * dt) * s.acc * movf if leap else s.v
            rows = jnp.concatenate(
                [s.x, zpad, v_in, zpad, movf],
                axis=1,
            )  # 7 cols: x3 | v_half3 | movable
            feat = pallas_step.scatter_slots(addr, rows, sg)
            xs = feat[:, 0:d, :]
            vs = feat[:, 3 : 3 + d, :]
            movb = feat[:, 6:7, :] > 0
            mov = movb.astype(jnp.float32)
            x0 = xs
            # kernels see a per-step view rebuilt from xs/vs (bf16 mode: a
            # cell-relative bf16 view; the fp32 state never leaves fp32)
            mk_feat = sp.mk_feat_builder(addr, feat)
            acc_s = None  # post-force only; the i=0 kick already happened
            a_s = jnp.zeros_like(xs)
            rp = None
            for i in range(sort_every):
                step_i = s.step + i
                if leap:
                    if i > 0:
                        vs = vs + (0.5 * dt) * acc_s * mov
                    xs = xs + dt * vs * mov
                    feat = mk_feat(xs, vs)
                    rp = pallas_step._call_density(feat, addr, sg, params)
                    f_s = pallas_step._call_force(feat, rp, addr, sg, params)
                    rho_s = rp[:, 0:1, :]
                    f_tot = body_forces(
                        xs, vs, rho_s, f_s[:, 0:d, :], step_i
                    )
                    a_s = jnp.where(
                        movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0
                    )
                    vs = vs + (0.5 * dt) * a_s
                    acc_s = a_s
                else:
                    feat = mk_feat(xs, vs)
                    rp = pallas_step._call_density(feat, addr, sg, params)
                    f_s = pallas_step._call_force(feat, rp, addr, sg, params)
                    rho_s = rp[:, 0:1, :]
                    f_tot = body_forces(
                        xs, vs, rho_s, f_s[:, 0:d, :], step_i
                    )
                    a_s = jnp.where(
                        movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0
                    )
                    vs = vs + dt * a_s * mov
                    xs = xs + dt * vs * mov
                if params.boundary_mode == "clamp":
                    xs, vs = clamp_slot(xs, vs, movb)
                dd = xs - x0
                drift2 = jnp.sum(dd * dd, axis=1, keepdims=True)
                bad_i = (drift2 > half2) & movb
                if use_mem:
                    # membership-relaxed: drift past skin/2 is only a real
                    # violation once the particle ALSO left its build cell
                    bad_i = bad_i & ~_slot_inside_bin(
                        xs, _slot_bin_refs(addr, sg), grid
                    )
                viol_blk = viol_blk + jnp.sum(bad_i.astype(jnp.int32))

            # one set of element-gathers per BLOCK materializes the State
            ok = addr.valid & (addr.row_pos > 0)
            x_g = gather(xs, d, addr)
            v_g = gather(vs, d, addr)
            a_g = gather(a_s, d, addr)
            rho_g = gather(rp, 1, addr)[:, 0]
            okc = ok[:, None]
            rho_p = jnp.where(ok & act0, rho_g, s.rho)
            out = State(
                x=jnp.where(okc, x_g, s.x),
                v=jnp.where(okc, v_g, s.v),
                acc=jnp.where(okc & movable0[:, None], a_g, s.acc),
                rho=rho_p,
                p=jnp.where(
                    ok & act0, physics.eos_pressure(rho_p, params), s.p
                ),
                kind=s.kind,
                emit_step=s.emit_step,
                step=s.step + sort_every,
            )
            if heal:
                def run_exact(s_):
                    for _ in range(sort_every):
                        s_ = exact_step(s_)
                    return s_

                bad = viol_blk > 0
                out = jax.lax.cond(bad, run_exact, lambda _s: out, s)
                healed = healed + bad.astype(jnp.int32)
            else:
                viol = viol + viol_blk
            return (out, viol, healed), None

        (out, viol, healed), _ = jax.lax.scan(
            block, (state, jnp.int32(0), jnp.int32(0)), length=blocks
        )
        if heal:
            return out, viol, healed
        return out, viol

    return advance


def _make_resident_auto_advance(
    scene: Scene, grid, sg, sort_every: int, blocks: int, skin: float,
    rebuild_frac: float = 1.0, reactive_theta: float | None = None,
    membership_audit: bool = True, repair_k: int = 0,
    packed_scatter: bool = False,
):
    """AUTO-REBUILD slot-resident advance (round 3): the state stays in
    the slot arrays ACROSS block boundaries, and the
    build_addr + scatter + materialize rebuild (99 ms at 1M — the whole
    non-kernel budget) runs only when actually needed:

      - the Verlet drift budget is half-spent (max drift² over slots >
        (rebuild_frac · skin/2)² — rebuild BEFORE the skin/2 validity
        bound is threatened), or
      - an emitter activated since the last build (its particle is not in
        slots yet; the rebuild lands it within ≤ sort_every steps of its
        schedule, the same latency as the classic resident block).

    The effective rebuild interval is velocity-adaptive: k_eff ≈
    rebuild_frac·skin / (2·sort_every·dt·v_max) blocks — calm phases
    stretch to 3-5× sort_every, violent phases rebuild every block
    (= the classic behavior).  Exactness is unchanged: the per-step audit
    still checks cumulative drift against skin/2 from the LAST BUILD, and
    a violating block re-runs exactly per-step-rebuild under lax.cond
    (heal — always on here), so a tail particle outrunning the budget
    costs one healed block, never silent physics.

    reactive_theta: REACTIVE rebuild policy — rebuild when MEASURED max
    drift crosses `reactive_theta * skin/2`, with NO velocity
    projection; the heal is the exactness backstop when a block still
    overruns the full budget.  Rationale (bench/probe_r3h.py): at
    settle the velocity projection alone (1.2 * max|v| * dt * k ≈ 0.71
    at the 1M preset, vs budget 0.72) trips EVERY block on acoustic
    oscillation of a fast minority whose actual drift stays bounded by
    the oscillation amplitude — no projection from instantaneous (or
    even per-block-displacement) data can distinguish an oscillator
    from ballistic transport within one block, so the only way to
    stretch the rebuild interval there is to trust the in-block audit.
    Wins iff heals stay rarer than ~(rebuild_cost/heal_cost) per block.

    membership_audit (default True): the membership-relaxed audit and
    its per-slot AND rebuild predicate (see the module-level notes above
    _slot_bin_refs) — a drift violation is only real, and a rebuild only
    needed, when a particle ALSO leaves (is predicted to leave) its
    build cell.  This is what actually defuses the settle-phase
    oscillators that reactive_theta was aimed at: they keep drift >
    skin/2 but never exit their cells, so neither the audit nor the
    predicate fires, with physics provably unchanged.  False restores
    the strict round-3 drift-only forms (A/B measurement knob).

    repair_k (> 0, requires membership_audit + xsub == 1 + fp32):
    MINORITY SLOT REPAIR — when the predicate fires on at most repair_k
    risky particles (a fast minority outrunning the budget while the
    bulk stays valid), re-home JUST THOSE into free slots of the cells
    their CURRENT positions bin into, inside the existing addressing —
    old slots are re-sentineled, their x0 resets to the new position,
    and addr.pos/row_pos/gcounts are patched — instead of paying the
    full build_addr + scatter + materialize rebuild (~99 ms at 1M).
    Repair is PURE RE-ADDRESSING: the particle state it materializes is
    bitwise unchanged (tested); subsequent kernel sums differ from a
    fresh rebuild only in within-cell summation order, exactly like the
    heal path already does.  Falls back to the full rebuild whenever it
    cannot re-home exactly: an emitter activated, more than repair_k
    risky particles, a target row not in the compacted set, or a target
    cell with no free slot.  Default 0 (off) until measured on TPU.

    Returns `advance(state) -> (state, residual_viol(=0), healed,
    rebuilds)`, plus a trailing `repaired_blocks` counter when
    repair_k > 0."""
    from sph_tpu import pallas_step, physics

    params = scene.params
    dt = params.dt
    d = params.dim
    half2 = (0.5 * skin) ** 2
    use_mem = membership_audit and sg.xsub == 1
    # predictive rebuild bound: rebuild when current drift plus a 1.2×
    # projection of the NEXT block's drift (from the max slot speed)
    # would cross rebuild_frac of the skin/2 validity budget — so calm
    # phases stretch the reuse span and fast phases rebuild on time
    # instead of healing from budget overruns.  rebuild_frac=0 forces a
    # rebuild at every moving block (the bitwise-vs-classic test knob).
    # Under the membership-relaxed audit the predicate sharpens to a
    # per-slot AND: rebuild only when some slot is BOTH about to exit its
    # build cell (margin < projected move) AND about to exceed the drift
    # budget — a settle-phase oscillator fails the first or second clause
    # and stops forcing a rebuild every block (bench/probe_r3h.py).
    budget = rebuild_frac * 0.5 * skin if rebuild_frac > 0 else 0.0
    leap = params.integrator == "leapfrog"
    if repair_k:
        if not use_mem:
            raise ValueError(
                "repair_k requires membership_audit=True and xsub == 1"
            )
        if params.precision == "bf16":
            raise ValueError("repair_k does not support precision='bf16'")
        if reactive_theta is not None or rebuild_frac <= 0:
            raise ValueError(
                "repair_k composes with the membership predicate only "
                "(reactive_theta=None, rebuild_frac > 0)"
            )
    sp = _SlotPhysics(scene, grid, sg)
    body_forces = sp.body_forces
    clamp_slot = sp.clamp_slot
    gather = sp.gather
    exact_step = make_step(scene, "pallas")   # heal path, default bare grid

    def enter_slots(s: State):
        """Particle state → slot residency (build + scatter), the classic
        block-top sequence.  The leapfrog half-kick is pre-applied in
        particle space (bitwise-equal elementwise arithmetic), and acc/
        rho/p are NOT scattered: the first block's kick is already done,
        the first density pass overwrites rp before any consumer reads
        it, and materialize falls back to the shadow for both until a
        block has run (`live` flag) — deleting two of the three scatter
        passes per rebuild (measured ~55 + ~46 ms at 1M).

        packed_scatter: transport x/v through PACKED bf16-pair columns
        (pallas_step.scatter_slots_packed) — 7 scatter columns become 4
        (3D) / 3 (2D); the slot arrays are unpacked back to fp32 right
        after, so the kernels are unchanged.  x packs CELL-RELATIVE
        (addr.center, the same frame as precision="bf16"): one bf16
        round-trip costs ~0.4% of a cell of position (~quantum 2⁻⁸·cell)
        and ~0.4% relative of v, ONCE PER REBUILD — an experiment knob
        (default off), measured in bench/probe_r4c.py."""
        act0 = s.active
        movable0 = act0 & (s.kind == 0)
        addr = pallas_step.build_addr(s.x, act0, grid, sg)
        movf = movable0[:, None].astype(jnp.float32)
        v_in = s.v + (0.5 * dt) * s.acc * movf if leap else s.v
        if packed_scatter:
            pk = pallas_step.pack2bf16
            xr = s.x - addr.center
            halves = [xr[:, i] for i in range(d)] + \
                     [v_in[:, i] for i in range(d)]
            cols = [pk(halves[2 * i], halves[2 * i + 1])
                    for i in range(d)] + [movf[:, 0]]
            rows_p = jnp.stack(cols, axis=1)
            # background: x halves unpack FAR (1e18 ≈ the _init_row
            # sentinel: phantom slots annihilate by distance), v/mov 0
            far = jnp.float32(1e18)
            bg_halves = [far] * d + [jnp.float32(0.0)] * d
            bg = jnp.stack(
                [pk(bg_halves[2 * i], bg_halves[2 * i + 1])
                 for i in range(d)] + [jnp.float32(0.0)]
            )
            packed = pallas_step.scatter_slots_packed(addr, rows_p, sg, bg)
            up = [pallas_step.unpack2bf16(packed[:, i, :])
                  for i in range(d)]
            flat = [h for pair in up for h in pair]
            centers = sp.slot_centers(addr)
            xs = jnp.stack(flat[:d], axis=1) + centers
            vs = jnp.stack(flat[d:], axis=1)
            movb = packed[:, d:d + 1, :] > 0
        else:
            zpad = jnp.zeros((s.capacity, 3 - d), jnp.float32)
            rows = jnp.concatenate(
                [s.x, zpad, v_in, zpad, movf],
                axis=1,
            )
            feat = pallas_step.scatter_slots(addr, rows, sg)
            xs = feat[:, 0:d, :]
            vs = feat[:, 3 : 3 + d, :]
            movb = feat[:, 6:7, :] > 0
        acc_s = jnp.zeros_like(xs)  # i=0's kick is pre-applied: +0 no-op
        rp = jnp.zeros((sg.c_rows, 2, sg.lanes), jnp.float32)
        return dict(
            addr=addr, xs=xs, vs=vs, acc=acc_s, movb=movb, x0s=xs, rp=rp,
            shadow=s, build_step=s.step, pend_over=addr.overflow,
            live=jnp.bool_(False),
        )

    def materialize(c) -> State:
        """Slots → particle State at the carry's current step (non-slotted
        particles keep their shadow values — same fallback semantics as
        the classic resident block).  Until a block has run (`live`),
        slot acc/rho/p are placeholders (enter_slots skips those
        scatters) and the shadow — exactly current at that point — is
        the source of truth."""
        addr, s = c["addr"], c["shadow"]
        live = c["live"]
        act0 = s.active
        movable0 = act0 & (s.kind == 0)
        ok = (addr.valid & (addr.row_pos > 0)) & live
        x_g = gather(c["xs"], d, addr)
        v_g = gather(c["vs"], d, addr)
        a_g = gather(c["acc"], d, addr)
        rho_g = gather(c["rp"], 1, addr)[:, 0]
        okc = ok[:, None]
        rho_p = jnp.where(ok & act0, rho_g, s.rho)
        return State(
            x=jnp.where(okc, x_g, s.x),
            v=jnp.where(okc, v_g, s.v),
            acc=jnp.where(okc & movable0[:, None], a_g, s.acc),
            rho=rho_p,
            p=jnp.where(
                ok & act0, physics.eos_pressure(rho_p, params), s.p
            ),
            kind=s.kind,
            emit_step=s.emit_step,
            step=s.step,
        )

    def run_block(c):
        """sort_every slot-space steps from the carry; returns the updated
        slot arrays + the block's drift-audit count."""
        addr, movb = c["addr"], c["movb"]
        mov = movb.astype(jnp.float32)
        xs, vs, acc_s = c["xs"], c["vs"], c["acc"]
        x0s = c["x0s"]
        step0 = c["shadow"].step
        # fp32 feat tail: movable flag col + zero spare col
        tail = jnp.concatenate(
            [mov, jnp.zeros_like(mov)], axis=1
        )
        zrow = jnp.zeros((sg.c_rows, 3 - d, sg.lanes), jnp.float32)

        def mk_feat(xs_, vs_):
            return jnp.concatenate([xs_, zrow, vs_, zrow, tail], axis=1)

        if params.precision == "bf16":
            centers = sp.slot_centers(addr)

            def mk_feat(xs_, vs_):  # noqa: F811
                return jnp.concatenate(
                    [xs_ - centers, zrow, vs_, zrow,
                     jnp.zeros((sg.c_rows, 2, sg.lanes), jnp.float32)],
                    axis=1,
                ).astype(jnp.bfloat16)

        viol_blk = jnp.int32(0)
        a_s = acc_s
        rp = c["rp"]
        for i in range(sort_every):
            step_i = step0 + i
            if leap:
                vs = vs + (0.5 * dt) * acc_s * mov
                xs = xs + dt * vs * mov
                feat = mk_feat(xs, vs)
                rp = pallas_step._call_density(feat, addr, sg, params)
                f_s = pallas_step._call_force(feat, rp, addr, sg, params)
                rho_s = rp[:, 0:1, :]
                f_tot = body_forces(xs, vs, rho_s, f_s[:, 0:d, :], step_i)
                a_s = jnp.where(movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0)
                vs = vs + (0.5 * dt) * a_s
                acc_s = a_s
            else:
                feat = mk_feat(xs, vs)
                rp = pallas_step._call_density(feat, addr, sg, params)
                f_s = pallas_step._call_force(feat, rp, addr, sg, params)
                rho_s = rp[:, 0:1, :]
                f_tot = body_forces(xs, vs, rho_s, f_s[:, 0:d, :], step_i)
                a_s = jnp.where(movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0)
                vs = vs + dt * a_s * mov
                xs = xs + dt * vs * mov
                acc_s = a_s   # materialized State.acc (Euler ignores it)
            if params.boundary_mode == "clamp":
                xs, vs = clamp_slot(xs, vs, movb)
            dd = xs - x0s
            drift2 = jnp.sum(dd * dd, axis=1, keepdims=True)
            bad_i = (drift2 > half2) & movb
            if use_mem:
                bad_i = _membership_bad(bad_i, xs, addr, sg, grid)
            viol_blk = viol_blk + jnp.sum(bad_i.astype(jnp.int32))
        return xs, vs, acc_s, rp, viol_blk

    def bump_step(s: State, k: int) -> State:
        return State(
            x=s.x, v=s.v, acc=s.acc, rho=s.rho, p=s.p, kind=s.kind,
            emit_step=s.emit_step, step=s.step + k,
        )

    # ---- minority slot repair (repair_k > 0): the shared tools
    # (make_repair_tools) + the single-chip shadow-anchor advance --------
    if repair_k:
        _plan_t, _apply_t = make_repair_tools(
            grid, sg, d, dt, sort_every, budget, repair_k, gather
        )

        def _plan_repair(c):
            s = c["shadow"]
            act0 = s.active
            return _plan_t(c, s.x, act0, act0 & (s.kind == 0))

        def _apply_repair(c, plan):
            import dataclasses as _dc

            c2 = _apply_t(c, plan)
            # Advance the repaired particles' plan anchors (shadow.x ==
            # x0 in _plan_repair): stale anchors leave them phantom-
            # risky against their OLD cell forever, and the next `need`
            # degenerates to a full rebuild once phantoms exceed
            # repair_k.  Safe: materialize/heal read shadow.x only for
            # non-slotted or pre-live particles (movers are slotted; at
            # the pre-live first block x_m == shadow.x → patch no-op).
            sh = c["shadow"]
            sidx = jnp.where(plan["vm"], plan["pids"], jnp.int32(2**30))
            shadow2 = _dc.replace(
                sh, x=sh.x.at[sidx].set(plan["x_m"], mode="drop")
            )
            return {**c2, "shadow": shadow2}

    @jax.jit
    def advance(state: State):
        carry0 = enter_slots(state)
        carry0.update(viol=jnp.int32(0), healed=jnp.int32(0),
                      rebuilds=jnp.int32(1))
        if repair_k:
            carry0.update(repairs=jnp.int32(0))

        def block(c, _):
            s_step = c["shadow"].step
            emit = c["shadow"].emit_step
            dd = c["xs"] - c["x0s"]
            dd2 = jnp.sum(dd * dd, axis=1, keepdims=True)
            drift_now = jnp.sqrt(jnp.max(dd2))
            activated = jnp.any((emit > c["build_step"]) & (emit <= s_step))
            if reactive_theta is not None:
                need = (drift_now > reactive_theta * 0.5 * skin) | activated
            elif use_mem and rebuild_frac > 0:
                # per-slot AND predicate (see budget note above): a slot is
                # risky only if the next block's 1.2×-projected move can
                # BOTH take it out of its build cell AND past the budget
                risky = _membership_risky(
                    c, c["addr"], sg, grid, dd2, dt, sort_every, budget
                )
                need = jnp.any(risky) | activated
            else:
                vmax = jnp.sqrt(
                    jnp.max(jnp.sum(c["vs"] * c["vs"], axis=1))
                )
                predicted = drift_now + 1.2 * vmax * dt * sort_every
                need = (predicted > budget) | activated

            def counters(c_, healed=0, rebuilds=0, repairs=0):
                out = {
                    "viol": c_["viol"],
                    "healed": c_["healed"] + healed,
                    "rebuilds": c_["rebuilds"] + rebuilds,
                }
                if repair_k:
                    out["repairs"] = c_["repairs"] + repairs
                return out

            def rebuild(c):
                fresh = enter_slots(materialize(c))
                return {**fresh, **counters(c, rebuilds=1)}

            if repair_k:
                def fix(c_):
                    plan = _plan_repair(c_)

                    def do_repair(cp):
                        c2 = _apply_repair(cp[0], cp[1])
                        return {**c2, **counters(cp[0], repairs=1)}

                    return jax.lax.cond(
                        plan["can"] & ~activated, do_repair,
                        lambda cp: rebuild(cp[0]), (c_, plan),
                    )

                c = jax.lax.cond(need, fix, lambda c_: c_, c)
            else:
                c = jax.lax.cond(need, rebuild, lambda c_: c_, c)

            top = (c["xs"], c["vs"], c["acc"], c["rp"])
            xs, vs, acc_s, rp, viol_blk = run_block(c)
            viol_blk = viol_blk + c["pend_over"]

            ok_carry = {
                **c,
                "xs": xs, "vs": vs, "acc": acc_s, "rp": rp,
                "shadow": bump_step(c["shadow"], sort_every),
                "pend_over": jnp.int32(0),
                "live": jnp.bool_(True),  # slot acc/rp real from now on
            }

            def heal(c_top):
                """Exact per-step re-run of this block from its held slot
                top, then fresh residency (default bare grid steps —
                bitwise the classic pallas path)."""
                c2 = {**c, "xs": c_top[0], "vs": c_top[1],
                      "acc": c_top[2], "rp": c_top[3]}
                sm = materialize(c2)
                for _ in range(sort_every):
                    sm = exact_step(sm)
                fresh = enter_slots(sm)
                return {**fresh, **counters(c, healed=1, rebuilds=1)}

            bad = viol_blk > 0
            out = jax.lax.cond(bad, heal, lambda _t: ok_carry, top)
            return out, None

        final, _ = jax.lax.scan(block, carry0, length=blocks)
        outs = (
            materialize(final), final["viol"], final["healed"],
            final["rebuilds"],
        )
        if repair_k:
            outs = outs + (final["repairs"],)
        return outs

    return advance


def make_advance(
    scene: Scene, method: str = "naive", steps_per_dispatch: int = 100,
    grid=None, sort_every: int = 1, skin: float | None = None,
    slot_resident: bool = False, xsub: int = 1, xb_cells: int = 4,
    heal: bool = False, row_pair: bool = False,
    auto_rebuild: bool = False, rebuild_frac: float = 1.0,
    reactive_theta: float | None = None, membership_audit: bool = True,
    repair_k: int = 0, packed_scatter: bool = False,
    packed_rows: bool = False, row_lanes: int | None = None,
):
    """jitted `advance(state) -> state` running S steps in one `lax.scan`.

    For method="pallas", S is clamped to MAX_PALLAS_STEPS_PER_DISPATCH (see
    above); drive longer horizons with multiple dispatches (`run` does).
    sort_every > 1 (pallas): Verlet-skin addr reuse — the returned advance
    is `advance(state) -> (state, skin_violation_count)`.
    slot_resident (pallas, sort_every > 1): integrate IN slot space so
    scatter/gather/sort all amortize 1/sort_every (see
    _make_resident_advance); bitwise-identical to the non-resident reuse
    path while no static cap overflows.
    heal (slot_resident only): in-dispatch per-block exact fallback — a
    block whose skin/cap audit fires re-runs per-step-rebuild under
    lax.cond; advance then returns (state, residual_viol, healed_blocks)
    with residual_viol always 0 (see _make_resident_advance)."""
    if method == "pallas":
        steps_per_dispatch = min(
            steps_per_dispatch, MAX_PALLAS_STEPS_PER_DISPATCH
        )
    if slot_resident and sort_every <= 1:
        raise ValueError("slot_resident requires sort_every > 1")
    if heal and not slot_resident:
        raise ValueError("heal requires slot_resident=True")
    if auto_rebuild and not slot_resident:
        raise ValueError("auto_rebuild requires slot_resident=True")
    if packed_scatter:
        if not auto_rebuild:
            raise ValueError(
                "packed_scatter is the auto-rebuild transport experiment "
                "(requires auto_rebuild=True)"
            )
        if scene.params.precision == "bf16":
            raise ValueError(
                "packed_scatter composes with fp32 features only "
                "(precision='bf16' already transports bf16 rows)"
            )
    if packed_rows:
        # packed-row sparse-scene layout (pallas_step.SlotGrid.packed):
        # measured 3.05× the slot kernels at the settled emitters3d
        # (bench/probe_r5b.py) and 2.5× WORSE at the dense 1M — callers
        # gate it per scene/state.  Composes with the slot-structure-
        # agnostic machinery only.
        if method != "pallas":
            raise ValueError("packed_rows requires method='pallas'")
        if xsub != 1 or row_pair or packed_scatter:
            raise ValueError(
                "packed_rows does not compose with xsub, row_pair, or "
                "packed_scatter"
            )
        if scene.params.precision == "bf16":
            raise ValueError("packed_rows requires fp32 features")
        if repair_k:
            raise ValueError(
                "packed_rows does not support minority slot repair "
                "(repair re-homing is per-cell-slot addressing)"
            )
    if sort_every > 1:
        # Addr reuse with a Verlet skin (SURVEY.md §7 hard-part 2, arXiv
        # 1804.06231 pattern): build the slot addressing every `sort_every`
        # steps from cells of size h+skin; scatter fresh positions into the
        # CACHED slots each step.  Exact while every particle moves < skin/2
        # within the reuse window (the compact-support window then still
        # covers every r < h pair); the returned `advance` reports the
        # count of violations of that bound so callers can reject/re-tune
        # (bench.py asserts it is 0).  Mid-window emitter activations stay
        # out of pair physics until the next rebuild (≤ sort_every steps,
        # ballistic under gravity) — use sort_every=1 for emitter scenes
        # where that matters.
        if method != "pallas":
            raise ValueError("sort_every > 1 requires method='pallas'")
        from sph_tpu import neighbors, pallas_step

        if grid is not None and skin is None:
            # the audit's drift bound must describe the grid actually used:
            # a caller-supplied grid carries its skin as cell − h
            skin = grid.cell - scene.params.h
            if skin <= 0:
                raise ValueError(
                    "sort_every > 1 with a caller-supplied grid requires "
                    "skinned cells (GridSpec.for_scene(..., skin=...)); "
                    f"got cell == {grid.cell} for h == {scene.params.h} — "
                    "addr reuse would be exact only at zero drift"
                )
        if skin is None:
            skin = default_skin(scene, sort_every)
        if grid is None:
            base = neighbors.GridSpec.for_scene(scene)
            grid = neighbors.GridSpec.for_scene(
                scene, cap=base.cap, skin=skin, xsub=xsub
            )
        # per-xb-batch i-occupancy skip for emitter scenes: jet droplets
        # fragment the compacted rows, so near-empty 64-lane groups pay
        # full window math (ROADMAP round-5 queue 1 diagnosis).  Exact per
        # PARTICLE: skipped batches hold only never-gathered background
        # lanes (their rho/p never feed the force kernel either — far
        # pairs zero s/t), though raw slot arrays may differ on phantom
        # lanes (see SlotGrid.batch_skip).  Wash on dense dams (round-2
        # measurement), so gated to emitter scenes.  bf16 features are
        # cell-relative — the 1e18 background test fails.
        batch_skip = (bool(scene.emitters)
                      and scene.params.precision != "bf16"
                      and not packed_rows)
        if packed_rows:
            sg = pallas_step.packed_grid(grid, row_lanes)
        else:
            sg = pallas_step.slot_grid(grid, xb_cells=xb_cells,
                                       row_pair=row_pair,
                                       batch_skip=batch_skip)
        blocks, rem = divmod(steps_per_dispatch, sort_every)
        if rem:
            raise ValueError(
                f"steps_per_dispatch={steps_per_dispatch} must be a "
                f"multiple of sort_every={sort_every}"
            )
        if slot_resident:
            if auto_rebuild:
                return _make_resident_auto_advance(
                    scene, grid, sg, sort_every, blocks, skin,
                    rebuild_frac=rebuild_frac,
                    reactive_theta=reactive_theta,
                    membership_audit=membership_audit,
                    repair_k=repair_k,
                    packed_scatter=packed_scatter,
                )
            return _make_resident_advance(
                scene, grid, sg, sort_every, blocks, skin, heal=heal,
                membership_audit=membership_audit,
            )
        step_a = make_step(scene, "pallas", grid=grid, with_addr=True,
                           row_pair=row_pair, packed_rows=packed_rows,
                           row_lanes=row_lanes)
        half2 = (0.5 * skin) ** 2
        use_mem = membership_audit and grid.xsub == 1

        @jax.jit
        def advance_reuse(state: State):
            def body(carry, _):
                s, viol = carry
                x0, act0 = s.x, s.active
                addr = pallas_step.build_addr(x0, act0, grid, sg)
                # fold BUILD-TIME cap overflow in with the skin violations:
                # both mean silently-degraded physics, and a mid-run
                # compression spike would escape a final-state-only audit
                viol = viol + addr.overflow
                if use_mem:
                    _, flat0 = neighbors.cell_index(x0, act0, grid)
                for _ in range(sort_every):
                    s = step_a(s, addr)
                    d = s.x - x0
                    drift2 = jnp.sum(d * d, axis=1)
                    bad_i = (drift2 > half2) & act0
                    if use_mem:
                        # membership-relaxed audit (see _slot_inside_bin):
                        # drift past skin/2 only degrades physics once the
                        # particle also bins outside its BUILD cell
                        _, flat_i = neighbors.cell_index(s.x, act0, grid)
                        bad_i = bad_i & (flat_i != flat0)
                    viol = viol + jnp.sum(bad_i.astype(jnp.int32))
                return (s, viol), None

            (out, viol), _ = jax.lax.scan(
                body, (state, jnp.int32(0)), length=blocks
            )
            return out, viol

        return advance_reuse
    if grid is None and method == "pallas" and xsub > 1:
        from sph_tpu import neighbors

        grid = neighbors.GridSpec.for_scene(scene, xsub=xsub)
    step = make_step(scene, method, grid=grid,
                     row_pair=row_pair and method == "pallas",
                     packed_rows=packed_rows, row_lanes=row_lanes)

    @jax.jit
    def advance(state: State) -> State:
        def body(s, _):
            return step(s), None

        out, _ = jax.lax.scan(body, state, length=steps_per_dispatch)
        return out

    return advance


#: Production default for the minority-repair budget (repair_k): measured
#: at the settled 1M splash (bench/probe_r3h.py part 3, the regime where
#: repair matters — the ballistic fast tail forces rebuilds ~every other
#: block): rep2048 runs 52.0 ms/step vs 64.0 strict (1.23×, rebuilds
#: 25/40 → 7/40, zero heals, zero violations); rep512 under-covers
#: (55.1), rep8192 buys nothing more (52.3).  From-init neutrality
#: (calm phase, the driver-ladder regime) measured in bench/probe_r3i.py.
DEFAULT_REPAIR_K = 2048

#: Packed-row auto-policy occupancy ceiling (make_audited_advance
#: packed_rows=None): run the packed layout only while mean cell
#: occupancy is at most this.  Measured anchors: 2.16 → packed kernels
#: 3.05× FASTER (settled emitters3d, bench/probe_r5b.py); 7.38 → modeled
#: 2.5× slower (settled 1M); ~4.4 models a slot win (dam2d).
PACKED_MAX_OCC = 3.5

def packed_fits(scene: Scene, state: State, sort_every: int = 4,
                row_lanes: int | None = None) -> bool:
    """Host-side occupancy probe for the packed-row auto policy: True iff
    `state` is sparse enough for the packed layout (mean cell occupancy ≤
    PACKED_MAX_OCC on the production skinned lattice, and the worst (z,)y
    row fits the static row_lanes with 2× headroom).  Shared by
    make_audited_advance(packed_rows=None) and bench.py so the ladder
    measures exactly the shipped policy."""
    import numpy as _np

    from sph_tpu import neighbors, pallas_step

    skin_p = default_skin(scene, sort_every)
    base_g = neighbors.GridSpec.for_scene(scene)
    grid_p = neighbors.GridSpec.for_scene(scene, cap=base_g.cap, skin=skin_p)
    rl_eff = pallas_step.packed_grid(grid_p, row_lanes).row_lanes
    x = _np.asarray(state.x)
    act = _np.asarray(state.active)
    xa = x[act]
    if xa.shape[0] == 0:
        return True
    cell = grid_p.cell
    lo = _np.asarray(scene.lo, _np.float64)
    ci = _np.floor(
        (xa.astype(_np.float64) - lo[None, :] + cell) / cell
    ).astype(_np.int64)
    mx = ci.max(0) + 2
    key = ci[:, 0]
    for a in range(1, ci.shape[1]):
        key = key * mx[a] + ci[:, a]
    occ = _np.bincount(_np.unique(key, return_inverse=True)[1])
    rows = _np.bincount(_np.unique(key // mx[-1], return_inverse=True)[1])
    return (float(occ.mean()) <= PACKED_MAX_OCC
            and int(rows.max()) * 2 <= rl_eff)


#: Smallest problem size where the repair default pays (bench/probe_r4a.py,
#: round 4, from init): at 10k-2D the plan/apply machinery fires 16/25
#: blocks for a 20% LOSS (1.204 vs 1.006 ms/step rep0) — rebuilds are
#: ~free at that scale so repair can only cost; at 100k it is neutral
#: (3D: 0 repairs fire; 2D: −0.7%), and at the settled 1M it wins 1.23×
#: (probe H).  Below this estimated n the default resolves to 0.
REPAIR_MIN_N = 32768

#: CONSTANT-HEAL DEMOTION (round 5, from the vortex2d soak): a healed
#: block pays the failed fast attempt PLUS the exact per-step re-run, so
#: a scene whose flow PERMANENTLY outruns the Verlet drift budget (the
#: rotating stir holds max|v| ≈ 1200 above it — every block healed,
#: 25/25, for 3800+ straight steps) is strictly better served by the
#: plain per-step path: bitwise the same trajectory (run_exact IS the
#: per-step step), minus the wasted attempts.  After DEMOTE_PATIENCE
#: consecutive all-blocks-healed dispatches the audited advance demotes
#: to per-step; every PERSTEP_REPROBE_EVERY demoted dispatches it
#: re-probes the fast path once (heal keeps the probe exact, so a calming
#: scene recovers the fast path for ~2% steady overhead).
DEMOTE_PATIENCE = 2
PERSTEP_REPROBE_EVERY = 50


def _seed_estimate(scene: Scene) -> int:
    """Host-side problem-size estimate: explicit capacity, else the
    lattice count the scene's blocks would seed (same pitch as init)."""
    if scene.capacity:
        return int(scene.capacity)
    s = scene.spacing or scene.params.h * 0.55
    total = 0
    for b in scene.blocks:
        cells = 1
        for lo, hi in zip(b.lo, b.hi):
            cells *= max(1, int((hi - lo) / s))
        total += cells
    return total


def default_repair_k(
    scene: Scene, *, auto: bool, membership_audit: bool = True,
    xsub: int = 1, reactive_theta: float | None = None,
    row_pair: bool = False, packed_rows: bool = False,
) -> int:
    """Resolve repair_k=None (the production surfaces' default) to
    DEFAULT_REPAIR_K wherever minority slot repair is supported AND the
    scene is large enough for repair to pay (REPAIR_MIN_N), else 0:
    repair composes with the membership-relaxed audit only (auto-rebuild
    resident path, xsub == 1, fp32 features, no reactive policy), and the
    row-pair kernel layout is excluded because make_repair_tools patches
    single-row compacted addressing."""
    ok = (
        auto and membership_audit and xsub == 1 and not row_pair
        and not packed_rows
        and reactive_theta is None
        and scene.params.precision != "bf16"
        and _seed_estimate(scene) >= REPAIR_MIN_N
    )
    return DEFAULT_REPAIR_K if ok else 0


def make_audited_advance(
    scene: Scene, method: str, steps_per_dispatch: int,
    sort_every: int = 1, slot_resident: bool = False, xsub: int = 1,
    grid=None, adaptive_cap: bool = False, row_pair: bool = False,
    auto_rebuild: bool = True, reactive_theta: float | None = None,
    membership_audit: bool = True, repair_k: int | None = None,
    packed_rows: bool | None = None, row_lanes: int | None = None,
):
    """`advance(state) -> state` with the fast path's safety policy built
    in: when the skin/cap audit fires (e.g. a splash-impact speed spike
    outrunning the Verlet skin), the affected work is re-run from its held
    input state on the per-step-rebuild path — fast when the skin bound
    holds, exact when not, never silently degraded.

    slot_resident: the policy runs IN-DISPATCH at block granularity
    (make_advance heal=True) — a violating sort_every-block re-runs under
    lax.cond, so the repair costs one block instead of the whole dispatch
    (~1 s vs ~25 s at 1M).  Non-resident reuse keeps the round-2 host-side
    per-dispatch re-run.

    adaptive_cap (slot_resident only): run a cap-8 slot grid while the
    flow is sparse enough for it — measured 1.44×/1.33× faster at
    100k/1M than cap-16 (bench/probe_cap8.py) — healing the rare
    overflow block exactly, and switch permanently to the default cap
    once healing exceeds the break-even rate (> blocks/8 per dispatch:
    a healed block costs ~2.9× a cap-16 block, so beyond that rate cap-8
    loses).  Physics is exact in every phase; only throughput is
    phase-dependent (a 3D collapse exceeds occupancy 8 from ~step 300 —
    see ROADMAP.md round-3 measurements).

    CONSTANT-HEAL DEMOTION (slot_resident, round 5): a healed block costs
    the failed fast attempt PLUS the exact per-step re-run, so once every
    block of DEMOTE_PATIENCE consecutive dispatches heals (the vortex2d
    stir holds max|v| permanently above the drift budget — 25/25 blocks
    healed for 3800+ straight steps in the round-5 soak), the advance
    demotes to the plain per-step path — the same trajectory run_exact
    was already producing, minus the wasted attempts — and re-probes the
    fast path every PERSTEP_REPROBE_EVERY dispatches so a calming scene
    recovers it (~2% steady re-probe overhead).

    The single implementation of that policy; step.run and both CLI
    commands route through it.  For sort_every <= 1 this is just
    make_advance."""
    import sys

    auto = auto_rebuild and slot_resident and sort_every > 1
    # packed_rows=None → auto: for emitter scenes, probe the CURRENT state
    # on first dispatch and run the packed-row sparse-scene layout while
    # occupancy admits it (see _packed_fits below); True/False pin it.
    packed_auto = (
        packed_rows is None and auto and bool(scene.emitters)
        and method == "pallas" and grid is None and not adaptive_cap
        and xsub == 1 and not row_pair
        and scene.params.precision != "bf16"
        and reactive_theta is None
    )
    if packed_rows is None:
        packed_rows = False
    if repair_k is None:
        # minority slot repair ON by default where supported (measured:
        # 1.23x at the settled 1M state, neutral from init — see
        # DEFAULT_REPAIR_K); pass repair_k=0 to pin the strict
        # rebuild-only policy (exactness anchors do)
        repair_k = default_repair_k(
            scene, auto=auto, membership_audit=membership_audit,
            xsub=xsub, reactive_theta=reactive_theta, row_pair=row_pair,
            packed_rows=packed_rows,
        )
    base_kw = dict(sort_every=sort_every, slot_resident=slot_resident,
                   xsub=xsub, heal=slot_resident and not auto,
                   row_pair=row_pair, auto_rebuild=auto,
                   reactive_theta=reactive_theta if auto else None,
                   membership_audit=membership_audit,
                   repair_k=repair_k if auto else 0,
                   packed_rows=packed_rows, row_lanes=row_lanes)

    def _unpack(out):
        # (state, viol) | (state, viol, healed) | (+ rebuilds[, repairs])
        # — the heal and auto-rebuild advances report extra counters.
        # ONE batched device_get for all scalars: each separate int()
        # fetch is a full host round-trip through the compile tunnel
        # (~20 ms measured round 4 — 3 fetches cost +60% on a 100 ms
        # dam2d dispatch; bench/probe_order raw-repeat data)
        vals = [int(v) for v in jax.device_get(out[1:])]
        healed = vals[1] if len(vals) > 1 else 0
        if len(vals) > 3:
            audited.repaired += vals[3]
        return out[0], vals[0], healed
    if adaptive_cap and slot_resident and grid is None:
        from sph_tpu import neighbors

        base_grid = neighbors.GridSpec.for_scene(scene)
        if base_grid.cap > 8:
            # OCCUPANCY-AWARE skin for the cap-8 lattice: kernel cost is
            # quantized by the slot cap, so shrinking the skin shifts the
            # cell-occupancy distribution down without touching per-pair
            # math — the price is rebuild rate (drift budget skin/2),
            # which the auto-rebuild advance adapts to.  Measured
            # (bench/probe_r3f.py): at 1M-3D skin(k) is clean at init and
            # narrower skins only add rebuilds (43.4 → 79 ms/step), but
            # at 10k-2D skin(k)'s wider cells overflow 8 at init (27
            # cells) while skin(k/2) is clean — without this check the
            # 2D auto8 path healed 25/25 blocks and fell straight back
            # to cap-16.  So: probe the CURRENT state on first dispatch
            # and take the WIDEST candidate skin whose occupancy fits.
            skin_full = default_skin(scene, sort_every)
            cand = [skin_full / div for div in (1, 2, 4)]
            occ_fit = []  # (skin, jitted state -> cells_over_8), lazy

            def _fits(st: State, s: float) -> bool:
                g = neighbors.GridSpec.for_scene(scene, cap=8, skin=s)

                @jax.jit
                def over8(state: State):
                    _, flat = neighbors.cell_index(
                        state.x, state.active, g
                    )
                    counts = jnp.bincount(flat, length=g.n_rows)[
                        : g.n_cells
                    ]
                    return jnp.sum(counts > 8)

                return int(over8(st)) == 0

            adv8_box = []  # compiled on first dispatch (grid chosen then)
            adv16 = []  # compiled on first switch
            blocks = max(steps_per_dispatch // sort_every, 1)
            mode = ["cap8"]

            def _adv8_for(st: State):
                if adv8_box:
                    return adv8_box[0]
                pick = next((s for s in cand if _fits(st, s)), None)
                if pick is None:
                    # dense from the start (e.g. resumed settled state):
                    # no candidate lattice fits — skip cap-8 entirely
                    mode[0] = "cap16"
                    audited.mode = f"cap{base_grid.cap}"
                    print(
                        f"sph_tpu: occupancy exceeds 8 on every cap-8 "
                        f"candidate lattice at step {int(st.step)} — "
                        f"running the cap-{base_grid.cap} fast path",
                        file=sys.stderr,
                    )
                    return None
                grid8 = neighbors.GridSpec.for_scene(
                    scene, cap=8, skin=pick
                )
                if pick != skin_full:
                    print(
                        f"sph_tpu: cap-8 lattice skin narrowed "
                        f"{skin_full:.3g} → {pick:.3g} (occupancy-fit; "
                        f"rebuild rate adapts)",
                        file=sys.stderr,
                    )
                # cap-8 prefers xb=8: same [64, W] op height as
                # cap-16/xb-4 with 0.83× the candidate width (measured
                # fastest)
                adv8_box.append(
                    make_advance(scene, method, steps_per_dispatch,
                                 grid=grid8, xb_cells=8, **base_kw)
                )
                return adv8_box[0]

            def audited(st: State) -> State:
                if mode[0] == "cap8":
                    adv8 = _adv8_for(st)
                    if adv8 is None:
                        return audited(st)
                    st2, viol, healed = _unpack(adv8(st))
                    audited.healed += int(healed)
                    if int(healed) > max(1, blocks // 8):
                        mode[0] = "cap16"
                        audited.mode = f"cap{base_grid.cap}"
                        print(
                            f"sph_tpu: cap-8 occupancy outgrown at step "
                            f"{int(st.step)} ({int(healed)}/{blocks} blocks "
                            f"healed) — switching to the cap-"
                            f"{base_grid.cap} fast path",
                            file=sys.stderr,
                        )
                    elif int(healed):
                        print(
                            f"sph_tpu: skin/cap violations at step "
                            f"{int(st.step)} — {int(healed)} block(s) "
                            f"re-ran exactly (in-dispatch)",
                            file=sys.stderr,
                        )
                    return st2
                if not adv16:
                    adv16.append(
                        make_advance(scene, method, steps_per_dispatch,
                                     **base_kw)
                    )
                st2, viol, healed = _unpack(adv16[0](st))
                audited.healed += int(healed)
                if int(healed):
                    print(
                        f"sph_tpu: skin/cap violations at step "
                        f"{int(st.step)} — {int(healed)} block(s) re-ran "
                        f"exactly (in-dispatch)",
                        file=sys.stderr,
                    )
                return st2

            # observability: cumulative healed blocks + current mode
            # (bench.py reports these; the physics is exact either way)
            audited.healed = 0
            audited.repaired = 0  # minority-repaired blocks (repair_k)
            audited.mode = "cap8"
            return audited

    if packed_auto:
        # PACKED-ROW auto policy (round 5): emitter scenes are sparse —
        # the settled emitters3d runs mean cell occupancy 2.16, where the
        # packed layout measures 3.05× the slot kernels (probe_r5b) — but
        # a filling scene can densify past the crossover (the settled 1M
        # splash at occupancy 7.38 models 2.5× WORSE packed).  So: probe
        # the CURRENT state on first dispatch, run packed while the
        # occupancy fits, and switch to the slot layout once row-overflow
        # healing exceeds break-even (the cap-8 switch pattern).
        blocks = max(steps_per_dispatch // sort_every, 1)
        mode = ["probe"]
        advp: list = []
        advs: list = []

        def audited(st: State) -> State:
            if mode[0] == "probe":
                mode[0] = ("packed"
                           if packed_fits(scene, st, sort_every, row_lanes)
                           else "slot")
                audited.mode = mode[0]
                if mode[0] == "slot":
                    print(
                        f"sph_tpu: occupancy too dense for packed rows at "
                        f"step {int(st.step)} — running the slot fast path",
                        file=sys.stderr,
                    )
            if mode[0] == "packed":
                if not advp:
                    advp.append(make_advance(
                        scene, method, steps_per_dispatch,
                        **{**base_kw, "packed_rows": True, "repair_k": 0},
                    ))
                st2, viol, healed = _unpack(advp[0](st))
                audited.healed += int(healed)
                if int(healed) > max(1, blocks // 8):
                    mode[0] = "slot"
                    audited.mode = "slot"
                    print(
                        f"sph_tpu: packed rows outgrown at step "
                        f"{int(st.step)} ({int(healed)}/{blocks} blocks "
                        f"healed) — switching to the slot fast path",
                        file=sys.stderr,
                    )
                elif int(healed):
                    print(
                        f"sph_tpu: skin/row violations at step "
                        f"{int(st.step)} — {int(healed)} block(s) re-ran "
                        f"exactly (in-dispatch)",
                        file=sys.stderr,
                    )
                return st2
            if not advs:
                advs.append(make_advance(
                    scene, method, steps_per_dispatch, **base_kw
                ))
            st2, viol, healed = _unpack(advs[0](st))
            audited.healed += int(healed)
            if int(healed):
                print(
                    f"sph_tpu: skin/cap violations at step {int(st.step)} "
                    f"— {int(healed)} block(s) re-ran exactly (in-dispatch)",
                    file=sys.stderr,
                )
            return st2

        audited.healed = 0
        audited.repaired = 0
        audited.mode = "probe"
        return audited

    adv = make_advance(scene, method, steps_per_dispatch, grid=grid,
                       **base_kw)
    if sort_every <= 1:
        return adv

    if slot_resident:
        blocks = max(steps_per_dispatch // sort_every, 1)
        streak = [0]       # consecutive all-blocks-healed fast dispatches
        demoted = [0]      # dispatches run since demotion (0 = fast path)
        perstep: list = []  # per-step advance, compiled on first demotion

        def audited(st: State) -> State:
            if demoted[0]:
                # CONSTANT-HEAL regime (see DEMOTE_PATIENCE): per-step is
                # bitwise what heal-every-block already computed, minus
                # the failed fast attempts.  Bounded re-probe so a scene
                # that calms down recovers the fast path.
                demoted[0] += 1
                if demoted[0] % PERSTEP_REPROBE_EVERY:
                    return perstep[0](st)
                st2, viol, healed = _unpack(adv(st))
                audited.healed += int(healed)
                if int(healed) >= blocks:
                    return st2  # still violent — stay demoted
                demoted[0] = 0
                streak[0] = 0
                audited.mode = "resident"
                print(
                    f"sph_tpu: drift back under the Verlet budget at step "
                    f"{int(st.step)} ({int(healed)}/{blocks} blocks healed) "
                    f"— resuming the resident fast path",
                    file=sys.stderr,
                )
                return st2
            st2, viol, healed = _unpack(adv(st))
            audited.healed += int(healed)
            if int(healed):
                print(
                    f"sph_tpu: skin/cap violations at step {int(st.step)} — "
                    f"{int(healed)} block(s) re-ran exactly (per-step "
                    f"rebuild, in-dispatch)",
                    file=sys.stderr,
                )
            streak[0] = streak[0] + 1 if int(healed) >= blocks else 0
            if streak[0] >= DEMOTE_PATIENCE:
                demoted[0] = 1
                if not perstep:
                    perstep.append(
                        make_advance(scene, method, steps_per_dispatch)
                    )
                audited.mode = "perstep"
                print(
                    f"sph_tpu: flow outruns the Verlet drift budget — every "
                    f"block healed {streak[0]} dispatches straight at step "
                    f"{int(st.step)}; demoting to the per-step path "
                    f"(re-probes every {PERSTEP_REPROBE_EVERY} dispatches)",
                    file=sys.stderr,
                )
            return st2

        audited.healed = 0
        audited.repaired = 0  # minority-repaired blocks (repair_k)
        audited.mode = "resident"
        return audited

    exact = []  # per-step-rebuild fallback, compiled on first use

    def audited(st: State) -> State:
        st2, viol = adv(st)
        if int(viol):
            if not exact:
                exact.append(make_advance(scene, method, steps_per_dispatch))
            print(
                f"sph_tpu: {int(viol)} skin/cap violations in a "
                f"{steps_per_dispatch}-step dispatch at step "
                f"{int(st.step)} — re-ran exactly (per-step rebuild)",
                file=sys.stderr,
            )
            return exact[0](st)
        return st2

    return audited


def run(
    scene: Scene,
    n_steps: int,
    method: str = "naive",
    steps_per_dispatch: int = 100,
    state: State | None = None,
    frame_callback: Callable[[State], None] | None = None,
    sort_every: int = 1,
    slot_resident: bool = False,
    adaptive_cap: bool = False,
    shards: int | tuple[int, ...] | None = None,
    shard_axis: int = 0,
    shard_axis2: int | None = None,
    membership_audit: bool = True,
    repair_k: int | None = None,
    packed_rows: bool | None = None,
) -> State:
    """Top-level driver (reference main loop, SURVEY.md §3.5).

    Host loop is coarse-grained: one device dispatch per `steps_per_dispatch`
    steps; `frame_callback` (render/metrics) runs once per dispatch.
    sort_every > 1 (pallas): Verlet-skin addr reuse with EXACT FALLBACK —
    see make_audited_advance.

    shards: domain decomposition across the device mesh (the library form
    of `sph-tpu run --shards`, SURVEY.md C16/§5.7): an int N = spatial
    slabs along `shard_axis`, a (N1, N2) tuple = 2-axis pencils over
    (`shard_axis`, `shard_axis2`, default last axis).  The state is
    sharded once, advanced with the audited mesh-wide policy (auto
    rebuild on slabs; per-step pencils — pencil ignores
    sort_every/slot_resident), elastically recovering when the flow
    outgrows static buffers, and the GLOBAL state is returned (and passed
    to frame_callback each dispatch).  Note: the returned capacity is
    mesh-padded (n_devices x local cap) and particle order follows slab
    ownership — identify particles by position/emit_step, not row index.

    membership_audit / repair_k: the fast-path audit policy knobs, same
    semantics as make_audited_advance (CLI: --strict-audit / --repair-k).
    repair_k=None resolves to the production default (DEFAULT_REPAIR_K
    where supported); repair_k=0 pins the strict rebuild-only policy.
    packed_rows: None = auto (emitter scenes probe the state and run the
    packed-row sparse layout while occupancy fits — step.packed_fits);
    True/False pin it (CLI: --packed-rows).  Single-chip only: with
    shards, the slot layout is used and an explicit True/False prints a
    notice (docs/SCALING.md on why the slab lemma is slot-structural).
    """
    from sph_tpu.state import init

    if state is None:
        state = init(scene)
    if scene.params.integrator == "leapfrog" and int(state.step) == 0:
        state = jax.jit(functools.partial(prime, scene, method=method))(state)
    if shards:
        if packed_rows is not None:
            # packed rows are single-chip only (the slab fast path's
            # face-band membership lemma and interior-only repair are
            # slot-structural, and a slab cut along x breaks the packed
            # kernels' row-x-completeness argument — docs/SCALING.md);
            # decomposed runs use the slot layout.
            import sys

            print(
                "sph_tpu: packed_rows is single-chip only; ignored with "
                "shards (slot layout used)",
                file=sys.stderr,
            )
        return _run_decomposed(
            scene, n_steps, method, steps_per_dispatch, state,
            frame_callback, sort_every, slot_resident, shards,
            shard_axis, shard_axis2, membership_audit, repair_k,
        )
    if method == "pallas":
        # keep the dispatch plan consistent with make_advance's clamp, so
        # exactly n_steps run (unclamped, run() would silently under-step)
        steps_per_dispatch = min(
            steps_per_dispatch, MAX_PALLAS_STEPS_PER_DISPATCH
        )
    if sort_every > 1:
        steps_per_dispatch -= steps_per_dispatch % sort_every
        steps_per_dispatch = max(steps_per_dispatch, sort_every)
    n_disp, rem = divmod(n_steps, steps_per_dispatch)
    advance = make_audited_advance(scene, method, steps_per_dispatch,
                                   sort_every=sort_every,
                                   slot_resident=slot_resident,
                                   adaptive_cap=adaptive_cap,
                                   membership_audit=membership_audit,
                                   repair_k=repair_k,
                                   packed_rows=packed_rows)

    for _ in range(n_disp):
        state = advance(state)
        if frame_callback is not None:
            frame_callback(state)
    if rem:
        rem_reuse = sort_every if rem % sort_every == 0 else 1
        state = make_audited_advance(
            scene, method, rem, sort_every=rem_reuse,
            slot_resident=slot_resident and rem_reuse > 1,
            membership_audit=membership_audit, repair_k=repair_k,
            packed_rows=packed_rows,
        )(state)
        if frame_callback is not None:
            frame_callback(state)
    return state


def _run_decomposed(
    scene, n_steps, method, steps_per_dispatch, state, frame_callback,
    sort_every, slot_resident, shards, shard_axis, shard_axis2,
    membership_audit=True, repair_k=None,
):
    """run(shards=...): the decomposed host loop — shard once, advance
    with the audited mesh-wide policy, elastically re-spec on static-cap
    outgrowth (decomp.SpatialCapOverflow), gather the global view only
    for callbacks and the return value.  Mirrors the CLI's --shards loop
    (cli._run_spatial) for library users."""
    from sph_tpu import decomp

    dims = (shards,) if isinstance(shards, int) else tuple(shards)
    pencil = len(dims) == 2
    if pencil and (sort_every > 1 or slot_resident):
        # the pencil path steps per-step (slabs carry the fast path)
        sort_every, slot_resident = 1, False
    if method == "pallas":
        steps_per_dispatch = min(
            steps_per_dispatch, MAX_PALLAS_STEPS_PER_DISPATCH
        )
    if sort_every > 1:
        if method != "pallas":
            raise ValueError("sort_every > 1 requires method='pallas'")
        steps_per_dispatch -= steps_per_dispatch % sort_every
        steps_per_dispatch = max(steps_per_dispatch, sort_every)
    skin = default_skin(scene, sort_every) if sort_every > 1 else 0.0
    mesh = decomp.mesh2d(*dims) if pencil else decomp.mesh1d(dims[0])
    ax2 = shard_axis2 if shard_axis2 is not None else scene.params.dim - 1
    if pencil and ax2 == shard_axis:
        raise ValueError("shard_axis2 must differ from shard_axis")

    def build(st, spd, se, resident):
        if pencil:
            spec = decomp.PencilSpec.for_state(
                scene, st, dims[0], dims[1], axis1=shard_axis, axis2=ax2
            )
            loc = decomp.pencil_shard_state(st, scene, spec, mesh)
            adv = decomp.make_audited_pencil_advance(
                scene, spec, mesh, method, spd
            )
        else:
            spec = decomp.SpatialSpec.for_state(
                scene, st, dims[0], axis=shard_axis,
                skin=skin if se > 1 else 0.0,
            )
            loc = decomp.spatial_shard_state(st, scene, spec, mesh)
            adv = decomp.make_audited_spatial_advance(
                scene, spec, mesh, method, spd,
                sort_every=se, slot_resident=resident,
                membership_audit=membership_audit, repair_k=repair_k,
            )
        return loc, adv

    def advance_block(loc, adv, spd, se, resident):
        try:
            return adv(loc), adv
        except decomp.SpatialCapOverflow:
            # elastic recovery: static buffers outgrown by the flow —
            # re-size the spec from the gathered state and continue
            loc2, adv2 = build(
                decomp.spatial_gather_state(loc), spd, se, resident
            )
            return adv2(loc2), adv2

    n_disp, rem = divmod(n_steps, steps_per_dispatch)
    loc, adv = build(state, steps_per_dispatch, sort_every, slot_resident)
    for _ in range(n_disp):
        loc, adv = advance_block(
            loc, adv, steps_per_dispatch, sort_every, slot_resident
        )
        if frame_callback is not None:
            frame_callback(decomp.spatial_gather_state(loc))
    if rem:
        # remainder dispatch: keep the fast path only when the block
        # length divides it (same rule as the single-chip tail above)
        se = sort_every if sort_every > 1 and rem % sort_every == 0 else 1
        loc, adv = build(
            decomp.spatial_gather_state(loc), rem, se,
            slot_resident and se > 1,
        )
        loc, adv = advance_block(loc, adv, rem, se, slot_resident and se > 1)
        if frame_callback is not None:
            frame_callback(decomp.spatial_gather_state(loc))
    return decomp.spatial_gather_state(loc)
