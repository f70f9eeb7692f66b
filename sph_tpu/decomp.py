"""Multi-chip domain decomposition via `shard_map` + XLA collectives over ICI
(SURVEY.md C16/C17, §5.7-5.8).

The reference is single-threaded CPU — there is nothing to port.  The
TPU-native scaling axes are:

1. `make_dp_step` — data-parallel over particles: each device owns a fixed
   index-slice of the capacity, `all_gather`s positions/velocities once per
   force evaluation, and computes pair sums for its local rows only.  Per-row
   reduction shape matches the single-device naive path, so trajectories are
   BITWISE identical to it (tests/test_domain_decomp.py) — this is the
   correctness anchor for the mesh machinery.  Scales compute 1/n but not
   memory.

2. `make_spatial_step` — true spatial decomposition, ring-attention-shaped
   (SURVEY.md §5.7): each device owns a slab of the domain along one axis;
   per step it
     (a) exchanges *ghost* particles within h of its slab faces with ring
         neighbors via `lax.ppermute` (fixed-capacity buffers + masks — the
         TPU form of dynamic halo lists),
     (b) runs the local grid pipeline over locals+ghosts,
     (c) integrates its locals, and
     (d) *migrates* particles that crossed a slab face (fixed-capacity send
         buffers; receivers scatter into inactive slots).
   Scales compute AND memory 1/n: particle arrays are cap_local-sized and
   the neighbor grid is slab-local (`GridSpec.for_slab` — along the slab
   axis it covers one slab + ghost band, with per-device integer cell-index
   offsets against the global lattice; VERDICT r1 item 5).  Bitwise
   equality with single-device is impossible (slot order changes under
   migration), so the test contract is tight-tolerance trajectories +
   exact mass/activation conservation.  Emitters are supported: pending
   slots ship to the slab owning their spawn position; migration reuses
   only INACTIVE slots so scheduled emissions survive (VERDICT r1 item 6).

The "communication backend" is deliberately just these XLA collectives
(`ppermute`, `all_gather`, `psum`) reached through this one module — mesh
shape and buffer capacities are the only tunables; DCN multi-host would use
the same code via a bigger mesh (SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sph_tpu import physics
from sph_tpu.params import Scene
from sph_tpu.state import INACTIVE, State

AXIS = "shard"


def mesh1d(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# 1. Data-parallel over particles (bitwise anchor)
# ---------------------------------------------------------------------------


def shard_state(state: State, mesh: Mesh) -> State:
    """Place a State with capacity padded to the mesh size, sharded on the
    particle axis (scalars replicated)."""
    n = mesh.shape[AXIS]
    cap = _round_up(state.capacity, n)
    pad = cap - state.capacity
    if pad:
        state = State(
            x=jnp.pad(state.x, ((0, pad), (0, 0))),
            v=jnp.pad(state.v, ((0, pad), (0, 0))),
            acc=jnp.pad(state.acc, ((0, pad), (0, 0))),
            rho=jnp.pad(state.rho, ((0, pad),), constant_values=1.0),
            p=jnp.pad(state.p, ((0, pad),)),
            kind=jnp.pad(state.kind, ((0, pad),)),
            emit_step=jnp.pad(
                state.emit_step, ((0, pad),), constant_values=INACTIVE
            ),
            step=state.step,
        )

    def spec(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == cap:
            return NamedSharding(mesh, P(AXIS, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.device_put(state, jax.tree.map(spec, state))


def make_dp_step(scene: Scene, mesh: Mesh) -> Callable[[State], State]:
    """Particle-sharded all-pairs step; bitwise-matches the naive path.

    Supports both integrators (euler / leapfrog KDK, same scheme as
    step.make_step) and scene.force_fields (ADVICE r1: this used to
    silently integrate leapfrog scenes with Euler)."""
    params = scene.params
    dt = params.dt

    def rho_p_f(x, v, active, step):
        """All-gathered pair sums; per-row reduction shape matches the
        single-device naive path (bitwise anchor)."""
        x_all = jax.lax.all_gather(x, AXIS, tiled=True)
        v_all = jax.lax.all_gather(v, AXIS, tiled=True)
        act_all = jax.lax.all_gather(active, AXIS, tiled=True)

        dx = x[:, None, :] - x_all[None, :, :]
        r2 = jnp.sum(dx * dx, axis=-1)
        mask = act_all[None, :].astype(x.dtype)
        rho = jnp.sum(physics.density_contrib(r2, mask, params), axis=1)
        rho = jnp.where(active, rho, params.rest_density)
        p = physics.eos_pressure(rho, params)

        rho_all = jax.lax.all_gather(rho, AXIS, tiled=True)
        p_all = jax.lax.all_gather(p, AXIS, tiled=True)
        f = jnp.sum(
            physics.force_contrib(
                dx,
                r2,
                v[:, None, :],
                v_all[None, :, :],
                p[:, None],
                p_all[None, :],
                rho_all[None, :],
                mask,
                params,
            ),
            axis=1,
        ) * active[:, None].astype(x.dtype)
        f = f + physics.gravity_force(rho, params)
        if params.boundary_mode == "penalty":
            f = f + physics.wall_penalty_force(x, v, scene.lo, scene.hi, params)
        if scene.force_fields:
            f = f + physics.force_field_force(x, step, scene.force_fields)
        return rho, p, f

    def sharded(state: State) -> State:
        # leaves arrive as per-device shards
        active = state.emit_step <= state.step
        movable = active & (state.kind == 0)
        mov = movable[:, None].astype(state.x.dtype)
        x, v, acc = state.x, state.v, state.acc

        if params.integrator == "leapfrog":
            v = v + (0.5 * dt) * acc * mov
            x = x + dt * v * mov
            rho, p, f = rho_p_f(x, v, active, state.step)
            a = f / jnp.maximum(rho, 1e-12)[:, None]
            v = v + (0.5 * dt) * a * mov
        else:
            rho, p, f = rho_p_f(x, v, active, state.step)
            a = f / jnp.maximum(rho, 1e-12)[:, None]
            v = v + dt * a * mov
            x = x + dt * v * mov
        acc = jnp.where(movable[:, None], a, 0.0)
        if params.boundary_mode == "clamp":
            xc, vc = physics.clamp_boundary(x, v, scene.lo, scene.hi, params)
            x = jnp.where(movable[:, None], xc, x)
            v = jnp.where(movable[:, None], vc, v)
        return State(
            x=x,
            v=v,
            acc=acc,
            rho=jnp.where(active, rho, state.rho),
            p=jnp.where(active, p, state.p),
            kind=state.kind,
            emit_step=state.emit_step,
            step=state.step + 1,
        )

    part = P(AXIS)
    spec = State(
        x=part, v=part, acc=part, rho=part, p=part,
        kind=part, emit_step=part, step=P(),
    )
    return jax.jit(
        jax.shard_map(
            sharded, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        )
    )


# ---------------------------------------------------------------------------
# 2. Spatial slab decomposition with halo exchange + migration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SpatialSpec:
    """Static decomposition geometry: slabs along `axis` of the domain."""

    n_shards: int
    axis: int            # position component the domain is sliced along
    slab_lo: float       # global domain lo along axis
    slab_w: float        # slab width
    cap_local: int       # particle capacity per device
    cap_ghost: int       # ghost-buffer capacity per face
    cap_mig: int         # migration-buffer capacity per face

    @staticmethod
    def for_scene(
        scene: Scene,
        n_shards: int,
        capacity: int,
        axis: int = 0,
        balance: float = 4.0,
    ) -> "SpatialSpec":
        """`balance` is the tolerated load imbalance: each slab can hold up
        to balance× the even share (dam-break columns start very lumpy)."""
        lo, hi = scene.lo[axis], scene.hi[axis]
        slab_w = (hi - lo) / n_shards
        if slab_w < 2 * scene.params.h:
            raise ValueError(
                f"slab width {slab_w} < 2h; fewer shards or a wider domain"
            )
        cap_local = min(
            _round_up(capacity, 64),
            _round_up(int(capacity / n_shards * balance) + 64, 64),
        )
        return SpatialSpec(
            n_shards=n_shards,
            axis=axis,
            slab_lo=lo,
            slab_w=slab_w,
            cap_local=cap_local,
            cap_ghost=_round_up(cap_local // 2 + 64, 64),
            cap_mig=_round_up(cap_local // 4 + 64, 64),
        )

    @staticmethod
    def for_state(
        scene: Scene,
        state,
        n_shards: int,
        axis: int = 0,
        headroom: float = 3.0,
        skin: float = 0.0,
    ) -> "SpatialSpec":
        """Lumpiness-aware spec: sizes cap_local from the state's ACTUAL
        worst-slab occupancy × headroom instead of a blind balance factor
        (a dam-break column concentrates most particles in a few slabs, so
        `for_scene` needed hand-tuned `balance` — VERDICT r1).  Headroom
        covers later compression/sloshing into one slab; overflow is still
        reported by the advance loop if it ever exceeds this.

        Ghost/migration buffers are sized from the ACTUAL worst face-band
        occupancy (particles within 2·(h+skin) of any interior slab face —
        double the exchange band, as sloshing margin), not from cap_local:
        the band holds ~2% of a slab's particles in practice, and the old
        `cap_local // 2` sizing made the 1M spatial step spend ~200 ms on
        `nonzero` compactions and ~15 MB ppermute payloads for nearly-empty
        bands (VERDICT r2 weakness 2).  Pass the fast path's Verlet `skin`
        so the band matches the pinned h+skin ghost selection.  A nonzero
        floor keeps tiny scenes and late-run sloshing safe; the advance
        loop still audits every cap."""
        import numpy as np_

        lo, hi = scene.lo[axis], scene.hi[axis]
        slab_w = (hi - lo) / n_shards
        if slab_w < 2 * scene.params.h:
            raise ValueError(
                f"slab width {slab_w} < 2h; fewer shards or a wider domain"
            )
        x = np_.asarray(state.x)
        live = np_.asarray(state.emit_step) != int(INACTIVE)
        slab = np_.clip(
            ((x[:, axis] - lo) // slab_w).astype(int), 0, n_shards - 1
        )
        worst = int(np_.bincount(slab[live], minlength=n_shards).max())
        cap_local = min(
            _round_up(state.capacity, 64),
            _round_up(int(worst * headroom) + 64, 64),
        )
        # worst interior-face band occupancy, 2·h_eff deep on each side
        h_eff = scene.params.h + skin
        band = 0
        xa = x[live, axis]
        for i in range(1, n_shards):
            face = lo + i * slab_w
            band = max(
                band, int(np_.sum(np_.abs(xa - face) < 2.0 * h_eff))
            )
        cap_ghost = min(
            _round_up(cap_local // 2 + 64, 64),
            _round_up(int(band * headroom) + 256, 64),
        )
        return SpatialSpec(
            n_shards=n_shards,
            axis=axis,
            slab_lo=lo,
            slab_w=slab_w,
            cap_local=cap_local,
            cap_ghost=cap_ghost,
            cap_mig=max(_round_up(cap_ghost // 2, 64), 256),
        )


def _chained(x, prev):
    """Order collectives: make `x` depend on `prev` so independent
    ppermutes cannot be reordered across devices (the CPU in-process
    communicator deadlocks on cross-device reordering; TPU channels would
    tolerate it, but a fixed order is also what determinism wants)."""
    if prev is None:
        return x
    return jax.lax.optimization_barrier((x, prev))[0]


def _pack_idx(mask, cap):
    """Fixed-size compaction INDICES: (idx [cap], valid [cap], overflow).
    Split from _pack so the reuse path can pin the selection for a whole
    block and re-gather fresh payloads per step."""
    n = mask.shape[0]
    idx = jnp.nonzero(mask, size=cap, fill_value=n)[0]
    overflow = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - cap, 0)
    return idx, idx < n, overflow


def _gather_rows(payload, idx):
    """payload rows at idx; index n (the pad fill) reads a zero row."""
    return jnp.concatenate(
        [payload, jnp.zeros((1, payload.shape[1]), payload.dtype)], 0
    )[idx]


def _pack(mask, payload, cap):
    """Fixed-size compaction: rows of `payload` where mask, padded.

    Returns (buf [cap, F], valid [cap] bool, overflow count)."""
    idx, valid, overflow = _pack_idx(mask, cap)
    return _gather_rows(payload, idx), valid, overflow


def spatial_shard_state(state: State, scene: Scene, spec: SpatialSpec, mesh: Mesh):
    """Host-side: split a global State into per-slab local States, stacked on
    a leading device axis and device_put sharded."""
    n = spec.n_shards
    x = np.asarray(state.x)
    # live = active now OR scheduled to activate later (pending emitter
    # slots travel to the slab owning their precomputed spawn position)
    live = np.asarray(state.emit_step) != int(INACTIVE)
    slab = np.clip(
        ((x[:, spec.axis] - spec.slab_lo) // spec.slab_w).astype(int), 0, n - 1
    )
    fields = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
        if f.name != "step"
    }
    out = {k: [] for k in fields}
    park = x.min(axis=0) * 0 + np.float32(-1e6)
    for s in range(n):
        sel = live & (slab == s)
        cnt = sel.sum()
        if cnt > spec.cap_local:
            raise ValueError(f"slab {s} holds {cnt} > cap_local {spec.cap_local}")
        pad = spec.cap_local - cnt
        for k, arr in fields.items():
            take = arr[sel]
            if k == "x":
                fill = np.broadcast_to(park, (pad, take.shape[1]))
            elif k == "emit_step":
                fill = np.full((pad,), INACTIVE, take.dtype)
            elif k == "rho":
                fill = np.ones((pad,), take.dtype)
            else:
                fill = np.zeros((pad,) + take.shape[1:], take.dtype)
            out[k].append(np.concatenate([take, fill], axis=0))
    stacked = {k: np.stack(v, axis=0) for k, v in out.items()}
    # emit_step of live locals: keep original (<= step); pads INACTIVE
    loc = State(step=state.step, **{k: jnp.asarray(v) for k, v in stacked.items()})

    def sspec(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n:
            return NamedSharding(mesh, P(AXIS, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.device_put(loc, jax.tree.map(sspec, loc))


def spatial_gather_state(loc: State) -> State:
    """Device→host: flatten the per-slab states back into one global State
    (slot order is per-slab; use invariants, not bitwise, to compare)."""
    flat = {
        f.name: np.asarray(getattr(loc, f.name)).reshape(
            (-1,) + getattr(loc, f.name).shape[2:]
        )
        for f in dataclasses.fields(loc)
        if f.name != "step"
    }
    return State(step=loc.step, **{k: jnp.asarray(v) for k, v in flat.items()})


F_GHOST = 6  # ghost payload: x3 | v3 (2D pads); ghosts are pair-SOURCES
#              only, so kind never rides the ring (review r2: the old kind
#              column was packed+exchanged every step and never read)
F_MIG = 11   # migration:     x3 | v3 | acc3 | kind | emit_step


def _pack_payload(x, v, d):
    z = jnp.zeros((x.shape[0], 3 - d), x.dtype)
    return jnp.concatenate([x, z, v, z], axis=1)


def _pack_mig(x, v, acc, kind, emit, d):
    z = jnp.zeros((x.shape[0], 3 - d), x.dtype)
    # emit_step travels BITCAST to float32, not value-cast: int32 values
    # above 2^24 (e.g. very long runs' step counts) would round in a
    # value cast and corrupt the active mask after migration (ADVICE r1).
    # The buffer only moves through gathers/ppermute — no arithmetic —
    # so arbitrary bit patterns survive transport exactly.
    emit_bits = jax.lax.bitcast_convert_type(emit, jnp.float32)
    return jnp.concatenate(
        [
            x, z, v, z, acc, z,
            kind[:, None].astype(x.dtype),
            emit_bits[:, None],
        ],
        axis=1,
    )


def _make_spatial_local(
    scene: Scene, spec: SpatialSpec, mesh: Mesh, method: str = "grid"
):
    """Build the per-device slab step body (halo exchange → local grid
    compute → integrate → migrate); wrapped by make_spatial_step/advance.

    Emitters work under decomposition: pending slots (emit_step in the
    future) are routed to the slab owning their spawn position at shard
    time (spatial_shard_state) and activate there; migration only ever
    reuses slots whose emit_step is INACTIVE, so arrivals cannot clobber a
    scheduled emission (VERDICT r1 item 6)."""
    params = scene.params
    dt = params.dt
    n_sh = spec.n_shards
    ax = spec.axis
    h = params.h

    grid = None
    if method in ("grid", "pallas"):
        from sph_tpu import neighbors

        # Slab-local grid: covers one slab + ghost band, NOT the full
        # domain, so grid/slot memory per device scales 1/n_shards
        # (VERDICT r1 item 5).  Each device shifts cell indices by a whole
        # number of cells (ci_offset below) — integer math, so the pair
        # physics is bitwise independent of the decomposition.
        grid = neighbors.GridSpec.for_slab(scene, spec.slab_w, ax)

    right = [(i, (i + 1) % n_sh) for i in range(n_sh)]
    left = [(i, (i - 1) % n_sh) for i in range(n_sh)]
    pack_payload, pack_mig = _pack_payload, _pack_mig

    def sharded(st: State) -> State:
        # local views arrive as [1, cap_local, ...]: drop the stack axis
        st = State(
            step=st.step,
            **{
                f.name: getattr(st, f.name)[0]
                for f in dataclasses.fields(st)
                if f.name != "step"
            },
        )
        d = st.x.shape[1]
        me = jax.lax.axis_index(AXIS)
        my_lo = spec.slab_lo + me.astype(jnp.float32) * spec.slab_w
        my_hi = my_lo + spec.slab_w
        is_first = me == 0
        is_last = me == n_sh - 1

        ci_off = None
        if grid is not None:
            from sph_tpu import neighbors as _nbr

            # integer cell offset of this device's slab-local grid against
            # the global lattice: local cell 0 sits at global cell k_dev,
            # chosen so [my_lo − h − ε, my_hi + h + ε] is covered (the slab
            # grid has spare cells for fp-floor slack), clamped so the
            # local window stays inside the global lattice
            s_full = _nbr.GridSpec.for_scene(scene).shape[ax]
            k_dev = jnp.floor(
                (my_lo - h - grid.cell - grid.lo[ax]) / grid.cell
            ).astype(jnp.int32)
            k_dev = jnp.clip(k_dev, 0, s_full - grid.shape[ax])
            ci_off = jnp.zeros((d,), jnp.int32).at[ax].set(1) * k_dev

        active = st.emit_step <= st.step
        movable = active & (st.kind == 0)
        mov = movable[:, None].astype(st.x.dtype)
        x, v, acc = st.x, st.v, st.acc

        if params.integrator == "leapfrog":
            # KDK: half-kick with stored acc + drift happen BEFORE the ghost
            # exchange so halos see post-drift positions (forces evaluate at
            # the new x, exactly like the single-device step)
            v = v + (0.5 * dt) * acc * mov
            x = x + dt * v * mov

        # ---- (a) ghost exchange: faces within h of each slab boundary ----
        # Domain-wall faces exchange nothing (their wrapped ghosts would be
        # discarded on receipt anyway); masking at SEND also keeps the
        # band-sized cap_ghost audit honest — wall pileups are not ghosts.
        near_lo = active & (x[:, ax] < my_lo + h) & ~is_first
        near_hi = active & (x[:, ax] >= my_hi - h) & ~is_last
        pay = pack_payload(x, v, d)
        buf_lo, val_lo, ov1 = _pack(near_lo, pay, spec.cap_ghost)
        buf_hi, val_hi, ov2 = _pack(near_hi, pay, spec.cap_ghost)
        # send my lo-face to left neighbor, my hi-face to right neighbor
        g_from_right = jax.lax.ppermute(
            jnp.concatenate([buf_lo, val_lo[:, None].astype(pay.dtype)], 1),
            AXIS,
            left,
        )
        g_from_left = jax.lax.ppermute(
            _chained(
                jnp.concatenate([buf_hi, val_hi[:, None].astype(pay.dtype)], 1),
                g_from_right,
            ),
            AXIS,
            right,
        )
        # edge slabs: ring wraps, but sends are already masked at the
        # domain-wall faces; keep the receipt-side mask as defense in depth
        gl_valid = (g_from_left[:, F_GHOST] > 0) & ~is_first
        gr_valid = (g_from_right[:, F_GHOST] > 0) & ~is_last

        def unpack_ghost(g, valid):
            gx = g[:, 0:d]
            gv = g[:, 3 : 3 + d]
            far = jnp.full_like(gx, 1e18)
            gx = jnp.where(valid[:, None], gx, far)
            return gx, jnp.where(valid[:, None], gv, 0.0), valid

        glx, glv, glm = unpack_ghost(g_from_left, gl_valid)
        grx, grv, grm = unpack_ghost(g_from_right, gr_valid)

        cx = jnp.concatenate([x, glx, grx], axis=0)
        cv = jnp.concatenate([v, glv, grv], axis=0)
        c_act = jnp.concatenate([active, glm, grm], axis=0)

        # ---- (b) local density over locals + h-deep ghosts ----
        # Locals' kernel support is complete (ghosts cover the missing h
        # band), so their rho is exact.  Ghost rows get garbage rho here —
        # their own support is truncated — so their true (rho, p) is
        # re-imported below before the force pass (halo-depth correctness:
        # the alternative would be 2h-deep ghosts).
        nl = spec.cap_local
        split_ctx = None
        if method == "grid":
            from sph_tpu import neighbors

            rho_c = neighbors.grid_density(
                cx, c_act, params, grid, ci_offset=ci_off
            )
        elif method == "pallas":
            from sph_tpu import pallas_step

            # ONE addr build + feature scatter shared by both kernel
            # phases (positions don't move between them — only ghost
            # rho/p is re-imported)
            split_ctx = pallas_step.pallas_split_build(
                cx, cv, c_act, params, grid, ci_offset=ci_off
            )
            rho_c = pallas_step.pallas_density_split(split_ctx, params)
        else:
            rho_c = physics.density_naive(cx, c_act, params)
        rho = rho_c[:nl]
        p = physics.eos_pressure(rho, params)

        # re-exchange computed (rho, p) for the same face particles, in the
        # same packed order (same masks -> same nonzero compaction)
        rp = jnp.stack([rho, p], axis=1)
        rp_lo, _, _ = _pack(near_lo, rp, spec.cap_ghost)
        rp_hi, _, _ = _pack(near_hi, rp, spec.cap_ghost)
        rp_from_right = jax.lax.ppermute(
            _chained(rp_lo, g_from_left), AXIS, left
        )
        rp_from_left = jax.lax.ppermute(
            _chained(rp_hi, rp_from_right), AXIS, right
        )
        ghost_rho = jnp.concatenate(
            [
                jnp.where(gl_valid, rp_from_left[:, 0], 1.0),
                jnp.where(gr_valid, rp_from_right[:, 0], 1.0),
            ]
        )
        ghost_p = jnp.concatenate(
            [
                jnp.where(gl_valid, rp_from_left[:, 1], 0.0),
                jnp.where(gr_valid, rp_from_right[:, 1], 0.0),
            ]
        )
        rho_cc = jnp.concatenate([rho, ghost_rho])
        p_cc = jnp.concatenate([p, ghost_p])

        # ---- (b') force pass with correct ghost rho/p ----
        if method == "grid":
            f_c = neighbors.grid_forces(
                cx, cv, rho_cc, p_cc, c_act, params, grid, ci_offset=ci_off
            )
        elif method == "pallas":
            f_c = pallas_step.pallas_forces_split(
                split_ctx, rho_cc, p_cc, params, d
            )
        else:
            f_c = physics.forces_naive(cx, cv, rho_cc, p_cc, c_act, params)
        f = f_c[:nl]
        f = f + physics.gravity_force(rho, params)
        if params.boundary_mode == "penalty":
            f = f + physics.wall_penalty_force(x, v, scene.lo, scene.hi, params)
        if scene.force_fields:
            f = f + physics.force_field_force(x, st.step, scene.force_fields)

        # ---- (c) integrate locals ----
        a = f / jnp.maximum(rho, 1e-12)[:, None]
        if params.integrator == "leapfrog":
            v = v + (0.5 * dt) * a * mov       # second half-kick
        else:
            v = v + dt * a * mov               # semi-implicit Euler
            x = x + dt * v * mov
        acc = jnp.where(movable[:, None], a, 0.0)
        if params.boundary_mode == "clamp":
            xc, vc = physics.clamp_boundary(x, v, scene.lo, scene.hi, params)
            x = jnp.where(movable[:, None], xc, x)
            v = jnp.where(movable[:, None], vc, v)

        # ---- (d) migration: locals that crossed a slab face ----
        # (first/last slab faces are domain walls: nothing leaves there)
        go_left = active & (x[:, ax] < my_lo) & ~is_first
        go_right = active & (x[:, ax] >= my_hi) & ~is_last
        leaver = go_left | go_right
        mig = pack_mig(x, v, acc, st.kind, st.emit_step, d)
        m_lo, mval_lo, ov3 = _pack(go_left, mig, spec.cap_mig)
        m_hi, mval_hi, ov4 = _pack(go_right, mig, spec.cap_mig)
        m_from_right = jax.lax.ppermute(
            _chained(
                jnp.concatenate([m_lo, mval_lo[:, None].astype(mig.dtype)], 1),
                g_from_left,
            ),
            AXIS,
            left,
        )
        m_from_left = jax.lax.ppermute(
            _chained(
                jnp.concatenate([m_hi, mval_hi[:, None].astype(mig.dtype)], 1),
                m_from_right,
            ),
            AXIS,
            right,
        )
        mr_valid = (m_from_right[:, F_MIG] > 0) & ~is_last
        ml_valid = (m_from_left[:, F_MIG] > 0) & ~is_first
        incoming = jnp.concatenate([m_from_left, m_from_right], axis=0)
        inc_valid = jnp.concatenate([ml_valid, mr_valid], axis=0)

        # deactivate leavers: park + INACTIVE.  Only LEAVERS are parked —
        # pending emitter slots (emit_step in the future) must keep their
        # precomputed spawn state until they activate.
        park = jnp.full((d,), -1e6, x.dtype)
        x = jnp.where(leaver[:, None], park[None, :], x)
        v = jnp.where(leaver[:, None], 0.0, v)
        acc = jnp.where(leaver[:, None], 0.0, acc)
        emit = jnp.where(leaver, INACTIVE, st.emit_step)

        # insert arrivals into INACTIVE slots only (never a pending
        # emitter slot — that emission would be silently destroyed)
        free = emit == INACTIVE
        free_idx = jnp.nonzero(
            free, size=2 * spec.cap_mig, fill_value=spec.cap_local
        )[0]
        # rank-compact arrivals onto the free list: valid arrival #r takes
        # free slot #r regardless of its buffer row (positional
        # free_idx[row] indexing dropped arrivals whenever the row index
        # ran past the populated free prefix even though slots were free)
        rank = jnp.cumsum(inc_valid.astype(jnp.int32)) - 1
        take = free_idx[jnp.clip(rank, 0, 2 * spec.cap_mig - 1)]
        slot = jnp.where(inc_valid, take, spec.cap_local)
        ins_overflow = jnp.sum(
            (inc_valid & (take >= spec.cap_local)).astype(jnp.int32)
        )
        x = x.at[slot, :].set(incoming[:, 0:d], mode="drop")
        v = v.at[slot, :].set(incoming[:, 3 : 3 + d], mode="drop")
        acc = acc.at[slot, :].set(incoming[:, 6 : 6 + d], mode="drop")
        kind = st.kind.at[slot].set(
            incoming[:, 9].astype(jnp.int32), mode="drop"
        )
        emit = emit.at[slot].set(
            jax.lax.bitcast_convert_type(incoming[:, 10], jnp.int32),
            mode="drop",
        )

        overflow = ov1 + ov2 + ov3 + ov4 + ins_overflow
        if split_ctx is not None:
            # slot cell-cap/row-compaction drops are degraded physics too
            # (the fast path already folds them in; review r2)
            overflow = overflow + split_ctx.addr.overflow
        overflow = jax.lax.psum(overflow, AXIS)
        return (
            State(
                x=x[None],
                v=v[None],
                acc=acc[None],
                rho=jnp.where(active, rho, st.rho)[None],
                p=jnp.where(active, p, st.p)[None],
                kind=kind[None],
                emit_step=emit[None],
                step=st.step + 1,
            ),
            overflow,
        )

    return sharded


def _make_spatial_reuse_local(
    scene: Scene, spec: SpatialSpec, mesh: Mesh, sort_every: int,
    slot_resident: bool = False,
):
    """Per-device BLOCK body for the decomp fast path (pallas only):
    `sort_every` steps per block with the Verlet-skin contract of the
    single-chip fast path (step.make_advance) extended across devices.

    Pinned per block, from block-top positions:
      - the ghost SELECTION (faces within h+skin instead of h — every
        particle drifts < skin/2 within the block, so the pinned set stays
        a superset of each step's exact h-band, and extras beyond h
        annihilate by compact support);
      - the slot ADDRESSING over locals + ghosts (skinned slab-local grid,
        `GridSpec.for_slab(..., skin=...)`), so build_addr's sort runs
        once per block instead of once per step.
    Exchanged per step (values stay exact): ghost (x, v) payloads of the
    pinned indices, then computed ghost (rho, p) between the kernel
    phases — identical collective pattern to the per-step path.
    Deferred to block END: migration and emitter activation (mid-block
    activations join at the next block top, ≤ sort_every steps late —
    the same documented semantics as the single-chip fast path).

    The returned overflow folds every validity audit (ghost/migration/
    addr caps AND skin-drift violations): nonzero ⇒ the block's physics is
    unreliable — same contract the single-chip audit + exact-fallback
    policy is built on.
    """
    from sph_tpu import neighbors, pallas_step
    from sph_tpu.step import default_skin

    params = scene.params
    if slot_resident and params.precision == "bf16":
        raise ValueError(
            "slot_resident decomp does not support precision='bf16': the "
            "slot-side cell-center frame is slab-local (shifted by k_dev "
            "cells), which would blow the bf16 relative-coordinate budget"
        )
    dt = params.dt
    n_sh = spec.n_shards
    ax = spec.axis
    h = params.h
    skin = default_skin(scene, sort_every)
    h_eff = h + skin
    half2 = (0.5 * skin) ** 2
    leap = params.integrator == "leapfrog"
    bf16 = params.precision == "bf16"

    base = neighbors.GridSpec.for_scene(scene)
    grid = neighbors.GridSpec.for_slab(
        scene, spec.slab_w, ax, cap=base.cap, skin=skin
    )
    sg = pallas_step.slot_grid(
        grid,
        batch_skip=(bool(scene.emitters)
                    and scene.params.precision != "bf16"),
    )

    right = [(i, (i + 1) % n_sh) for i in range(n_sh)]
    left = [(i, (i - 1) % n_sh) for i in range(n_sh)]

    def block(st: State):
        st = State(
            step=st.step,
            **{
                f.name: getattr(st, f.name)[0]
                for f in dataclasses.fields(st)
                if f.name != "step"
            },
        )
        d = st.x.shape[1]
        me = jax.lax.axis_index(AXIS)
        my_lo = spec.slab_lo + me.astype(jnp.float32) * spec.slab_w
        my_hi = my_lo + spec.slab_w
        is_first = me == 0
        is_last = me == n_sh - 1

        from sph_tpu import neighbors as _nbr

        s_full = _nbr.GridSpec.for_scene(scene, skin=skin).shape[ax]
        k_dev = jnp.floor(
            (my_lo - h_eff - grid.cell - grid.lo[ax]) / grid.cell
        ).astype(jnp.int32)
        k_dev = jnp.clip(k_dev, 0, s_full - grid.shape[ax])
        ci_off = jnp.zeros((d,), jnp.int32).at[ax].set(1) * k_dev

        active0 = st.emit_step <= st.step
        movable0 = active0 & (st.kind == 0)
        mov = movable0[:, None].astype(st.x.dtype)
        x, v, acc = st.x, st.v, st.acc
        x0_ref = x                      # drift-audit reference (block top)

        # pinned ghost selection: h+skin band from block-top positions
        # (domain-wall faces masked at send — see _make_spatial_local)
        near_lo = active0 & (x[:, ax] < my_lo + h_eff) & ~is_first
        near_hi = active0 & (x[:, ax] >= my_hi - h_eff) & ~is_last
        idx_lo, val_lo, ov1 = _pack_idx(near_lo, spec.cap_ghost)
        idx_hi, val_hi, ov2 = _pack_idx(near_hi, spec.cap_ghost)
        overflow = ov1 + ov2
        viol = jnp.int32(0)

        nl = spec.cap_local
        addr = None
        prev = None                     # collective ordering token

        if slot_resident:
            # ---- SLOT-RESIDENT block: state lives in the slot arrays ----
            # step 0 enters slot space from particle space; steps 1..k-1
            # integrate elementwise in slots, with only the pinned ghost
            # payloads and face (rho, p) crossing particle space (small
            # gathers/scatters instead of the full per-step feature
            # scatter + result gathers).  Bitwise-equal to the classic
            # reuse loop below while no cap overflows (same argument as
            # the single-chip slot-resident advance).
            # Measured (1-device mesh): dam3d_100k 29.4 vs the classic
            # reuse loop's 28.8 ms/step (a wash — scatter+gather are only
            # ~20% of the step there), but splash3d_1m 595 (per-step) →
            # 376 (reuse4) → 321 (resident4) ms/step: at 1M-scale slabs,
            # where those phases are ~44%, this is the decomp counterpart
            # of the single-chip resident win (250→117 ms).
            from sph_tpu.step import _SlotPhysics

            sp = _SlotPhysics(scene, grid, sg)
            lanes = sg.lanes
            g_cap = spec.cap_ghost

            if leap:
                v = v + (0.5 * dt) * acc * mov
                x = x + dt * v * mov
            pay = _pack_payload(x, v, d)
            buf_lo = _gather_rows(pay, idx_lo)
            buf_hi = _gather_rows(pay, idx_hi)
            g_from_right = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [buf_lo, val_lo[:, None].astype(pay.dtype)], 1
                    ),
                    prev,
                ),
                AXIS,
                left,
            )
            g_from_left = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [buf_hi, val_hi[:, None].astype(pay.dtype)], 1
                    ),
                    g_from_right,
                ),
                AXIS,
                right,
            )
            gl_valid = (g_from_left[:, F_GHOST] > 0) & ~is_first
            gr_valid = (g_from_right[:, F_GHOST] > 0) & ~is_last
            far3 = jnp.full((g_cap, d), 1e18, x.dtype)
            glx = jnp.where(gl_valid[:, None], g_from_left[:, 0:d], far3)
            glv = jnp.where(gl_valid[:, None], g_from_left[:, 3 : 3 + d], 0.0)
            grx = jnp.where(gr_valid[:, None], g_from_right[:, 0:d], far3)
            grv = jnp.where(gr_valid[:, None], g_from_right[:, 3 : 3 + d], 0.0)
            cx = jnp.concatenate([x, glx, grx], axis=0)
            cv = jnp.concatenate([v, glv, grv], axis=0)
            c_act = jnp.concatenate([active0, gl_valid, gr_valid], axis=0)
            addr = pallas_step.build_addr(cx, c_act, grid, sg, ci_off)
            overflow = overflow + addr.overflow

            nc = cx.shape[0]
            zc = jnp.zeros((nc, 3 - d), jnp.float32)
            movflag = jnp.concatenate(
                [movable0, jnp.zeros((2 * g_cap,), bool)], axis=0
            )
            rows7 = jnp.concatenate(
                [cx, zc, cv, zc, movflag[:, None].astype(jnp.float32)],
                axis=1,
            )
            feat32 = pallas_step.scatter_slots(addr, rows7, sg)
            xs = feat32[:, 0:d, :]
            vs = feat32[:, 3 : 3 + d, :]
            movb = feat32[:, 6:7, :] > 0
            movs = movb.astype(jnp.float32)
            mk_feat = sp.mk_feat_builder(addr, feat32)
            # drift-audit reference = BIN-time positions (post step-0
            # drift).  This is exactly requirement (a): addr validity
            # needs |x_t − x_bin| < skin/2, and it fires at v > c0·k/(k−1).
            # The pinned ghost band (h+skin from PRE-drift positions) has
            # skin of slack against a skin/2 + one-drift excursion, so
            # requirement (b) is implied; the classic loop's pre-drift
            # reference is merely more conservative (fires at v > c0).
            xs0 = xs
            # no acc scatter: step 0's kick+drift ran in particle space
            # above, so the first kick that reads acc_s is i=1's — by
            # then acc_s is i=0's force result (the scattered value was
            # dead compute)
            acc_s = jnp.zeros_like(xs)

            ok_all = addr.valid & (addr.row_pos > 0)
            # ghost slot scatter indices into the [c_rows, C, lanes] arrays
            okg = ok_all[nl:]
            g_row = addr.row_pos[nl:]
            g_pos = addr.pos[nl:]

            def ghost_idx(c_cols):
                base = jnp.where(
                    okg,
                    (g_row * c_cols) * lanes + g_pos,
                    sg.c_rows * c_cols * lanes,  # out of range -> dropped
                )
                return base[:, None] + (
                    jnp.arange(c_cols, dtype=jnp.int32) * lanes
                )[None, :]

            gidx_d = ghost_idx(d)
            gidx_2 = ghost_idx(2)

            # pinned face gather bases (locals; invalid -> masked after)
            def face_sel(idx_face):
                safe = jnp.minimum(idx_face, nl - 1)
                okf = (idx_face < nl) & ok_all[safe]
                return safe, okf

            safe_lo, okf_lo = face_sel(idx_lo)
            safe_hi, okf_hi = face_sel(idx_hi)

            def face_base(safe, okf, c_cols):
                return jnp.where(
                    okf,
                    (addr.row_pos[safe] * c_cols) * lanes + addr.pos[safe],
                    sg.c_rows * c_cols * lanes - 1,  # in-range, masked out
                )

            base_lo_d = face_base(safe_lo, okf_lo, d)
            base_hi_d = face_base(safe_hi, okf_hi, d)
            base_lo_2 = face_base(safe_lo, okf_lo, 2)
            base_hi_2 = face_base(safe_hi, okf_hi, 2)
            send_lo = val_lo & okf_lo
            send_hi = val_hi & okf_hi
            zg = jnp.zeros((g_cap, 3 - d), jnp.float32)

            for i in range(sort_every):
                step_i = st.step + i
                if i > 0:
                    if leap:
                        vs = vs + (0.5 * dt) * acc_s * movs
                        xs = xs + dt * vs * movs
                    xsf = xs.reshape(-1)
                    vsf = vs.reshape(-1)

                    def mkbuf(base, okf):
                        xx = jnp.stack(
                            [xsf[base + c * lanes] for c in range(d)], 1
                        )
                        vv = jnp.stack(
                            [vsf[base + c * lanes] for c in range(d)], 1
                        )
                        return jnp.concatenate(
                            [
                                jnp.where(okf[:, None], xx, 1e18),
                                zg,
                                jnp.where(okf[:, None], vv, 0.0),
                                zg,
                            ],
                            axis=1,
                        )

                    b_lo = mkbuf(base_lo_d, okf_lo)
                    b_hi = mkbuf(base_hi_d, okf_hi)
                    g_from_right = jax.lax.ppermute(
                        _chained(
                            jnp.concatenate(
                                [
                                    b_lo,
                                    send_lo[:, None].astype(jnp.float32),
                                ],
                                1,
                            ),
                            prev,
                        ),
                        AXIS,
                        left,
                    )
                    g_from_left = jax.lax.ppermute(
                        _chained(
                            jnp.concatenate(
                                [
                                    b_hi,
                                    send_hi[:, None].astype(jnp.float32),
                                ],
                                1,
                            ),
                            g_from_right,
                        ),
                        AXIS,
                        right,
                    )
                    inc_x = jnp.concatenate(
                        [g_from_left[:, 0:d], g_from_right[:, 0:d]], 0
                    )
                    inc_v = jnp.concatenate(
                        [
                            g_from_left[:, 3 : 3 + d],
                            g_from_right[:, 3 : 3 + d],
                        ],
                        0,
                    )
                    xs = (
                        xs.reshape(-1)
                        .at[gidx_d]
                        .set(inc_x, mode="drop")
                        .reshape(xs.shape)
                    )
                    vs = (
                        vs.reshape(-1)
                        .at[gidx_d]
                        .set(inc_v, mode="drop")
                        .reshape(vs.shape)
                    )

                feat = mk_feat(xs, vs)
                rp = pallas_step._call_density(feat, addr, sg, params)
                rpf = rp.reshape(-1)

                def rp_face(base, okf):
                    return jnp.stack(
                        [
                            jnp.where(
                                okf, rpf[base], params.rest_density
                            ),
                            jnp.where(okf, rpf[base + lanes], 0.0),
                        ],
                        axis=1,
                    )

                rp_lo = rp_face(base_lo_2, okf_lo)
                rp_hi = rp_face(base_hi_2, okf_hi)
                rp_from_right = jax.lax.ppermute(
                    _chained(rp_lo, g_from_left), AXIS, left
                )
                rp_from_left = jax.lax.ppermute(
                    _chained(rp_hi, rp_from_right), AXIS, right
                )
                inc_rp = jnp.concatenate(
                    [rp_from_left, rp_from_right], axis=0
                )
                rp = (
                    rp.reshape(-1)
                    .at[gidx_2]
                    .set(inc_rp, mode="drop")
                    .reshape(rp.shape)
                )

                f_s = pallas_step._call_force(feat, rp, addr, sg, params)
                rho_s = rp[:, 0:1, :]
                f_tot = sp.body_forces(
                    xs, vs, rho_s, f_s[:, 0:d, :], step_i
                )
                a_s = jnp.where(
                    movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0
                )
                if leap:
                    vs = vs + (0.5 * dt) * a_s
                    acc_s = a_s
                else:
                    vs = vs + dt * a_s * movs
                    xs = xs + dt * vs * movs
                if params.boundary_mode == "clamp":
                    xs, vs = sp.clamp_slot(xs, vs, movb)
                ddx = xs - xs0
                drift2 = jnp.sum(ddx * ddx, axis=1, keepdims=True)
                viol = viol + jnp.sum(
                    ((drift2 > half2) & movb).astype(jnp.int32)
                )
                prev = rp_from_left

            # materialize locals from the slots (once per block)
            ok_loc = ok_all[:nl]
            okc = ok_loc[:, None]

            def gat_loc(slot):
                # feature-minor transpose + one contiguous row-gather per
                # particle (see pallas_step.slot_rows_view; measured 2.6×
                # cheaper than strided element-gathers at 1M)
                rows = pallas_step.slot_rows_view(slot)
                b = addr.row_pos[:nl] * lanes + addr.pos[:nl]
                return rows[b][:, : min(d, slot.shape[1])]

            x = jnp.where(okc, gat_loc(xs), st.x)
            v = jnp.where(okc, gat_loc(vs), st.v)
            acc = jnp.where(okc & movable0[:, None], gat_loc(a_s), st.acc)
            rho_g = gat_loc(rp)[:, 0]
            rho = jnp.where(ok_loc & active0, rho_g, st.rho)
            p_loc = jnp.where(
                ok_loc & active0,
                physics.eos_pressure(rho, params),
                st.p,
            )
        else:
          for i in range(sort_every):
            if leap:
                v = v + (0.5 * dt) * acc * mov
                x = x + dt * v * mov
            pay = _pack_payload(x, v, d)
            buf_lo = _gather_rows(pay, idx_lo)
            buf_hi = _gather_rows(pay, idx_hi)
            g_from_right = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [buf_lo, val_lo[:, None].astype(pay.dtype)], 1
                    ),
                    prev,
                ),
                AXIS,
                left,
            )
            g_from_left = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [buf_hi, val_hi[:, None].astype(pay.dtype)], 1
                    ),
                    g_from_right,
                ),
                AXIS,
                right,
            )
            gl_valid = (g_from_left[:, F_GHOST] > 0) & ~is_first
            gr_valid = (g_from_right[:, F_GHOST] > 0) & ~is_last

            def unpack_ghost(g, valid):
                gx = g[:, 0:d]
                gv = g[:, 3 : 3 + d]
                far = jnp.full_like(gx, 1e18)
                gx = jnp.where(valid[:, None], gx, far)
                return gx, jnp.where(valid[:, None], gv, 0.0), valid

            glx, glv, glm = unpack_ghost(g_from_left, gl_valid)
            grx, grv, grm = unpack_ghost(g_from_right, gr_valid)
            cx = jnp.concatenate([x, glx, grx], axis=0)
            cv = jnp.concatenate([v, glv, grv], axis=0)

            if addr is None:
                # block top: build the pinned addressing from the first
                # exchange's positions (post-drift for leapfrog, exactly
                # like the per-step path's binning)
                c_act = jnp.concatenate([active0, glm, grm], axis=0)
                addr = pallas_step.build_addr(cx, c_act, grid, sg, ci_off)
                overflow = overflow + addr.overflow

            rows = (
                pallas_step._rel_rows(cx, cv, addr)
                if bf16
                else pallas_step._pack_rows6(cx, cv)
            )
            feat = pallas_step.scatter_slots(addr, rows, sg)
            ctx = pallas_step.SplitCtx(sg=sg, addr=addr, feat=feat)
            rho_c = pallas_step.pallas_density_split(ctx, params)
            rho = rho_c[:nl]
            p_loc = physics.eos_pressure(rho, params)

            rp = jnp.stack([rho, p_loc], axis=1)
            rp_lo = _gather_rows(rp, idx_lo)
            rp_hi = _gather_rows(rp, idx_hi)
            rp_from_right = jax.lax.ppermute(
                _chained(rp_lo, g_from_left), AXIS, left
            )
            rp_from_left = jax.lax.ppermute(
                _chained(rp_hi, rp_from_right), AXIS, right
            )
            ghost_rho = jnp.concatenate(
                [
                    jnp.where(gl_valid, rp_from_left[:, 0], 1.0),
                    jnp.where(gr_valid, rp_from_right[:, 0], 1.0),
                ]
            )
            ghost_p = jnp.concatenate(
                [
                    jnp.where(gl_valid, rp_from_left[:, 1], 0.0),
                    jnp.where(gr_valid, rp_from_right[:, 1], 0.0),
                ]
            )
            rho_cc = jnp.concatenate([rho, ghost_rho])
            p_cc = jnp.concatenate([p_loc, ghost_p])
            f = pallas_step.pallas_forces_split(
                ctx, rho_cc, p_cc, params, d
            )[:nl]

            f = f + physics.gravity_force(rho, params)
            if params.boundary_mode == "penalty":
                f = f + physics.wall_penalty_force(
                    x, v, scene.lo, scene.hi, params
                )
            if scene.force_fields:
                f = f + physics.force_field_force(
                    x, st.step + i, scene.force_fields
                )

            a = f / jnp.maximum(rho, 1e-12)[:, None]
            if leap:
                v = v + (0.5 * dt) * a * mov
            else:
                v = v + dt * a * mov
                x = x + dt * v * mov
            acc = jnp.where(movable0[:, None], a, 0.0)
            if params.boundary_mode == "clamp":
                xc_, vc_ = physics.clamp_boundary(
                    x, v, scene.lo, scene.hi, params
                )
                x = jnp.where(movable0[:, None], xc_, x)
                v = jnp.where(movable0[:, None], vc_, v)

            dd = x - x0_ref
            drift2 = jnp.sum(dd * dd, axis=1)
            viol = viol + jnp.sum(
                ((drift2 > half2) & active0).astype(jnp.int32)
            )
            prev = rp_from_left

        # ---- block end: migration (same policy as the per-step path) ----
        go_left = active0 & (x[:, ax] < my_lo) & ~is_first
        go_right = active0 & (x[:, ax] >= my_hi) & ~is_last
        leaver = go_left | go_right
        mig = _pack_mig(x, v, acc, st.kind, st.emit_step, d)
        m_lo, mval_lo, ov3 = _pack(go_left, mig, spec.cap_mig)
        m_hi, mval_hi, ov4 = _pack(go_right, mig, spec.cap_mig)
        m_from_right = jax.lax.ppermute(
            _chained(
                jnp.concatenate(
                    [m_lo, mval_lo[:, None].astype(mig.dtype)], 1
                ),
                prev,
            ),
            AXIS,
            left,
        )
        m_from_left = jax.lax.ppermute(
            _chained(
                jnp.concatenate(
                    [m_hi, mval_hi[:, None].astype(mig.dtype)], 1
                ),
                m_from_right,
            ),
            AXIS,
            right,
        )
        mr_valid = (m_from_right[:, F_MIG] > 0) & ~is_last
        ml_valid = (m_from_left[:, F_MIG] > 0) & ~is_first
        incoming = jnp.concatenate([m_from_left, m_from_right], axis=0)
        inc_valid = jnp.concatenate([ml_valid, mr_valid], axis=0)

        park = jnp.full((d,), -1e6, x.dtype)
        x = jnp.where(leaver[:, None], park[None, :], x)
        v = jnp.where(leaver[:, None], 0.0, v)
        acc = jnp.where(leaver[:, None], 0.0, acc)
        emit = jnp.where(leaver, INACTIVE, st.emit_step)

        free = emit == INACTIVE
        free_idx = jnp.nonzero(
            free, size=2 * spec.cap_mig, fill_value=spec.cap_local
        )[0]
        # rank-compact arrivals onto the free list: valid arrival #r takes
        # free slot #r regardless of its buffer row (positional
        # free_idx[row] indexing dropped arrivals whenever the row index
        # ran past the populated free prefix even though slots were free)
        rank = jnp.cumsum(inc_valid.astype(jnp.int32)) - 1
        take = free_idx[jnp.clip(rank, 0, 2 * spec.cap_mig - 1)]
        slot = jnp.where(inc_valid, take, spec.cap_local)
        ins_overflow = jnp.sum(
            (inc_valid & (take >= spec.cap_local)).astype(jnp.int32)
        )
        x = x.at[slot, :].set(incoming[:, 0:d], mode="drop")
        v = v.at[slot, :].set(incoming[:, 3 : 3 + d], mode="drop")
        acc = acc.at[slot, :].set(incoming[:, 6 : 6 + d], mode="drop")
        kind = st.kind.at[slot].set(
            incoming[:, 9].astype(jnp.int32), mode="drop"
        )
        emit = emit.at[slot].set(
            jax.lax.bitcast_convert_type(incoming[:, 10], jnp.int32),
            mode="drop",
        )

        overflow = overflow + viol + ov3 + ov4 + ins_overflow
        overflow = jax.lax.psum(overflow, AXIS)
        return (
            State(
                x=x[None],
                v=v[None],
                acc=acc[None],
                rho=jnp.where(active0, rho, st.rho)[None],
                p=jnp.where(active0, p_loc, st.p)[None],
                kind=kind[None],
                emit_step=emit[None],
                step=st.step + sort_every,
            ),
            overflow,
        )

    return block


def _make_spatial_resident_auto(
    scene: Scene, spec: SpatialSpec, mesh: Mesh, sort_every: int,
    blocks: int, rebuild_frac: float = 1.0,
    reactive_theta: float | None = None, membership_audit: bool = True,
    repair_k: int = 0,
):
    """AUTO-REBUILD slot residency under spatial decomposition — the
    decomp form of step._make_resident_auto_advance: the per-slab slot
    state persists ACROSS block boundaries, and the expensive rebuild
    (materialize → migrate → band re-selection → build_addr → scatter)
    runs only when the predictive Verlet-drift check (current max drift +
    1.2× the max-slot-speed projection of the next block, pmax'd across
    the mesh so every device rebuilds together) threatens the skin/2
    budget, or an emitter activated since the last build.

    Validity is the same skin/2 contract as the classic decomp fast path
    (_make_spatial_reuse_local): while every particle has drifted < skin/2
    from its BUILD position, (a) the pinned slot addressing bins it
    correctly (skinned slab grid), (b) the pinned h+skin ghost band stays
    a superset of the exact h-band, and (c) an unmigrated slab-leaver is
    still covered by the neighbor slab's ghost band — so migration can be
    deferred to the next rebuild.  Per-step ghost (x, v) and face (rho, p)
    exchanges still run every step (values stay exact).

    SPMD discipline: the rebuild predicate is uniform across the mesh
    (lax.pmax), and every collective on the FAST path runs
    UNCONDITIONALLY with the same per-block schedule in both phases
    (migration buffers are zero-masked on keep-blocks).  The ONE
    conditional that does contain collectives — the in-dispatch HEAL —
    is guarded by a psum'd (hence mesh-uniform) predicate, so every
    device enters the branch together and the collective schedules
    match (validated on the 8-device CPU mesh and the TPU).

    HEALING (the decomp form of single-chip heal, VERDICT-r2 weakness 5
    closed across the mesh): a block whose audit fires anywhere on the
    mesh — skin-drift violation, cell-cap/row overflow at build, or a
    ghost/migration buffer overflow — is re-run EXACTLY from its held
    block-top state on the per-step spatial path (_make_spatial_local:
    fresh h-band ghosts, per-step grids, per-step migration), then
    residency is re-entered.  The pre-block state is recoverable inside
    the cond because the block's unconditional phase A/B/C effects are
    simply discarded on ALL devices (uniform predicate) and `live`
    routes materialize to the shadow when no block has run.  A dispatch
    where every block heals degrades bitwise to the per-step spatial
    advance.  Cost: ~sort_every per-step steps (~1.6 s at 1M) instead
    of the ~35 s per-dispatch host-side re-run.

    The returned shard_map body gives `(state, overflow, rebuilds,
    healed)` — plus a trailing `repaired_blocks` counter when
    repair_k > 0; overflow now carries only what healing could not repair —
    the heal path's own static-cap overflows (spec outgrowth → elastic
    recovery) — plus dispatch-end exit/migration audits."""
    from sph_tpu import neighbors, pallas_step
    from sph_tpu.step import _SlotPhysics, default_skin

    params = scene.params
    if params.precision == "bf16":
        raise ValueError(
            "auto-rebuild decomp does not support precision='bf16' (same "
            "slab-local cell-center frame limit as the resident block)"
        )
    dt = params.dt
    d = params.dim
    n_sh = spec.n_shards
    ax = spec.axis
    h = params.h
    skin = default_skin(scene, sort_every)
    h_eff = h + skin
    half2 = (0.5 * skin) ** 2
    budget = rebuild_frac * 0.5 * skin if rebuild_frac > 0 else 0.0
    leap = params.integrator == "leapfrog"
    use_mem = membership_audit
    # Membership-relaxed audit across the mesh (see step.py's lemma notes
    # above _slot_bin_refs).  Two decomp-specific amendments keep it
    # sound with slab faces that cut THROUGH lattice cells:
    #   1. the ghost band doubles to 2·h_eff: an in-bin remote source can
    #      sit up to h + cell past a face (its bin adjacent to a local
    #      straddling bin), beyond the strict-audit band of h_eff —
    #      SpatialSpec.for_state already sizes cap_ghost for this band;
    #   2. slab LEAVERS keep the STRICT drift budget (audit adds
    #      `| beyond-face`): the neighbor's band coverage of pairs around
    #      a leaver is only guaranteed to depth skin/2 past the face.
    # Out-of-coverage ghost bins clip into the slab grid's edge cells,
    # which only ADDS candidates (annihilated by compact support) — never
    # drops pairs — so the slab grid itself needs no widening.
    band_w = 2.0 * h_eff if use_mem else h_eff
    if repair_k:
        # MINORITY SLOT REPAIR across the mesh (step.make_repair_tools):
        # strictly INTERIOR particles only — a band particle has ghost
        # copies on a neighbor whose slot addressing (and hence the
        # lemma's case-(a) coverage) a local repair cannot patch; any
        # risky band/leaver particle vetoes the repair and the mesh
        # rebuilds uniformly instead.  Post-repair soundness: an interior
        # particle sits ≥ band_w = 2·h_eff from every face at BUILD, so
        # even after another skin/2 of post-repair drift it stays > h
        # from the face — no remote pair can involve it before the next
        # rebuild, and it can never be a migration leaver.
        # (bf16 needs no check here: the auto-rebuild decomp path raised
        # on precision='bf16' unconditionally above)
        if not use_mem:
            raise ValueError("repair_k requires membership_audit=True")
        if reactive_theta is not None or rebuild_frac <= 0:
            raise ValueError(
                "repair_k composes with the membership predicate only "
                "(reactive_theta=None, rebuild_frac > 0)"
            )

    base = neighbors.GridSpec.for_scene(scene)
    grid = neighbors.GridSpec.for_slab(
        scene, spec.slab_w, ax, cap=base.cap, skin=skin
    )
    sg = pallas_step.slot_grid(
        grid,
        batch_skip=(bool(scene.emitters)
                    and scene.params.precision != "bf16"),
    )
    sp = _SlotPhysics(scene, grid, sg)
    lanes = sg.lanes
    g_cap = spec.cap_ghost
    nl = spec.cap_local

    right = [(i, (i + 1) % n_sh) for i in range(n_sh)]
    left = [(i, (i - 1) % n_sh) for i in range(n_sh)]
    s_full = neighbors.GridSpec.for_scene(scene, skin=skin).shape[ax]

    zg = jnp.zeros((g_cap, 3 - d), jnp.float32)
    zrow = jnp.zeros((sg.c_rows, 3 - d, sg.lanes), jnp.float32)

    # exact per-step spatial body for the heal branch (fresh h-band
    # ghosts + per-step grids + per-step migration, default bare slab
    # grid — the decomp analog of single-chip heal's make_step)
    per_step = _make_spatial_local(scene, spec, mesh, method="pallas")

    def scanned(st: State):
        st = State(
            step=st.step,
            **{
                f.name: getattr(st, f.name)[0]
                for f in dataclasses.fields(st)
                if f.name != "step"
            },
        )
        me = jax.lax.axis_index(AXIS)
        my_lo = spec.slab_lo + me.astype(jnp.float32) * spec.slab_w
        my_hi = my_lo + spec.slab_w
        is_first = me == 0
        is_last = me == n_sh - 1
        k_dev = jnp.floor(
            (my_lo - h_eff - grid.cell - grid.lo[ax]) / grid.cell
        ).astype(jnp.int32)
        k_dev = jnp.clip(k_dev, 0, s_full - grid.shape[ax])
        ci_off = jnp.zeros((d,), jnp.int32).at[ax].set(1) * k_dev

        # ---- shadow = particle-space arrays, valid as of the last build
        def masks(sh, at_step):
            act = sh["emit"] <= at_step
            return act, act & (sh["kind"] == 0)

        if repair_k:
            from sph_tpu.step import make_repair_tools

            plan_t, apply_t = make_repair_tools(
                grid, sg, d, dt, sort_every, budget, repair_k,
                sp.gather, ci_off=ci_off,
            )
            BIGR = jnp.int32(2**30)

            def plan_repair(c):
                sh = c["shadow"]
                act0, movable0 = masks(sh, c["build_step"])
                # interior = outside BOTH band selections at BUILD (the
                # anchors ARE the selection positions) → no ghost copy
                # of this particle exists anywhere on the mesh
                bx = sh["x"][:, ax]
                out_band = (
                    ~((bx < my_lo + band_w) & ~is_first)
                    & ~((bx >= my_hi - band_w) & ~is_last)
                )

                def face_fn(x_now):
                    xa = x_now[:, ax]
                    face_m = jnp.minimum(
                        jnp.where(is_first, jnp.inf, xa - my_lo),
                        jnp.where(is_last, jnp.inf, my_hi - xa),
                    )
                    return face_m, out_band

                return plan_t(c, sh["x"], act0, movable0, face_fn=face_fn)

            def apply_repair(cp):
                c, p_ = cp
                c2 = apply_t(c, p_)
                # advance the repaired anchors (see step.py's phantom-
                # risky note) — shadow.x is read back only via
                # materialize (slot values win for slotted movers)
                sh = c["shadow"]
                sidx = jnp.where(p_["vm"], p_["pids"], BIGR)
                sh2 = {
                    **sh,
                    "x": sh["x"].at[sidx].set(p_["x_m"], mode="drop"),
                }
                return {**c2, "shadow": sh2}

            def zero_plan():
                k0 = jnp.zeros((repair_k,), jnp.int32)
                return dict(
                    can=jnp.bool_(False), n_risky=jnp.int32(0), pids=k0,
                    vm=jnp.zeros((repair_k,), bool),
                    x_m=jnp.zeros((repair_k, d), jnp.float32),
                    old_row=k0, old_pos=k0, new_row=k0, new_pos=k0,
                )

        def drift_shadow(sh, at_step):
            """Leapfrog block-top pre-drift in particle space (the rebuild
            path's counterpart of the in-slot drift)."""
            if not leap:
                return sh
            _, movable = masks(sh, at_step)
            mov = movable[:, None].astype(jnp.float32)
            v = sh["v"] + (0.5 * dt) * sh["acc"] * mov
            x = sh["x"] + dt * v * mov
            return {**sh, "x": x, "v": v}

        def band_pack(sh, at_step):
            """Fresh face-band selection + (x, v) payloads (band_w deep:
            h+skin strict, 2·(h+skin) under the membership audit)."""
            act, _ = masks(sh, at_step)
            x = sh["x"]
            near_lo = act & (x[:, ax] < my_lo + band_w) & ~is_first
            near_hi = act & (x[:, ax] >= my_hi - band_w) & ~is_last
            idx_lo, val_lo, ov1 = _pack_idx(near_lo, g_cap)
            idx_hi, val_hi, ov2 = _pack_idx(near_hi, g_cap)
            pay = _pack_payload(x, sh["v"], d)
            return (idx_lo, val_lo, _gather_rows(pay, idx_lo),
                    idx_hi, val_hi, _gather_rows(pay, idx_hi), ov1 + ov2)

        def materialize(c):
            """Slots → shadow at the carry's current step (non-slotted
            particles keep shadow values — same semantics as the
            single-chip auto advance)."""
            addr, sh = c["addr"], c["shadow"]
            act0, movable0 = masks(sh, c["build_step"])
            # until a block has run (`live`), the slots hold the pre-kick
            # v and acc/rp placeholders — the shadow (exactly current at
            # that point) is the source of truth
            ok_loc = (addr.valid & (addr.row_pos > 0))[:nl] & c["live"]
            okc = ok_loc[:, None]

            def gat(slot, ncomp):
                rows = pallas_step.slot_rows_view(slot)
                b = addr.row_pos[:nl] * lanes + addr.pos[:nl]
                return rows[b][:, :ncomp]

            x = jnp.where(okc, gat(c["xs"], d), sh["x"])
            v = jnp.where(okc, gat(c["vs"], d), sh["v"])
            acc = jnp.where(
                okc & movable0[:, None], gat(c["acc"], d), sh["acc"]
            )
            rho_g = gat(c["rp"], 1)[:, 0]
            rho = jnp.where(ok_loc & act0, rho_g, sh["rho"])
            p_ = jnp.where(
                ok_loc & act0, physics.eos_pressure(rho, params), sh["p"]
            )
            return {**sh, "x": x, "v": v, "acc": acc, "rho": rho, "p": p_}

        def exit_shadow(c):
            """Materialize + park leavers + pack migration buffers (local
            only — the exchange itself is unconditional)."""
            sh = materialize(c)
            act0, _ = masks(sh, c["build_step"])
            x = sh["x"]
            go_left = act0 & (x[:, ax] < my_lo) & ~is_first
            go_right = act0 & (x[:, ax] >= my_hi) & ~is_last
            leaver = go_left | go_right
            mig = _pack_mig(x, sh["v"], sh["acc"], sh["kind"], sh["emit"], d)
            m_lo, mval_lo, ov3 = _pack(go_left, mig, spec.cap_mig)
            m_hi, mval_hi, ov4 = _pack(go_right, mig, spec.cap_mig)
            park = jnp.full((d,), -1e6, x.dtype)
            sh = {
                **sh,
                "x": jnp.where(leaver[:, None], park[None, :], x),
                "v": jnp.where(leaver[:, None], 0.0, sh["v"]),
                "acc": jnp.where(leaver[:, None], 0.0, sh["acc"]),
                "emit": jnp.where(leaver, INACTIVE, sh["emit"]),
            }
            return sh, m_lo, mval_lo, m_hi, mval_hi, ov3 + ov4

        def mig_exchange(sh, m_lo, mval_lo, m_hi, mval_hi, token):
            """Unconditional migration ring exchange + free-slot insertion
            (zero-masked buffers on keep-blocks make it a no-op)."""
            m_from_right = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [m_lo, mval_lo[:, None].astype(jnp.float32)], 1
                    ),
                    token,
                ),
                AXIS, left,
            )
            m_from_left = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [m_hi, mval_hi[:, None].astype(jnp.float32)], 1
                    ),
                    m_from_right,
                ),
                AXIS, right,
            )
            mr_valid = (m_from_right[:, F_MIG] > 0) & ~is_last
            ml_valid = (m_from_left[:, F_MIG] > 0) & ~is_first
            incoming = jnp.concatenate([m_from_left, m_from_right], axis=0)
            inc_valid = jnp.concatenate([ml_valid, mr_valid], axis=0)
            free = sh["emit"] == INACTIVE
            free_idx = jnp.nonzero(
                free, size=2 * spec.cap_mig, fill_value=nl
            )[0]
            rank = jnp.cumsum(inc_valid.astype(jnp.int32)) - 1
            take = free_idx[jnp.clip(rank, 0, 2 * spec.cap_mig - 1)]
            slot = jnp.where(inc_valid, take, nl)
            ins_over = jnp.sum(
                (inc_valid & (take >= nl)).astype(jnp.int32)
            )
            sh = {
                **sh,
                "x": sh["x"].at[slot, :].set(incoming[:, 0:d], mode="drop"),
                "v": sh["v"].at[slot, :].set(
                    incoming[:, 3 : 3 + d], mode="drop"
                ),
                "acc": sh["acc"].at[slot, :].set(
                    incoming[:, 6 : 6 + d], mode="drop"
                ),
                "kind": sh["kind"].at[slot].set(
                    incoming[:, 9].astype(jnp.int32), mode="drop"
                ),
                "emit": sh["emit"].at[slot].set(
                    jax.lax.bitcast_convert_type(incoming[:, 10], jnp.int32),
                    mode="drop",
                ),
            }
            return sh, ins_over, m_from_left

        def build_residency(sh, g_left, g_right, at_step):
            """Local: slot addressing + feature scatter over locals +
            received ghost payloads (the rebuild branch of phase C)."""
            act0, movable0 = masks(sh, at_step)
            gl_valid = (g_left[:, F_GHOST] > 0) & ~is_first
            gr_valid = (g_right[:, F_GHOST] > 0) & ~is_last
            far3 = jnp.full((g_cap, d), 1e18, jnp.float32)
            glx = jnp.where(gl_valid[:, None], g_left[:, 0:d], far3)
            glv = jnp.where(gl_valid[:, None], g_left[:, 3 : 3 + d], 0.0)
            grx = jnp.where(gr_valid[:, None], g_right[:, 0:d], far3)
            grv = jnp.where(gr_valid[:, None], g_right[:, 3 : 3 + d], 0.0)
            cx = jnp.concatenate([sh["x"], glx, grx], axis=0)
            cv = jnp.concatenate([sh["v"], glv, grv], axis=0)
            c_act = jnp.concatenate([act0, gl_valid, gr_valid], axis=0)
            addr = pallas_step.build_addr(cx, c_act, grid, sg, ci_off)
            nc = cx.shape[0]
            zc = jnp.zeros((nc, 3 - d), jnp.float32)
            movflag = jnp.concatenate(
                [movable0, jnp.zeros((2 * g_cap,), bool)], axis=0
            )
            rows7 = jnp.concatenate(
                [cx, zc, cv, zc, movflag[:, None].astype(jnp.float32)],
                axis=1,
            )
            feat32 = pallas_step.scatter_slots(addr, rows7, sg)
            xs = feat32[:, 0:d, :]
            vs = feat32[:, 3 : 3 + d, :]
            movb = feat32[:, 6:7, :] > 0
            # no acc scatter (measured ~55 ms at 1M): on the rebuild path
            # step 0's kick+drift ran in particle space (drift_shadow) so
            # the first acc_s reader is i=1's kick — post-force by then —
            # and at the dispatch top the half-kick is pre-applied to the
            # scattered v instead (see scanned()); materialize falls back
            # to the shadow acc until a block has run (`live`)
            acc_s = jnp.zeros_like(xs)
            return addr, xs, vs, acc_s, movb

        def make_pins(addr, idx_lo, val_lo, idx_hi, val_hi):
            """Block-window-pinned slot indices: ghost scatter targets and
            face gather bases (identical construction to
            _make_spatial_reuse_local, packaged for the scan carry)."""
            ok_all = addr.valid & (addr.row_pos > 0)
            okg = ok_all[nl:]
            g_row = addr.row_pos[nl:]
            g_pos = addr.pos[nl:]

            def ghost_idx(c_cols):
                b = jnp.where(
                    okg,
                    (g_row * c_cols) * lanes + g_pos,
                    sg.c_rows * c_cols * lanes,  # out of range -> dropped
                )
                return b[:, None] + (
                    jnp.arange(c_cols, dtype=jnp.int32) * lanes
                )[None, :]

            def face_sel(idx_face):
                safe = jnp.minimum(idx_face, nl - 1)
                okf = (idx_face < nl) & ok_all[safe]
                return safe, okf

            safe_lo, okf_lo = face_sel(idx_lo)
            safe_hi, okf_hi = face_sel(idx_hi)

            def face_base(safe, okf, c_cols):
                return jnp.where(
                    okf,
                    (addr.row_pos[safe] * c_cols) * lanes + addr.pos[safe],
                    sg.c_rows * c_cols * lanes - 1,  # in-range, masked out
                )

            return dict(
                idx_lo=idx_lo, idx_hi=idx_hi,
                okf_lo=okf_lo, okf_hi=okf_hi,
                send_lo=val_lo & okf_lo, send_hi=val_hi & okf_hi,
                gidx_d=ghost_idx(d), gidx_2=ghost_idx(2),
                base_lo_d=face_base(safe_lo, okf_lo, d),
                base_hi_d=face_base(safe_hi, okf_hi, d),
                base_lo_2=face_base(safe_lo, okf_lo, 2),
                base_hi_2=face_base(safe_hi, okf_hi, 2),
            )

        def mkbuf(xs, vs, base, okf):
            xsf = xs.reshape(-1)
            vsf = vs.reshape(-1)
            xx = jnp.stack([xsf[base + c * lanes] for c in range(d)], 1)
            vv = jnp.stack([vsf[base + c * lanes] for c in range(d)], 1)
            return jnp.concatenate(
                [
                    jnp.where(okf[:, None], xx, 1e18), zg,
                    jnp.where(okf[:, None], vv, 0.0), zg,
                ],
                axis=1,
            )

        def set_ghosts(xs, vs, pins, g_left, g_right):
            inc_x = jnp.concatenate([g_left[:, 0:d], g_right[:, 0:d]], 0)
            inc_v = jnp.concatenate(
                [g_left[:, 3 : 3 + d], g_right[:, 3 : 3 + d]], 0
            )
            xs = (
                xs.reshape(-1)
                .at[pins["gidx_d"]].set(inc_x, mode="drop")
                .reshape(xs.shape)
            )
            vs = (
                vs.reshape(-1)
                .at[pins["gidx_d"]].set(inc_v, mode="drop")
                .reshape(vs.shape)
            )
            return xs, vs

        def ghost_exchange(buf_lo, flag_lo, buf_hi, flag_hi, token):
            g_from_right = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [buf_lo, flag_lo[:, None].astype(jnp.float32)], 1
                    ),
                    token,
                ),
                AXIS, left,
            )
            g_from_left = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [buf_hi, flag_hi[:, None].astype(jnp.float32)], 1
                    ),
                    g_from_right,
                ),
                AXIS, right,
            )
            return g_from_left, g_from_right

        # ---- dispatch top: enter residency from UNDRIFTED positions (the
        # first moving block immediately drifts in slot space, or the
        # rebuild branch round-trips bitwise — either way no double drift)
        sh0 = dict(
            x=st.x, v=st.v, acc=st.acc, rho=st.rho, p=st.p,
            kind=st.kind, emit=st.emit_step,
        )
        step_t = st.step

        def enter(sh, at_step):
            """Synchronized shadow → fresh residency carry core.

            Leapfrog: the block-top half-kick is pre-applied in particle
            space to the SCATTERED v (identical elementwise arithmetic
            to the old in-slot kick from a scattered acc, which this
            deletes); the carried shadow keeps the raw synchronized v —
            materialize falls back to it until a block has run (`live`).
            rho/p are likewise not scattered: step 0's density kernel
            overwrites rp before any consumer reads it.  The enter's own
            build/band audits land in `pend`, consumed by the NEXT
            block's heal predicate (so a bad enter is repaired too)."""
            if leap:
                movf = masks(sh, at_step)[1][:, None].astype(jnp.float32)
                shs = {**sh, "v": sh["v"] + (0.5 * dt) * sh["acc"] * movf}
            else:
                shs = sh
            idx_lo, val_lo, buf_lo, idx_hi, val_hi, buf_hi, ovb = (
                band_pack(shs, at_step)
            )
            g_l, g_r = ghost_exchange(buf_lo, val_lo, buf_hi, val_hi, None)
            addr, xs, vs, acc, movb = build_residency(shs, g_l, g_r, at_step)
            pins = make_pins(addr, idx_lo, val_lo, idx_hi, val_hi)
            rp = jnp.zeros((sg.c_rows, 2, sg.lanes), jnp.float32)
            return dict(
                addr=addr, xs=xs, vs=vs, acc=acc, rp=rp, movb=movb,
                pins=pins, x0s=xs, shadow=sh, build_step=at_step,
                step=at_step, pend=addr.overflow + ovb,
                live=jnp.bool_(False),
                # ordering token: a tiny slice keeps the data dependence
                # on the last collective without growing the scan carry
                # (shape must be stable across blocks)
                tok=g_l[0, :1],
            )

        carry0 = dict(
            enter(sh0, step_t),
            over=jnp.int32(0),
            rebuilds=jnp.int32(1), healed=jnp.int32(0),
        )
        if repair_k:
            carry0["repairs"] = jnp.int32(0)

        def block(c, _):
            step0 = c["step"]
            # --- uniform rebuild decision (one pmax across the mesh) ---
            dd = c["xs"] - c["x0s"]
            dd2 = jnp.sum(dd * dd, axis=1, keepdims=True)
            drift_now = jnp.sqrt(jnp.max(dd2))
            if reactive_theta is not None:
                # reactive policy (see step._make_resident_auto_advance):
                # rebuild on MEASURED drift only; the in-dispatch heal is
                # the backstop when a block still overruns skin/2
                metric, thresh = drift_now, reactive_theta * 0.5 * skin
            elif use_mem and rebuild_frac > 0:
                # per-slot AND predicate — the shared lemma helper
                # (step._membership_risky), with the slab-face distance as
                # extra margin (leaver strictness); pmax'd as a 0/1 flag
                from sph_tpu.step import _membership_risky

                xax = c["xs"][:, ax : ax + 1, :]
                face_m = jnp.minimum(
                    jnp.where(is_first, jnp.inf, xax - my_lo),
                    jnp.where(is_last, jnp.inf, my_hi - xax),
                )
                risky = _membership_risky(
                    c, c["addr"], sg, grid, dd2, dt, sort_every, budget,
                    ci_offset=ci_off, extra_margin=face_m,
                )
                metric = jnp.any(risky).astype(jnp.float32)
                thresh = 0.5
            else:
                vmax = jnp.sqrt(
                    jnp.max(jnp.sum(c["vs"] * c["vs"], axis=1))
                )
                metric = drift_now + 1.2 * vmax * dt * sort_every
                thresh = budget
            activated = jnp.any(
                (c["shadow"]["emit"] > c["build_step"])
                & (c["shadow"]["emit"] <= step0)
            )
            sig = jax.lax.pmax(
                _chained(
                    jnp.stack([metric, activated.astype(jnp.float32)]),
                    c["tok"],
                ),
                AXIS,
            )
            need = (sig[0] > thresh) | (sig[1] > 0)
            if repair_k:
                # second uniform round, only under `need` (a collective
                # inside a lax.cond is legal because `need` is already
                # mesh-uniform): every device plans its local repair and
                # the mesh repairs TOGETHER iff no device vetoes (can
                # covers: ≤ K risky, all interior, all placeable).  The
                # repair itself is collective-free and purely local.
                act_any = sig[1] > 0

                def try_plan(c_):
                    p_ = plan_repair(c_)
                    # a device with nothing risky consents (its apply is
                    # a no-op); a device with risky it cannot re-home
                    # exactly vetoes the whole mesh into a rebuild
                    veto = ~(p_["can"] | (p_["n_risky"] == 0))
                    nb = veto.astype(jnp.float32)
                    return p_, jax.lax.pmax(_chained(nb, sig), AXIS)

                def no_plan(c_):
                    return zero_plan(), jnp.float32(1.0)

                plan_d, cbad = jax.lax.cond(
                    need & ~act_any, try_plan, no_plan, c
                )
                do_rep = need & ~act_any & (cbad <= 0.0)
                c = jax.lax.cond(
                    do_rep, apply_repair, lambda cp: cp[0], (c, plan_d)
                )
                need = need & ~do_rep
                tokA = _chained(sig, cbad)
            else:
                tokA = sig

            # --- phase A (local cond): exit + leaver packing ---
            def a_yes(c_):
                return exit_shadow(c_)

            def a_no(c_):
                zmig = jnp.zeros((spec.cap_mig, F_MIG), jnp.float32)
                zval = jnp.zeros((spec.cap_mig,), bool)
                return c_["shadow"], zmig, zval, zmig, zval, jnp.int32(0)

            shA, m_lo, mval_lo, m_hi, mval_hi, ovm = jax.lax.cond(
                need, a_yes, a_no, c
            )
            shA, ins_over, tok = mig_exchange(
                shA, m_lo, mval_lo, m_hi, mval_hi, tokA
            )

            # --- phase B (local cond): band + ghost payload source ---
            def b_fresh(sh):
                shD = drift_shadow(sh, step0)
                (idx_lo, val_lo, buf_lo, idx_hi, val_hi, buf_hi,
                 ovb) = band_pack(shD, step0)
                return (shD, idx_lo, val_lo, buf_lo, idx_hi, val_hi,
                        buf_hi, ovb, c["xs"], c["vs"])

            def b_keep(sh):
                pins = c["pins"]
                if leap:
                    movs = c["movb"].astype(jnp.float32)
                    vs2 = c["vs"] + (0.5 * dt) * c["acc"] * movs
                    xs2 = c["xs"] + dt * vs2 * movs
                else:
                    xs2, vs2 = c["xs"], c["vs"]
                return (
                    sh, pins["idx_lo"], pins["send_lo"],
                    mkbuf(xs2, vs2, pins["base_lo_d"], pins["okf_lo"]),
                    pins["idx_hi"], pins["send_hi"],
                    mkbuf(xs2, vs2, pins["base_hi_d"], pins["okf_hi"]),
                    jnp.int32(0), xs2, vs2,
                )

            (shB, idx_lo, flag_lo, buf_lo, idx_hi, flag_hi, buf_hi, ovb,
             xs2, vs2) = jax.lax.cond(need, b_fresh, b_keep, shA)
            g_left, g_right = ghost_exchange(
                buf_lo, flag_lo, buf_hi, flag_hi, tok
            )

            # --- phase C (local cond): build vs ghost-slot update ---
            def c_build(op):
                sh, gl, gr = op
                addr, xs3, vs3, acc3, movb3 = build_residency(
                    sh, gl, gr, step0
                )
                pins = make_pins(addr, idx_lo, flag_lo, idx_hi, flag_hi)
                # rp stays carried: it is overwritten by step 0's density
                # kernel before any consumer reads it (materialize only
                # runs after a full block)
                return dict(
                    addr=addr, xs=xs3, vs=vs3, acc=acc3, movb=movb3,
                    pins=pins, x0s=xs3, rp=c["rp"], build_step=step0,
                    pend=addr.overflow,
                )

            def c_keep(op):
                _, gl, gr = op
                xs3, vs3 = set_ghosts(xs2, vs2, c["pins"], gl, gr)
                return dict(
                    addr=c["addr"], xs=xs3, vs=vs3, acc=c["acc"],
                    movb=c["movb"], pins=c["pins"], x0s=c["x0s"],
                    rp=c["rp"], build_step=c["build_step"],
                    pend=jnp.int32(0),
                )

            sl = jax.lax.cond(need, c_build, c_keep, (shB, g_left, g_right))

            # --- sort_every slot-space steps (same inner loop as the
            # classic resident block; step 0's drift/ghost-set happened in
            # phases B/C) ---
            addr, movb, pins = sl["addr"], sl["movb"], sl["pins"]
            movs = movb.astype(jnp.float32)
            xs, vs, acc_s, rp = sl["xs"], sl["vs"], sl["acc"], sl["rp"]
            x0s = sl["x0s"]
            viol = jnp.int32(0)  # THIS block's drift audit (heal decides)
            tok2 = g_left

            # movable flag + zero spare col: full FEAT=8 columns, like every
            # other feat builder — the kernel BlockSpec DMAs 8-column
            # blocks, so a 7-column feat would make column 7 read padded/
            # undefined memory (unread today, but a trap for any future
            # use of the spare column)
            feat_tail = jnp.concatenate([movs, jnp.zeros_like(movs)], axis=1)

            def mk_feat(xs_, vs_):
                return jnp.concatenate(
                    [xs_, zrow, vs_, zrow, feat_tail], axis=1
                )

            for i in range(sort_every):
                step_i = step0 + i
                if i > 0:
                    if leap:
                        vs = vs + (0.5 * dt) * acc_s * movs
                        xs = xs + dt * vs * movs
                    b_lo = mkbuf(xs, vs, pins["base_lo_d"], pins["okf_lo"])
                    b_hi = mkbuf(xs, vs, pins["base_hi_d"], pins["okf_hi"])
                    g_left, g_right = ghost_exchange(
                        b_lo, pins["send_lo"], b_hi, pins["send_hi"], tok2
                    )
                    xs, vs = set_ghosts(xs, vs, pins, g_left, g_right)
                feat = mk_feat(xs, vs)
                rp = pallas_step._call_density(feat, addr, sg, params)
                rpf = rp.reshape(-1)

                def rp_face(base, okf):
                    return jnp.stack(
                        [
                            jnp.where(okf, rpf[base], params.rest_density),
                            jnp.where(okf, rpf[base + lanes], 0.0),
                        ],
                        axis=1,
                    )

                rp_lo = rp_face(pins["base_lo_2"], pins["okf_lo"])
                rp_hi = rp_face(pins["base_hi_2"], pins["okf_hi"])
                rp_from_right = jax.lax.ppermute(
                    _chained(rp_lo, g_left), AXIS, left
                )
                rp_from_left = jax.lax.ppermute(
                    _chained(rp_hi, rp_from_right), AXIS, right
                )
                inc_rp = jnp.concatenate([rp_from_left, rp_from_right], 0)
                rp = (
                    rp.reshape(-1)
                    .at[pins["gidx_2"]].set(inc_rp, mode="drop")
                    .reshape(rp.shape)
                )
                f_s = pallas_step._call_force(feat, rp, addr, sg, params)
                rho_s = rp[:, 0:1, :]
                f_tot = sp.body_forces(xs, vs, rho_s, f_s[:, 0:d, :], step_i)
                a_s = jnp.where(movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0)
                if leap:
                    vs = vs + (0.5 * dt) * a_s
                    acc_s = a_s
                else:
                    vs = vs + dt * a_s * movs
                    xs = xs + dt * vs * movs
                    acc_s = a_s
                if params.boundary_mode == "clamp":
                    xs, vs = sp.clamp_slot(xs, vs, movb)
                ddx = xs - x0s
                drift2 = jnp.sum(ddx * ddx, axis=1, keepdims=True)
                bad_i = (drift2 > half2) & movb
                if use_mem:
                    # membership-relaxed via the shared lemma helper, with
                    # leaver strictness: across a slab face the neighbor's
                    # band coverage needs the strict budget
                    from sph_tpu.step import _membership_bad

                    xax_a = xs[:, ax : ax + 1, :]
                    beyond = (
                        ((xax_a < my_lo) & ~is_first)
                        | ((xax_a >= my_hi) & ~is_last)
                    )
                    bad_i = _membership_bad(
                        bad_i, xs, addr, sg, grid, ci_offset=ci_off,
                        beyond=beyond,
                    )
                viol = viol + jnp.sum(bad_i.astype(jnp.int32))
                tok2 = rp_from_left

            # --- uniform heal decision: EVERY audit of this block, psum'd
            # so all devices take the same branch (collectives are legal
            # inside the branch under a uniform predicate) ---
            blk_audit = (
                c["pend"] + ovm + ins_over + ovb + sl["pend"] + viol
            )
            bad = jax.lax.psum(_chained(blk_audit, tok2), AXIS) > 0

            ok_carry = dict(
                addr=addr, xs=xs, vs=vs, acc=acc_s, rp=rp, movb=movb,
                pins=pins, x0s=x0s, shadow=shB,
                build_step=sl["build_step"], step=step0 + sort_every,
                pend=jnp.int32(0),
                # blk_audit (incl. this block's viol count) == 0 when this
                # branch runs; residual violations reach the overflow sum
                # only through a heal's ov_h, never as a separate counter
                over=c["over"] + blk_audit,
                rebuilds=c["rebuilds"] + need.astype(jnp.int32),
                healed=c["healed"],
                live=jnp.bool_(True),  # slot v/acc/rp real from now on
                tok=tok2[0, :1],
            )
            if repair_k:
                ok_carry["repairs"] = (
                    c["repairs"] + do_rep.astype(jnp.int32)
                )

            def heal_blk(_):
                """Exact re-run of this block on the per-step spatial path
                (fresh h-band ghosts, per-step grid + migration), from the
                held PRE-block state — the block's unconditional phase
                effects are discarded on every device (uniform `bad`).
                Ends with fresh residency; its enter audits land in pend
                for the next block's predicate."""
                sm = materialize(c)
                st1 = State(
                    x=sm["x"][None], v=sm["v"][None], acc=sm["acc"][None],
                    rho=sm["rho"][None], p=sm["p"][None],
                    kind=sm["kind"][None], emit_step=sm["emit"][None],
                    step=step0,
                )
                ov_h = jnp.int32(0)
                for _ in range(sort_every):
                    st1, ov_s = per_step(st1)
                    ov_h = ov_h + ov_s  # already psum'd (uniform): an
                    # unhealable-spec-outgrowth indicator, not a count
                sh_new = dict(
                    x=st1.x[0], v=st1.v[0], acc=st1.acc[0], rho=st1.rho[0],
                    p=st1.p[0], kind=st1.kind[0], emit=st1.emit_step[0],
                )
                fresh = enter(sh_new, step0 + sort_every)
                out_h = dict(
                    fresh,
                    over=c["over"] + ov_h,
                    rebuilds=c["rebuilds"] + 1,
                    healed=c["healed"] + 1,
                )
                if repair_k:
                    out_h["repairs"] = (
                        c["repairs"] + do_rep.astype(jnp.int32)
                    )
                return out_h

            c_out = jax.lax.cond(bad, heal_blk, lambda _o: ok_carry, None)
            return c_out, None

        final, _ = jax.lax.scan(block, carry0, length=blocks)

        # ---- dispatch end: exit residency + final migration ----
        shF, m_lo, mval_lo, m_hi, mval_hi, ovmF = exit_shadow(final)
        shF, ins_overF, _ = mig_exchange(
            shF, m_lo, mval_lo, m_hi, mval_hi, final["tok"]
        )
        overflow = jax.lax.psum(
            final["over"] + final["pend"] + ovmF + ins_overF,
            AXIS,
        )
        out = State(
            x=shF["x"][None], v=shF["v"][None], acc=shF["acc"][None],
            rho=shF["rho"][None], p=shF["p"][None], kind=shF["kind"][None],
            emit_step=shF["emit"][None], step=final["step"],
        )
        outs = (out, overflow, final["rebuilds"], final["healed"])
        if repair_k:
            outs = outs + (final["repairs"],)
        return outs

    return scanned


def _spatial_specs():
    part = P(AXIS)
    return State(
        x=part, v=part, acc=part, rho=part, p=part,
        kind=part, emit_step=part, step=P(),
    )


def make_spatial_step(
    scene: Scene, spec: SpatialSpec, mesh: Mesh, method: str = "grid"
):
    """jitted single sharded step (stacked local State in/out).

    NOTE: back-to-back *separate* dispatches of collective programs can
    deadlock the CPU in-process communicator (devices end up in different
    runs at a rendezvous); for multi-step driving use
    `make_spatial_advance`, which scans steps inside ONE program — also the
    production dispatch shape (SURVEY.md §3.5)."""
    sharded = _make_spatial_local(scene, spec, mesh, method)
    spec_in = _spatial_specs()
    return jax.jit(
        jax.shard_map(
            sharded, mesh=mesh, in_specs=(spec_in,),
            out_specs=(spec_in, P()),
            check_vma=False,
        )
    )


def make_spatial_advance(
    scene: Scene,
    spec: SpatialSpec,
    mesh: Mesh,
    method: str = "grid",
    steps_per_dispatch: int = 50,
    sort_every: int = 1,
    slot_resident: bool = False,
    auto_rebuild: bool = False,
    rebuild_frac: float = 1.0,
    reactive_theta: float | None = None,
    membership_audit: bool = True,
    repair_k: int = 0,
):
    """jitted advance: `steps_per_dispatch` sharded steps in one lax.scan.

    sort_every > 1 (pallas only): the decomp FAST PATH — Verlet-skin
    addr/ghost-selection reuse per `sort_every`-step block with migration
    at block boundaries (see _make_spatial_reuse_local).  slot_resident
    additionally keeps the block's state IN the slot arrays (elementwise
    integration; only pinned ghost payloads and face rho/p cross particle
    space per step) — the decomp form of the single-chip flagship mode.
    auto_rebuild (slot_resident only) keeps the residency ACROSS block
    boundaries, rebuilding (and migrating) only when the mesh-wide
    predictive drift check or an emitter activation demands it, and
    HEALS violating blocks in-dispatch on the per-step spatial path
    (_make_spatial_resident_auto); returns (state, worst_overflow,
    rebuilds, healed_blocks) instead — plus a trailing repaired_blocks
    counter when repair_k > 0 — where worst_overflow carries only what
    healing could not repair (spec-cap outgrowth on the per-step path
    itself).

    Returns (state, worst_overflow): worst_overflow > 0 means a ghost/
    migration/local buffer cap dropped particles — or, on the fast path,
    the skin-drift audit fired — in some step/block; the dispatch's
    physics is then unreliable (watchdog hook, SURVEY.md §5.2-5.3)."""
    if slot_resident and sort_every <= 1:
        raise ValueError("slot_resident requires sort_every > 1")
    if auto_rebuild and not slot_resident:
        raise ValueError("auto_rebuild requires slot_resident=True")
    if auto_rebuild:
        if method != "pallas":
            raise ValueError("auto_rebuild requires method='pallas'")
        if steps_per_dispatch % sort_every:
            raise ValueError(
                f"steps_per_dispatch={steps_per_dispatch} must be a "
                f"multiple of sort_every={sort_every}"
            )
        scanned = _make_spatial_resident_auto(
            scene, spec, mesh, sort_every,
            steps_per_dispatch // sort_every, rebuild_frac=rebuild_frac,
            reactive_theta=reactive_theta,
            membership_audit=membership_audit,
            repair_k=repair_k,
        )
        spec_in = _spatial_specs()
        outs = (spec_in, P(), P(), P())
        if repair_k:
            outs = outs + (P(),)
        return jax.jit(
            jax.shard_map(
                scanned, mesh=mesh, in_specs=(spec_in,),
                out_specs=outs,
                check_vma=False,
            )
        )
    if sort_every > 1:
        if method != "pallas":
            raise ValueError("sort_every > 1 requires method='pallas'")
        if steps_per_dispatch % sort_every:
            raise ValueError(
                f"steps_per_dispatch={steps_per_dispatch} must be a "
                f"multiple of sort_every={sort_every}"
            )
        sharded = _make_spatial_reuse_local(
            scene, spec, mesh, sort_every, slot_resident=slot_resident
        )
        length = steps_per_dispatch // sort_every
    else:
        sharded = _make_spatial_local(scene, spec, mesh, method)
        length = steps_per_dispatch

    def scanned(st: State):
        def body(carry, _):
            s, worst = carry
            s, over = sharded(s)
            return (s, jnp.maximum(worst, over)), None

        (out, worst), _ = jax.lax.scan(
            body, (st, jnp.int32(0)), length=length
        )
        return out, worst

    spec_in = _spatial_specs()
    return jax.jit(
        jax.shard_map(
            scanned, mesh=mesh, in_specs=(spec_in,),
            out_specs=(spec_in, P()),
            check_vma=False,
        )
    )


# ---------------------------------------------------------------------------
# 3. Pencil (2-axis) decomposition — ring per axis, corner ghosts via two-hop
# ---------------------------------------------------------------------------

AXIS2 = "shard2"


def mesh2d(n1: int, n2: int) -> Mesh:
    """2D device mesh for pencil decomposition: axis AXIS (n1) × AXIS2
    (n2), row-major over jax.devices()."""
    devs = jax.devices()
    if n1 * n2 > len(devs):
        raise ValueError(f"need {n1 * n2} devices, have {len(devs)}")
    return Mesh(np.array(devs[: n1 * n2]).reshape(n1, n2), (AXIS, AXIS2))


@dataclasses.dataclass(frozen=True)
class PencilSpec:
    """Static 2-axis decomposition geometry: the domain is cut into
    n1 × n2 rectangular pencils along (axis1, axis2).  ROADMAP round-3
    queue 3 / VERDICT r2 missing 4: the structure slabs cannot give past
    ~dozens of chips (slab width shrinks below 2h; pencils keep each cut
    direction coarse)."""

    n1: int
    n2: int
    axis1: int
    axis2: int
    lo1: float
    lo2: float
    w1: float
    w2: float
    cap_local: int
    cap_ghost: int   # per face, both axes (phase-2 bands include phase-1
    #                  ghosts, so this is sized from the worst band of
    #                  either axis plus the corner strips)
    cap_mig: int

    @staticmethod
    def for_state(
        scene: Scene,
        state,
        n1: int,
        n2: int,
        axis1: int = 0,
        axis2: int | None = None,
        headroom: float = 3.0,
        skin: float = 0.0,
    ) -> "PencilSpec":
        """Occupancy-aware sizing, same pattern as SpatialSpec.for_state:
        cap_local from the worst pencil, cap_ghost from the worst face
        band (2·h_eff deep) of either axis."""
        import numpy as np_

        if axis2 is None:
            # default: the last axis (2D: the other axis; 3D: x — keeps
            # the vertical (gravity) axis uncut for dam scenes)
            axis2 = scene.dim - 1
        if axis1 == axis2:
            raise ValueError("pencil axes must differ")
        lo1, hi1 = scene.lo[axis1], scene.hi[axis1]
        lo2, hi2 = scene.lo[axis2], scene.hi[axis2]
        w1 = (hi1 - lo1) / n1
        w2 = (hi2 - lo2) / n2
        if min(w1, w2) < 2 * scene.params.h:
            raise ValueError(
                f"pencil widths ({w1:.1f}, {w2:.1f}) < 2h; fewer shards"
            )
        x = np_.asarray(state.x)
        live = np_.asarray(state.emit_step) != int(INACTIVE)
        s1 = np_.clip(((x[:, axis1] - lo1) // w1).astype(int), 0, n1 - 1)
        s2 = np_.clip(((x[:, axis2] - lo2) // w2).astype(int), 0, n2 - 1)
        worst = int(
            np_.bincount((s1 * n2 + s2)[live], minlength=n1 * n2).max()
        )
        cap_local = min(
            _round_up(state.capacity, 64),
            _round_up(int(worst * headroom) + 64, 64),
        )
        h_eff = scene.params.h + skin
        band = 0
        for axn, lo, w, ax in ((n1, lo1, w1, axis1), (n2, lo2, w2, axis2)):
            xa = x[live, ax]
            for i in range(1, axn):
                band = max(
                    band,
                    int(np_.sum(np_.abs(xa - (lo + i * w)) < 2.0 * h_eff)),
                )
        cap_ghost = min(
            _round_up(cap_local // 2 + 64, 64),
            _round_up(int(band * headroom) + 256, 64),
        )
        return PencilSpec(
            n1=n1, n2=n2, axis1=axis1, axis2=axis2,
            lo1=lo1, lo2=lo2, w1=w1, w2=w2,
            cap_local=cap_local,
            cap_ghost=cap_ghost,
            cap_mig=max(_round_up(cap_ghost // 2, 64), 256),
        )


def pencil_shard_state(state: State, scene: Scene, spec: PencilSpec, mesh: Mesh):
    """Host-side: split a global State into per-pencil local States, stacked
    on a leading device axis (row-major (i1, i2)) and device_put sharded
    over the 2D mesh."""
    n1, n2 = spec.n1, spec.n2
    x = np.asarray(state.x)
    live = np.asarray(state.emit_step) != int(INACTIVE)
    s1 = np.clip(
        ((x[:, spec.axis1] - spec.lo1) // spec.w1).astype(int), 0, n1 - 1
    )
    s2 = np.clip(
        ((x[:, spec.axis2] - spec.lo2) // spec.w2).astype(int), 0, n2 - 1
    )
    pencil = s1 * n2 + s2
    fields = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
        if f.name != "step"
    }
    out = {k: [] for k in fields}
    park = x.min(axis=0) * 0 + np.float32(-1e6)
    for s in range(n1 * n2):
        sel = live & (pencil == s)
        cnt = sel.sum()
        if cnt > spec.cap_local:
            raise ValueError(
                f"pencil {s} holds {cnt} > cap_local {spec.cap_local}"
            )
        pad = spec.cap_local - cnt
        for k, arr in fields.items():
            take = arr[sel]
            if k == "x":
                fill = np.broadcast_to(park, (pad, take.shape[1]))
            elif k == "emit_step":
                fill = np.full((pad,), INACTIVE, take.dtype)
            elif k == "rho":
                fill = np.ones((pad,), take.dtype)
            else:
                fill = np.zeros((pad,) + take.shape[1:], take.dtype)
            out[k].append(np.concatenate([take, fill], axis=0))
    stacked = {k: np.stack(v, axis=0) for k, v in out.items()}
    loc = State(
        step=state.step, **{k: jnp.asarray(v) for k, v in stacked.items()}
    )

    def sspec(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n1 * n2:
            return NamedSharding(
                mesh, P((AXIS, AXIS2), *([None] * (leaf.ndim - 1)))
            )
        return NamedSharding(mesh, P())

    return jax.device_put(loc, jax.tree.map(sspec, loc))


def _make_pencil_local(
    scene: Scene, spec: PencilSpec, mesh: Mesh, method: str = "pallas"
):
    """Per-device pencil step body.  Same structure as _make_spatial_local
    with every phase done TWICE, once per cut axis, sequentially:

      ghosts:    axis1 faces first; the axis2 exchange then selects from
                 locals AND the fresh axis1 ghosts, so corner regions
                 (diagonal-neighbor pencils) arrive via two hops — no
                 dedicated corner channels (SURVEY.md §5.7).
      rho/p:     re-imported in the same two-hop order (phase 2 forwards
                 phase-1-corrected ghost values, so corner ghosts stream
                 their owner's exact rho/p).
      migration: axis1 exchange, insert, then axis2 over the updated
                 arrays — a particle crossing both faces in one step
                 reaches its diagonal owner in the same step.
    """
    params = scene.params
    dt = params.dt
    a1, a2 = spec.axis1, spec.axis2
    h = params.h

    from sph_tpu import neighbors

    grid = neighbors.GridSpec.for_pencil(
        scene, {a1: spec.w1, a2: spec.w2}
    )

    right1 = [(i, (i + 1) % spec.n1) for i in range(spec.n1)]
    left1 = [(i, (i - 1) % spec.n1) for i in range(spec.n1)]
    right2 = [(i, (i + 1) % spec.n2) for i in range(spec.n2)]
    left2 = [(i, (i - 1) % spec.n2) for i in range(spec.n2)]

    def sharded(st: State):
        st = State(
            step=st.step,
            **{
                f.name: getattr(st, f.name)[0]
                for f in dataclasses.fields(st)
                if f.name != "step"
            },
        )
        d = st.x.shape[1]
        me1 = jax.lax.axis_index(AXIS)
        me2 = jax.lax.axis_index(AXIS2)
        my_lo1 = spec.lo1 + me1.astype(jnp.float32) * spec.w1
        my_hi1 = my_lo1 + spec.w1
        my_lo2 = spec.lo2 + me2.astype(jnp.float32) * spec.w2
        my_hi2 = my_lo2 + spec.w2
        first1, last1 = me1 == 0, me1 == spec.n1 - 1
        first2, last2 = me2 == 0, me2 == spec.n2 - 1

        # integer cell offset against the global lattice, both cut axes
        s_full = neighbors.GridSpec.for_scene(scene).shape
        ci_off = jnp.zeros((d,), jnp.int32)
        for ax, my_lo in ((a1, my_lo1), (a2, my_lo2)):
            k_dev = jnp.floor(
                (my_lo - h - grid.cell - grid.lo[ax]) / grid.cell
            ).astype(jnp.int32)
            k_dev = jnp.clip(k_dev, 0, s_full[ax] - grid.shape[ax])
            ci_off = ci_off.at[ax].set(k_dev)

        active = st.emit_step <= st.step
        movable = active & (st.kind == 0)
        mov = movable[:, None].astype(st.x.dtype)
        x, v, acc = st.x, st.v, st.acc

        if params.integrator == "leapfrog":
            v = v + (0.5 * dt) * acc * mov
            x = x + dt * v * mov

        gc = spec.cap_ghost
        nl = spec.cap_local
        prev = None

        def exchange(pay_rows, masks, axis_name, left, right, prev):
            """One two-sided ghost/payload exchange along a mesh axis:
            pack rows where mask, ppermute both directions, chained."""
            (m_lo, m_hi) = masks
            buf_lo, val_lo, ov_a = _pack(m_lo, pay_rows, gc)
            buf_hi, val_hi, ov_b = _pack(m_hi, pay_rows, gc)
            fr_r = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [buf_lo, val_lo[:, None].astype(pay_rows.dtype)], 1
                    ),
                    prev,
                ),
                axis_name,
                left,
            )
            fr_l = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [buf_hi, val_hi[:, None].astype(pay_rows.dtype)], 1
                    ),
                    fr_r,
                ),
                axis_name,
                right,
            )
            return fr_l, fr_r, ov_a + ov_b

        # ---- ghosts, phase 1 (axis1) ----
        near_lo1 = active & (x[:, a1] < my_lo1 + h) & ~first1
        near_hi1 = active & (x[:, a1] >= my_hi1 - h) & ~last1
        pay = _pack_payload(x, v, d)
        g1l, g1r, ov1 = exchange(
            pay, (near_lo1, near_hi1), AXIS, left1, right1, prev
        )
        g1l_valid = (g1l[:, F_GHOST] > 0) & ~first1
        g1r_valid = (g1r[:, F_GHOST] > 0) & ~last1

        def unpack(g, valid):
            far = jnp.full((gc, d), 1e18, x.dtype)
            gx = jnp.where(valid[:, None], g[:, 0:d], far)
            gv = jnp.where(valid[:, None], g[:, 3 : 3 + d], 0.0)
            return gx, gv

        g1lx, g1lv = unpack(g1l, g1l_valid)
        g1rx, g1rv = unpack(g1r, g1r_valid)
        cx1 = jnp.concatenate([x, g1lx, g1rx], axis=0)
        cv1 = jnp.concatenate([v, g1lv, g1rv], axis=0)
        act1 = jnp.concatenate([active, g1l_valid, g1r_valid], axis=0)

        # ---- ghosts, phase 2 (axis2, over locals + phase-1 ghosts) ----
        near_lo2 = act1 & (cx1[:, a2] < my_lo2 + h) & ~first2
        near_hi2 = act1 & (cx1[:, a2] >= my_hi2 - h) & ~last2
        pay1 = _pack_payload(cx1, cv1, d)
        g2l, g2r, ov2 = exchange(
            pay1, (near_lo2, near_hi2), AXIS2, left2, right2, g1l
        )
        g2l_valid = (g2l[:, F_GHOST] > 0) & ~first2
        g2r_valid = (g2r[:, F_GHOST] > 0) & ~last2
        g2lx, g2lv = unpack(g2l, g2l_valid)
        g2rx, g2rv = unpack(g2r, g2r_valid)
        cx = jnp.concatenate([cx1, g2lx, g2rx], axis=0)
        cv = jnp.concatenate([cv1, g2lv, g2rv], axis=0)
        c_act = jnp.concatenate([act1, g2l_valid, g2r_valid], axis=0)

        # ---- density over locals + both ghost bands ----
        split_ctx = None
        if method == "grid":
            rho_c = neighbors.grid_density(
                cx, c_act, params, grid, ci_offset=ci_off
            )
        elif method == "pallas":
            from sph_tpu import pallas_step

            split_ctx = pallas_step.pallas_split_build(
                cx, cv, c_act, params, grid, ci_offset=ci_off
            )
            rho_c = pallas_step.pallas_density_split(split_ctx, params)
        else:
            rho_c = physics.density_naive(cx, c_act, params)
        rho = rho_c[:nl]
        p_loc = physics.eos_pressure(rho, params)

        # ---- rho/p re-import, two-hop (phase 1 then phase 2) ----
        rp_loc = jnp.stack([rho, p_loc], axis=1)
        rp1_lo, _, _ = _pack(near_lo1, rp_loc, gc)
        rp1_hi, _, _ = _pack(near_hi1, rp_loc, gc)
        rp1_fr_r = jax.lax.ppermute(_chained(rp1_lo, g2l), AXIS, left1)
        rp1_fr_l = jax.lax.ppermute(
            _chained(rp1_hi, rp1_fr_r), AXIS, right1
        )
        g1l_rp = jnp.where(
            g1l_valid[:, None], rp1_fr_l,
            jnp.array([[1.0, 0.0]], jnp.float32),
        )
        g1r_rp = jnp.where(
            g1r_valid[:, None], rp1_fr_r,
            jnp.array([[1.0, 0.0]], jnp.float32),
        )
        rp_c1 = jnp.concatenate([rp_loc, g1l_rp, g1r_rp], axis=0)
        # phase 2 forwards the corrected combined1 values (corner ghosts
        # get their owner's exact rho/p via the middle device)
        rp2_lo, _, _ = _pack(near_lo2, rp_c1, gc)
        rp2_hi, _, _ = _pack(near_hi2, rp_c1, gc)
        rp2_fr_r = jax.lax.ppermute(
            _chained(rp2_lo, rp1_fr_l), AXIS2, left2
        )
        rp2_fr_l = jax.lax.ppermute(
            _chained(rp2_hi, rp2_fr_r), AXIS2, right2
        )
        g2l_rp = jnp.where(
            g2l_valid[:, None], rp2_fr_l,
            jnp.array([[1.0, 0.0]], jnp.float32),
        )
        g2r_rp = jnp.where(
            g2r_valid[:, None], rp2_fr_r,
            jnp.array([[1.0, 0.0]], jnp.float32),
        )
        rp_cc = jnp.concatenate([rp_c1, g2l_rp, g2r_rp], axis=0)
        rho_cc, p_cc = rp_cc[:, 0], rp_cc[:, 1]

        # ---- forces with correct ghost rho/p ----
        if method == "grid":
            f_c = neighbors.grid_forces(
                cx, cv, rho_cc, p_cc, c_act, params, grid, ci_offset=ci_off
            )
        elif method == "pallas":
            from sph_tpu import pallas_step

            f_c = pallas_step.pallas_forces_split(
                split_ctx, rho_cc, p_cc, params, d
            )
        else:
            f_c = physics.forces_naive(cx, cv, rho_cc, p_cc, c_act, params)
        f = f_c[:nl]
        f = f + physics.gravity_force(rho, params)
        if params.boundary_mode == "penalty":
            f = f + physics.wall_penalty_force(
                x, v, scene.lo, scene.hi, params
            )
        if scene.force_fields:
            f = f + physics.force_field_force(x, st.step, scene.force_fields)

        # ---- integrate locals ----
        a = f / jnp.maximum(rho, 1e-12)[:, None]
        if params.integrator == "leapfrog":
            v = v + (0.5 * dt) * a * mov
        else:
            v = v + dt * a * mov
            x = x + dt * v * mov
        acc = jnp.where(movable[:, None], a, 0.0)
        if params.boundary_mode == "clamp":
            xc, vc = physics.clamp_boundary(x, v, scene.lo, scene.hi, params)
            x = jnp.where(movable[:, None], xc, x)
            v = jnp.where(movable[:, None], vc, v)

        # ---- migration, two-phase ----
        kind, emit = st.kind, st.emit_step
        ov_mig = jnp.int32(0)
        prev_tok = rp2_fr_l
        for phase, (ax_name, lo_b, hi_b, ax, first, last, left, right) in (
            (1, (AXIS, my_lo1, my_hi1, a1, first1, last1, left1, right1)),
            (2, (AXIS2, my_lo2, my_hi2, a2, first2, last2, left2, right2)),
        ):
            act_now = emit <= st.step
            go_left = act_now & (x[:, ax] < lo_b) & ~first
            go_right = act_now & (x[:, ax] >= hi_b) & ~last
            leaver = go_left | go_right
            mig = _pack_mig(x, v, acc, kind, emit, d)
            m_lo, mval_lo, ova = _pack(go_left, mig, spec.cap_mig)
            m_hi, mval_hi, ovb = _pack(go_right, mig, spec.cap_mig)
            m_fr_r = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [m_lo, mval_lo[:, None].astype(mig.dtype)], 1
                    ),
                    prev_tok,
                ),
                ax_name,
                left,
            )
            m_fr_l = jax.lax.ppermute(
                _chained(
                    jnp.concatenate(
                        [m_hi, mval_hi[:, None].astype(mig.dtype)], 1
                    ),
                    m_fr_r,
                ),
                ax_name,
                right,
            )
            mr_valid = (m_fr_r[:, F_MIG] > 0) & ~last
            ml_valid = (m_fr_l[:, F_MIG] > 0) & ~first
            incoming = jnp.concatenate([m_fr_l, m_fr_r], axis=0)
            inc_valid = jnp.concatenate([ml_valid, mr_valid], axis=0)

            park = jnp.full((d,), -1e6, x.dtype)
            x = jnp.where(leaver[:, None], park[None, :], x)
            v = jnp.where(leaver[:, None], 0.0, v)
            acc = jnp.where(leaver[:, None], 0.0, acc)
            emit = jnp.where(leaver, INACTIVE, emit)

            free = emit == INACTIVE
            free_idx = jnp.nonzero(
                free, size=2 * spec.cap_mig, fill_value=spec.cap_local
            )[0]
            rank = jnp.cumsum(inc_valid.astype(jnp.int32)) - 1
            take = free_idx[jnp.clip(rank, 0, 2 * spec.cap_mig - 1)]
            slot = jnp.where(inc_valid, take, spec.cap_local)
            ov_mig = ov_mig + ova + ovb + jnp.sum(
                (inc_valid & (take >= spec.cap_local)).astype(jnp.int32)
            )
            x = x.at[slot, :].set(incoming[:, 0:d], mode="drop")
            v = v.at[slot, :].set(incoming[:, 3 : 3 + d], mode="drop")
            acc = acc.at[slot, :].set(incoming[:, 6 : 6 + d], mode="drop")
            kind = kind.at[slot].set(
                incoming[:, 9].astype(jnp.int32), mode="drop"
            )
            emit = emit.at[slot].set(
                jax.lax.bitcast_convert_type(incoming[:, 10], jnp.int32),
                mode="drop",
            )
            prev_tok = m_fr_l

        overflow = ov1 + ov2 + ov_mig
        if split_ctx is not None:
            overflow = overflow + split_ctx.addr.overflow
        overflow = jax.lax.psum(overflow, (AXIS, AXIS2))
        return (
            State(
                x=x[None],
                v=v[None],
                acc=acc[None],
                rho=jnp.where(active, rho, st.rho)[None],
                p=jnp.where(active, p_loc, st.p)[None],
                kind=kind[None],
                emit_step=emit[None],
                step=st.step + 1,
            ),
            overflow,
        )

    return sharded


def make_pencil_advance(
    scene: Scene,
    spec: PencilSpec,
    mesh: Mesh,
    method: str = "pallas",
    steps_per_dispatch: int = 50,
):
    """jitted pencil advance: `steps_per_dispatch` 2-axis-decomposed steps
    in one lax.scan.  Returns (state, worst_overflow) — same audit
    contract as make_spatial_advance."""
    sharded = _make_pencil_local(scene, spec, mesh, method)

    def scanned(st: State):
        def body(carry, _):
            s, worst = carry
            s, over = sharded(s)
            return (s, jnp.maximum(worst, over)), None

        (out, worst), _ = jax.lax.scan(
            body, (st, jnp.int32(0)), length=steps_per_dispatch
        )
        return out, worst

    part = P((AXIS, AXIS2))
    spec_in = State(
        x=part, v=part, acc=part, rho=part, p=part,
        kind=part, emit_step=part, step=P(),
    )
    return jax.jit(
        jax.shard_map(
            scanned, mesh=mesh, in_specs=(spec_in,),
            out_specs=(spec_in, P()),
            check_vma=False,
        )
    )


class SpatialCapOverflow(RuntimeError):
    """A spatial dispatch overflowed a static buffer (ghost/migration/
    local/slot cap) even on the per-step-rebuild path: the SpatialSpec is
    too small for the current state.  Callers recover by rebuilding the
    spec from the gathered state (`SpatialSpec.for_state`) and recompiling
    — see cli.cmd_run's elastic-recovery loop."""


def make_audited_spatial_advance(
    scene: Scene,
    spec: SpatialSpec,
    mesh: Mesh,
    method: str = "pallas",
    steps_per_dispatch: int = 100,
    sort_every: int = 1,
    slot_resident: bool = False,
    auto_rebuild: bool = True,
    reactive_theta: float | None = None,
    membership_audit: bool = True,
    repair_k: int | None = None,
):
    """`advance(loc_state) -> loc_state` with the single-chip audited-
    fallback policy extended across the mesh (VERDICT r2 missing 2): when
    the fast path's skin/cap audit fires, the dispatch re-runs from its
    held input on the per-step-rebuild spatial path — fast when the skin
    bound holds, exact when not.  If even the per-step path overflows a
    static buffer, raises SpatialCapOverflow (the spec must be resized —
    a recompile-grade event, surfaced rather than silently degraded).

    auto_rebuild (default, slot_resident fast path only): the residency
    persists across blocks with the mesh-wide predictive rebuild policy
    (same production default as the single-chip make_audited_advance)."""
    import sys

    auto = auto_rebuild and slot_resident and sort_every > 1
    if repair_k is None:
        # same production default as step.make_audited_advance (the
        # decomp repair is interior-only and veto-guarded — see
        # make_spatial_advance); repair_k=0 pins rebuild-only
        from sph_tpu.step import default_repair_k

        repair_k = default_repair_k(
            scene, auto=auto, membership_audit=membership_audit,
            reactive_theta=reactive_theta,
        )
    adv = make_spatial_advance(
        scene, spec, mesh, method, steps_per_dispatch,
        sort_every=sort_every, slot_resident=slot_resident,
        auto_rebuild=auto,
        reactive_theta=reactive_theta if auto else None,
        membership_audit=membership_audit,
        repair_k=repair_k if auto else 0,
    )
    exact = []  # per-step spatial fallback, compiled on first use
    blocks = max(steps_per_dispatch // max(sort_every, 1), 1)
    streak = [0]    # consecutive all-blocks-healed fast dispatches
    demoted = [0]   # dispatches run since demotion (0 = fast path)

    def _raise_overflow(loc: State, worst: int):
        raise SpatialCapOverflow(
            f"spatial dispatch at step {int(loc.step)} overflowed a static "
            f"buffer even on the per-step path (worst={int(worst)}); "
            f"rebuild the SpatialSpec from the current state "
            f"(SpatialSpec.for_state) and recompile"
        )

    def _exact_run(loc: State) -> State:
        if not exact:
            exact.append(
                make_spatial_advance(
                    scene, spec, mesh, method, steps_per_dispatch
                )
            )
        out, worst = exact[0](loc)
        if int(worst):
            _raise_overflow(loc, int(worst))
        return out

    def _dispatch_fast(loc: State):
        """One fast dispatch → (state, healed_blocks).

        (state, worst[, rebuilds, healed[, repairs]]) — auto adds the
        counters; repair_k the trailing one.  ONE batched device_get
        for all scalars (each separate int() is a ~20 ms host
        round-trip through the compile tunnel — step.py _unpack note)."""
        res = adv(loc)
        out = res[0]
        vals = [int(v) for v in jax.device_get(res[1:])]
        worst = vals[0]
        healed = vals[2] if len(vals) > 2 else 0
        if len(vals) > 3:
            audited.repaired += vals[3]
        if healed:
            audited.healed += healed
            print(
                f"sph_tpu: skin/cap violations at step {int(loc.step)} — "
                f"{healed} block(s) re-ran exactly on the per-step "
                f"spatial path (in-dispatch, mesh-uniform)",
                file=sys.stderr,
            )
        if worst == 0:
            return out, healed
        if sort_every > 1:
            print(
                f"sph_tpu: {int(worst)} skin/cap violations in a spatial "
                f"{steps_per_dispatch}-step dispatch at step "
                f"{int(loc.step)} — re-ran exactly (per-step rebuild)",
                file=sys.stderr,
            )
            # the whole dispatch re-ran per-step: counts as all blocks
            # healed for the demotion streak (per-step absorbed what the
            # fast path could not even hold in its static buffers)
            return _exact_run(loc), blocks
        _raise_overflow(loc, int(worst))

    def audited(loc: State) -> State:
        # CONSTANT-HEAL DEMOTION across the mesh (round 5 — the same
        # policy as step.make_audited_advance): a healed block pays the
        # failed fast attempt plus the exact re-run, so a flow that holds
        # the whole mesh above the Verlet drift budget demotes to the
        # per-step spatial path, with a bounded fast-path re-probe.
        from sph_tpu.step import DEMOTE_PATIENCE, PERSTEP_REPROBE_EVERY

        if demoted[0]:
            demoted[0] += 1
            if demoted[0] % PERSTEP_REPROBE_EVERY:
                return _exact_run(loc)
            out, healed = _dispatch_fast(loc)
            if healed >= blocks:
                return out  # still violent — stay demoted
            demoted[0] = 0
            streak[0] = 0
            audited.mode = "resident"
            print(
                f"sph_tpu: drift back under the Verlet budget at step "
                f"{int(loc.step)} ({healed}/{blocks} blocks healed) — "
                f"resuming the resident spatial fast path",
                file=sys.stderr,
            )
            return out
        out, healed = _dispatch_fast(loc)
        streak[0] = streak[0] + 1 if healed >= blocks else 0
        if streak[0] >= DEMOTE_PATIENCE:
            demoted[0] = 1
            audited.mode = "perstep"
            print(
                f"sph_tpu: flow outruns the Verlet drift budget — every "
                f"block healed {streak[0]} dispatches straight at step "
                f"{int(loc.step)}; demoting to the per-step spatial path "
                f"(re-probes every {PERSTEP_REPROBE_EVERY} dispatches)",
                file=sys.stderr,
            )
        return out

    audited.healed = 0  # cumulative in-dispatch healed blocks (observability)
    audited.repaired = 0  # cumulative minority-repaired blocks
    audited.mode = "resident"
    return audited


def make_audited_pencil_advance(
    scene: Scene,
    spec: PencilSpec,
    mesh: Mesh,
    method: str = "pallas",
    steps_per_dispatch: int = 100,
):
    """Pencil counterpart of make_audited_spatial_advance (same
    `advance(loc) -> loc` contract, so cli._run_spatial drives either).
    The pencil path is per-step-rebuild only — slabs carry the
    sort_every/slot-resident flagship; pencils exist for mesh shapes
    slabs cannot reach (SURVEY.md §5.7, slab width < 2h) — so a nonzero
    audit has no faster path to fall back FROM: it is directly a
    static-buffer event, surfaced as SpatialCapOverflow for the caller's
    elastic recovery (PencilSpec.for_state + recompile)."""
    adv = make_pencil_advance(scene, spec, mesh, method, steps_per_dispatch)

    def audited(loc: State) -> State:
        out, worst = adv(loc)
        if int(worst) == 0:
            return out
        raise SpatialCapOverflow(
            f"pencil dispatch at step {int(loc.step)} overflowed a static "
            f"buffer (worst={int(worst)}); rebuild the PencilSpec from the "
            f"current state (PencilSpec.for_state) and recompile"
        )

    return audited
