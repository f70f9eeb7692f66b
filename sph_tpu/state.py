"""Particle state pytree and scene initialization (SURVEY.md C2, C3, C13).

TPU-native restatement of the reference's `std::vector<Particle>` (AoS,
dynamically grown on keypress): a fixed-capacity structure-of-arrays pytree.
Dynamic particle counts become *activation schedules* — every slot has an
`emit_step`; a slot is active iff `emit_step <= state.step`.  Emitting
particles mid-run changes no shapes and needs no host sync: the step counter
advances inside the jitted step and the mask follows (SURVEY.md §7 hard-part
6).  Inactive slots are parked far outside the domain and masked out of all
pair sums.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.params import Scene

INACTIVE = np.int32(2**31 - 1)  # emit_step sentinel: never activates


@jax.tree_util.register_dataclass
@dataclass
class State:
    """Structure-of-arrays particle state; all arrays capacity-N, fp32.

    x, v, acc : [N, D]  position / velocity / acceleration (force/rho)
    rho, p    : [N]     density / pressure (as of the last completed step)
    kind      : [N] i32 0 = fluid, 1 = static boundary particle
    emit_step : [N] i32 step at which the slot activates (INACTIVE = never)
    step      : i32     completed-step counter
    """

    x: jax.Array
    v: jax.Array
    acc: jax.Array
    rho: jax.Array
    p: jax.Array
    kind: jax.Array
    emit_step: jax.Array
    step: jax.Array

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def dim(self) -> int:
        return self.x.shape[1]

    @property
    def active(self) -> jax.Array:
        """[N] bool — slots live at the current step."""
        return self.emit_step <= self.step

    def n_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))


def _lattice(lo, hi, spacing, rng, jitter_frac):
    """Host-side lattice fill of an axis-aligned box, with jitter."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    axes = [np.arange(l + spacing * 0.5, h, spacing) for l, h in zip(lo, hi)]
    # a block thinner than the pitch still seeds one plane at its midpoint
    axes = [
        a if a.size else np.array([(l + h) * 0.5]) for a, l, h in zip(axes, lo, hi)
    ]
    grids = np.meshgrid(*axes, indexing="ij")
    pts = np.stack([g.ravel() for g in grids], axis=-1)
    pts += (rng.random(pts.shape) - 0.5) * (jitter_frac * spacing)
    return pts.astype(np.float32)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def park_position(scene: Scene) -> np.ndarray:
    """Where inactive slots sit: far outside the domain (never a neighbor)."""
    lo = np.asarray(scene.lo, np.float32)
    return lo - np.float32(1e6)


def spawn(
    state: State, scene: Scene, pos, n: int = 64,
    velocity=None, radius: float | None = None, seed: int = 0,
) -> tuple[State, int]:
    """Live particle injection — the reference's keypress/mouse spawn
    (SURVEY.md C13 "spawn particles on keypress/mouse"), TPU-native form:
    claim up to `n` never-activating slots (emit_step == INACTIVE: capacity
    padding or expired emitter events) and schedule them to activate at the
    NEXT step, lattice-packed (+ scene jitter) inside a disc/sphere of
    `radius` around `pos` with initial `velocity`.

    Pure data surgery on the fixed-capacity pytree — no shape change and no
    retrace: activation is `emit_step <= step`, evaluated inside the jitted
    step, and the fast paths detect the activation from the carried
    emit_step on device (step.py `activated`), so the next block rebuilds
    and the spawned particles join pair physics exactly at their activation
    step — same contract as scheduled emitters.

    Returns (state, n_spawned); n_spawned < n when free capacity, the
    packing disc, or the in-bounds clip runs out.  Spawned slots are fluid
    (kind 0) at rest density.
    """
    p = scene.params
    d = state.dim
    spacing = scene.spacing or p.h * 0.55
    pos = np.asarray(pos, np.float64)
    if pos.shape != (d,):
        raise ValueError(f"spawn pos must have dim {d}, got {pos.shape}")
    if radius is None:
        # disc/sphere just big enough to lattice-pack n at `spacing`
        vol_unit = np.pi if d == 2 else 4.0 / 3.0 * np.pi
        radius = spacing * (n / vol_unit) ** (1.0 / d) + spacing

    emit_host = np.asarray(state.emit_step)
    free = np.flatnonzero(emit_host == INACTIVE)
    if n <= 0 or len(free) == 0:
        return state, 0

    # centered lattice clipped to the disc and to the domain interior;
    # bounded by what n needs (+ margin for disc/bounds clipping) so a
    # huge radius cannot allocate a huge meshgrid
    half_n = int(np.ceil(n ** (1.0 / d) / 2.0)) + 2
    half = min(int(np.ceil(radius / spacing)), max(half_n, 2))
    ax = (np.arange(-half, half + 1, dtype=np.float64)) * spacing
    pts = np.stack(
        np.meshgrid(*([ax] * d), indexing="ij"), axis=-1
    ).reshape(-1, d)
    pts = pts[np.argsort(np.sum(pts * pts, axis=1), kind="stable")]
    pts = pts[np.sum(pts * pts, axis=1) <= radius * radius] + pos[None, :]
    rng = np.random.default_rng(seed)
    pts = pts + (rng.random(pts.shape) - 0.5) * (scene.jitter * spacing)
    lo = np.asarray(scene.lo, np.float64) + 0.5 * spacing
    hi = np.asarray(scene.hi, np.float64) - 0.5 * spacing
    inb = np.all((pts >= lo) & (pts <= hi), axis=1)
    pts = pts[inb]

    k = int(min(n, len(pts), len(free)))
    if k == 0:
        return state, 0
    idx = jnp.asarray(free[:k])
    pts = jnp.asarray(pts[:k], jnp.float32)
    if velocity is None:
        vel = jnp.zeros((d,), jnp.float32)
    else:
        vel_np = np.asarray(velocity, np.float32)
        if vel_np.shape != (d,):
            raise ValueError(
                f"spawn velocity must have dim {d}, got {vel_np.shape}"
            )
        vel = jnp.asarray(vel_np)
    zero = jnp.zeros((k, d), jnp.float32)
    nxt = state.step + jnp.int32(1)
    return State(
        x=state.x.at[idx].set(pts),
        v=state.v.at[idx].set(jnp.broadcast_to(vel, (k, d))),
        acc=state.acc.at[idx].set(zero),
        rho=state.rho.at[idx].set(jnp.float32(p.rest_density)),
        p=state.p.at[idx].set(jnp.float32(0)),
        kind=state.kind.at[idx].set(jnp.int32(0)),
        emit_step=state.emit_step.at[idx].set(nxt),
        step=state.step,
    ), k


def init(scene: Scene, capacity_multiple: int = 256) -> State:
    """Seed a scene into a `State` (reference `initSPH`, SURVEY.md C3).

    Lattice-fills each `Block` (fluid or static boundary), schedules emitter
    slots with precomputed positions/velocities/activation steps, pads to a
    TPU-friendly capacity, and parks the spare slots.
    """
    p = scene.params
    d = p.dim
    spacing = scene.spacing or p.h * 0.55
    rng = np.random.default_rng(scene.seed)

    xs, kinds = [], []
    for b in scene.blocks:
        pts = _lattice(b.lo, b.hi, spacing, rng, scene.jitter)
        xs.append(pts)
        kinds.append(np.full(len(pts), b.kind, np.int32))
    x = np.concatenate(xs, 0) if xs else np.zeros((0, d), np.float32)
    kind = np.concatenate(kinds, 0) if kinds else np.zeros((0,), np.int32)
    n_seed = len(x)
    v = np.zeros_like(x)
    off = 0
    for b, pts in zip(scene.blocks, xs):
        if b.velocity is not None:
            v[off : off + len(pts)] = np.asarray(b.velocity, np.float32)
        off += len(pts)

    emit_step = np.zeros(n_seed, np.int32)

    # Emitter slots: schedule activation steps and precompute spawn states.
    cap = scene.capacity or 0
    if scene.emitters and not cap:
        cap = _round_up(max(4 * n_seed, 16384), capacity_multiple)
    cap = max(cap, _round_up(
        max(n_seed + max(scene.spawn_reserve, 0), 1), capacity_multiple
    ))

    # live-injection headroom (state.spawn): emitter schedules may fill
    # only the spare capacity BEYOND the reserve, so `spawn_reserve` slots
    # stay emit_step == INACTIVE and claimable mid-run
    n_spare = max(cap - n_seed - max(scene.spawn_reserve, 0), 0)
    ex, ev, estep = [], [], []
    if scene.emitters and n_spare > 0:
        per = n_spare // len(scene.emitters)
        for em in scene.emitters:
            vel = np.asarray(em.velocity, np.float64)
            speed = float(np.linalg.norm(vel))
            if speed <= 0:
                raise ValueError("emitter velocity must be nonzero")
            # one emission row every `spacing` of downstream travel
            interval = max(1, round(spacing / (speed * p.dt)))
            # nozzle basis: unit vectors perpendicular to the jet
            n_hat = vel / speed
            perp = np.eye(d) - np.outer(n_hat, n_hat)
            basis = np.linalg.svd(perp)[0][:, : d - 1]  # [d, d-1]
            row = em.width ** (d - 1)
            lat = np.stack(
                np.meshgrid(
                    *([np.arange(em.width) - (em.width - 1) / 2] * (d - 1)),
                    indexing="ij",
                ),
                axis=-1,
            ).reshape(row, d - 1)
            offsets = lat @ basis.T * spacing  # [row, d]
            n_events = per // row
            steps = em.start_step + np.arange(n_events) * interval
            steps = np.where(steps < em.stop_step, steps, np.int64(INACTIVE))
            steps = np.repeat(steps, row)
            pos = (
                np.asarray(em.pos, np.float64)[None, :]
                + np.tile(offsets, (n_events, 1))
                + (rng.random((n_events * row, d)) - 0.5)
                * (em.jitter * spacing)
            )
            ex.append(pos.astype(np.float32))
            ev.append(
                np.broadcast_to(
                    vel.astype(np.float32), (n_events * row, d)
                ).copy()
            )
            estep.append(np.minimum(steps, INACTIVE).astype(np.int32))
        ex = np.concatenate(ex, 0)
        ev = np.concatenate(ev, 0)
        estep = np.concatenate(estep, 0)
    else:
        ex = np.zeros((0, d), np.float32)
        ev = np.zeros((0, d), np.float32)
        estep = np.zeros((0,), np.int32)

    n_used = n_seed + len(ex)
    n_pad = cap - n_used
    park = park_position(scene)

    x_all = np.concatenate(
        [x, ex, np.broadcast_to(park, (n_pad, d)).astype(np.float32)], 0
    )
    v_all = np.concatenate([v, ev, np.zeros((n_pad, d), np.float32)], 0)
    kind_all = np.concatenate([kind, np.zeros(len(ex) + n_pad, np.int32)], 0)
    emit_all = np.concatenate(
        [emit_step, estep, np.full(n_pad, INACTIVE, np.int32)], 0
    )
    # Park the not-yet-active emitter slots too?  No: their spawn position is
    # precomputed; they must already sit at the spawn point when activated.
    # They are masked out of all sums until emit_step <= step.

    return State(
        x=jnp.asarray(x_all),
        v=jnp.asarray(v_all),
        acc=jnp.zeros((cap, d), jnp.float32),
        rho=jnp.full((cap,), np.float32(p.rest_density)),
        p=jnp.zeros((cap,), jnp.float32),
        kind=jnp.asarray(kind_all),
        emit_step=jnp.asarray(emit_all),
        step=jnp.asarray(0, jnp.int32),
    )
