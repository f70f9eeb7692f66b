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
from sph_tpu.params import Scene, SimParams
from sph_tpu.state import State


def _rho_p_f(
    x, v, active, movable, scene: Scene, method: str, grid=None, step=None,
    slot_cache=None, addr=None,
):
    """Density → EOS → pairwise forces + gravity + wall penalty + external
    force fields, one x eval.  Returns (rho, p, f, new_slot_cache);
    `slot_cache` (pallas only) is the persistent slot grid threaded through
    the scan — see pallas_step.init_slot_cache."""
    params = scene.params
    new_cache = None
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
            if slot_cache is None:
                rho, p, f = pallas_step.pallas_rho_p_f(
                    x, v, active, params, grid, addr=addr
                )
            else:
                rho, p, f, new_cache = pallas_step.pallas_rho_p_f_cached(
                    x, v, active, params, grid, slot_cache
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
    return rho, p, f, new_cache


def make_step(
    scene: Scene, method: str = "naive", grid=None, with_cache: bool = False,
    with_addr: bool = False,
) -> Callable[[State], State]:
    """Build the pure step function for `scene` (closes over all statics).

    method: "naive" (O(N²), C9) | "grid" (cell-hash, C10) | "pallas" (C11).
    `grid` overrides the default GridSpec (cap/chunk tuning).
    with_cache (pallas only): the returned function is
    `step(state, slot_cache) -> (state, slot_cache)`, threading the
    persistent slot grid (pallas_step.init_slot_cache) through the scan.
    """
    params = scene.params
    dt = params.dt
    if grid is None and method in ("grid", "pallas"):
        from sph_tpu import neighbors

        grid = neighbors.GridSpec.for_scene(scene)

    def step_impl(state: State, cache, addr=None):
        active = state.active
        movable = active & (state.kind == 0)
        mov = movable[:, None].astype(state.x.dtype)
        x, v, acc = state.x, state.v, state.acc

        if params.integrator == "leapfrog":
            # KDK with stored acceleration: one force eval per step.
            v = v + (0.5 * dt) * acc * mov
            x = x + dt * v * mov
            rho, p, f, cache = _rho_p_f(
                x, v, active, movable, scene, method, grid, step=state.step,
                slot_cache=cache, addr=addr,
            )
            a = f / jnp.maximum(rho, 1e-12)[:, None]
            v = v + (0.5 * dt) * a * mov
            acc = jnp.where(movable[:, None], a, 0.0)
        elif params.integrator == "euler":
            # Semi-implicit (symplectic) Euler: v += dt f/ρ; x += dt v.
            rho, p, f, cache = _rho_p_f(
                x, v, active, movable, scene, method, grid, step=state.step,
                slot_cache=cache, addr=addr,
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
        return new_state, cache

    if with_cache:
        if method != "pallas":
            raise ValueError("with_cache requires method='pallas'")
        return step_impl
    if with_addr:
        if method != "pallas":
            raise ValueError("with_addr requires method='pallas'")
        return lambda state, addr: step_impl(state, None, addr)[0]
    return lambda state: step_impl(state, None)[0]


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
    rho, p, f, _ = _rho_p_f(
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
    conservative bound; the advance loop still counts actual violations)."""
    return 2.0 * sort_every * scene.params.dt * scene.params.sound_speed


def make_advance(
    scene: Scene, method: str = "naive", steps_per_dispatch: int = 100,
    grid=None, slot_cache: bool = False, sort_every: int = 1,
    skin: float | None = None,
):
    """jitted `advance(state) -> state` running S steps in one `lax.scan`.

    For method="pallas", S is clamped to MAX_PALLAS_STEPS_PER_DISPATCH (see
    above); drive longer horizons with multiple dispatches (`run` does).
    slot_cache=True carries the slot grid through the scan and parks/rewrites
    only each step's own slots instead of re-initializing — bitwise identical
    (tested) but measured SLOWER (35.3 vs 30.3 ms/step at 100k-3D: an extra
    N×8 random scatter costs more than the full-grid background fill, which
    is a fast fused broadcast).  Kept as an A/B hook; default off."""
    if method == "pallas":
        steps_per_dispatch = min(
            steps_per_dispatch, MAX_PALLAS_STEPS_PER_DISPATCH
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

        if skin is None:
            skin = default_skin(scene, sort_every)
        if grid is None:
            base = neighbors.GridSpec.for_scene(scene)
            grid = neighbors.GridSpec.for_scene(
                scene, cap=base.cap, skin=skin
            )
        sg = pallas_step.slot_grid(grid)
        step_a = make_step(scene, "pallas", grid=grid, with_addr=True)
        blocks, rem = divmod(steps_per_dispatch, sort_every)
        if rem:
            raise ValueError(
                f"steps_per_dispatch={steps_per_dispatch} must be a "
                f"multiple of sort_every={sort_every}"
            )
        half2 = (0.5 * skin) ** 2

        @jax.jit
        def advance_reuse(state: State):
            def body(carry, _):
                s, viol = carry
                x0, act0 = s.x, s.active
                addr = pallas_step.build_addr(x0, act0, grid, sg)
                for _ in range(sort_every):
                    s = step_a(s, addr)
                    d = s.x - x0
                    drift2 = jnp.sum(d * d, axis=1)
                    viol = viol + jnp.sum(
                        ((drift2 > half2) & act0).astype(jnp.int32)
                    )
                return (s, viol), None

            (out, viol), _ = jax.lax.scan(
                body, (state, jnp.int32(0)), length=blocks
            )
            return out, viol

        return advance_reuse
    if method == "pallas" and slot_cache:
        # Persistent slot cache: the slot grid's full-background init (the
        # scatter phase's dominant cost) runs once per DISPATCH; each step
        # parks + rewrites only its own N×8 slots.  Bitwise identical.
        from sph_tpu import neighbors, pallas_step

        g = grid if grid is not None else neighbors.GridSpec.for_scene(scene)
        sg = pallas_step.slot_grid(g)
        step_c = make_step(scene, method, grid=g, with_cache=True)

        @jax.jit
        def advance(state: State) -> State:
            cache = pallas_step.init_slot_cache(
                sg, state.capacity, state.x.dtype
            )

            def body(carry, _):
                return step_c(*carry), None

            (out, _), _ = jax.lax.scan(
                body, (state, cache), length=steps_per_dispatch
            )
            return out

        return advance

    step = make_step(scene, method, grid=grid)

    @jax.jit
    def advance(state: State) -> State:
        def body(s, _):
            return step(s), None

        out, _ = jax.lax.scan(body, state, length=steps_per_dispatch)
        return out

    return advance


def run(
    scene: Scene,
    n_steps: int,
    method: str = "naive",
    steps_per_dispatch: int = 100,
    state: State | None = None,
    frame_callback: Callable[[State], None] | None = None,
    sort_every: int = 1,
) -> State:
    """Top-level driver (reference main loop, SURVEY.md §3.5).

    Host loop is coarse-grained: one device dispatch per `steps_per_dispatch`
    steps; `frame_callback` (render/metrics) runs once per dispatch.
    sort_every > 1 (pallas): Verlet-skin addr reuse — raises if the drift
    bound is violated during the run (physics would silently be wrong).
    """
    from sph_tpu.state import init

    if state is None:
        state = init(scene)
    if scene.params.integrator == "leapfrog" and int(state.step) == 0:
        state = jax.jit(functools.partial(prime, scene, method=method))(state)
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
    advance = make_advance(scene, method, steps_per_dispatch,
                           sort_every=sort_every)

    def dispatch(st, adv, reuse):
        if reuse:
            st, viol = adv(st)
            if int(viol):
                raise RuntimeError(
                    f"sort_every={sort_every}: {int(viol)} particles "
                    "exceeded skin/2 drift — physics invalid; lower "
                    "sort_every or raise skin"
                )
            return st
        return adv(st)

    for _ in range(n_disp):
        state = dispatch(state, advance, sort_every > 1)
        if frame_callback is not None:
            frame_callback(state)
    if rem:
        rem_reuse = sort_every if rem % sort_every == 0 else 1
        state = dispatch(
            state,
            make_advance(scene, method, rem, sort_every=rem_reuse),
            rem_reuse > 1,
        )
        if frame_callback is not None:
            frame_callback(state)
    return state
