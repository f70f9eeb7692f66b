"""Diagnostics, watchdog, checkpoint/resume (SURVEY.md §5.3–5.5).

The reference has none of these (tutorial code verifies visually); this is
the proportionate TPU-native build:

- `scalar_pack`: one small on-device reduction per frame (max |v|, density
  stats, total momentum, kinetic energy, active count) fetched together with
  the frame — one transfer, no extra sync.
- `Watchdog`: halts on NaN/exploding fetched scalars (failure detection);
  fault injection = overwrite particles with NaN and assert detection
  (tests/test_diagnostics.py).
- checkpoints: `State` is a pytree → .npz (+ scene json) with bitwise
  resume; cheap at this scale, zero extra deps (no orbax needed).
- CFL monitor: warn when dt > cfl_fraction · h / max|v|.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.params import Scene, SimParams
from sph_tpu.state import State

SCALARS = (
    "max_speed",
    "min_rho",
    "mean_rho",
    "max_rho",
    "momentum_x",
    "momentum_y",
    "momentum_z",
    "kinetic_energy",
    "n_active",
)


def scalar_pack(state: State, params: SimParams) -> jax.Array:
    """[9] float32 frame diagnostics, computed on device (SURVEY.md §5.5)."""
    act = state.active
    w = act.astype(jnp.float32)
    n_true = jnp.sum(w)            # reported count (0 when scene is empty)
    n = jnp.maximum(n_true, 1.0)   # safe divisor for the mean
    speed2 = jnp.sum(state.v * state.v, axis=-1)
    max_speed = jnp.sqrt(jnp.max(jnp.where(act, speed2, 0.0)))
    rho = jnp.where(act, state.rho, jnp.nan)
    min_rho = jnp.min(jnp.where(act, state.rho, jnp.inf))
    mean_rho = jnp.sum(jnp.where(act, state.rho, 0.0)) / n
    max_rho = jnp.max(jnp.where(act, state.rho, -jnp.inf))
    mom = params.mass * jnp.sum(state.v * w[:, None], axis=0)
    mom3 = jnp.concatenate([mom, jnp.zeros((3 - mom.shape[0],), mom.dtype)])
    ke = 0.5 * params.mass * jnp.sum(speed2 * w)
    return jnp.stack(
        [max_speed, min_rho, mean_rho, max_rho, mom3[0], mom3[1], mom3[2],
         ke, n_true]
    )


def scalars_dict(pack) -> dict:
    vals = np.asarray(pack, np.float64)
    return dict(zip(SCALARS, vals.tolist()))


def cfl_limit(params: SimParams, max_speed: float, fraction: float = 0.4):
    """Largest stable-ish dt at the observed speed; None if at rest."""
    if max_speed <= 0:
        return None
    return fraction * params.h / max_speed


class Watchdog:
    """Failure detection on fetched frame scalars (SURVEY.md §5.3).

    Raises SimulationDiverged when density or speed leaves sane bounds or
    turns NaN — by construction within one frame of the fault.
    """

    def __init__(self, params: SimParams, rho_factor: float = 100.0,
                 speed_limit: float | None = None):
        self.params = params
        self.rho_factor = rho_factor
        self.speed_limit = speed_limit

    def check(self, pack) -> dict:
        s = scalars_dict(pack)
        if s["n_active"] == 0:
            # a legitimately empty frame (e.g. emitters that start later)
            # yields min_rho=+inf / max_rho=-inf from the masked reductions;
            # nothing to check until particles exist (ADVICE r1)
            return s
        bad = []
        for k, v in s.items():
            if not np.isfinite(v):
                bad.append(f"{k} is not finite ({v})")
        if s["max_rho"] > self.rho_factor * self.params.rest_density:
            bad.append(f"max_rho {s['max_rho']:.3g} exploded")
        if self.speed_limit and s["max_speed"] > self.speed_limit:
            bad.append(f"max_speed {s['max_speed']:.3g} exploded")
        if bad:
            raise SimulationDiverged("; ".join(bad), scalars=s)
        return s


class SimulationDiverged(RuntimeError):
    def __init__(self, msg, scalars=None):
        super().__init__(msg)
        self.scalars = scalars


# ---------------------------------------------------------------------------
# Checkpoint / resume (SURVEY.md §5.4)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: State, scene: Scene) -> None:
    """State pytree + scene config → one .npz; resume is bitwise."""
    arrays = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    from sph_tpu.params import scene_to_json

    arrays["__scene_json__"] = np.frombuffer(
        scene_to_json(scene).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str) -> tuple[State, Scene]:
    from sph_tpu.params import scene_from_json

    with np.load(path) as z:
        scene = scene_from_json(bytes(z["__scene_json__"]).decode())
        kw = {
            f.name: jnp.asarray(z[f.name])
            for f in dataclasses.fields(State)
        }
    return State(**kw), scene


def validate_state(state: State, scene: Scene, slack: float = 4.0) -> list[str]:
    """Host-side sanity sweep (SURVEY.md §5.2 — the functional-core analog
    of sanitizers): returns a list of problems (empty = healthy)."""
    problems = []
    act = np.asarray(state.active)
    x = np.asarray(state.x)[act]
    v = np.asarray(state.v)[act]
    rho = np.asarray(state.rho)[act]
    if not np.all(np.isfinite(x)):
        problems.append("non-finite positions")
    if not np.all(np.isfinite(v)):
        problems.append("non-finite velocities")
    if not np.all(np.isfinite(rho)):
        problems.append("non-finite densities")
    lo = np.asarray(scene.lo) - slack * scene.params.h
    hi = np.asarray(scene.hi) + slack * scene.params.h
    if len(x) and (np.any(x < lo[None, :]) or np.any(x > hi[None, :])):
        problems.append("active particles far outside the domain")
    if len(rho) and np.max(rho) > 100.0 * scene.params.rest_density:
        problems.append(f"density blow-up (max {np.max(rho):.3g})")
    return problems


def inject_nan(state: State, k: int = 4) -> State:
    """Fault injection (SURVEY.md §5.3): corrupt k particles with NaN."""
    x = state.x.at[:k].set(jnp.nan)
    return dataclasses.replace(state, x=x)


# ---------------------------------------------------------------------------
# Debug checking mode (SURVEY.md §5.2): checkify-instrumented step
# ---------------------------------------------------------------------------


def make_checked_step(scene: Scene, method: str = "grid"):
    """Debug-mode step with on-device asserts (SURVEY.md §5.2): the
    functional-core analog of a sanitizer build.

    Checks BEFORE the physics (so the report names the state that broke,
    not its NaN-poisoned successor):
      - active positions are finite;
      - active cell indices lie inside the grid *before clipping* (the
        production path clips silently, which is exact physics but hides
        an exploding position until the watchdog bound trips);
      - per-cell occupancy fits the static tile cap (grid/pallas);
    and AFTER: densities came out finite and positive.

    Returns `checked(state) -> (error, new_state)`; call
    `error.throw()` to raise on the host (jittable; works inside scan).
    """
    from jax.experimental import checkify

    from sph_tpu.step import make_step

    grid = None
    if method in ("grid", "pallas"):
        from sph_tpu import neighbors

        grid = neighbors.GridSpec.for_scene(scene)
    base = make_step(scene, method, grid=grid)

    def checked(state: State) -> State:
        act = state.active
        checkify.check(
            jnp.all(jnp.where(act[:, None], jnp.isfinite(state.x), True)),
            "debug: non-finite active position",
        )
        if grid is not None:
            lo = jnp.asarray(grid.lo, state.x.dtype)
            ci_raw = jnp.floor((state.x - lo) / grid.cell).astype(jnp.int32)
            shape = jnp.asarray(grid.shape, jnp.int32)
            in_bounds = jnp.all(
                (ci_raw >= 0) & (ci_raw < shape[None, :]), axis=-1
            )
            checkify.check(
                jnp.all(jnp.where(act, in_bounds, True)),
                "debug: active cell index out of grid bounds "
                "(position escaped the domain)",
            )
            from sph_tpu import neighbors

            over = neighbors.cell_overflow(state.x, act, grid)
            checkify.check(
                over <= 0,
                "debug: cell tile overflow — {n} particles past the "
                "static cap would be dropped",
                n=jnp.maximum(over, 0),
            )
        out = base(state)
        rho_ok = jnp.where(
            out.active, jnp.isfinite(out.rho) & (out.rho > 0), True
        )
        checkify.check(
            jnp.all(rho_ok), "debug: non-finite or non-positive density"
        )
        return out

    return checkify.checkify(checked, errors=checkify.user_checks)
