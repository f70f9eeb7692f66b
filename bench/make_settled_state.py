"""Regenerate the settled/filled checkpoint states bench.py's ladder uses.

Two regimes the from-init ladder can't see (VERDICT r3 items 2+3):

- splash3d_1m at step 3000: post-impact, fluid settled against the floor,
  max|v| ~ 370 acoustic rattle — the regime where the minority-repair
  policy wins (probe H: 52.0 ms/step rep2048 vs 64.0 strict).  ~6 min.
- emitters3d filled: the scene starts EMPTY and its three jets emit only
  ~0.27 particles/step, so any from-init measurement times dispatch
  overhead at n~10² (BENCH_r03 recorded n=136 — a degenerate number).
  The filled checkpoint advances until >= 20k particles are active
  (~80k steps, ~15 min one-time) and the ladder measures from there.

These are ~40 MB artifacts regenerated on demand rather than committed
(VERDICT r3 weak item 4: a 40 MB npz permanently bloats every clone).

Usage:
  python bench/make_settled_state.py                   # both, if absent
  python bench/make_settled_state.py splash3d_1m       # force-regen one
  python bench/make_settled_state.py emitters3d
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from sph_tpu.platform import ensure_backend

ensure_backend()

from sph_tpu import diagnostics
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import make_audited_advance, prime

_DIR = _os.path.dirname(_os.path.abspath(__file__))

#: config -> (checkpoint path, stop criterion).  bench.py reads the same
#: table to decide whether a settled ladder row can run.
SETTLED = {
    "splash3d_1m": (_os.path.join(_DIR, ".settled_1m_3000.npz"),
                    dict(n_steps=3000)),
    "emitters3d": (_os.path.join(_DIR, ".settled_emitters3d.npz"),
                   dict(min_active=20000, max_steps=120000)),
}


def settled_path(config: str) -> str | None:
    ent = SETTLED.get(config)
    return ent[0] if ent else None


def regen(config: str) -> None:
    path, crit = SETTLED[config]
    scene = preset(config)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    adv = make_audited_advance(
        scene, "pallas", 100, sort_every=4, slot_resident=True,
        adaptive_cap=(config == "splash3d_1m"),
    )
    t0 = time.perf_counter()
    done = 0
    limit = crit.get("n_steps", crit.get("max_steps"))
    while done < limit:
        state = adv(state)
        float(jnp.sum(state.x))
        done += 100
        n_act = int(state.n_active())
        if done % 5000 == 0 or done == limit:
            print(f"{config}: step {done:6d}  n={n_act:7d}  "
                  f"wall {time.perf_counter() - t0:7.1f}s  "
                  f"healed={getattr(adv, 'healed', 0)}", flush=True)
        if "min_active" in crit and n_act >= crit["min_active"]:
            break
    n_act = int(state.n_active())
    if "min_active" in crit and n_act < crit["min_active"]:
        raise SystemExit(
            f"{config}: only {n_act} active after {done} steps "
            f"(wanted {crit['min_active']}) — raise max_steps"
        )
    act = state.active
    assert bool(jnp.isfinite(state.x[act]).all()), "non-finite positions"
    diagnostics.save_checkpoint(path, state, scene)
    mx = float(jnp.max(jnp.where(act[:, None], jnp.abs(state.v), 0.0)))
    print(f"saved {path} at step {done} (n={n_act}, max|v|={mx:.1f})",
          flush=True)


def main():
    targets = _sys.argv[1:] or None
    for config in (targets or SETTLED):
        path, _ = SETTLED[config]
        if targets is None and _os.path.exists(path):
            print(f"{config}: {path} exists — skipping (name it to regen)",
                  flush=True)
            continue
        regen(config)


if __name__ == "__main__":
    main()
