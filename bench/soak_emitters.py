"""Production-policy soaks for the emitter/interaction demo scenes
(VERDICT r4 item 5): the full-arc validation the 1M splash got in round 4,
for (a) emitters3d — fill from EMPTY through jets → pool, optionally all
the way to capacity — and (b) vortex2d — the 90k rotating-stir pool.

Both run `make_audited_advance` exactly as run()/CLI would (auto-rebuild
resident fast path, membership audit, repair_k=None → the capacity-keyed
default), print healed/repaired/rebuild counters at every probe, and
assert a healthy finish.  For emitters3d the run doubles as the generator
of the FULL settled state (`.settled_emitters3d_full.npz`): the config is
a live render loop, so its long-run regime is capacity-filled — the 20k
checkpoint (bench/make_settled_state.py) is the transient minimum-density
point of the fill curve.

Usage:
  python bench/soak_emitters.py emitters3d [n_steps=260000] [save_path]
  python bench/soak_emitters.py vortex2d   [n_steps=5000]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.platform import ensure_backend

ensure_backend()

from sph_tpu import diagnostics
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import default_repair_k, make_audited_advance, prime

_DIR = _os.path.dirname(_os.path.abspath(__file__))
DEFAULTS = {"emitters3d": 260_000, "vortex2d": 5_000}


def main():
    config = _sys.argv[1] if len(_sys.argv) > 1 else "emitters3d"
    n_steps = int(_sys.argv[2]) if len(_sys.argv) > 2 else DEFAULTS[config]
    save = (_sys.argv[3] if len(_sys.argv) > 3 else
            (_os.path.join(_DIR, ".settled_emitters3d_full.npz")
             if config == "emitters3d" else None))
    scene = preset(config)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    adv = make_audited_advance(
        scene, "pallas", 100, sort_every=4, slot_resident=True,
    )
    rk = default_repair_k(scene, auto=True)
    print(f"soak {config}: {n_steps} steps, production policy "
          f"(repair_k default resolves to {rk}), capacity={state.capacity}",
          flush=True)
    state = adv(state)       # warm compile outside the timed loop
    float(jnp.sum(state.x))
    done, t0 = 100, time.perf_counter()
    window_t0, window_done = t0, done
    probe_every = max(1000, n_steps // 40 // 100 * 100)
    while done < n_steps:
        state = adv(state)
        float(jnp.sum(state.x))
        done += 100
        if done % probe_every == 0:
            t_now = time.perf_counter()
            n_act = int(state.n_active())
            mx = float(jnp.max(jnp.abs(jnp.where(
                state.active[:, None], state.v, 0.0))))
            rho_mean = float(
                jnp.sum(jnp.where(state.active, state.rho, 0.0))
                / jnp.maximum(jnp.sum(state.active), 1)
            )
            ms = (t_now - window_t0) / (done - window_done) * 1e3
            print(
                f"step {done:7d}  wall {t_now - t0:9.1f}s  n={n_act:6d}  "
                f"{ms:7.2f} ms/step  mode={getattr(adv, 'mode', '-')} "
                f"healed={getattr(adv, 'healed', 0)} "
                f"repaired={getattr(adv, 'repaired', 0)}  "
                f"max|v|={mx:7.1f} rho_mean={rho_mean:9.2f}",
                flush=True,
            )
            window_t0, window_done = t_now, done
    t_all = time.perf_counter() - t0
    x = np.asarray(state.x)
    act = np.asarray(state.active)
    assert np.isfinite(x[act]).all(), "non-finite positions after soak"
    n_final = int(act.sum())
    print(
        f"SOAK RESULT {config}: {n_steps - 100} timed steps in {t_all:.1f}s "
        f"({t_all / (n_steps - 100) * 1e3:.2f} ms/step whole-run); "
        f"n_final={n_final} mode={getattr(adv, 'mode', '-')} "
        f"healed={getattr(adv, 'healed', 0)} "
        f"repaired={getattr(adv, 'repaired', 0)}; finish healthy",
        flush=True,
    )
    if save:
        diagnostics.save_checkpoint(save, state, scene)
        print(f"saved final state -> {save}", flush=True)


if __name__ == "__main__":
    main()
