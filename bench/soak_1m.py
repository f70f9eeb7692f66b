"""5000-step 1M splash soak on the adaptive flagship.

Validates the round-3 audited policy over the full collapse→impact→settle
arc (healing, the cap-8→cap-16 switch) and records the honest SOAK-AVERAGE
throughput — the phase-dependent adaptive engine's bench number is its
clean-phase speed, so the average over a whole run is reported here and in
ROADMAP.md to keep the story complete.

Usage: python bench/soak_1m.py [n_steps] [reactive_theta] [repair_k]
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

from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import make_audited_advance, prime


def main():
    n_steps = int(_sys.argv[1]) if len(_sys.argv) > 1 else 5000
    theta = float(_sys.argv[2]) if len(_sys.argv) > 2 else None
    # repair_k: None = the shipped production default (resolves to
    # step.DEFAULT_REPAIR_K where supported); pass 0 to pin rebuild-only
    repair_k = int(_sys.argv[3]) if len(_sys.argv) > 3 else None
    scene = preset("splash3d_1m")
    state = init(scene)
    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    adv = make_audited_advance(
        scene, "pallas", 100, sort_every=4, slot_resident=True,
        adaptive_cap=True, reactive_theta=theta, repair_k=repair_k,
    )
    n = int(state.n_active())
    print(f"soak: n={n}, {n_steps} steps, adaptive flagship "
          f"(reactive_theta={theta}, repair_k={repair_k})", flush=True)
    t_all = 0.0
    healed_prev = 0
    # warm compile outside the timed loop
    state = adv(state)
    float(jnp.sum(state.x))
    done = 100
    t0 = time.perf_counter()
    while done < n_steps:
        state = adv(state)
        float(jnp.sum(state.x))
        done += 100
        t_now = time.perf_counter() - t0
        healed = getattr(adv, "healed", 0)
        if done % 500 == 0 or healed != healed_prev:
            mx = float(jnp.max(jnp.abs(state.v)))
            rho_mean = float(
                jnp.sum(jnp.where(state.active, state.rho, 0.0))
                / jnp.sum(state.active)
            )
            print(
                f"step {done:5d}  wall {t_now:8.1f}s  healed={healed} "
                f"mode={getattr(adv, 'mode', '-')}  max|v|={mx:7.1f} "
                f"rho_mean={rho_mean:8.1f}",
                flush=True,
            )
        healed_prev = healed
    t_all = time.perf_counter() - t0
    x = np.asarray(state.x)
    act = np.asarray(state.active)
    assert np.isfinite(x[act]).all(), "non-finite positions after soak"
    avg = n * (n_steps - 100) / t_all
    print(
        f"SOAK RESULT: {n_steps - 100} timed steps in {t_all:.1f}s → "
        f"{avg:.3e} particle-steps/s soak-average "
        f"({t_all / (n_steps - 100) * 1e3:.1f} ms/step); healed="
        f"{getattr(adv, 'healed', 0)} repaired={getattr(adv, 'repaired', 0)}"
        f" final_mode={getattr(adv, 'mode', '-')}",
        flush=True,
    )


if __name__ == "__main__":
    main()
