"""Cell-capacity (tile-size) sweep (SURVEY.md M6).

Kernel pair-math cost scales with cap²; physics fidelity needs cap >= the
worst per-cell occupancy.  This sweep measures throughput AND the dropped-
particle count per cap so the cap choice is evidence-based per config.

Usage: python bench/bench_sweep.py [config] [steps]
"""

from __future__ import annotations

import sys
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import jax

from sph_tpu.platform import ensure_backend

ensure_backend()  # stale JAX_PLATFORMS env (axon-era) -- see sph_tpu/platform.py
import jax.numpy as jnp

from sph_tpu import neighbors, pallas_step
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import make_advance, prime


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dam3d_100k"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    scene = preset(name)
    for cap in (8, 16, 32):
        grid = neighbors.GridSpec.for_scene(scene, cap=cap)
        sg = pallas_step.slot_grid(grid)
        state = init(scene)
        over_fn = jax.jit(
            lambda s: pallas_step.slot_overflow(s.x, s.active, grid, sg)
        )
        if scene.params.integrator == "leapfrog":
            state = jax.jit(
                lambda s: prime(scene, s, method="pallas")
            )(state)
        try:
            adv = make_advance(scene, "pallas", steps, grid=grid)
            state = adv(state)
            float(jnp.sum(state.x))
            t0 = time.perf_counter()
            state = adv(state)
            float(jnp.sum(state.x))
            dt = (time.perf_counter() - t0) / steps
            cell_over, row_over = over_fn(state)
            n = int(state.n_active())
            print(
                f"cap={cap:3d}  {dt*1e3:9.3f} ms/step  "
                f"{n/dt:12.3e} psteps/s  dropped={int(cell_over)} "
                f"row_over={int(row_over)}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"cap={cap:3d}  FAIL {type(e).__name__}: {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
