"""Measure cap-overflow populations through a full splash (cap=8 design
input): at each dispatch, total spilled particles Σ_cells max(count-cap, 0)
and worst cell occupancy, for cap=8 and the current cap.

Usage: python bench/measure_spill.py [config] [n_steps] [cap]
"""

import sys

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import jax

from sph_tpu.platform import ensure_backend

ensure_backend()  # stale JAX_PLATFORMS env (axon-era) -- see sph_tpu/platform.py
import jax.numpy as jnp

from sph_tpu import neighbors
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import make_advance, prime


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dam3d_100k"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    scene = preset(name)
    grid = neighbors.GridSpec.for_scene(scene)
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    adv = make_advance(scene, "pallas", steps_per_dispatch=100)

    @jax.jit
    def spill(s):
        _, flat = neighbors.cell_index(s.x, s.active, grid)
        counts = jnp.bincount(flat, length=grid.n_rows)[: grid.n_cells]
        return (
            jnp.sum(jnp.maximum(counts - cap, 0)),
            jnp.max(counts),
            jnp.sum(jnp.maximum(counts - 2 * cap, 0)),
        )

    worst_tot, worst_occ, worst_tot2 = 0, 0, 0
    for k in range(n_steps // 100):
        state = adv(state)
        tot, occ, tot2 = map(int, spill(state))
        worst_tot = max(worst_tot, tot)
        worst_occ = max(worst_occ, occ)
        worst_tot2 = max(worst_tot2, tot2)
        if k % 5 == 0:
            print(
                f"step {int(state.step):6d}: spilled(cap={cap})={tot:6d} "
                f"max_occ={occ:3d} spilled(cap={2*cap})={tot2:4d}",
                flush=True,
            )
    print(
        f"WORST over {n_steps} steps: spilled(cap={cap})={worst_tot} "
        f"max_occ={worst_occ} spilled(cap={2*cap})={worst_tot2}"
    )


if __name__ == "__main__":
    main()
