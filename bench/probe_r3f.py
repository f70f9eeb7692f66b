"""Round-3 probe: does a NARROWER Verlet skin keep cap=8 alive at 1M?

Insight: kernel cost is quantized by the slot cap, not by the skinned
cell width — shrinking the skin shifts the cell-occupancy distribution
down (cell volume ∝ (h+skin)³) without changing per-candidate math.  The
occupancy ledger (probe_cap8) showed cap=8 dies at settling under the
k=4 skin (cell 1.09 h, ~13.5k cells > 8); a narrower skin may keep the
distribution's tail under 8 for the WHOLE run.  The price — a smaller
drift budget, hence more frequent rebuilds — is exactly what the
auto-rebuild advance now adapts to (rebuilds are demand-driven, and a
rebuild costs ~99 ms vs the ~30 ms/step cap-8 kernel saving).

Questions:
  1. OCCUPANCY: cap-8 overflow stats at snapshots through the splash arc
     (init / collapse / impact / settle), on lattices with skin(4),
     skin(2), skin(1), and skin(4)/4.
  2. SPEED: auto-rebuild advances (cap16 skin4 baseline; cap8 × each
     skin) timed from init AND from the settled state; healed counters
     reported — an occupancy-clean narrow-skin cap8 should show healed=0
     at settle where skin(4) cap8 heals every block.

Usage: python bench/probe_r3f.py [evolve_steps] [probe_steps]
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

from sph_tpu.neighbors import GridSpec, cell_index
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.state import State
from sph_tpu.step import default_skin, make_advance, prime


def occ_fn(grid: GridSpec, cap_q: int):
    @jax.jit
    def f(state):
        _, flat = cell_index(state.x, state.active, grid)
        counts = jnp.bincount(flat, length=grid.n_rows)[: grid.n_cells]
        return (
            jnp.max(counts),
            jnp.sum(counts > cap_q),
            jnp.sum(jnp.maximum(counts - cap_q, 0)),
        )

    return f


def snapshot(state: State):
    return jax.tree.map(np.asarray, state)


def timed_auto(tag, scene, grid, xb, state, steps, repeats=2):
    try:
        adv = make_advance(
            scene, "pallas", steps_per_dispatch=steps, grid=grid,
            sort_every=4, slot_resident=True, xb_cells=xb,
            auto_rebuild=True,
        )
        st, viol, healed, rebuilds = adv(state)
        float(jnp.sum(st.x))  # compile+warm
        best, h_last, r_last = float("inf"), 0, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            st, viol, healed, rebuilds = adv(st)
            float(jnp.sum(st.x))
            best = min(best, time.perf_counter() - t0)
            h_last, r_last = int(healed), int(rebuilds)
        n = int(st.n_active())
        print(
            f"{tag:38s} {best/steps*1e3:8.2f} ms/step  "
            f"{n*steps/best:.3e} p-steps/s  healed={h_last} "
            f"rebuilds={r_last}/{steps//4}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    evolve_steps = int(_sys.argv[1]) if len(_sys.argv) > 1 else 3000
    probe_steps = int(_sys.argv[2]) if len(_sys.argv) > 2 else 100
    scene = preset("splash3d_1m")
    h = scene.params.h
    skins = [
        ("skin4", default_skin(scene, 4)),
        ("skin2", default_skin(scene, 2)),
        ("skin1", default_skin(scene, 1)),
        ("skin4/4", default_skin(scene, 4) / 4.0),
    ]
    base = GridSpec.for_scene(scene)
    occ = [
        (tag, s, occ_fn(GridSpec.for_scene(scene, cap=base.cap, skin=s), 8))
        for tag, s in skins
    ]

    state = init(scene)
    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    state0 = snapshot(state)

    g16 = GridSpec.for_scene(scene, cap=base.cap, skin=skins[0][1])
    adv = make_advance(
        scene, "pallas", steps_per_dispatch=100, grid=g16,
        sort_every=4, slot_resident=True, heal=True,
    )
    print(f"== occupancy through the arc (cap_q=8, h={h})", flush=True)
    marks = sorted({0, 500, 1000, 1700, 2400, evolve_steps})
    settled = None
    done = 0
    for m in marks:
        while done < m:
            out = adv(state)
            state = out[0]
            done += 100
        line = f"step {done:5d}: "
        for tag, s, f in occ:
            mx, nc, npart = f(state)
            line += (
                f"[{tag} cell={h+s:.2f}: max={int(mx)} "
                f"cells>8={int(nc)} parts>8={int(npart)}] "
            )
        print(line, flush=True)
        if done == evolve_steps:
            settled = snapshot(state)

    print("== auto-rebuild speed from INIT", flush=True)
    for st_tag, st in (("init", state0), ("settled", settled)):
        if st_tag == "settled":
            print(
                f"== auto-rebuild speed from SETTLED (step {evolve_steps})",
                flush=True,
            )
        st = jax.tree.map(jnp.asarray, st)
        timed_auto(
            f"{st_tag} auto cap16 skin4 (baseline)", scene, g16, 4,
            st, probe_steps,
        )
        for tag, s in skins:
            g8 = GridSpec.for_scene(scene, cap=8, skin=s)
            timed_auto(
                f"{st_tag} auto cap8 xb8 {tag}", scene, g8, 8,
                st, probe_steps,
            )


if __name__ == "__main__":
    main()
