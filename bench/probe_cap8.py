"""Round-3 probe: is cap=8 viable for the resident fast path?

Two questions (VERDICT r2 item 1):
  1. OCCUPANCY: with the k=4 skinned grid, how often does any cell exceed
     8 particles over the 1M splash run (rest / collapse / impact)?  cap=8
     is the single biggest remaining kernel lever (halves pair padding AND
     slot-array HBM traffic), but only if overflow is rare enough for an
     exact fallback to absorb.
  2. SPEED: resident4 at cap=8 (xb 4 and 8) vs the cap=16 flagship, at
     dam3d_100k and splash3d_1m, honest timing (multi-step dispatch +
     checksum fetch).

Usage: python bench/probe_cap8.py [evolve_steps]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from sph_tpu.platform import ensure_backend

ensure_backend()

from sph_tpu import neighbors
from sph_tpu.neighbors import GridSpec, cell_index
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import default_skin, make_advance, prime


def occ_stats(grid: GridSpec, cap_q: int):
    """jitted: state -> (max occupancy, n cells > cap_q, particles beyond
    cap_q) on `grid`'s lattice."""

    @jax.jit
    def f(state):
        _, flat = cell_index(state.x, state.active, grid)
        counts = jnp.bincount(flat, length=grid.n_rows)[: grid.n_cells]
        over = jnp.maximum(counts - cap_q, 0)
        return jnp.max(counts), jnp.sum(counts > cap_q), jnp.sum(over)

    return f


def timed(tag, adv, state, steps, repeats=2):
    st = state
    st, viol = adv(st)
    float(jnp.sum(st.x))  # compile+warm
    v0 = int(viol)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        st, viol = adv(st)
        float(jnp.sum(st.x))
        best = min(best, time.perf_counter() - t0)
    n = int(st.n_active())
    print(
        f"{tag:42s} {best/steps*1e3:8.2f} ms/step  "
        f"{n*steps/best:.3e} p-steps/s  viol(warm)={v0} viol={int(viol)}",
        flush=True,
    )
    return st


def bench_cfg(name, steps=100):
    scene = preset(name)
    skin = default_skin(scene, 4)
    base = GridSpec.for_scene(scene)
    state0 = init(scene)
    state0 = jax.jit(lambda s: prime(scene, s, method="pallas"))(state0)

    g16 = GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    g8 = GridSpec.for_scene(scene, cap=8, skin=skin)
    print(f"== {name}: base cap={base.cap}, skinned cell={g16.cell:.3f}")

    for tag, grid, xb in (
        ("resident4 cap16 xb4 (flagship)", g16, 4),
        ("resident4 cap8 xb4", g8, 4),
        ("resident4 cap8 xb8", g8, 8),
    ):
        try:
            adv = make_advance(
                scene, "pallas", steps_per_dispatch=steps, grid=grid,
                sort_every=4, slot_resident=True, xb_cells=xb,
            )
            timed(f"{name} {tag}", adv, state0, steps)
        except Exception as e:  # noqa: BLE001
            print(f"{name} {tag}: FAILED {type(e).__name__}: {e}", flush=True)


def evolve_occupancy(evolve_steps):
    """Evolve the 1M splash on the cap=16 flagship; after every 100-step
    dispatch, report cap-8 overflow stats on the skinned lattice."""
    scene = preset("splash3d_1m")
    skin = default_skin(scene, 4)
    base = GridSpec.for_scene(scene)
    g16 = GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    g8 = GridSpec.for_scene(scene, cap=8, skin=skin)
    stats8 = occ_stats(g16, 8)  # same lattice the kernels would use at cap=8
    state = init(scene)
    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    adv = make_advance(
        scene, "pallas", steps_per_dispatch=100, grid=g16,
        sort_every=4, slot_resident=True,
    )
    print("== 1M occupancy evolution (skinned k=4 lattice, cap_q=8)")
    mx, nc, npart = stats8(state)
    print(f"step {0:5d}: max_occ={int(mx):3d} cells>8={int(nc):6d} "
          f"parts_dropped@8={int(npart):7d}", flush=True)
    for disp in range(evolve_steps // 100):
        state, viol = adv(state)
        mx, nc, npart = stats8(state)
        print(
            f"step {(disp+1)*100:5d}: max_occ={int(mx):3d} "
            f"cells>8={int(nc):6d} parts_dropped@8={int(npart):7d} "
            f"viol={int(viol)}",
            flush=True,
        )


def main():
    evolve_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    bench_cfg("dam3d_100k")
    bench_cfg("splash3d_1m")
    evolve_occupancy(evolve_steps)


if __name__ == "__main__":
    main()
