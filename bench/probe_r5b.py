"""Probe r5b — packed-row kernels vs slot kernels at the settled
emitters3d state (the VERDICT r4 item-2 structural candidate, round 5).

The packed-row layout (pallas_step.SlotGrid.packed) pairs each 128-lane
i-group of a compacted row against the neighbor rows' occupied 128-blocks
directly — work scales with ceil(row_count/128) instead of occupied-x-span
× cap padding.  Checkpoint-derived model: 0.342× the slot kernels' lane
work at this state (1,121 packed i-groups vs 4,159 slot groups).  This
probe measures the real kernels head-to-head (density+force, fixed
addressing, loop-carried feat perturbation per bench_phases' timeit
pattern) plus the build/scatter/gather sides.

Run after other TPU jobs have been gone ~30 s.
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from sph_tpu.platform import ensure_backend

ensure_backend()

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu import diagnostics, neighbors, pallas_step
from sph_tpu.step import default_skin

CKPT = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     ".settled_emitters3d.npz")


def timeit(name, fn, x0, *args, iters=50):
    def run(xin, *a):
        def body(i, xc):
            s = jnp.sum(fn(xc, *a).astype(jnp.float32))
            return xc + 1e-30 * s

        return jnp.sum(jax.lax.fori_loop(0, iters, body, xin))

    f = jax.jit(run)
    float(f(x0, *args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x0, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best / iters * 1e3:9.3f} ms", flush=True)
    return best / iters


def main():
    state, scene = diagnostics.load_checkpoint(CKPT)
    params = scene.params
    n = int(state.n_active())
    skin = default_skin(scene, 4)
    base = neighbors.GridSpec.for_scene(scene)
    grid = neighbors.GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    x, v, act = state.x, state.v, state.active
    print(f"settled emitters3d n={n}, cell={grid.cell:.2f}, cap={grid.cap}")

    for label, sg in [
        ("slot (production cap16)", pallas_step.slot_grid(grid)),
        ("slot + batch_skip", pallas_step.slot_grid(grid, batch_skip=True)),
        ("packed row_lanes=256", pallas_step.packed_grid(grid, 256)),
        ("packed row_lanes=384", pallas_step.packed_grid(grid, 384)),
    ]:
        addr = jax.jit(
            lambda xx, sg=sg: pallas_step.build_addr(xx, act, grid, sg)
        )(x)
        over = int(addr.overflow)
        if over:
            print(f"{label}: OVERFLOW {over} — skipping")
            continue
        rows = pallas_step._pack_rows6(x, v)
        feat = jax.jit(
            lambda a, r, sg=sg: pallas_step.scatter_slots(a, r, sg)
        )(addr, rows)

        def both(feat_in, addr_in, sg=sg):
            rp = pallas_step._call_density(feat_in, addr_in, sg, params)
            f_slot = pallas_step._call_force(feat_in, rp, addr_in, sg, params)
            return f_slot

        timeit(f"{label}: density+force", both, feat, addr)
        timeit(
            f"{label}: build_addr",
            lambda xx, sg=sg: pallas_step.build_addr(xx, act, grid, sg).pos,
            x, iters=20,
        )
        timeit(
            f"{label}: scatter",
            lambda r, a, sg=sg: pallas_step.scatter_slots(a, r, sg),
            rows, addr, iters=20,
        )


if __name__ == "__main__":
    main()
