"""Round-3 probe: is scatter7 sensitive to PARTICLE ORDER?

The direct strided scatter (pallas_step.scatter_slots, 57 ms at 1M) is
the biggest non-kernel rebuild item.  If its cost depends on how
spatially coherent the particle order is (init = lattice order ≈ sorted;
a long run leaves order fixed while positions mix), a periodic
slot-order re-sort of the particle arrays (one gather by permutation,
~7×1M×4B ≈ 28 MB) could pay for itself.  This times build_addr +
scatter7 + the density kernel at 1M under:

  a. natural init order (lattice — near-best case),
  b. a random permutation of the same state (worst case),
  c. slot-sorted order (argsort of the build's flat slot index — what a
     re-sort pass would produce).

If b ≈ a, the scatter is order-insensitive and re-sorting is a dead end.

Usage: python bench/probe_r3g.py [repeats]
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

from sph_tpu import pallas_step
from sph_tpu.neighbors import GridSpec
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import default_skin, prime


def main():
    repeats = int(_sys.argv[1]) if len(_sys.argv) > 1 else 5
    scene = preset("splash3d_1m")
    skin = default_skin(scene, 4)
    base = GridSpec.for_scene(scene)
    grid = GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    sg = pallas_step.slot_grid(grid)
    params = scene.params
    d = params.dim

    state = init(scene)
    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)

    def phase(x, active, v):
        addr = pallas_step.build_addr(x, active, grid, sg)
        zpad = jnp.zeros((x.shape[0], 3 - d), jnp.float32)
        mov = active[:, None].astype(jnp.float32)
        rows = jnp.concatenate([x, zpad, v, zpad, mov], axis=1)
        feat = pallas_step.scatter_slots(addr, rows, sg)
        rp = pallas_step._call_density(feat, addr, sg, params)
        return addr.overflow + jnp.sum(rp[:, 0, :1])

    jphase = jax.jit(phase)

    def timeit(tag, x, active, v):
        out = jphase(x, active, v)
        float(out)  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jphase(x, active, v))
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:28s} {best*1e3:8.2f} ms / rebuild-phase", flush=True)

    x, v, act = state.x, state.v, state.active
    timeit("a. natural (lattice) order", x, act, v)

    rng = np.random.default_rng(7)
    perm = jnp.asarray(rng.permutation(x.shape[0]))
    timeit("b. random permutation", x[perm], act[perm], v[perm])

    addr = pallas_step.build_addr(x, act, grid, sg)
    slot_key = addr.row_pos * sg.lanes + addr.pos
    order = jnp.argsort(jnp.where(addr.valid, slot_key, 2**30))
    timeit("c. slot-sorted order", x[order], act[order], v[order])


if __name__ == "__main__":
    main()
