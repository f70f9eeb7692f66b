"""Round-3 probe E: the auto-rebuild resident advance on real hardware.

Measures resident4-auto (velocity-adaptive rebuild interval) vs the
classic resident4, at cap16 and cap8, 100k and 1M, with rebuild/heal
counters.  Expected: calm phases stretch the 99 ms-per-rebuild
(build+scatter+materialize at 1M) across 2-5 blocks.
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

from sph_tpu.neighbors import GridSpec
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import default_skin, make_advance, prime


def timed(tag, adv, state, steps, repeats=2):
    st = state
    out = adv(st)
    st = out[0]
    float(jnp.sum(st.x))
    warm_info = [int(v) for v in out[1:]]
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = adv(st)
        st = out[0]
        float(jnp.sum(st.x))
        best = min(best, time.perf_counter() - t0)
    n = int(st.n_active())
    info = [int(v) for v in out[1:]]
    print(
        f"{tag:44s} {best/steps*1e3:8.2f} ms/step  "
        f"{n*steps/best:.3e} p-steps/s  warm={warm_info} last={info}",
        flush=True,
    )


def cfg(name, steps=100):
    scene = preset(name)
    skin = default_skin(scene, 4)
    base = GridSpec.for_scene(scene)
    g16 = GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    g8 = GridSpec.for_scene(scene, cap=8, skin=skin)
    state0 = init(scene)
    state0 = jax.jit(lambda s: prime(scene, s, method="pallas"))(state0)
    for tag, grid, xb, auto in (
        ("resident4-auto cap16 xb4", g16, 4, True),
        ("resident4-auto cap8 xb8", g8, 8, True),
        ("resident4 classic cap16 (ref)", g16, 4, False),
    ):
        try:
            adv = make_advance(
                scene, "pallas", steps_per_dispatch=steps, grid=grid,
                sort_every=4, slot_resident=True, xb_cells=xb,
                auto_rebuild=auto, heal=not auto,
            )
            timed(f"{name} {tag}", adv, state0, steps)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            print(f"{name} {tag}: FAILED {type(e).__name__}: {e}", flush=True)


def main():
    cfg("dam3d_100k")
    cfg("splash3d_1m")


if __name__ == "__main__":
    main()
