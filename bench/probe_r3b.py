"""Round-3 probe B: row-pair programs, resident phase breakdown at 1M,
and the band-sized spatial overhead remeasure.

Usage: python bench/probe_r3b.py [100|1000]  (k-particles tier filter)
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

from sph_tpu import decomp, neighbors, pallas_step
from sph_tpu.neighbors import GridSpec
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import default_skin, make_advance, prime


def timed(tag, adv, state, steps, repeats=2, unpack2=True):
    st = state
    out = adv(st)
    st, viol = out[0], out[1]
    float(jnp.sum(st.x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = adv(st)
        st, viol = out[0], out[1]
        float(jnp.sum(st.x))
        best = min(best, time.perf_counter() - t0)
    n = int(st.n_active())
    print(
        f"{tag:46s} {best/steps*1e3:8.2f} ms/step  "
        f"{n*steps/best:.3e} p-steps/s  viol={int(viol)}",
        flush=True,
    )


def rowpair_bench(name, steps=100):
    scene = preset(name)
    skin = default_skin(scene, 4)
    base = GridSpec.for_scene(scene)
    g16 = GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    g8 = GridSpec.for_scene(scene, cap=8, skin=skin)
    state0 = init(scene)
    state0 = jax.jit(lambda s: prime(scene, s, method="pallas"))(state0)
    for tag, grid, xb, rp in (
        ("resident4 cap16 xb4 rowpair", g16, 4, True),
        ("resident4 cap8 xb8 rowpair", g8, 8, True),
    ):
        try:
            adv = make_advance(
                scene, "pallas", steps_per_dispatch=steps, grid=grid,
                sort_every=4, slot_resident=True, xb_cells=xb, row_pair=rp,
            )
            timed(f"{name} {tag}", adv, state0, steps)
        except Exception as e:  # noqa: BLE001
            print(f"{name} {tag}: FAILED {type(e).__name__}: {e}", flush=True)


def spatial_bench(name, steps=100):
    """Spatial resident4 on a 1-device mesh with BAND-SIZED ghost caps."""
    scene = preset(name)
    k = 4
    skin = default_skin(scene, k)
    state = init(scene)
    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    mesh = decomp.mesh1d(1)
    spec = decomp.SpatialSpec.for_state(scene, state, 1, skin=skin)
    print(
        f"{name} spatial spec: cap_local={spec.cap_local} "
        f"cap_ghost={spec.cap_ghost} cap_mig={spec.cap_mig}",
        flush=True,
    )
    loc = decomp.spatial_shard_state(state, scene, spec, mesh)
    steps = max(steps - steps % k, k)
    adv = decomp.make_spatial_advance(
        scene, spec, mesh, method="pallas", steps_per_dispatch=steps,
        sort_every=k, slot_resident=True,
    )
    loc2, worst = adv(loc)
    float(jnp.sum(loc2.x))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        loc2, worst = adv(loc2)
        float(jnp.sum(loc2.x))
        best = min(best, time.perf_counter() - t0)
    merged = decomp.spatial_gather_state(loc2)
    n = int(jnp.sum(merged.emit_step <= merged.step))
    print(
        f"{name} spatial-resident4 (1-dev, band caps)   "
        f"{best/steps*1e3:8.2f} ms/step  {n*steps/best:.3e} p-steps/s  "
        f"worst={int(worst)}",
        flush=True,
    )


def phases(name):
    import importlib.util

    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "bench_phases.py")
    spec = importlib.util.spec_from_file_location("bench_phases", path)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__name__"] = "bench_phases"
    spec.loader.exec_module(mod)
    old = _sys.argv
    try:
        _sys.argv = ["bench_phases", name, "10", "4"]
        mod.main()
    finally:
        _sys.argv = old


def main():
    rowpair_bench("dam3d_100k")
    rowpair_bench("splash3d_1m")
    print("== resident phase breakdown (sort_every=4 grids) ==", flush=True)
    phases("splash3d_1m")
    print("== spatial remeasure (band-sized ghosts) ==", flush=True)
    spatial_bench("dam3d_100k")
    spatial_bench("splash3d_1m")


if __name__ == "__main__":
    main()
