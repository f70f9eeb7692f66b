"""Round-3 probe C: staged scatter/gather effect on the flagship.

Measures (1M + 100k): isolated staged-vs-direct scatter, the new
materialize gathers, and the full resident4 / cap8 fast paths with the
staged default.  Then the spatial 1M remeasure (staged scatter applies
there too via pallas_split_build / scatter_rp).
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

from sph_tpu import decomp, pallas_step
from sph_tpu.neighbors import GridSpec
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import _SlotPhysics, default_skin, make_advance, prime


def timeit(name, fn, x0, *args, iters=20):
    def run(xin, *a):
        def body2(i, xc):
            s = jnp.sum(fn(xc, *a).astype(jnp.float32))
            return xc + 1e-30 * s
        return jnp.sum(jax.lax.fori_loop(0, iters, body2, xin))

    f = jax.jit(run)
    float(f(x0, *args))
    t0 = time.perf_counter()
    float(f(x0, *args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def timed_adv(tag, adv, state, steps, repeats=2):
    st = state
    out = adv(st)
    st = out[0]
    float(jnp.sum(st.x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = adv(st)
        st = out[0]
        float(jnp.sum(st.x))
        best = min(best, time.perf_counter() - t0)
    n = int(st.n_active())
    extra = f"viol={int(out[1])}" if len(out) > 1 else ""
    print(
        f"{tag:46s} {best/steps*1e3:8.2f} ms/step  "
        f"{n*steps/best:.3e} p-steps/s  {extra}",
        flush=True,
    )


def isolated(name):
    scene = preset(name)
    skin = default_skin(scene, 4)
    base = GridSpec.for_scene(scene)
    grid = GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    sg = pallas_step.slot_grid(grid)
    state = init(scene)
    x, v, act = state.x, state.v, state.active
    d = scene.params.dim
    addr = pallas_step.build_addr(x, act, grid, sg)
    movable = act & (state.kind == 0)
    zpad = jnp.zeros((state.capacity, 3 - d), jnp.float32)
    rows7 = jnp.concatenate(
        [x, zpad, v, zpad, movable[:, None].astype(jnp.float32)], axis=1
    )
    print(f"== {name} isolated ==", flush=True)
    timeit(
        "scatter7 staged",
        lambda xc, r7: pallas_step.scatter_slots(
            addr, r7.at[0, 0].add(xc[0, 0] * 1e-30), sg, staged=True
        )[0, 0],
        x, rows7,
    )
    timeit(
        "scatter7 direct (round-2)",
        lambda xc, r7: pallas_step.scatter_slots(
            addr, r7.at[0, 0].add(xc[0, 0] * 1e-30), sg, staged=False
        )[0, 0],
        x, rows7,
    )
    sp = _SlotPhysics(scene, grid, sg)
    feat = jax.jit(
        lambda r7: pallas_step.scatter_slots(addr, r7, sg)
    )(rows7)
    xs = feat[:, 0:d, :]
    rp = feat[:, 0:2, :]

    def materialize(xc, xs_, rp_):
        xs2 = xs_ + 1e-30 * xc[0, 0]
        return (
            jnp.sum(sp.gather(xs2, d, addr)[0])
            + jnp.sum(sp.gather(xs_, d, addr)[0])
            + jnp.sum(sp.gather(xs_, d, addr)[0])
            + sp.gather(rp_, 1, addr)[0, 0]
        )

    timeit("materialize gathers (staged)", materialize, x, xs, rp)


def fullpath(name, steps=100):
    scene = preset(name)
    skin = default_skin(scene, 4)
    base = GridSpec.for_scene(scene)
    g16 = GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    g8 = GridSpec.for_scene(scene, cap=8, skin=skin)
    state0 = init(scene)
    state0 = jax.jit(lambda s: prime(scene, s, method="pallas"))(state0)
    for tag, grid, xb in (
        ("resident4 cap16 xb4 STAGED", g16, 4),
        ("resident4 cap8 xb8 STAGED", g8, 8),
    ):
        adv = make_advance(
            scene, "pallas", steps_per_dispatch=steps, grid=grid,
            sort_every=4, slot_resident=True, xb_cells=xb,
        )
        timed_adv(f"{name} {tag}", adv, state0, steps)


def spatial(name, steps=100):
    scene = preset(name)
    k = 4
    skin = default_skin(scene, k)
    state = init(scene)
    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    mesh = decomp.mesh1d(1)
    spec = decomp.SpatialSpec.for_state(scene, state, 1, skin=skin)
    loc = decomp.spatial_shard_state(state, scene, spec, mesh)
    steps = max(steps - steps % k, k)
    adv = decomp.make_spatial_advance(
        scene, spec, mesh, method="pallas", steps_per_dispatch=steps,
        sort_every=k, slot_resident=True,
    )
    timed_adv(f"{name} spatial-resident4 STAGED", adv, loc, steps)


def main():
    isolated("splash3d_1m")
    fullpath("dam3d_100k")
    fullpath("splash3d_1m")
    spatial("splash3d_1m")


if __name__ == "__main__":
    main()
