"""Per-phase timing of the Pallas step (SURVEY.md §5.1, M6 groundwork).

Times each phase of pallas_rho_p_f in isolation with loop-carried data
dependence (XLA hoists loop-invariant computation out of fori_loop, so naive
repeat-timing lies — measured on this machine).

Usage: python bench/bench_phases.py [config] [iters] [sort_every]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import sys
import time

import jax

from sph_tpu.platform import ensure_backend

ensure_backend()  # stale JAX_PLATFORMS env (axon-era) -- see sph_tpu/platform.py

import jax.numpy as jnp

from sph_tpu import neighbors, pallas_step
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import default_skin


def timeit(name, fn, x0, *args, iters=20):
    """Time fn(x, *args)->array with a loop-carried perturbation of x.

    Extra arrays MUST be passed via *args (not closures): closed-over
    concrete arrays are serialized into the remote-compile request on this
    platform and blow its size limit (HTTP 413)."""

    def run(xin, *a):
        def body2(i, xc):
            s = jnp.sum(fn(xc, *a).astype(jnp.float32))
            return xc + 1e-30 * s
        return jnp.sum(jax.lax.fori_loop(0, iters, body2, xin))

    f = jax.jit(run)
    float(f(x0, *args))  # compile + warm
    t0 = time.perf_counter()
    float(f(x0, *args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dam2d_10k"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sort_every = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    scene = preset(name)
    if sort_every > 1:
        base = neighbors.GridSpec.for_scene(scene)
        grid = neighbors.GridSpec.for_scene(
            scene, cap=base.cap, skin=default_skin(scene, sort_every)
        )
    else:
        grid = neighbors.GridSpec.for_scene(scene)
    sg = pallas_step.slot_grid(grid)
    state = init(scene)
    x, v, act = state.x, state.v, state.active
    params = scene.params
    n = state.capacity
    print(
        f"{name}: n={n} grid={grid.shape} cap={grid.cap} "
        f"lanes={sg.lanes} c_rows={sg.c_rows} sort_every={sort_every}"
    )

    timeit("noop (loop overhead)", lambda xc: xc[0], x)
    timeit(
        "build_addr (sort+compact)",
        lambda xc: pallas_step.build_addr(xc, act, grid, sg).pos.astype(
            jnp.float32
        ),
        x,
    )
    addr = pallas_step.build_addr(x, act, grid, sg)

    def scatter(xc, vv):
        f = pallas_step.scatter_slots(
            addr, pallas_step._pack_rows6(xc, vv), sg
        )
        return f[0, 0]

    timeit("scatter_slots", scatter, x, v)
    feat = jax.jit(
        lambda xx, vv: pallas_step.scatter_slots(
            addr, pallas_step._pack_rows6(xx, vv), sg
        )
    )(x, v)

    def dens(xc, f_):
        f2 = f_.at[1, 0, 0].add(xc[0, 0] * 1e-30)
        return pallas_step._call_density(f2, addr, sg, params)[:, 0, :]

    timeit("density kernel (rho+p out)", dens, x, feat)

    rp_slot = jax.jit(
        lambda f_: pallas_step._call_density(f_, addr, sg, params)
    )(feat)

    def force(xc, f_, rp_):
        f2 = f_.at[1, 0, 0].add(xc[0, 0] * 1e-30)
        return pallas_step._call_force(f2, rp_, addr, sg, params)[:, 0, :]

    timeit("force kernel", force, x, feat, rp_slot)

    def gather(xc, rs):
        r = rs.at[1, 0, 0].add(xc[0, 0] * 1e-30)
        rho, ok = pallas_step._gather_rho(r, addr, sg, params)
        return rho

    timeit("per-particle result gather", gather, x, rp_slot)

    timeit(
        "FULL pallas_rho_p_f",
        lambda xc: pallas_step.pallas_rho_p_f(xc, v, act, params, grid)[2],
        x,
        iters=max(5, iters // 2),
    )


if __name__ == "__main__":
    main()
