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
    state = None
    if name.endswith("@settled"):
        # settled/filled checkpoints (bench/make_settled_state.py) — the
        # regimes the from-init breakdown can't see (round 4: the
        # emitters3d sparse-scene cost question)
        import importlib.util

        mpath = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                              "make_settled_state.py")
        mspec = importlib.util.spec_from_file_location("mss", mpath)
        mss = importlib.util.module_from_spec(mspec)
        mspec.loader.exec_module(mss)
        from sph_tpu import diagnostics

        state, scene = diagnostics.load_checkpoint(
            mss.settled_path(name[: -len("@settled")])
        )
    else:
        scene = preset(name)
    if sort_every > 1:
        base = neighbors.GridSpec.for_scene(scene)
        grid = neighbors.GridSpec.for_scene(
            scene, cap=base.cap, skin=default_skin(scene, sort_every)
        )
    else:
        grid = neighbors.GridSpec.for_scene(scene)
    sg = pallas_step.slot_grid(grid)
    if state is None:
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

    if sort_every > 1:
        resident_phases(scene, grid, sg, state, iters)


def resident_phases(scene, grid, sg, state, iters):
    """Per-phase breakdown of the slot-RESIDENT block (the flagship mode;
    VERDICT r2 missing 3): what one step costs inside the block (mk_feat +
    kernels + slot-space integration) vs what amortizes 1/sort_every
    (build_addr + scatter + materialize gathers)."""
    import jax.numpy as jnp

    from sph_tpu.step import _SlotPhysics

    params = scene.params
    d = params.dim
    x, v, act = state.x, state.v, state.active
    movable = act & (state.kind == 0)
    addr = pallas_step.build_addr(x, act, grid, sg)
    sp = _SlotPhysics(scene, grid, sg)

    zpad = jnp.zeros((state.capacity, 3 - d), jnp.float32)
    rows7 = jnp.concatenate(
        [x, zpad, v, zpad, movable[:, None].astype(jnp.float32)], axis=1
    )
    print("-- resident block phases --")

    def scatter7(xc, r7):
        r2 = r7.at[0, 0].add(xc[0, 0] * 1e-30)
        return pallas_step.scatter_slots(addr, r2, sg)[0, 0]

    timeit("scatter_slots (7 cols, 1/k)", scatter7, x, rows7)
    feat0 = jax.jit(
        lambda r7: pallas_step.scatter_slots(addr, r7, sg)
    )(rows7)
    xs0 = feat0[:, 0:d, :]
    vs0 = feat0[:, 3 : 3 + d, :]
    movb = feat0[:, 6:7, :] > 0
    mk_feat = sp.mk_feat_builder(addr, feat0)

    def mkf(xs_, vs_):
        f = mk_feat(xs_ + 1e-30 * jnp.sum(vs_[0, 0, :1]), vs_)
        return f[0, 0]

    timeit("mk_feat (per step)", mkf, xs0, vs0)
    feat = jax.jit(mk_feat)(xs0, vs0)
    rp = jax.jit(
        lambda f_: pallas_step._call_density(f_, addr, sg, params)
    )(feat)

    def integ(xs_, vs_, rp_, fs_):
        rho_s = rp_[:, 0:1, :]
        f_tot = sp.body_forces(xs_, vs_, rho_s, fs_[:, 0:d, :], 0)
        a_s = jnp.where(movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0)
        vs2 = vs_ + params.dt * a_s * movb.astype(jnp.float32)
        xs2 = xs_ + params.dt * vs2 * movb.astype(jnp.float32)
        if params.boundary_mode == "clamp":
            xs2, vs2 = sp.clamp_slot(xs2, vs2, movb)
        dd = xs2 - xs0
        drift2 = jnp.sum(dd * dd, axis=1, keepdims=True)
        viol = jnp.sum((drift2 > 1e30) & movb)
        return xs2[0, 0] + viol.astype(jnp.float32)

    fs = jax.jit(
        lambda f_, rp_: pallas_step._call_force(f_, rp_, addr, sg, params)
    )(feat, rp)
    timeit("slot integrate+audit (per step)", integ, xs0, vs0, rp, fs)

    def materialize(xc, xs_, vs_, rp_):
        xs2 = xs_ + 1e-30 * xc[0, 0]
        x_g = sp.gather(xs2, d, addr)
        v_g = sp.gather(vs_, d, addr)
        a_g = sp.gather(vs_, d, addr)
        rho_g = sp.gather(rp_, 1, addr)[:, 0]
        return jnp.sum(x_g[0] + v_g[0] + a_g[0]) + rho_g[0]

    timeit("materialize gathers (1/k)", materialize, x, xs0, vs0, rp)


if __name__ == "__main__":
    main()
