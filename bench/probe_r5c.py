"""Probe r5c — where do the settled-emitters3d resident path's ~14 ms/step
actually go?  Isolated kernels measure 4.2-4.8 ms (probe_r5b: packed rows /
batch_skip) yet resident4auto runs 14.3 (probe_r5a) — ~9.5 ms/step of
non-pair-kernel cost.  This probe times (a) a synthetic FULL slot step
(mk_feat → density → force → body forces → integrate → drift+membership
audit), i.e. run_block's per-step body outside the scan/cond machinery,
and (b) make_advance variants that remove machinery pieces one at a time.
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
from sph_tpu.step import (
    _membership_bad,
    _SlotPhysics,
    default_skin,
    make_advance,
)

CKPT = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     ".settled_emitters3d.npz")


def timeit(name, fn, x0, *args, iters=50):
    def run(xin, *a):
        def body(i, xc):
            s = jnp.sum(fn(xc, *a).astype(jnp.float32))
            return xc + 1e-30 * s

        return jnp.sum(jax.lax.fori_loop(0, iters, body, xin))

    f = jax.jit(run)
    float(f(x0, *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x0, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best / iters * 1e3:9.3f} ms", flush=True)
    return best / iters


def checksum(s):
    return float(jnp.sum(s.x, dtype=jnp.float32))


def main():
    state, scene = diagnostics.load_checkpoint(CKPT)
    params = scene.params
    n = int(state.n_active())
    d = params.dim
    dt = params.dt
    skin = default_skin(scene, 4)
    base = neighbors.GridSpec.for_scene(scene)
    grid = neighbors.GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    print(f"n={n} grid={grid.shape} cap={grid.cap}")

    # ---- (a) synthetic full slot step, slot+skip vs packed -------------
    for label, sg in [
        ("slot+batch_skip", pallas_step.slot_grid(grid, batch_skip=True)),
        ("packed 384", pallas_step.packed_grid(grid, 384)),
    ]:
        addr = jax.jit(
            lambda xx, sg=sg: pallas_step.build_addr(xx, state.active, grid, sg)
        )(state.x)
        sp = _SlotPhysics(scene, grid, sg)
        rows = pallas_step._pack_rows6(state.x, state.v)
        feat = jax.jit(
            lambda a, r, sg=sg: pallas_step.scatter_slots(a, r, sg)
        )(addr, rows)
        xs = feat[:, 0:d, :]
        vs = feat[:, 3:3 + d, :]
        movb = feat[:, 6:7, :] > 0
        mov = movb.astype(jnp.float32)
        tail = jnp.concatenate([mov, jnp.zeros_like(mov)], axis=1)
        zrow = jnp.zeros((sg.c_rows, 3 - d, sg.lanes), jnp.float32)

        def full_step(xs_, vs_, x0s, addr=addr, sg=sg, sp=sp, movb=movb,
                      mov=mov, tail=tail, zrow=zrow):
            feat_ = jnp.concatenate([xs_, zrow, vs_, zrow, tail], axis=1)
            rp = pallas_step._call_density(feat_, addr, sg, params)
            f_s = pallas_step._call_force(feat_, rp, addr, sg, params)
            rho_s = rp[:, 0:1, :]
            f_tot = sp.body_forces(xs_, vs_, rho_s, f_s[:, 0:d, :], 0)
            a_s = jnp.where(movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0)
            vs2 = vs_ + (0.5 * dt) * a_s
            xs2 = xs_ + dt * vs2 * mov
            dd = xs2 - x0s
            drift2 = jnp.sum(dd * dd, axis=1, keepdims=True)
            bad_i = (drift2 > (0.5 * skin) ** 2) & movb
            bad_i = _membership_bad(bad_i, xs2, addr, sg, grid)
            return xs2, vs2, jnp.sum(bad_i.astype(jnp.int32))

        def loop_step(xs_in, vs_in, x0s, sg=sg):
            xs2, vs2, viol = full_step(xs_in, vs_in, x0s)
            return xs2 + 1e-30 * viol.astype(jnp.float32)

        timeit(f"{label}: FULL slot step", loop_step, xs, vs, xs)

        def kern_only(feat_in, addr_in, sg=sg):
            rp = pallas_step._call_density(feat_in, addr_in, sg, params)
            return pallas_step._call_force(feat_in, rp, addr_in, sg, params)

        timeit(f"{label}: kernels only", kern_only, feat, addr)

    # ---- (b) advance variants (100-step dispatch, checksum-forced) -----
    for label, kw in [
        ("resident4auto rep0 (production-like)",
         dict(auto_rebuild=True, repair_k=0)),
        ("resident4auto strict-audit rep0",
         dict(auto_rebuild=True, repair_k=0, membership_audit=False)),
        ("resident4 plain (rebuild every block)",
         dict(auto_rebuild=False)),
        ("resident4 heal",
         dict(auto_rebuild=False, heal=True)),
    ]:
        adv = make_advance(scene, "pallas", steps_per_dispatch=100,
                           sort_every=4, slot_resident=True, **kw)

        def one(st, adv=adv):
            out = adv(st)
            return out[0] if isinstance(out, tuple) else out

        st = one(state)
        checksum(st)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            st = one(st)
            checksum(st)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:44s} {best / 100 * 1e3:9.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
