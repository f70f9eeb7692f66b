"""Round-3 probe H: settle-phase drift dynamics + reactive rebuild policy.

The auto-rebuild predictor (`drift + 1.2*vmax*dt*k`, step.py
_make_resident_auto_advance) rebuilds EVERY block at settle: the soak's
max|v| ~ 369 makes the velocity projection alone (1.2*369*dt*4 = 0.71)
eat the whole skin/2 budget (0.72 at the 1M preset), so settle runs at
~113 ms/step vs ~73 in calm phases.  Hypothesis: the fast minority at
settle is acoustic OSCILLATION, not ballistic transport — per-slot drift
stays bounded by the oscillation amplitude, so actual skin/2 violations
are rare and a REACTIVE policy (rebuild when MEASURED drift crosses
theta * skin/2, with the existing exact heal as the backstop when a
block overruns) can stretch the rebuild interval where ANY velocity- or
displacement-projection predictor cannot.

From a settled 1M splash state (cached as a checkpoint so repeat probes
skip the 3000-step evolve):

 1. no-rebuild drift dynamics: per block — max slot drift, #slots past
    skin/2, #past 0.8*budget, max per-block displacement, and the max
    drift of the enter-time fast set (|v| > 150): bounded fast-set drift
    == oscillator signature;
 2. reactive-theta policy: actual rebuild rate + would-be-heal rate over
    a block horizon, per theta.

Usage: python bench/probe_r3h.py [settle_steps] [probe_blocks]
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

from sph_tpu import diagnostics, neighbors, pallas_step
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import (
    _SlotPhysics, default_skin, make_advance, make_audited_advance, prime,
)

SORT_EVERY = 4
CACHE = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      ".settled_1m_{steps}.npz")


def settled_state(scene, settle_steps):
    path = CACHE.format(steps=settle_steps)
    if _os.path.exists(path):
        st, _ = diagnostics.load_checkpoint(path)
        print(f"loaded settled state from {path}", flush=True)
        return st
    state = init(scene)
    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    adv = make_audited_advance(
        scene, "pallas", 100, sort_every=SORT_EVERY, slot_resident=True,
    )
    t0 = time.perf_counter()
    for done in range(100, settle_steps + 1, 100):
        state = adv(state)
        if done % 1000 == 0:
            print(f"  evolve {done}/{settle_steps} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    jax.block_until_ready(state.x)
    diagnostics.save_checkpoint(path, state, scene)
    print(f"settled state cached to {path}", flush=True)
    return state


def make_resident_tools(scene, grid, sg):
    """enter / materialize / run-one-block in slot space — the
    _make_resident_auto_advance machinery, with per-block stats exposed."""
    params = scene.params
    dt = params.dt
    d = params.dim
    leap = params.integrator == "leapfrog"
    sp = _SlotPhysics(scene, grid, sg)

    @jax.jit
    def enter(s):
        act0 = s.active
        movable0 = act0 & (s.kind == 0)
        addr = pallas_step.build_addr(s.x, act0, grid, sg)
        zpad = jnp.zeros((s.capacity, 3 - d), jnp.float32)
        movf = movable0[:, None].astype(jnp.float32)
        v_in = s.v + (0.5 * dt) * s.acc * movf if leap else s.v
        rows = jnp.concatenate([s.x, zpad, v_in, zpad, movf], axis=1)
        feat = pallas_step.scatter_slots(addr, rows, sg)
        xs = feat[:, 0:d, :]
        vs = feat[:, 3:3 + d, :]
        movb = feat[:, 6:7, :] > 0
        fast0 = jnp.sum(vs * vs, axis=1, keepdims=True) > 150.0 ** 2
        return dict(
            addr=addr, xs=xs, vs=vs,
            acc=jnp.zeros_like(xs),
            rp=jnp.zeros((sg.c_rows, 2, sg.lanes), jnp.float32),
            movb=movb, x0s=xs, fast0=fast0 & movb, step=s.step,
        )

    zrow = jnp.zeros((sg.c_rows, 3 - d, sg.lanes), jnp.float32)

    @jax.jit
    def run_block(c):
        addr, movb = c["addr"], c["movb"]
        mov = movb.astype(jnp.float32)
        xs, vs, acc_s, rp = c["xs"], c["vs"], c["acc"], c["rp"]
        xs_top = xs
        tail = jnp.concatenate([mov, jnp.zeros_like(mov)], axis=1)

        def mk_feat(xs_, vs_):
            return jnp.concatenate([xs_, zrow, vs_, zrow, tail], axis=1)

        for i in range(SORT_EVERY):
            step_i = c["step"] + i
            vs = vs + (0.5 * dt) * acc_s * mov
            xs = xs + dt * vs * mov
            feat = mk_feat(xs, vs)
            rp = pallas_step._call_density(feat, addr, sg, params)
            f_s = pallas_step._call_force(feat, rp, addr, sg, params)
            rho_s = rp[:, 0:1, :]
            f_tot = sp.body_forces(xs, vs, rho_s, f_s[:, 0:d, :], step_i)
            a_s = jnp.where(movb, f_tot / jnp.maximum(rho_s, 1e-12), 0.0)
            vs = vs + (0.5 * dt) * a_s
            acc_s = a_s
            if params.boundary_mode == "clamp":
                xs, vs = sp.clamp_slot(xs, vs, movb)
        dd = xs - c["x0s"]
        drift2 = jnp.sum(dd * dd, axis=1, keepdims=True)
        bd = xs - xs_top
        bdisp2 = jnp.sum(bd * bd, axis=1, keepdims=True)
        stats = dict(
            dmax=jnp.sqrt(jnp.max(jnp.where(movb, drift2, 0.0))),
            fdmax=jnp.sqrt(jnp.max(jnp.where(c["fast0"], drift2, 0.0))),
            bdisp=jnp.sqrt(jnp.max(jnp.where(movb, bdisp2, 0.0))),
        )
        c2 = dict(c, xs=xs, vs=vs, acc=acc_s, rp=rp,
                  step=c["step"] + SORT_EVERY)
        return c2, stats, drift2, movb

    @jax.jit
    def viol_counts(drift2, movb, half, frac):
        return (
            jnp.sum((drift2 > half ** 2) & movb),
            jnp.sum((drift2 > (frac * half) ** 2) & movb),
        )

    @jax.jit
    def member_counts(c, half):
        """(outside-bin count, RELAXED violations = outside & drift>half):
        the membership-relaxed audit's view of the same state."""
        from sph_tpu.step import _slot_bin_refs, _slot_inside_bin

        dd = c["xs"] - c["x0s"]
        drift2 = jnp.sum(dd * dd, axis=1, keepdims=True)
        inside = _slot_inside_bin(
            c["xs"], _slot_bin_refs(c["addr"], sg), grid
        )
        out = ~inside & c["movb"]
        return jnp.sum(out), jnp.sum(out & (drift2 > half ** 2))

    @jax.jit
    def rematerialize(c, s):
        """Slots -> particle State (active particles all slotted at the
        settled state; shadow fallback for the rest)."""
        addr = c["addr"]
        act0 = s.active
        movable0 = act0 & (s.kind == 0)
        ok = addr.valid & (addr.row_pos > 0)
        x_g = sp.gather(c["xs"], d, addr)
        v_g = sp.gather(c["vs"], d, addr)
        a_g = sp.gather(c["acc"], d, addr)
        okc = ok[:, None]
        from sph_tpu import physics
        rho_g = sp.gather(c["rp"], 1, addr)[:, 0]
        rho_p = jnp.where(ok & act0, rho_g, s.rho)
        from sph_tpu.state import State
        return State(
            x=jnp.where(okc, x_g, s.x),
            v=jnp.where(okc, v_g, s.v),
            acc=jnp.where(okc & movable0[:, None], a_g, s.acc),
            rho=rho_p,
            p=jnp.where(ok & act0, physics.eos_pressure(rho_p, params),
                        s.p),
            kind=s.kind, emit_step=s.emit_step, step=c["step"],
        )

    return enter, run_block, viol_counts, member_counts, rematerialize


def main():
    settle_steps = int(_sys.argv[1]) if len(_sys.argv) > 1 else 3000
    probe_blocks = int(_sys.argv[2]) if len(_sys.argv) > 2 else 40
    scene = preset("splash3d_1m")
    skin = default_skin(scene, SORT_EVERY)
    half = 0.5 * skin
    base = neighbors.GridSpec.for_scene(scene)
    grid = neighbors.GridSpec.for_scene(scene, cap=base.cap, skin=skin)
    sg = pallas_step.slot_grid(grid, xb_cells=4)
    print(f"skin={skin:.3f} budget(skin/2)={half:.3f} "
          f"dt={scene.params.dt} c0={scene.params.sound_speed}", flush=True)

    st = settled_state(scene, settle_steps)
    vmax = float(jnp.sqrt(jnp.max(jnp.sum(st.v * st.v, axis=1))))
    vq = np.sqrt(np.asarray(jnp.sum(st.v * st.v, axis=1)))
    act = np.asarray(st.active)
    print(f"settled: max|v|={vmax:.1f}  "
          f"|v| quantiles (active) 50/90/99/99.9%: "
          f"{np.percentile(vq[act], [50, 90, 99, 99.9])}", flush=True)

    enter, run_block, viol_counts, member_counts, remat = (
        make_resident_tools(scene, grid, sg)
    )

    print(f"== part 1: no-rebuild drift dynamics ({probe_blocks} blocks "
          f"of {SORT_EVERY} steps)", flush=True)
    c = enter(st)
    for b in range(probe_blocks):
        c, stats, drift2, movb = run_block(c)
        nv, n80 = viol_counts(drift2, movb, half, 0.8)
        nout, nrelax = member_counts(c, half)
        print(
            f"block {b + 1:3d}: dmax={float(stats['dmax']):6.3f} "
            f"fast-set dmax={float(stats['fdmax']):6.3f} "
            f"blk-disp={float(stats['bdisp']):6.3f} "
            f"viol(> {half:.2f})={int(nv):7d} "
            f">80%budget={int(n80):7d} "
            f"outside-bin={int(nout):7d} "
            f"RELAXED-viol={int(nrelax):7d}",
            flush=True,
        )
        if int(nrelax) > 200_000:
            print("  (bulk membership violation — stopping part 1)",
                  flush=True)
            break

    print("== part 2: reactive-theta policy (rebuild at measured "
          "drift > theta*budget; heal when a block still overruns)",
          flush=True)
    for theta in (0.5, 0.7, 0.85):
        c = enter(st)
        s_shadow = st
        rebuilds = 0
        heals = 0
        clean = 0
        for b in range(probe_blocks):
            dd = c["xs"] - c["x0s"]
            drift_now = float(jnp.sqrt(jnp.max(jnp.where(
                c["movb"], jnp.sum(dd * dd, axis=1, keepdims=True), 0.0
            ))))
            if drift_now > theta * half:
                s_shadow = remat(c, s_shadow)
                c = enter(s_shadow)
                rebuilds += 1
            c, stats, drift2, movb = run_block(c)
            nv, _ = viol_counts(drift2, movb, half, 0.8)
            if int(nv) > 0:
                heals += 1
                s_shadow = remat(c, s_shadow)
                c = enter(s_shadow)
            else:
                clean += 1
        print(
            f"theta={theta:.2f}: rebuilds={rebuilds}/{probe_blocks} "
            f"heals={heals}/{probe_blocks} clean={clean}",
            flush=True,
        )

    print("== part 3: production auto advance from SETTLED — strict "
          "velocity vs reactive vs membership-relaxed vs block length "
          "(timed)", flush=True)
    for tag, kw, se in (
        ("velocity strict (r3)", dict(membership_audit=False), SORT_EVERY),
        ("reactive 0.70 strict", dict(reactive_theta=0.70,
                                      membership_audit=False), SORT_EVERY),
        ("membership (default)", {}, SORT_EVERY),
        ("membership+th=0.85", dict(reactive_theta=0.85), SORT_EVERY),
        ("membership+rep512", dict(repair_k=512), SORT_EVERY),
        ("membership+rep2048", dict(repair_k=2048), SORT_EVERY),
        ("membership+rep8192", dict(repair_k=8192), SORT_EVERY),
        # block-length sweep (untried knob): se=8 halves per-block fixed
        # costs (predicate, counters, cond plumbing) but doubles the skin
        # (default_skin ∝ k) — bigger cells, more candidates; se=2 the
        # reverse.  Same block COUNT per run so ms/step is comparable.
        ("membership se=2", {}, 2),
        ("membership se=8", {}, 8),
        ("membership+rep2048 se=8", dict(repair_k=2048), 8),
    ):
        steps = probe_blocks * se
        adv = make_advance(
            scene, "pallas", steps_per_dispatch=steps, sort_every=se,
            slot_resident=True, auto_rebuild=True, **kw
        )
        out = adv(st)
        s2, viol, healed, rebuilds = out[:4]
        float(jnp.sum(s2.x))
        best, h_last, r_last, p_last, v_last = float("inf"), 0, 0, 0, 0
        for _ in range(2):
            t0 = time.perf_counter()
            out = adv(s2)
            s2, viol, healed, rebuilds = out[:4]
            float(jnp.sum(s2.x))
            best = min(best, time.perf_counter() - t0)
            h_last, r_last, v_last = int(healed), int(rebuilds), int(viol)
            p_last = int(out[4]) if len(out) > 4 else 0
        n = int(s2.n_active())
        print(
            f"{tag:22s} {best/steps*1e3:8.2f} ms/step  "
            f"{n*steps/best:.3e} p-steps/s  viol={v_last} healed={h_last} "
            f"rebuilds={r_last}/{steps//se} repaired={p_last}",
            flush=True,
        )


if __name__ == "__main__":
    main()
