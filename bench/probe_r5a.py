"""Probe r5a — the emitters3d@settled residual (VERDICT r4 item 2).

Round-4 left config 5 at 14.5 ms/step (n=20,092, vs_baseline 0.458) with
the diagnosis "dense floor rows dominate".  The round-5 occupancy data
from the settled checkpoint REFUTES that model: the state is a diffuse
spray — mean cell occupancy 2.16 (max 11, 27 cells > 8, 9,289 occupied
cells over 1,120 rows at the default widened skin) — so the engine pays
~4,159 occupied 128-lane groups of fixed 864-lane window math for ~5
true neighbors per particle.  This probe measures, on the real chip:

  1. naive all-pairs at the SAME n (the reference's own algorithm, which
     the vs_baseline formula extrapolates from its 8k pair rate) — does
     the chip even sustain 6.06e10 pairs/s at 20k?
  2. the shipped production row (resident4auto, default repair) as the
     re-baseline, plus repair_k=0 — VERDICT item 5's gate question:
     capacity (65,536) is above REPAIR_MIN_N while active n (~20k) is
     below, so the default currently turns repair ON here.
  3. cheap structural variants: xb_cells=8 (fewer, wider batches) and a
     further-widened skin.

Run AFTER any other TPU process has been gone ~30 s (CLAUDE.md).
"""

import dataclasses
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from sph_tpu.platform import ensure_backend

ensure_backend()

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu import diagnostics
from sph_tpu.state import State
from sph_tpu.step import default_repair_k, default_skin, make_advance

CKPT = "/root/repo/bench/.settled_emitters3d.npz"


def checksum(state):
    return float(jnp.sum(state.x, dtype=jnp.float32))


def timeit(adv, state, steps, repeats=3, tuple_out=False):
    """Checksum-forced best-of-repeats; counter fetches deferred out of
    the timed window (CLAUDE.md: each scalar fetch is a ~20 ms RTT)."""
    outs = []

    def one(st):
        out = adv(st)
        st = out[0] if tuple_out else out
        checksum(st)
        return st, (out[1:] if tuple_out else ())

    state, _ = one(state)  # warmup/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, extra = one(state)
        best = min(best, time.perf_counter() - t0)
        outs.append(extra)
    audits = [tuple(int(c) for c in e) for e in outs if e]
    return best / steps * 1e3, audits


def compact_state(state, scene, cap=20480):
    """Active particles repacked into a small-capacity State (naive at
    capacity 65,536 would allocate a 17 GB pair matrix)."""
    act = np.asarray(state.active)
    idx = np.nonzero(act)[0][:cap]
    pad = cap - idx.size

    def take(a, fill=0):
        a = np.asarray(a)
        out = a[idx]
        if pad:
            out = np.concatenate(
                [out, np.full((pad,) + a.shape[1:], fill, a.dtype)]
            )
        return jnp.asarray(out)

    small = State(
        x=take(state.x, 1e9),
        v=take(state.v),
        acc=take(state.acc),
        rho=take(state.rho),
        p=take(state.p),
        kind=take(state.kind),
        emit_step=jnp.asarray(
            np.where(np.arange(cap) < idx.size, 0, np.iinfo(np.int32).max)
        ).astype(jnp.int32),
        step=state.step,
    )
    small_scene = dataclasses.replace(scene, emitters=(), capacity=cap)
    return small, small_scene, idx.size


def main():
    state, scene = diagnostics.load_checkpoint(CKPT)
    n = int(state.n_active())
    rk = default_repair_k(scene, auto=True)
    print(f"settled emitters3d: n_active={n}, capacity={state.capacity}")
    print(f"default_repair_k(auto) resolves to {rk} (capacity-keyed)")

    # --- 1. naive all-pairs at the same n ------------------------------
    small, small_scene, n_small = compact_state(state, scene)
    steps = 20
    adv = make_advance(small_scene, "naive", steps_per_dispatch=steps)
    ms, _ = timeit(adv, small, steps)
    print(f"naive@{n_small}: {ms:.2f} ms/step ({n_small / ms * 1e3:.3e} "
          f"p-steps/s; survey-extrapolated bar = "
          f"{n_small * n_small / 6.06e10 * 1e3:.2f} ms/step)")

    # --- 2 + 3. production row and variants -----------------------------
    steps = 100
    cases = [
        ("resident4auto repair=default(2048)", dict(repair_k=rk)),
        ("resident4auto repair_k=0", dict(repair_k=0)),
        ("resident4auto xb=8 rep0", dict(repair_k=0, xb_cells=8)),
        ("resident4auto skin x4.5 rep0",
         dict(repair_k=0, skin=default_skin(scene, 4) * 1.5)),
    ]
    for label, kw in cases:
        try:
            adv = make_advance(scene, "pallas", steps_per_dispatch=steps,
                               sort_every=4, slot_resident=True,
                               auto_rebuild=True, **kw)
            ms, audits = timeit(adv, state, steps, tuple_out=True)
            print(f"{label}: {ms:.3f} ms/step ({n / ms * 1e3:.3e}) "
                  f"[viol,healed,rebuilds,(repairs)]={audits}")
        except Exception as e:  # noqa: BLE001 — keep probing
            print(f"{label}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
