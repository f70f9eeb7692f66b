"""Probe r5d — packed-row resident4auto END-TO-END at the settled
emitters3d state (the round-5 headline; kernels-only numbers in
probe_r5b.py).

Measured 2026-08-20 (100-step dispatches, checksum-forced, best of 3):

    packed resident4auto (row_lanes default=384): 5.182 ms/step (3.86e6)
    packed resident4auto row_lanes=256:           4.802 ms/step (4.17e6)
    slot resident4auto (probe_r5a, same state):  14.268 ms/step (1.40e6)

→ 2.97× end-to-end, vs_baseline 1.38 (bar: 1.0 ≈ 6.62 ms/step at
n=20,024) — config 5 reaches parity on the FORMULA bar and beats the
reference algorithm at the same n (naive 18.22 ms/step) by 3.8×.
Zero violations, zero heals, ~10 rebuilds/25 blocks, finite finish.
row_lanes=256 is 8% faster but fails packed_fits' 2× worst-row headroom
at this state (max row 148); the shipped default stays 384.
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from sph_tpu.platform import ensure_backend

ensure_backend()

import jax.numpy as jnp
import numpy as np

from sph_tpu import diagnostics
from sph_tpu.step import make_advance

CKPT = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     ".settled_emitters3d.npz")


def main():
    state, scene = diagnostics.load_checkpoint(CKPT)
    n = int(state.n_active())
    for label, kw in [
        ("packed resident4auto", dict(packed_rows=True)),
        ("packed resident4auto rl=256",
         dict(packed_rows=True, row_lanes=256)),
    ]:
        adv = make_advance(scene, "pallas", steps_per_dispatch=100,
                           sort_every=4, slot_resident=True,
                           auto_rebuild=True, repair_k=0, **kw)
        out = adv(state)
        st = out[0]
        float(jnp.sum(st.x))
        best, audits = float("inf"), []
        for _ in range(3):
            t0 = time.perf_counter()
            out = adv(st)
            st = out[0]
            float(jnp.sum(st.x))
            best = min(best, time.perf_counter() - t0)
            audits.append(out[1:])
        a = [tuple(int(c) for c in e) for e in audits]
        ms = best / 100 * 1e3
        print(f"{label}: {ms:.3f} ms/step ({n / ms * 1e3:.3e} p-steps/s) "
              f"[viol,healed,rebuilds]={a}", flush=True)
        act = np.asarray(st.active)
        assert np.isfinite(np.asarray(st.x)[act]).all(), "non-finite!"


if __name__ == "__main__":
    main()
