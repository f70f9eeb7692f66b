"""Round-4 probe E: why does emitters3d@settled cost 23.8 ms/step at
n=20k (vs dam3d_100k 11.1 at 101k), and does a wider skin fix it?

The settled emitters row runs 16 rebuilds + 10 heals per 25 blocks: jet
particles near the EOS sound speed (skin = 2·k·dt·c0 → budget skin/2
covers |v| ≤ c0 only on average) keep tripping the predictive predicate
and, past c0, the in-block audit (heal = ~4 exact steps, the expensive
path).  With h = 16 the cell edge is h + skin = 17.4, so DOUBLING the
skin grows cells by just 8% (candidate volume +27% worst case) while
doubling every drift budget — the opposite trade from the 1M splash
(h = 4.3, skin-dominated cells).

Rows: per-step / plain resident4 / auto variants / auto with skin ×2, ×3.

Usage: python bench/probe_r4e.py  (needs bench/.settled_emitters3d.npz)
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

from sph_tpu import diagnostics
from sph_tpu.step import default_skin, make_advance

SETTLED = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        ".settled_emitters3d.npz")


def timed(scene, st0, tag, steps=100, se=4, **kw):
    adv = make_advance(scene, "pallas", steps_per_dispatch=steps,
                       sort_every=se, **kw)
    out = adv(st0)
    st = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(st.x))
    best = float("inf")
    outs = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = adv(st)
        st = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(st.x))
        best = min(best, time.perf_counter() - t0)
        outs.append(out)
    counters = tuple(
        tuple(int(c) for c in o[1:]) for o in outs if isinstance(o, tuple)
    )
    n = int(st.n_active())
    print(f"  {tag:30s} {best / steps * 1e3:8.3f} ms/step  "
          f"{n * steps / best:.3e} p-steps/s  counters={counters[-1] if counters else ()}",
          flush=True)


def main():
    st, scene = diagnostics.load_checkpoint(SETTLED)
    jax.block_until_ready(st.x)
    print(f"settled emitters3d: n={int(st.n_active())}", flush=True)
    timed(scene, st, "per-step pallas", se=1)
    timed(scene, st, "plain resident4", slot_resident=True)
    timed(scene, st, "auto rep0", slot_resident=True, auto_rebuild=True)
    timed(scene, st, "auto rep2048", slot_resident=True, auto_rebuild=True,
          repair_k=2048)
    for mult in (2.0, 3.0):
        sk = mult * default_skin(scene, 4)
        timed(scene, st, f"auto rep2048 skin x{mult:.0f}",
              slot_resident=True, auto_rebuild=True, repair_k=2048, skin=sk)
        timed(scene, st, f"auto rep0 skin x{mult:.0f}",
              slot_resident=True, auto_rebuild=True, skin=sk)


if __name__ == "__main__":
    main()
