"""Round-3 probe I: repair_k from-init neutrality + the se=8 rows probe H
crashed on (steps_per_dispatch must be a multiple of sort_every, and the
pallas clamp is 100 — probe H asked for 320).

Decides the repair_k production default: probe H measured repair_k=2048 at
1.23x strict from the SETTLED 1M state (52.0 vs 64.0 ms/step, rebuilds
25/40 -> 7/40, zero heals); this probe checks the predicate+repair
machinery costs nothing from INIT (calm phase, rebuilds 4-6/100) where the
driver's ladder runs.  Also finishes the block-length sweep: se=8 doubles
the skin (cells h+2.88 vs h+1.44 -> more candidates/step) for half the
per-block fixed costs and a doubled drift budget.

Usage: python bench/probe_r3i.py  (expects bench/.settled_1m_3000.npz)
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
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import make_advance, prime

SETTLED = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        ".settled_1m_3000.npz")


def timed(scene, st, tag, se, steps, **kw):
    adv = make_advance(
        scene, "pallas", steps_per_dispatch=steps, sort_every=se,
        slot_resident=True, auto_rebuild=True, **kw
    )
    out = adv(st)
    s2 = out[0]
    float(jnp.sum(s2.x))  # compile + warm
    best, counters = float("inf"), ()
    for _ in range(2):
        t0 = time.perf_counter()
        out = adv(s2)
        s2 = out[0]
        float(jnp.sum(s2.x))
        best = min(best, time.perf_counter() - t0)
        counters = tuple(int(c) for c in out[1:])
    n = int(s2.n_active())
    print(f"{tag:26s} {best/steps*1e3:8.2f} ms/step  "
          f"{n*steps/best:.3e} p-steps/s  "
          f"(viol, healed, rebuilds, repaired)={counters}", flush=True)


def main():
    scene = preset("splash3d_1m")

    print("== from INIT (calm phase): repair_k predicate cost", flush=True)
    st0 = init(scene)
    st0 = jax.jit(lambda s: prime(scene, s, method="pallas"))(st0)
    jax.block_until_ready(st0.x)
    timed(scene, st0, "init se=4 rep0", 4, 100)
    timed(scene, st0, "init se=4 rep2048", 4, 100, repair_k=2048)

    if _os.path.exists(SETTLED):
        st, _ = diagnostics.load_checkpoint(SETTLED)
        print("== from SETTLED: block length se=8 (96-step dispatches; "
              "probe H rows were 160)", flush=True)
        timed(scene, st, "settled se=8", 8, 96)
        timed(scene, st, "settled se=8 rep2048", 8, 96, repair_k=2048)
        # the probe-H winner re-timed at the same 96-step dispatch length
        # so the se rows have an apples-to-apples baseline
        timed(scene, st, "settled se=4 rep2048", 4, 96, repair_k=2048)
    else:
        print(f"(no settled checkpoint at {SETTLED}; skipping se=8 rows)",
              flush=True)


if __name__ == "__main__":
    main()
