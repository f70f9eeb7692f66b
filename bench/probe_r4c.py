"""Round-4 probe C: packed-bf16 rebuild transport (VERDICT r3 item 4a).

ROADMAP's bf16 dead-end entry left one lever unmeasured: packed-bf16
SCATTER columns — the rebuild's 7-column x/v/mov scatter becomes 4 (3D)
by packing bf16 pairs into fp32 lanes, unpacked to fp32 right after
(kernels unchanged; precision loss = one bf16 round-trip of
cell-relative x / absolute v per rebuild, ~0.4% of a cell).  The
estimate was −26 ms of the 57 ms 1M scatter; since auto-mode rebuilds
fire every 1-2 blocks at settle/impact, the scatter is back on the
critical path there.

Rows: splash3d_1m resident4auto packed on/off, from INIT (calm: rebuilds
amortize ~1/20 steps — expect ~neutral) and from the SETTLED state with
repair_k=0 rebuild-heavy policy AND the production repair_k=2048 (repair
replaces most rebuilds — packed should matter less).  dam3d_100k from
init as the smaller-scale check.

Usage: python bench/probe_r4c.py   (settled rows need
bench/.settled_1m_3000.npz — bench/make_settled_state.py)
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


def timed(scene, st0, tag, steps=100, **kw):
    adv = make_advance(scene, "pallas", steps_per_dispatch=steps,
                       sort_every=4, slot_resident=True, auto_rebuild=True,
                       **kw)
    out = adv(st0)
    st = out[0]
    float(jnp.sum(st.x))
    best, counters = float("inf"), ()
    for _ in range(2):
        t0 = time.perf_counter()
        out = adv(st)
        st = out[0]
        float(jnp.sum(st.x))
        best = min(best, time.perf_counter() - t0)
        counters = tuple(int(c) for c in out[1:])
    n = int(st.n_active())
    print(f"  {tag:34s} {best / steps * 1e3:8.2f} ms/step  "
          f"{n * steps / best:.3e} p-steps/s  "
          f"(viol,healed,rebuilds[,repairs])={counters}", flush=True)


def main():
    for name in ("dam3d_100k", "splash3d_1m"):
        scene = preset(name)
        st0 = init(scene)
        st0 = jax.jit(lambda s: prime(scene, s, method="pallas"))(st0)
        jax.block_until_ready(st0.x)
        print(f"== {name} from init", flush=True)
        timed(scene, st0, "auto rep0")
        timed(scene, st0, "auto rep0 packed", packed_scatter=True)

    if _os.path.exists(SETTLED):
        st, scene = diagnostics.load_checkpoint(SETTLED)
        print("== splash3d_1m from SETTLED (rebuild-heavy regime)",
              flush=True)
        timed(scene, st, "auto rep0")
        timed(scene, st, "auto rep0 packed", packed_scatter=True)
        timed(scene, st, "auto rep2048", repair_k=2048)
        timed(scene, st, "auto rep2048 packed", packed_scatter=True,
              repair_k=2048)
    else:
        print(f"(no settled checkpoint at {SETTLED}; skipping settled rows)",
              flush=True)


if __name__ == "__main__":
    main()
