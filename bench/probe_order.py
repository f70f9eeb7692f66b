"""Round-4 probe: raw per-dispatch repeat times for the dam2d auto row.

The r3/r4 ladders showed resident4auto LOSING to plain resident4 at
dam2d_10k (1.71-1.97 vs 1.48-1.56 ms/step) while a fresh-process probe
showed it WINNING (1.006 vs 1.297).  This probe prints every repeat raw
(ms/step, 8 dispatches per advance, two advances of each kind
interleaved) with ONLY the checksum fetched inside the timing.

Measured output (2026-08-19, the round-4 smoking gun):

    auto#1  687.13   1.08   1.08   1.05   1.06   1.10   1.09   1.11
    plain#1  60.25   1.27   1.32   1.29   1.25   1.27   1.31   1.26
    auto#2  142.35   1.05   1.04   1.04   1.07   1.08   1.10   1.10
    plain#2  60.64   1.30   1.29   1.30   1.29   1.28   1.26   1.26

Post-warmup, auto is STABLY 19% faster than plain.  The ladder's
inversion came from fetching the auto advance's 3-4 counters inside the
timed window: each separate scalar int() is a ~20 ms host round-trip
through the compile tunnel (+60 ms on a 100 ms dispatch).  Consequences
shipped: benches defer counter fetches past the timed repeats;
make_audited_advance / the spatial audited wrapper batch their scalars
into ONE jax.device_get per dispatch.

Usage: python bench/probe_order.py
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

from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import make_advance


def raw(scene, st0, tag, **kw):
    adv = make_advance(scene, "pallas", steps_per_dispatch=100,
                       sort_every=4, slot_resident=True, **kw)
    st = st0
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = adv(st)
        st = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(st.x))  # checksum ONLY — no counter fetches
        ts.append((time.perf_counter() - t0) * 10)  # ms/step
    print(tag, " ".join(f"{t:6.2f}" for t in ts), flush=True)


def main():
    scene = preset("dam2d_10k")
    st0 = init(scene)
    jax.block_until_ready(st0.x)
    raw(scene, st0, "auto#1 ", auto_rebuild=True)
    raw(scene, st0, "plain#1")
    raw(scene, st0, "auto#2 ", auto_rebuild=True)
    raw(scene, st0, "plain#2")


if __name__ == "__main__":
    main()
