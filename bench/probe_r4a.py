"""Round-4 probe A: why does resident4auto LOSE to plain resident4 at
dam2d_10k (VERDICT r3 weak 2: 1.97 vs 1.56 ms/step, vs_baseline 0.84)?

Hypotheses to separate:
  (a) the auto machinery's fixed per-block cost (predicate + lax.cond +
      repair plan) exceeds a 10k rebuild's cost (rebuilds are ~free at
      10k — ROADMAP r3f), so SKIPPING rebuilds buys nothing there;
  (b) the repair_k=2048 default's plan cost at small n;
  (c) the membership predicate mis-fires on 2D scenes (7 rebuilds/25
      from init).

Rows: plain resident4 / heal / auto variants (rep2048, rep0, strict,
rebuild_frac=0 = rebuild EVERY block, isolating the cond+predicate
overhead against plain), on dam2d_10k, a scaled 2D-100k dam, and
dam3d_100k (where auto is known to win) — the 2D-100k row decides
whether any fallback threshold should be scale- or dim-based.

Usage: python bench/probe_r4a.py
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

from sph_tpu.params import _dam_break_2d, calibrate, preset
from sph_tpu.state import init
from sph_tpu.step import make_advance, prime


def timed(scene, st0, tag, steps=100, **kw):
    adv = make_advance(scene, "pallas", steps_per_dispatch=steps,
                       sort_every=4, slot_resident=True, **kw)
    out = adv(st0)
    st = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(st.x))
    best, counters = float("inf"), ()
    for _ in range(3):
        t0 = time.perf_counter()
        out = adv(st)
        st = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(st.x))
        best = min(best, time.perf_counter() - t0)
        if isinstance(out, tuple):
            counters = tuple(int(c) for c in out[1:])
    n = int(st.n_active())
    print(f"  {tag:28s} {best / steps * 1e3:8.3f} ms/step  "
          f"{n * steps / best:.3e} p-steps/s  counters={counters}",
          flush=True)
    return best / steps


def run_scene(name, scene):
    print(f"== {name}", flush=True)
    st0 = init(scene)
    if scene.params.integrator == "leapfrog":
        st0 = jax.jit(lambda s: prime(scene, s, method="pallas"))(st0)
    jax.block_until_ready(st0.x)
    timed(scene, st0, "plain resident4")
    timed(scene, st0, "heal resident4", heal=True)
    timed(scene, st0, "auto rep2048", auto_rebuild=True, repair_k=2048)
    timed(scene, st0, "auto rep0", auto_rebuild=True)
    timed(scene, st0, "auto rep0 strict", auto_rebuild=True,
          membership_audit=False)
    timed(scene, st0, "auto rep0 frac0", auto_rebuild=True,
          rebuild_frac=0.0)


def main():
    run_scene("dam2d_10k", preset("dam2d_10k"))
    run_scene("dam2d_100k (scaled)", calibrate(_dam_break_2d(100_000)))
    run_scene("dam3d_100k", preset("dam3d_100k"))


if __name__ == "__main__":
    main()
