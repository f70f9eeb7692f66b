"""1M splash soak under spatial decomposition (1-device mesh).

Validates the decomp production path — make_audited_spatial_advance with
auto-rebuild residency — through the collapse→impact→settle arc, the
same contract the single-chip soak (soak_1m.py) guards: skin/cap audits
absorbed by the exact fallback, elastic SpatialSpec recovery if the flow
outgrows a static buffer, healthy physics at the end, and the honest
whole-run soak-average.

On this machine the mesh has one real device, so this soaks the full
ring machinery (masked wrapped ghosts, migration, mesh-uniform rebuild
predicate) at zero communication benefit — the point is correctness
under load plus the overhead floor, not scaling.

Usage: python bench/soak_spatial.py [n_steps] [shards]
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

from sph_tpu import decomp
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import default_skin, prime


def main():
    n_steps = int(_sys.argv[1]) if len(_sys.argv) > 1 else 2000
    shards = int(_sys.argv[2]) if len(_sys.argv) > 2 else 1
    spd = 100
    scene = preset("splash3d_1m")
    state = init(scene)
    state = jax.jit(lambda s: prime(scene, s, method="pallas"))(state)
    n = int(state.n_active())
    mesh = decomp.mesh1d(shards)
    skin = default_skin(scene, 4)

    def build(st):
        spec = decomp.SpatialSpec.for_state(scene, st, shards, skin=skin)
        loc = decomp.spatial_shard_state(st, scene, spec, mesh)
        adv = decomp.make_audited_spatial_advance(
            scene, spec, mesh, steps_per_dispatch=spd, sort_every=4,
            slot_resident=True,
        )
        return loc, adv

    loc, adv = build(state)
    healed_total = 0
    print(f"spatial soak: n={n}, {n_steps} steps, shards={shards}",
          flush=True)
    loc = adv(loc)  # warm compile outside the timed loop
    jax.block_until_ready(loc.x)
    done = spd
    recoveries = 0
    t0 = time.perf_counter()
    while done < n_steps:
        try:
            loc = adv(loc)
        except decomp.SpatialCapOverflow as e:
            recoveries += 1
            print(f"elastic recovery at step {done}: {e}", flush=True)
            healed_total += adv.healed
            loc, adv = build(decomp.spatial_gather_state(loc))
            loc = adv(loc)
        jax.block_until_ready(loc.x)
        done += spd
        if done % 500 == 0:
            merged = decomp.spatial_gather_state(loc)
            act = merged.emit_step <= merged.step
            mx = float(jnp.max(jnp.abs(merged.v)))
            rho_mean = float(
                jnp.sum(jnp.where(act, merged.rho, 0.0))
                / jnp.maximum(jnp.sum(act), 1)
            )
            n_act = int(jnp.sum(act))
            wall = time.perf_counter() - t0
            print(
                f"step {done:5d}  wall {wall:8.1f}s  n_act={n_act} "
                f"max|v|={mx:7.1f} rho_mean={rho_mean:8.1f}",
                flush=True,
            )
            assert n_act == n, f"lost particles: {n_act} != {n}"
    wall = time.perf_counter() - t0
    timed = done - spd
    merged = decomp.spatial_gather_state(loc)
    ok = bool(jnp.all(jnp.isfinite(merged.x)))
    print(
        f"SPATIAL SOAK RESULT: {timed} timed steps in {wall:.1f}s → "
        f"{n * timed / wall:.3e} particle-steps/s soak-average "
        f"({wall / timed * 1e3:.1f} ms/step); recoveries={recoveries} "
        f"healed_blocks={healed_total + adv.healed} finite={ok}",
        flush=True,
    )
    assert ok


if __name__ == "__main__":
    main()
