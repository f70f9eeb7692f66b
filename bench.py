"""Benchmark harness (SURVEY.md §4.10, §6) — prints ONE JSON line.

Metric (driver-defined, BASELINE.json:2): particle-steps/sec.  The reference
publishes no numbers ("published": {}), so vs_baseline is computed against
the naive-path throughput measured on this machine at survey time
(~7.4e6 particle-steps/s, BASELINE.md).

Timing rule learned at survey time: async timings lie on this platform
(`block_until_ready` under-reports ~1000×) — every measurement runs >=100
steps inside one `lax.scan` dispatch and fetches a checksum to force real
completion.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import make_advance, prime

# The reference publishes no numbers (BASELINE.json "published": {}), so the
# baseline is the reference's own algorithm — naive all-pairs — run on THIS
# chip at survey time: 7.4e6 particle-steps/s at n=8192, i.e. a measured
# pair rate of 7.4e6 * 8192 ≈ 6.06e10 pair-interactions/s.  vs_baseline
# compares against that algorithm AT THE SAME particle count (naive is
# O(n²), so its throughput at n is pair_rate / n); comparing against the
# 8k figure directly would mix two different workloads.
SURVEY_NAIVE_PAIR_RATE = 7.4e6 * 8192  # pairs/s, BASELINE.md (measured [M])


def checksum(state) -> float:
    """Host-materialized scalar that depends on every particle's position."""
    return float(jnp.sum(state.x, dtype=jnp.float32))


def bench_config(scene, method: str, steps: int, repeats: int = 3):
    state = init(scene)
    if scene.params.integrator == "leapfrog":
        state = jax.jit(lambda s: prime(scene, s, method=method))(state)
    adv = make_advance(scene, method, steps_per_dispatch=steps)
    # warmup: compile + one full dispatch
    state = adv(state)
    checksum(state)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = adv(state)
        checksum(state)  # forces completion (async timings unreliable here)
        best = min(best, time.perf_counter() - t0)
    n_active = int(state.n_active())
    return n_active * steps / best, best / steps, n_active


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="auto")
    ap.add_argument("--method", default="auto")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--all", action="store_true", help="bench every config")
    args = ap.parse_args()

    # Flagship measurement: the largest config the current build supports.
    ladder = [
        ("splash3d_1m", "pallas"),
        ("dam3d_100k", "pallas"),
        ("dam3d_100k", "grid"),
        ("dam2d_10k", "grid"),
        ("tutorial2d", "naive"),
    ]
    if args.config != "auto":
        if args.method != "auto":
            ladder = [(args.config, args.method)]
        else:
            # fastest-first method ladder for the named config (naive at
            # 100k+ would allocate an [N, N] pair matrix — instant OOM)
            ladder = [
                (args.config, m) for m in ("pallas", "grid", "naive")
            ]

    for name, method in ladder:
        try:
            scene = preset(name)
            pstep_s, s_per_step, n = bench_config(scene, method, args.steps)
            print(
                json.dumps(
                    {
                        "metric": f"particle-steps/sec ({name}, {method}, n={n})",
                        "value": pstep_s,
                        "unit": "particle-steps/s",
                        # speedup over the reference algorithm (naive
                        # all-pairs) at the same n on this same chip
                        "vs_baseline": pstep_s / (SURVEY_NAIVE_PAIR_RATE / n),
                    }
                )
            )
            return 0
        except Exception as e:  # noqa: BLE001 — fall down the ladder
            print(f"# {name}/{method} unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps({"metric": "no-config-ran", "value": 0.0,
                      "unit": "particle-steps/s", "vs_baseline": 0.0}))
    return 1


if __name__ == "__main__":
    sys.exit(main())
