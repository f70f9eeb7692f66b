"""Probe r5e — tutorial2d (n=1034) calibration: chip ceiling vs the ladder row.

The last sub-1 ladder row is tutorial2d/naive: 0.1437 ms/step at n=1034
(vs_baseline 0.12; bar = 0.0176 ms/step from the formula's n-independent
8k pair rate, 6.1e10 pairs/s -> 17.5 us/step at 1.07e6 pairs).  Round-3/4
accepted it as "fixed-overhead bound" without separating the overheads.
This probe decomposes the 143 us/step into:

  1. per-DISPATCH overhead — the ladder row runs S=200 steps/dispatch and
     fetches one checksum per dispatch; the checksum fetch alone is a
     ~20 ms tunnel RTT (CLAUDE.md round-4 finding) = ~100 us/step at
     S=200.  Measured by sweeping S in {200, 1000, 5000} on the SHIPPED
     production advance (make_advance "naive").
  2. framework-vs-raw — a raw-array fori_loop step (same math: density,
     ideal EOS, forces, gravity, clamp walls, semi-implicit Euler; no
     State pytree, no emitter/mask machinery) at the same S.
  3. alignment — n=1024 (8/128-aligned) vs n=1034 (pads rows 1034->1040
     sublanes, lanes 1034->1152 on [n, n] pair intermediates).
  4. the per-iteration floor — n in {256, 1024, 4096} raw scaling plus an
     integrate-only loop (no pair math) at n=1034.

Run AFTER any other TPU process has been gone ~30 s (CLAUDE.md).
"""

import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from sph_tpu.platform import ensure_backend

ensure_backend()

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu import physics
from sph_tpu.params import preset
from sph_tpu.state import init
from sph_tpu.step import make_advance


def timeit(fn, carry, steps, repeats=3):
    """Checksum-forced best-of-repeats, one checksum fetch per dispatch."""
    carry = fn(carry)  # warmup/compile
    float(jnp.sum(carry[0] if isinstance(carry, tuple) else carry.x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = fn(carry)
        float(jnp.sum(carry[0] if isinstance(carry, tuple) else carry.x))
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e3


def prod_advance(scene, steps):
    return make_advance(scene, "naive", steps_per_dispatch=steps)


def raw_step_fn(params, lo, hi, n_steps):
    """Raw-array fori_loop: the tutorial2d math with zero framework."""
    lo_a = jnp.asarray(lo, jnp.float32)
    hi_a = jnp.asarray(hi, jnp.float32)

    def body(_, xv):
        x, v = xv
        active = jnp.ones((x.shape[0],), jnp.bool_)
        rho = physics.density_naive(x, active, params)
        p = physics.eos_pressure(rho, params)
        f = physics.forces_naive(x, v, rho, p, active, params)
        f = f + physics.gravity_force(rho, params)
        v = v + params.dt * f / rho[:, None]
        x = x + params.dt * v
        x, v = physics.clamp_boundary(x, v, lo_a, hi_a, params)
        return (x, v)

    def run(xv):
        return jax.lax.fori_loop(0, n_steps, body, xv)

    return jax.jit(run)


def integrate_only_fn(params, lo, hi, n_steps):
    lo_a = jnp.asarray(lo, jnp.float32)
    hi_a = jnp.asarray(hi, jnp.float32)
    g = jnp.asarray(params.gravity, jnp.float32)

    def body(_, xv):
        x, v = xv
        v = v + params.dt * g[None, :]
        x = x + params.dt * v
        x, v = physics.clamp_boundary(x, v, lo_a, hi_a, params)
        return (x, v)

    return jax.jit(lambda xv: jax.lax.fori_loop(0, n_steps, body, xv))


def main():
    smoke = "--smoke" in _sys.argv  # CPU correctness pass: tiny step counts
    div = 100 if smoke else 1
    scene = preset("tutorial2d")
    state = init(scene)
    n = int(np.asarray(state.active).sum())
    params = scene.params
    print(f"tutorial2d n={n} capacity={state.x.shape[0]}", flush=True)

    results = {}

    # --- 1. production advance, S sweep --------------------------------
    for s in (200 // div or 2, 1000 // div, 5000 // div):
        adv = prod_advance(scene, s)
        ms = timeit(adv, state, s)
        results[f"prod_S{s}"] = ms
        print(f"prod naive S={s}: {ms*1e3:.1f} us/step", flush=True)

    # --- 2/3. raw fori_loop, alignment + S sweep ------------------------
    x0 = np.asarray(state.x, np.float32)
    v0 = np.asarray(state.v, np.float32)
    for label, nn in (("raw_n1034", n), ("raw_n1024", 1024)):
        xv = (jnp.asarray(x0[:nn]), jnp.asarray(v0[:nn]))
        for s in (1000 // div, 5000 // div):
            fn = raw_step_fn(params, scene.lo, scene.hi, s)
            ms = timeit(fn, xv, s)
            results[f"{label}_S{s}"] = ms
            print(f"{label} S={s}: {ms*1e3:.1f} us/step", flush=True)

    # --- 4a. n scaling (per-iteration floor vs compute) ----------------
    rng = np.random.default_rng(0)
    for nn in (256, 4096):
        xs = rng.uniform(50, 500, size=(nn, 2)).astype(np.float32)
        xv = (jnp.asarray(xs), jnp.zeros((nn, 2), jnp.float32))
        fn = raw_step_fn(params, scene.lo, scene.hi, 1000 // div)
        ms = timeit(fn, xv, 1000 // div)
        results[f"raw_n{nn}_S1000"] = ms
        print(f"raw n={nn} S=1000: {ms*1e3:.1f} us/step "
              f"({nn*nn/ms*1e-9:.2f}e9 pairs/ms... raw)", flush=True)

    # --- 4b. integrate-only floor ---------------------------------------
    xv = (jnp.asarray(x0[:n]), jnp.asarray(v0[:n]))
    fn = integrate_only_fn(params, scene.lo, scene.hi, 5000 // div)
    ms = timeit(fn, xv, 5000 // div)
    results["integrate_only_S5000"] = ms
    print(f"integrate-only n={n} S=5000: {ms*1e3:.2f} us/step", flush=True)

    print("\nsummary (us/step):", flush=True)
    for k, v in results.items():
        print(f"  {k:24s} {v*1e3:8.1f}", flush=True)


if __name__ == "__main__":
    main()
