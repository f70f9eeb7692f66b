"""Probe: Mosaic support + cost of the MXU pair-engine building blocks.

Shapes mirror the planned kernels at cap=16/xb=4 (3D):
  r2 cross-term:  [B=64, 3] x [3, cand=864]        (K=3 matmul)
  force reduce:   [B=64, cand=864] x [4, cand=864] (NT dot_general)

Run on the real TPU: python bench/probe_mxu.py
"""

import functools
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, CAND, D = 64, 864, 3
PREC = jax.lax.Precision.HIGHEST


def kernel(xi_ref, cj_ref, coef_in_ref, a_ref, out_ref, *, reps):
    acc = jnp.zeros((B, 4), jnp.float32)
    xi = xi_ref[...]
    cj = cj_ref[...]
    a = a_ref[...]

    def body(i, acc):
        # K=3 matmul: r2 cross term
        dot = jax.lax.dot_general(
            xi, cj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        )  # [B, CAND]
        coef = coef_in_ref[...] + dot  # data dep so nothing hoists
        # NT dot_general: force reduction
        m = jax.lax.dot_general(
            coef, a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC,
        )  # [B, 4]
        return acc + m + jnp.float32(i) * 0  # loop-carried

    acc = jax.lax.fori_loop(0, reps, body, acc)
    out_ref[...] = acc


def run(reps):
    f = pl.pallas_call(
        functools.partial(kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct((B, 4), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )
    k = jax.random.key(0)
    xi = jax.random.normal(k, (B, D), jnp.float32)
    cj = jax.random.normal(k, (D, CAND), jnp.float32)
    coef = jax.random.normal(k, (B, CAND), jnp.float32)
    a = jax.random.normal(k, (4, CAND), jnp.float32)
    return jax.jit(f)(xi, cj, coef, a)


if __name__ == "__main__":
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(1))
    print(f"compile+run(1): {time.perf_counter() - t0:.1f}s; out[0,:2]={out[0,:2]}")
    for reps in (1000, 10000):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(reps))
        dt = time.perf_counter() - t0
        print(f"reps={reps}: {dt*1e6/reps:.2f} us per (K3 matmul + NT reduce) pair")
