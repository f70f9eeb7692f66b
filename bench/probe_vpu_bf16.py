"""Probe: does the VPU run bf16 elementwise math at 2x fp32 throughput?

Decides whether a precision="bf16" kernel mode (ROADMAP r2 item 1, arXiv
2401.08586 pattern) can pay: if bf16 vector ops lower to packed (16, 128)
vregs with double the per-op element count, the SPH pair math gets ~2x;
if Mosaic widens bf16 to fp32 for arithmetic, only memory traffic shrinks
and the mode is not worth its precision cost.

Times a chain of the actual SPH inner-loop op mix (sub, mul, add, max) on
resident VMEM blocks, loop-carried so XLA/Mosaic cannot hoist it.

Usage: python bench/probe_vpu_bf16.py [iters]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

from sph_tpu.platform import ensure_backend

ensure_backend()

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 512, 1024          # block: 512x1024 elements
CHAIN = 64                      # dependent op-mix rounds per kernel call


def make_kernel(dtype):
    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        acc = x
        for _ in range(CHAIN):
            d = acc - y          # the SPH pair mix: sub, mul, add, max
            acc = jnp.maximum(d * d + y, acc * jnp.array(0.5, dtype))
        o_ref[:] = acc

    @jax.jit
    def run(x, y):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LANE), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, y)

    return run


def bench(dtype, iters):
    run = make_kernel(dtype)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (SUB, LANE), jnp.float32).astype(dtype)
    y = jax.random.normal(key, (SUB, LANE), jnp.float32).astype(dtype) + 2.0

    @jax.jit
    def loop(x, y):
        def body(_, acc):
            return run(acc, y)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32))

    float(loop(x, y))  # compile + warm
    t0 = time.perf_counter()
    float(loop(x, y))
    dt = time.perf_counter() - t0
    ops = iters * CHAIN * 4 * SUB * LANE  # 4 vector ops per chain round
    print(
        f"{jnp.dtype(dtype).name:9s} {dt*1e3/iters:8.3f} ms/call "
        f"{ops/dt/1e12:6.2f} Top/s"
    )
    return ops / dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    f32 = bench(jnp.float32, iters)
    bf16 = bench(jnp.bfloat16, iters)
    print(f"bf16 / fp32 throughput ratio: {bf16 / f32:.2f}x")


import sys

if __name__ == "__main__":
    main()
