"""Probe 2: end-to-end inner-block strategies for the pair kernels.

Density block [B=64 i-rows x CAND=864 candidates]:
  A) VPU direct r2 (3x sub/mul/add) + q^3 row-sum            (current)
  B) MXU r2 (K=3 dot, DEFAULT precision) + q^3 row-sum
  C) MXU r2 (K=3 dot, HIGHEST) + q^3 row-sum

Force tail given r2/t/coef inputs:
  D) VPU per-component coef_p*dx + coef_v*dv + 3 row-sums    (current)
  E) MXU NT reduce [B,CAND]x[4,CAND], DEFAULT
  F) MXU NT reduce, HIGHEST

Also prints max |r2_mxu - r2_vpu| for DEFAULT and HIGHEST dot precision
(centered-coordinate scale ~100) to pick MXU_PRECISION.
"""

import functools
import time

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, CAND, D = 64, 864, 3
REPS = 5000


def timeit(kern, shapes, n_out_cols=128):
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, n_out_cols), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(shapes),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )
    k = jax.random.key(0)
    args = [
        jax.random.uniform(jax.random.fold_in(k, i), s, jnp.float32, -100, 100)
        for i, s in enumerate(shapes)
    ]
    jf = jax.jit(f)
    jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(jf(*args))
    return (time.perf_counter() - t0) * 1e6 / REPS


def density_vpu(xi_ref, cj_ref, out_ref):
    xi, cj = xi_ref[...], cj_ref[...]

    def body(i, acc):
        r2 = None
        for c in range(D):
            dc = xi[:, c:c+1] - (cj[c:c+1, :] + acc[0, 0] * 0)
            r2 = dc * dc if r2 is None else r2 + dc * dc
        q = jnp.maximum(2500.0 - r2, 0.0)
        s = jnp.sum(q * q * q, axis=1, keepdims=True)
        return acc + jnp.pad(s, ((0, 0), (0, 127)))

    out_ref[...] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((B, 128), jnp.float32))


def density_mxu(prec):
    def kern(xi_ref, cj_ref, out_ref):
        xi, cj = xi_ref[...], cj_ref[...]
        bi = jnp.sum(xi * xi, axis=1, keepdims=True)
        bj = jnp.sum(cj * cj, axis=0, keepdims=True)

        def body(i, acc):
            dot = jax.lax.dot_general(
                xi + acc[0, 0] * 0, cj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            r2 = jnp.maximum((bi - (dot + dot)) + bj, 0.0)
            q = jnp.maximum(2500.0 - r2, 0.0)
            s = jnp.sum(q * q * q, axis=1, keepdims=True)
            return acc + jnp.pad(s, ((0, 0), (0, 127)))

        out_ref[...] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((B, 128), jnp.float32))
    return kern


def force_vpu(coefp_ref, coefv_ref, cj_ref, vj_ref, out_ref):
    coefp, coefv = coefp_ref[...], coefv_ref[...]
    cj, vj = cj_ref[...], vj_ref[...]

    def body(i, acc):
        cols = []
        for c in range(D):
            dxc = 1.0 - cj[c:c+1, :]      # stand-in for xi_c - xj_c
            dvc = vj[c:c+1, :] - 2.0
            fc = jnp.sum((coefp + acc[0, 0] * 0) * dxc + coefv * dvc,
                         axis=1, keepdims=True)
            cols.append(fc)
        f = jnp.concatenate(cols, axis=1)  # [B, 3]
        return acc + jnp.pad(f, ((0, 0), (0, 125)))

    out_ref[...] = jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((B, 128), jnp.float32))


def force_mxu(prec):
    def kern(coefp_ref, coefv_ref, cj_ref, vj_ref, out_ref):
        coefp, coefv = coefp_ref[...], coefv_ref[...]
        cj, vj = cj_ref[...], vj_ref[...]
        ones = jnp.ones((1, CAND), jnp.float32)
        ap = jnp.concatenate([cj, ones], axis=0)
        av = jnp.concatenate([vj, ones], axis=0)

        def body(i, acc):
            mp = jax.lax.dot_general(
                coefp + acc[0, 0] * 0, ap, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            mv = jax.lax.dot_general(
                coefv, av, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            f = mp[:, 3:4] * 1.0 - mp[:, 0:3] + mv[:, 0:3] - mv[:, 3:4] * 2.0
            return acc + jnp.pad(f, ((0, 0), (0, 125)))

        out_ref[...] = jax.lax.fori_loop(
            0, REPS, body, jnp.zeros((B, 128), jnp.float32))
    return kern


def accuracy():
    """r2 via expansion at DEFAULT/HIGHEST dot vs exact (float64 on CPU)."""
    rng = np.random.default_rng(7)
    xi = rng.uniform(-100, 100, (B, D)).astype(np.float32)
    cj = rng.uniform(-100, 100, (D, CAND)).astype(np.float32)
    exact = ((xi.astype(np.float64)[:, None, :]
              - cj.T.astype(np.float64)[None, :, :]) ** 2).sum(-1)

    for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        @jax.jit
        def r2f(xi, cj, prec=prec):
            bi = jnp.sum(xi * xi, axis=1, keepdims=True)
            bj = jnp.sum(cj * cj, axis=0, keepdims=True)
            dot = jax.lax.dot_general(
                xi, cj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            return (bi - (dot + dot)) + bj

        err = np.max(np.abs(np.asarray(r2f(xi, cj)) - exact))
        print(f"r2 abs err  {name:8s}: {err:.4f}  (r2 scale ~{exact.max():.0f})")


if __name__ == "__main__":
    accuracy()
    P = jax.lax.Precision
    print(f"A density VPU        : {timeit(density_vpu, [(B, D), (D, CAND)]):7.3f} us")
    print(f"B density MXU DEFAULT: {timeit(density_mxu(P.DEFAULT), [(B, D), (D, CAND)]):7.3f} us")
    print(f"C density MXU HIGHEST: {timeit(density_mxu(P.HIGHEST), [(B, D), (D, CAND)]):7.3f} us")
    fshapes = [(B, CAND), (B, CAND), (D, CAND), (D, CAND)]
    print(f"D force   VPU        : {timeit(force_vpu, fshapes):7.3f} us")
    print(f"E force   MXU DEFAULT: {timeit(force_mxu(P.DEFAULT), fshapes):7.3f} us")
    print(f"F force   MXU HIGHEST: {timeit(force_mxu(P.HIGHEST), fshapes):7.3f} us")
