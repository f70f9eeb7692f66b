"""Round-4 probe: the MXU adjacency-matmul question, measured.

VERDICT r3 weak 1: ROADMAP name-dropped the MXU as a dead end with no
ledger entry.  The implied design: cast the per-pair reductions as
matmuls — density rho_i = sum_j W_ij m_j is [rows, cand] @ [cand, 1],
force f_i = sum_j c_ij (x_i - x_j) is [rows, cand] @ [cand, dim] — and
let the 128x128 systolic array do the accumulation.

The structural problem this probe quantifies:

1. The MXU can only take the REDUCTION.  Forming W_ij / c_ij is
   nonlinear per-pair math (poly6/spiky powers, rsqrt of r²) that must
   run on the VPU regardless — and the measured kernel budget is
   VPU-ISSUE-bound forming exactly those values (~63M vreg-ops at 1M,
   ROADMAP roofline).  The reduction the MXU would absorb is the final
   add-chain only: at cap-aligned blocks that's 1 add per pair-lane vs
   the ~25 multiply/compare/select ops that formed the operand — < 5%
   of kernel issues.
2. The matmul's N side is the output feature count: 1 (rho) .. 8
   (rho,p + 3 force + visc) — an N=8 tile on a 128-wide MXU runs at
   <= 8/128 = 6% utilization.  K = candidate width (864) is fine; N is
   structurally tiny because SPH emits per-PARTICLE scalars.
3. r²_ij itself has a bilinear piece (x_i · x_j, K = dim <= 3): a K=3
   matmul is 3/128 of an MXU pass — strictly worse than the VPU's
   3 fused multiply-adds.

This probe measures the best case anyway: a resident [64, 864] fp32
block contracted against [864, 8] per compacted row, timed across the
1M-scale block count, assuming W arrives FREE.  If even that free-W
matmul time is not decisively below the ~68 ms measured kernel time,
the MXU path is closed with numbers.

Usage: python bench/probe_r4_mxu.py
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


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args, out)  # loop-carried dependence (CLAUDE.md: XLA
        # hoists loop-invariant work; chain iterations through `out`)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    # 1M-preset kernel geometry: c_rows=4096 compacted rows, 64-lane row
    # programs x 8 i-groups = [64, W] blocks, W = R*(xb+2)*cap = 864
    # candidate lanes, TWO kernel passes (density + force) -> the matmul
    # equivalent is rows x [64, 864] @ [864, 8] per pass.
    rows, g_h, w, n_feat = 4096, 64, 864, 8
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (rows, g_h, w), jnp.float32)
    b = jax.random.normal(key, (rows, w, n_feat), jnp.float32)

    @jax.jit
    def contract(a_, b_, prev=None):
        out = jnp.einsum("rgw,rwf->rgf", a_, b_,
                         preferred_element_type=jnp.float32)
        if prev is not None:  # loop-carried dependence
            out = out + 1e-30 * prev
        return out

    t = timeit(lambda a_, prev=None: contract(a_, b, prev), a)
    flops = 2 * rows * g_h * w * n_feat
    print(f"free-W MXU contraction [4096x64x864]@[864x8] fp32: "
          f"{t * 1e3:7.2f} ms/pass  ({flops / t / 1e12:.2f} TFLOP/s)",
          flush=True)
    print(f"  x2 passes = {2 * t * 1e3:.2f} ms vs ~68 ms measured VPU "
          f"kernel time at 1M (which INCLUDES forming W)", flush=True)

    # the same reduction as the VPU add-chain the kernels actually use
    @jax.jit
    def vpu_reduce(a_, prev=None):
        out = jnp.sum(a_, axis=2)
        if prev is not None:
            out = out + 1e-30 * prev
        return out

    t2 = timeit(vpu_reduce, a)
    print(f"VPU lane-reduce of the same [4096x64x864] operand: "
          f"{t2 * 1e3:7.2f} ms", flush=True)

    # N=8 vs N=128 utilization check: same K, wide N.  At rows=4096 the
    # [rows, 864, 128] operand is 1.8 GB and the einsum thrashed (>20 min,
    # killed) — 512 rows (226 MB) gives the same per-tile utilization
    # datapoint.
    rows_w = 512
    b_wide = jax.random.normal(key, (rows_w, w, 128), jnp.float32)
    a_w = a[:rows_w]

    @jax.jit
    def contract_wide(a_, prev=None):
        out = jnp.einsum("rgw,rwf->rgf", a_, b_wide,
                         preferred_element_type=jnp.float32)
        if prev is not None:
            out = out + 1e-30 * prev
        return out

    t3 = timeit(contract_wide, a_w)
    flops3 = 2 * rows_w * g_h * w * 128
    print(f"same contraction at N=128 (rows={rows_w}): {t3 * 1e3:7.2f} "
          f"ms/pass ({flops3 / t3 / 1e12:.2f} TFLOP/s) — the utilization "
          f"the MXU needs and SPH's N<=8 outputs cannot provide",
          flush=True)


if __name__ == "__main__":
    main()
