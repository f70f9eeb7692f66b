"""Smoothing kernels: poly6 (density), spiky gradient (pressure), viscosity
Laplacian (SURVEY.md C4, §2.1; Müller et al. 2003).

All functions are branchless, pure, and take r² or r so they vectorize over
arbitrary batch shapes on the VPU.  Compact support is enforced with
`maximum(·, 0)` rather than `where`-on-distance so the same expression is
valid inside Pallas kernels and XLA fusions.

Normalization conventions (SURVEY.md §2.1): many tutorial-family 2D codes
reuse the 3D constants verbatim.  Since the reference's exact choice is
unverifiable (empty mount), the convention is a knob:

  - "proper":    dimension-correct constants (2D: 4/(πh⁸) etc.)
  - "legacy3d":  3D constants used regardless of dim (tutorial-family habit)

For dim == 3 the two conventions coincide.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kernel_constants(dim: int, h: float, norm: str) -> tuple[float, float, float]:
    """(poly6, spiky-gradient magnitude, viscosity-Laplacian) normalizations.

    W_poly6(r)   = C_p · (h²−r²)³          0 ≤ r ≤ h
    ∇W_spiky(r)  = −C_s · (h−r)² · r̂
    ∇²W_visc(r)  =  C_v · (h−r)
    """
    if norm not in ("proper", "legacy3d"):
        raise ValueError(f"kernel_norm must be 'proper' or 'legacy3d', got {norm!r}")
    use3d = dim == 3 or norm == "legacy3d"
    if use3d:
        c_poly6 = 315.0 / (64.0 * math.pi * h**9)
        c_spiky = 45.0 / (math.pi * h**6)
        c_visc = 45.0 / (math.pi * h**6)
    else:
        if dim != 2:
            raise ValueError(f"dim must be 2 or 3, got {dim}")
        c_poly6 = 4.0 / (math.pi * h**8)
        c_spiky = 30.0 / (math.pi * h**5)
        c_visc = 40.0 / (math.pi * h**5)
    return c_poly6, c_spiky, c_visc


def poly6(r2, h: float, c_poly6: float):
    """Density kernel W_poly6(r², h). Zero for r² ≥ h² (branchless)."""
    q = jnp.maximum(h * h - r2, 0.0)
    return c_poly6 * q * q * q


def spiky_grad_scale(r, h: float, c_spiky: float, eps: float = 1e-12):
    """Scalar s(r) such that ∇W_spiky(d) = −s(r) · d for d = x_i − x_j.

    s(r) = C_s (h−r)² / r, zero outside support, guarded at r → 0 (the j = i
    self-pair and coincident particles contribute no pressure force).
    """
    t = jnp.maximum(h - r, 0.0)
    return c_spiky * t * t / jnp.maximum(r, eps) * (r > eps)


def pair_scales(r2, h: float, c_spiky: float, c_visc: float,
                eps: float = 1e-24):
    """(spiky-gradient scale s(r), viscosity Laplacian) from r² via ONE
    rsqrt — the hot-path form shared by every neighbor path.

    sqrt + divide are multi-cycle VPU ops; rsqrt replaces both:
    r = r²·rsqrt(r²) and 1/r = rsqrt(r²).  The (r² > eps) factor zeroes the
    j = i self-pair (s(0) must be exactly 0, not c_s·h²·rsqrt(eps)).
    Changing this form changes fp rounding vs the old sqrt/divide version,
    so ALL paths (naive/grid/pallas) use this one definition — their
    bitwise path-equality tests stay meaningful.
    """
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, eps))
    t = jnp.maximum(h - r2 * inv_r, 0.0)
    s = c_spiky * t * t * inv_r * (r2 > eps)
    return s, c_visc * t


def visc_lap(r, h: float, c_visc: float):
    """Viscosity Laplacian ∇²W_visc(r, h). Zero outside support."""
    return c_visc * jnp.maximum(h - r, 0.0)


# --- reference forms used only by tests (normalization checks) -------------


def spiky_w(r, h: float, dim: int, norm: str):
    """W_spiky itself (tests check ∇W matches finite differences of this)."""
    use3d = dim == 3 or norm == "legacy3d"
    c = 15.0 / (math.pi * h**6) if use3d else 10.0 / (math.pi * h**5)
    t = jnp.maximum(h - r, 0.0)
    return c * t * t * t
