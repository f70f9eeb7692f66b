"""SPH physics: density, EOS, forces, integrators, boundaries.

Covers SURVEY.md components C5–C8 and C12, implementing the §2.1 math.  The
pair-level terms (`density_contrib`, `force_contrib`) are factored out so the
naive O(N²) path, the cell-grid path, and the Pallas fused kernel all share a
single definition of the physics — the neighbor machinery only decides which
(i, j) candidates are evaluated and in what order.

Sign/unit conventions (§2.1): forces are *force densities* (acceleration is
f/ρᵢ); gravity enters as ρᵢ·g; pairwise pressure force is antisymmetric by
construction, which makes total-momentum conservation a testable invariant.
"""

from __future__ import annotations

import jax.numpy as jnp

from sph_tpu.kernels import kernel_constants, pair_scales, poly6
from sph_tpu.params import SimParams

# ---------------------------------------------------------------------------
# Pair-level terms (shared by every neighbor path)
# ---------------------------------------------------------------------------


def density_contrib(r2, mask, params: SimParams):
    """Per-pair density contribution m·W_poly6; includes the j = i self-term
    (r = 0 is inside support).  `mask` zeroes invalid candidates."""
    c_p, _, _ = kernel_constants(params.dim, params.h, params.kernel_norm)
    return params.mass * poly6(r2, params.h, c_p) * mask


def force_contrib(dx, r2, v_i, v_j, p_i, p_j, rho_j, mask, params: SimParams):
    """Per-pair force density on i from j (pressure + viscosity), §2.1 step 4.

    f_press = −m (pᵢ+pⱼ)/(2ρⱼ) ∇W_spiky   with ∇W_spiky(d) = −s(r)·d
    f_visc  =  μ m (vⱼ−vᵢ)/ρⱼ ∇²W_visc

    Both vanish naturally at j = i (s(0) = 0, vⱼ−vᵢ = 0), so no explicit
    self-exclusion is needed.  dx = xᵢ − xⱼ, shape [..., D]; scalars [...].
    """
    c_p, c_s, c_v = kernel_constants(params.dim, params.h, params.kernel_norm)
    inv_rho_j = mask / jnp.maximum(rho_j, 1e-12)
    s, lap = pair_scales(r2, params.h, c_s, c_v)
    f_press = (params.mass * 0.5) * ((p_i + p_j) * inv_rho_j * s)[..., None] * dx
    f_visc = (params.viscosity * params.mass) * (
        inv_rho_j * lap
    )[..., None] * (v_j - v_i)
    return f_press + f_visc


def eos_pressure(rho, params: SimParams):
    """EOS pressure update (C6): ideal-gas p = k(ρ−ρ₀) or Tait/WCSPH
    p = (c₀²ρ₀/γ)((ρ/ρ₀)^γ − 1) with γ = 7 (SURVEY.md §2.1 step 3)."""
    if params.eos == "ideal":
        p = params.stiffness * (rho - params.rest_density)
    elif params.eos == "tait":
        b = params.sound_speed**2 * params.rest_density / params.tait_gamma
        p = b * ((rho / params.rest_density) ** params.tait_gamma - 1.0)
    else:
        raise ValueError(f"unknown eos {params.eos!r}")
    if params.pressure_floor:
        p = jnp.maximum(p, 0.0)
    return p


# ---------------------------------------------------------------------------
# Naive O(N²) all-pairs path (C9) — the forever-kept correctness oracle
# ---------------------------------------------------------------------------


def density_naive(x, active, params: SimParams):
    """ρᵢ = Σⱼ m W(rᵢⱼ) over active j; inactive i get ρ = ρ₀ (placeholder)."""
    dx = x[:, None, :] - x[None, :, :]
    r2 = jnp.sum(dx * dx, axis=-1)
    mask = active[None, :].astype(x.dtype)
    rho = jnp.sum(density_contrib(r2, mask, params), axis=1)
    return jnp.where(active, rho, params.rest_density)


def forces_naive(x, v, rho, p, active, params: SimParams):
    """Pairwise pressure+viscosity force densities, all-pairs. [N, D]."""
    dx = x[:, None, :] - x[None, :, :]
    r2 = jnp.sum(dx * dx, axis=-1)
    mask = active[None, :].astype(x.dtype)
    f = force_contrib(
        dx,
        r2,
        v[:, None, :],
        v[None, :, :],
        p[:, None],
        p[None, :],
        rho[None, :],
        mask,
        params,
    )
    return jnp.sum(f, axis=1) * active[:, None].astype(x.dtype)


# ---------------------------------------------------------------------------
# Body forces and boundaries (C12)
# ---------------------------------------------------------------------------


def gravity_force(rho, params: SimParams):
    """f_grav = ρ·g (force-density convention)."""
    g = jnp.asarray(params.gravity, dtype=rho.dtype)
    return rho[:, None] * g[None, :]


def force_field_force(x, step, fields):
    """External scheduled force probes (SURVEY.md L5 drag interaction):
    radial force density s·(1 − r/R) toward/away from each field center,
    zero outside R or outside the field's step window."""
    f = jnp.zeros_like(x)
    for ff in fields:
        c = jnp.asarray(ff.pos, x.dtype)
        dx = c[None, :] - x
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        fall = jnp.maximum(1.0 - r / ff.radius, 0.0)
        live = jnp.logical_and(
            step >= ff.start_step, step < ff.stop_step
        ).astype(x.dtype)
        dirn = dx / jnp.maximum(r, 1e-6)[:, None]
        f = f + (ff.strength * live) * fall[:, None] * dirn
    return f


def wall_penalty_force(x, v, lo, hi, params: SimParams):
    """Penalty spring-damper per wall (boundary_mode='penalty', §2.1 step 6):
    penetration d > 0 past the inset wall ⇒ f += (k·d − c·v_n)·n̂."""
    lo = jnp.asarray(lo, x.dtype) + params.wall_eps
    hi = jnp.asarray(hi, x.dtype) - params.wall_eps
    k, c = params.wall_stiffness, params.wall_damping
    d_lo = jnp.maximum(lo[None, :] - x, 0.0)   # penetration past min walls
    d_hi = jnp.maximum(x - hi[None, :], 0.0)   # penetration past max walls
    # min wall: n̂ = +e_a, v_n = v·n̂ = v;  max wall: n̂ = −e_a, v_n = −v
    f = (k * d_lo - c * v) * (d_lo > 0) - (k * d_hi - c * (-v)) * (d_hi > 0)
    return f


def clamp_boundary(x, v, lo, hi, params: SimParams):
    """Tutorial-family wall handling (boundary_mode='clamp'): clamp position
    to the inset wall and scale the normal velocity by `boundary_damping`
    (default −0.5) — SURVEY.md §2.1 step 6 alternative."""
    lo = jnp.asarray(lo, x.dtype) + params.wall_eps
    hi = jnp.asarray(hi, x.dtype) - params.wall_eps
    hit = (x < lo[None, :]) | (x > hi[None, :])
    v = jnp.where(hit, v * params.boundary_damping, v)
    x = jnp.clip(x, lo[None, :], hi[None, :])
    return x, v
