"""Golden oracle: independent pure-NumPy float32 SPH, naive O(n²).

Written once from the SURVEY.md §2.1 spec and FROZEN (SURVEY.md §4.3) — this
file must never import sph_tpu and must never be "fixed" to match the
production code; discrepancies are production bugs until proven otherwise.

Deliberately different code style from sph_tpu (explicit per-particle loops
over a neighbor mask) so shared bugs are unlikely.
"""

from __future__ import annotations

import math

import numpy as np

F = np.float32


def kernel_consts(dim, h, norm):
    if dim == 3 or norm == "legacy3d":
        return (
            F(315.0 / (64.0 * math.pi * h**9)),
            F(45.0 / (math.pi * h**6)),
            F(45.0 / (math.pi * h**6)),
        )
    return (
        F(4.0 / (math.pi * h**8)),
        F(30.0 / (math.pi * h**5)),
        F(40.0 / (math.pi * h**5)),
    )


def density(x, active, p):
    """rho_i = sum_j m W_poly6(r_ij), j active, self included."""
    cp, _, _ = kernel_consts(p["dim"], p["h"], p["kernel_norm"])
    h2 = F(p["h"]) ** 2
    n = len(x)
    rho = np.zeros(n, F)
    for i in range(n):
        if not active[i]:
            rho[i] = F(p["rest_density"])
            continue
        d = x[i][None, :] - x
        r2 = np.sum(d * d, axis=-1, dtype=F)
        q = np.maximum(h2 - r2, F(0))
        w = cp * q * q * q
        rho[i] = np.sum(F(p["mass"]) * w * active.astype(F), dtype=F)
    return rho


def eos(rho, p):
    if p["eos"] == "ideal":
        out = F(p["stiffness"]) * (rho - F(p["rest_density"]))
    else:
        b = F(p["sound_speed"] ** 2 * p["rest_density"] / p["tait_gamma"])
        out = b * ((rho / F(p["rest_density"])) ** F(p["tait_gamma"]) - F(1))
    if p.get("pressure_floor", False):
        out = np.maximum(out, F(0))
    return out.astype(F)


def forces(x, v, rho, pr, active, p):
    """Pressure + viscosity force densities (force/volume), naive pairs."""
    _, cs, cv = kernel_consts(p["dim"], p["h"], p["kernel_norm"])
    h = F(p["h"])
    m = F(p["mass"])
    mu = F(p["viscosity"])
    n = len(x)
    f = np.zeros_like(x)
    for i in range(n):
        if not active[i]:
            continue
        d = x[i][None, :] - x            # x_i - x_j
        r2 = np.sum(d * d, axis=-1, dtype=F)
        r = np.sqrt(r2, dtype=F)
        inside = (r < h) & active & (np.arange(n) != i)
        safe_r = np.where(r > F(1e-12), r, F(1))
        t = np.maximum(h - r, F(0))
        # pressure: -m (p_i+p_j)/(2 rho_j) * (-cs t^2 rhat) = +m(...)cs t^2 d/r
        coef_p = m * (pr[i] + pr) / (F(2) * rho) * cs * t * t / safe_r
        coef_p = np.where(inside & (r > F(1e-12)), coef_p, F(0))
        f[i] += np.sum(coef_p[:, None] * d, axis=0, dtype=F)
        # viscosity: mu m (v_j - v_i)/rho_j * cv (h - r)
        coef_v = mu * m / rho * cv * t
        coef_v = np.where(inside, coef_v, F(0))
        f[i] += np.sum(coef_v[:, None] * (v - v[i][None, :]), axis=0, dtype=F)
    return f.astype(F)


def wall_penalty(x, v, lo, hi, p):
    lo = np.asarray(lo, F) + F(p["wall_eps"])
    hi = np.asarray(hi, F) - F(p["wall_eps"])
    k, c = F(p["wall_stiffness"]), F(p["wall_damping"])
    d_lo = np.maximum(lo[None, :] - x, F(0))
    d_hi = np.maximum(x - hi[None, :], F(0))
    f = (k * d_lo - c * v) * (d_lo > 0) - (k * d_hi + c * v) * (d_hi > 0)
    return f.astype(F)


def step(x, v, acc, active, kind, lo, hi, p):
    """One §2.1 step; returns (x, v, acc, rho, pr). Mirrors the spec, not
    the production code."""
    x, v = x.copy(), v.copy()
    movable = active & (kind == 0)
    mv = movable[:, None]
    dt = F(p["dt"])
    g = np.asarray(p["gravity"], F)

    def eval_f(x_, v_):
        rho = density(x_, active, p)
        pr = eos(rho, p)
        f = forces(x_, v_, rho, pr, active, p)
        f = f + rho[:, None] * g[None, :]
        if p["boundary_mode"] == "penalty":
            f = f + wall_penalty(x_, v_, lo, hi, p)
        return rho, pr, f

    if p["integrator"] == "leapfrog":
        v = v + F(0.5) * dt * acc * mv
        x = x + dt * v * mv
        rho, pr, f = eval_f(x, v)
        a = f / np.maximum(rho, F(1e-12))[:, None]
        v = v + F(0.5) * dt * a * mv
        acc = np.where(mv, a, F(0)).astype(F)
    else:
        rho, pr, f = eval_f(x, v)
        a = f / np.maximum(rho, F(1e-12))[:, None]
        v = v + dt * a * mv
        x = x + dt * v * mv
        acc = np.where(mv, a, F(0)).astype(F)

    if p["boundary_mode"] == "clamp":
        lo_i = np.asarray(lo, F) + F(p["wall_eps"])
        hi_i = np.asarray(hi, F) - F(p["wall_eps"])
        hit = (x < lo_i[None, :]) | (x > hi_i[None, :])
        vc = np.where(hit, v * F(p["boundary_damping"]), v)
        xc = np.clip(x, lo_i[None, :], hi_i[None, :])
        v = np.where(mv, vc, v).astype(F)
        x = np.where(mv, xc, x).astype(F)
    return x, v, acc, rho, pr
