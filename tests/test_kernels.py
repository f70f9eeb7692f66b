"""Unit tests for smoothing kernels (SURVEY.md §4.1)."""

import numpy as np
import pytest

from sph_tpu.kernels import (
    kernel_constants,
    poly6,
    spiky_grad_scale,
    spiky_w,
    visc_lap,
)

H = 1.3


@pytest.mark.parametrize("dim,norm", [(2, "proper"), (3, "proper"), (2, "legacy3d")])
def test_compact_support(dim, norm):
    cp, cs, cv = kernel_constants(dim, H, norm)
    # strictly outside support (at r == h exactly, fp32 rounding of h²−r²
    # can leave a ~1e-21 residue; physically irrelevant)
    r = np.linspace(H * (1 + 1e-6), 3 * H, 50, dtype=np.float32)
    assert np.all(np.asarray(poly6(r * r, H, cp)) == 0)
    assert np.all(np.asarray(spiky_grad_scale(r, H, cs)) == 0)
    assert np.all(np.asarray(visc_lap(r, H, cv)) == 0)


@pytest.mark.parametrize("dim", [2, 3])
def test_poly6_normalization(dim):
    """∫ W dV = 1 for the dimension-proper convention (radial quadrature)."""
    cp, _, _ = kernel_constants(dim, H, "proper")
    r = np.linspace(0, H, 200001, dtype=np.float64)
    w = np.asarray(poly6((r * r).astype(np.float32), H, cp), np.float64)
    shell = 2 * np.pi * r if dim == 2 else 4 * np.pi * r * r
    integral = np.trapezoid(w * shell, r)
    assert abs(integral - 1.0) < 2e-3


@pytest.mark.parametrize("dim", [2, 3])
def test_spiky_normalization(dim):
    _cs = None
    r = np.linspace(0, H, 200001, dtype=np.float64)
    w = np.asarray(spiky_w(r.astype(np.float32), H, dim, "proper"), np.float64)
    shell = 2 * np.pi * r if dim == 2 else 4 * np.pi * r * r
    integral = np.trapezoid(w * shell, r)
    assert abs(integral - 1.0) < 2e-3


@pytest.mark.parametrize("dim,norm", [(2, "proper"), (3, "proper")])
def test_spiky_grad_matches_fd(dim, norm):
    """∇W_spiky magnitude matches d/dr of W_spiky (away from endpoints)."""
    _, cs, _ = kernel_constants(dim, H, norm)
    r = np.linspace(0.05 * H, 0.95 * H, 101, dtype=np.float64)
    eps = 1e-5
    w_p = np.asarray(spiky_w((r + eps).astype(np.float32), H, dim, norm), np.float64)
    w_m = np.asarray(spiky_w((r - eps).astype(np.float32), H, dim, norm), np.float64)
    dw = (w_p - w_m) / (2 * eps)
    # ∇W = -cs (h-r)^2 r̂ → radial derivative is -cs (h-r)^2
    expected = -np.asarray(spiky_grad_scale(r.astype(np.float32), H, cs)) * r
    assert np.allclose(dw, expected, rtol=2e-2, atol=1e-2)


def test_gradient_antisymmetry():
    """∇W(−d) = −∇W(d): grad = −s(r)·d is odd in d by construction."""
    _, cs, _ = kernel_constants(2, H, "proper")
    d = np.array([[0.3, 0.4]], np.float32)
    r = np.linalg.norm(d, axis=-1)
    s = np.asarray(spiky_grad_scale(r, H, cs))
    g_pos = -s[:, None] * d
    g_neg = -s[:, None] * (-d)
    assert np.allclose(g_pos, -g_neg)


def test_legacy3d_matches_3d_constants():
    assert kernel_constants(2, H, "legacy3d") == kernel_constants(3, H, "proper")


def test_grad_scale_zero_at_origin():
    _, cs, _ = kernel_constants(3, H, "proper")
    assert float(spiky_grad_scale(np.float32(0.0), H, cs)) == 0.0


def test_pair_scales_matches_reference_forms():
    """The rsqrt-based hot-path form (kernels.pair_scales) agrees with the
    definitional sqrt/divide forms to fp32 rounding, including s(0) = 0."""
    from sph_tpu.kernels import pair_scales

    cs, cv = 3.0, 5.0
    H = 16.0
    r = np.linspace(0.0, 2 * H, 201).astype(np.float32)
    r2 = (r * r).astype(np.float32)
    s, lap = pair_scales(r2, H, cs, cv)
    s_ref = np.asarray(spiky_grad_scale(r, H, cs))
    lap_ref = np.asarray(visc_lap(r, H, cv))
    assert float(np.asarray(pair_scales(np.float32(0.0), H, cs, cv)[0])) == 0.0
    assert np.allclose(np.asarray(s), s_ref, rtol=1e-5, atol=1e-6)
    assert np.allclose(np.asarray(lap), lap_ref, rtol=1e-5, atol=1e-6)
