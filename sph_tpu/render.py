"""Device-side point-splat renderer (SURVEY.md C14).

The reference renders by uploading a vertex buffer and drawing GL_POINTS
(SURVEY.md §3.3) — its single CPU→GPU boundary.  The TPU-native restatement
inverts that: the frame is *rasterized on device* (scatter-add of particle
splats into an [H, W] buffer, fully inside jit) and only the finished image
crosses to the host, asynchronously, once per dispatch (SURVEY.md §3.5).

Headless output: a dependency-free PNG writer (stdlib zlib) and a tiny
colormap, so `sph-tpu render` works in this environment with zero GL.
"""

from __future__ import annotations

import struct
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu.params import Scene
from sph_tpu.state import State


def render_splat(
    state: State,
    scene: Scene,
    width: int = 400,
    height: int = 300,
    mode: str = "density",
    axes: tuple[int, int] = (0, 1),
    radius: int = 1,
):
    """Rasterize particles into an [H, W] scalar field, on device.

    mode: "density" (splat count), "rho" (mean density), "speed" (mean |v|),
    "depth" (3D only: depth-shaded splat — near particles brighter).
    axes: which position components map to (x, y) of the image (3D scenes
    render an orthographic projection along the remaining axis).
    radius: splat radius in pixels — the reference draws GL points *with
    area* (point sprites, SURVEY.md §3.3), so each particle covers a
    (2r+1)² stencil with a smooth radial falloff; radius=0 is the r1
    single-pixel splat (1M-particle frames at small sizes saturate, sparse
    scenes look dusty — VERDICT r1 missing #3).
    """
    ax, ay = axes
    lo = jnp.asarray(scene.lo, jnp.float32)
    hi = jnp.asarray(scene.hi, jnp.float32)
    act = state.active
    u = (state.x[:, ax] - lo[ax]) / (hi[ax] - lo[ax]) * (width - 1)
    v = (state.x[:, ay] - lo[ay]) / (hi[ay] - lo[ay]) * (height - 1)
    px = jnp.round(u).astype(jnp.int32)
    # image row 0 = top; simulation y up
    py = height - 1 - jnp.round(v).astype(jnp.int32)
    # out-of-frame or inactive → far index, dropped by the scatter
    ok = act & (px >= -radius) & (px < width + radius)
    ok = ok & (py >= -radius) & (py < height + radius)
    px = jnp.where(ok, px, -(1 << 20))
    img = jnp.zeros((height, width), jnp.float32)

    def stencil_add(img, val):
        # unrolled (2r+1)² stencil, cosine-bell falloff (point sprite)
        r2max = (radius + 0.5) ** 2
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                wgt = max(0.0, 1.0 - (dx * dx + dy * dy) / r2max)
                if wgt <= 0.0:
                    continue
                iy, ix = py + dy, px + dx
                # mode="drop" only drops indices BEYOND the axis; negative
                # taps (a particle on the image edge) would wrap to the
                # opposite edge — route them one-past-the-end instead
                oob = (iy < 0) | (iy >= height) | (ix < 0) | (ix >= width)
                img = img.at[
                    jnp.where(oob, height, iy), jnp.where(oob, width, ix)
                ].add(val * jnp.float32(wgt), mode="drop")
        return img

    w = ok.astype(jnp.float32)
    if mode == "density":
        return stencil_add(img, w)
    if mode == "rho":
        num = stencil_add(img, w * state.rho)
        den = stencil_add(img, w)
        return num / jnp.maximum(den, 1e-6)
    if mode == "speed":
        speed = jnp.sqrt(jnp.sum(state.v * state.v, axis=-1))
        num = stencil_add(img, w * speed)
        den = stencil_add(img, w)
        return num / jnp.maximum(den, 1e-6)
    if mode == "depth":
        # depth-shaded splat for 3D scenes: particles near the viewer
        # (large coordinate along the projection axis) splat brighter —
        # the cheap orthographic stand-in for the reference's GL depth
        # cue, one extra multiply on the same scatter
        if state.dim < 3:
            raise ValueError("render mode 'depth' needs a 3D scene")
        az = ({0, 1, 2} - {ax, ay}).pop()
        dnorm = (state.x[:, az] - lo[az]) / (hi[az] - lo[az])
        shade = jnp.clip(0.15 + 0.85 * dnorm, 0.0, 1.0) ** 2
        return stencil_add(img, w * shade)
    raise ValueError(f"unknown render mode {mode!r}")


def colorize(
    field: np.ndarray, gamma: float = 0.5, top: float | None = None
) -> np.ndarray:
    """[H, W] scalar → [H, W, 3] uint8, dark-blue→cyan→white water map.

    `top` fixes the normalization scale; None autoscales to this frame's
    99th percentile (recordings should pass a sequence-wide `top` so
    brightness doesn't flicker frame to frame — VERDICT r1 weak #8)."""
    f = np.asarray(field, np.float32)
    if top is None:
        top = np.percentile(f[f > 0], 99.0) if np.any(f > 0) else 1.0
    t = np.clip(f / max(top, 1e-9), 0.0, 1.0) ** gamma
    r = np.clip(t * 2.0 - 1.0, 0.0, 1.0)
    g = np.clip(t * 1.6 - 0.2, 0.0, 1.0)
    b = np.clip(0.2 + t * 0.8, 0.0, 1.0) * (t > 0) + 0.07 * (t == 0)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def write_png(path: str, rgb: np.ndarray) -> None:
    """Minimal RGB8 PNG writer (stdlib only)."""
    h, w, _ = rgb.shape
    raw = b"".join(
        b"\x00" + rgb[i].astype(np.uint8).tobytes() for i in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as fh:
        fh.write(png)


def save_frame(
    state: State, scene: Scene, path: str, width=400, height=300,
    mode="density", radius=1, top=None,
) -> None:
    from sph_tpu import io_native

    field = np.asarray(
        render_splat(state, scene, width, height, mode, radius=radius)
    )
    rgb = colorize(field, top=top)
    if not io_native.write_png(path, rgb):   # native encoder, if built
        write_png(path, rgb)                 # pure-Python fallback


def sequence_scale(fields: list[np.ndarray]) -> float:
    """One normalization scale for a whole recording (99th percentile of
    positive pixels across ALL frames) — per-frame autoscale flickers."""
    pos = [f[f > 0] for f in (np.asarray(f, np.float32) for f in fields)]
    pos = [p for p in pos if p.size]
    if not pos:
        return 1.0
    return float(np.percentile(np.concatenate(pos), 99.0))


def save_apng(path: str, fields: list[np.ndarray], fps: float = 20.0) -> None:
    """Encode a field sequence to an animated PNG (native encoder required;
    falls back to writing per-frame PNGs next to `path`).  All frames share
    one normalization scale (no per-frame brightness flicker)."""
    from sph_tpu import io_native

    top = sequence_scale(fields)
    frames = np.stack([colorize(f, top=top) for f in fields])
    if not io_native.write_apng(path, frames, fps=fps):
        base, _ = path.rsplit(".", 1)
        for i, frame in enumerate(frames):
            write_png(f"{base}_{i:05d}.png", frame)
