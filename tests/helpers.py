"""Shared test fixtures/helpers (SURVEY.md §4 'scenes.py fixture module')."""

from __future__ import annotations

import dataclasses

import numpy as np

from sph_tpu.params import Block, Scene, SimParams, calibrate


def pdict(params: SimParams) -> dict:
    """SimParams → plain dict for the frozen NumPy oracle."""
    return dataclasses.asdict(params)


def small_scene(dim=2, n=None, seed=0, **params_kw) -> Scene:
    """A small mass-calibrated dam-break at test-reduced size."""
    if dim == 2:
        p = SimParams(**params_kw)
        lo = (p.wall_eps + 4, p.wall_eps + 4)
        scene = Scene(
            params=p,
            lo=(0.0, 0.0),
            hi=(400.0, 400.0),
            blocks=(Block(lo=lo, hi=(lo[0] + 120, lo[1] + 200)),),
            seed=seed,
        )
        return calibrate(scene)
    kw = dict(
        dim=3,
        gravity=(0.0, -9.81, 0.0),
        kernel_norm="proper",
    )
    kw.update(params_kw)
    p = SimParams(**kw)
    lo = (p.wall_eps + 4,) * 3
    scene = Scene(
        params=p,
        lo=(0.0, 0.0, 0.0),
        hi=(300.0, 300.0, 300.0),
        blocks=(Block(lo=lo, hi=(lo[0] + 90, lo[1] + 120, lo[2] + 90)),),
        seed=seed,
    )
    return calibrate(scene)


def random_cloud(n, dim, lo, hi, seed=0, vmax=10.0):
    """Random particle positions/velocities inside a box (np.float32)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(lo, hi, (n, dim)).astype(np.float32)
    v = rng.uniform(-vmax, vmax, (n, dim)).astype(np.float32)
    return x, v
