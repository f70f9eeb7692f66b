"""Neighbor search: naive path lives in physics.py; this is the cell-hash
counting-sort pipeline (SURVEY.md C10, B:5).

TPU-native design — everything shape-static:

  1. cell id per particle: floor((x−lo)/cell) per axis, clipped into the
     grid, raveled to a flat id (last axis fastest).  Inactive particles are
     routed to a dedicated *dump row* that no neighbor lookup ever reads.
  2. stable argsort by flat id (counting sort; `jnp.argsort` is stable) →
     per-cell contiguous ranges; offsets via bincount + exclusive cumsum.
  3. fixed-size per-cell tiles: tile[c, rank] = particle index, padded with
     the sentinel index N (a dummy particle parked at +∞, so W = 0 and every
     contribution vanishes without branching).
  4. pairwise compute: for each particle, candidates are the 3^D adjacent
     cells' tiles; processed in fixed-size particle chunks under `lax.map`
     so peak memory is O(chunk · 3^D · cap), not O(N · 3^D · cap).

Compact support makes this *exact*, not approximate: cell size = h, so all
pairs with r < h lie within ±1 cell (tested against the naive path in
tests/test_grid_equiv.py).  Cell capacity overflow drops particles from the
tile (documented static cap, SURVEY.md §7 hard-part 1); `cell_overflow`
reports the worst-case occupancy for debug/watchdog use.
"""

from __future__ import annotations

import itertools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from sph_tpu import physics
from sph_tpu.params import Scene, SimParams


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclass(frozen=True)
class GridSpec:
    """Static grid geometry (hashable; closed over by jit)."""

    lo: tuple[float, ...]     # grid origin (scene lo minus one-cell margin)
    cell: float               # cell edge length == support radius h
    shape: tuple[int, ...]    # cells per axis
    cap: int                  # max particles per cell tile
    chunk: int                # particles per lax.map chunk
    xsub: int = 1             # pallas-only: split each LANE-axis (x) cell
    #   into `xsub` slot-cells of cap/xsub each.  The candidate window's
    #   dead margin then shrinks from one cap-wide cell to sub-cell
    #   granularity (the margin stays exactly one full cell = xsub slots
    #   wide, so the compact-support/skin guarantee is unchanged), cutting
    #   the per-pair-block padding the kernels chew through.  The XLA grid
    #   path ignores it (full-cell tiles).

    @property
    def dim(self) -> int:
        return len(self.shape)

    @property
    def n_cells(self) -> int:
        return math.prod(self.shape)

    @property
    def n_rows(self) -> int:
        # + always-empty row (invalid-neighbor target) + inactive dump row
        return self.n_cells + 2

    @property
    def empty_row(self) -> int:
        return self.n_cells

    @property
    def dump_row(self) -> int:
        return self.n_cells + 1

    @property
    def n_offsets(self) -> int:
        return 3**self.dim

    @staticmethod
    def for_scene(
        scene: Scene, cap: int | None = None, chunk: int = 2048,
        skin: float = 0.0, xsub: int = 1,
    ) -> "GridSpec":
        """`skin` > 0 widens cells to h + skin (pseudo-Verlet, arXiv
        1804.06231 pattern): a neighbor structure built from positions at
        time t0 stays a correct superset of all r < h pairs while every
        particle has moved less than skin/2 since t0 — the basis of
        `sort_every` addr reuse (step.make_advance).  Compact support keeps
        results exact regardless of cell size."""
        p = scene.params
        cell = float(p.h) + float(skin)
        spacing = scene.spacing or p.h * 0.55
        lo = tuple(float(l) - cell for l in scene.lo)
        hi = tuple(float(h) + cell for h in scene.hi)
        shape = tuple(
            max(1, int(math.ceil((h - l) / cell))) for l, h in zip(lo, hi)
        )
        if cap is None:
            cap = scene.grid_cap or None
        if cap is None:
            # rest occupancy (cell/spacing)^dim, ×2.5 compression headroom
            cap = _round_up(int(math.ceil((cell / spacing) ** p.dim * 2.5)), 8)
        cap = _round_up(cap, xsub)  # slot cap = cap/xsub must stay integral
        return GridSpec(
            lo=lo, cell=cell, shape=shape, cap=cap, chunk=chunk, xsub=xsub
        )

    @staticmethod
    def for_slab(
        scene: Scene,
        slab_w: float,
        axis: int,
        cap: int | None = None,
        chunk: int = 2048,
        skin: float = 0.0,
    ) -> "GridSpec":
        """Slab-local grid for spatial decomposition (decomp.py): along
        `axis` it spans only one slab plus an (h+skin)-deep ghost band and
        margin cells, so per-device grid/slot memory scales 1/n_shards.
        Indices are computed against the GLOBAL lattice and shifted per
        device by an integer `ci_offset` (see cell_index) — grid.lo stays
        global.  `skin` > 0 (decomp fast path) widens both the cells and
        the covered ghost band, same pseudo-Verlet contract as
        for_scene."""
        full = GridSpec.for_scene(scene, cap=cap, chunk=chunk, skin=skin)
        h_eff = scene.params.h + skin
        # cells covering [my_lo − h_eff − 2·cell, my_hi + h_eff + cell] for
        # any fractional alignment of the slab against the lattice
        # (decomp.py picks the matching integer offset per device)
        n_ax = int(math.ceil((slab_w + 2 * h_eff) / full.cell)) + 3
        shape = tuple(
            min(n_ax, s) if a == axis else s
            for a, s in enumerate(full.shape)
        )
        return GridSpec(
            lo=full.lo, cell=full.cell, shape=shape, cap=full.cap,
            chunk=full.chunk, xsub=full.xsub,
        )

    @staticmethod
    def for_pencil(
        scene: Scene,
        widths: dict[int, float],
        cap: int | None = None,
        chunk: int = 2048,
        skin: float = 0.0,
    ) -> "GridSpec":
        """Pencil-local grid (decomp.make_pencil_advance): like for_slab
        but restricted along EVERY axis in `widths` ({axis: pencil width}),
        so per-device grid/slot memory scales 1/(n1·n2).  Same global-
        lattice + integer ci_offset contract as for_slab."""
        full = GridSpec.for_scene(scene, cap=cap, chunk=chunk, skin=skin)
        h_eff = scene.params.h + skin
        shape = tuple(
            min(int(math.ceil((widths[a] + 2 * h_eff) / full.cell)) + 3, s)
            if a in widths
            else s
            for a, s in enumerate(full.shape)
        )
        return GridSpec(
            lo=full.lo, cell=full.cell, shape=shape, cap=full.cap,
            chunk=full.chunk, xsub=full.xsub,
        )


# ---------------------------------------------------------------------------
# Grid build
# ---------------------------------------------------------------------------


def cell_index(x, active, grid: GridSpec, ci_offset=None):
    """Per-particle (multi-index [N, D], flat row id [N]).

    Out-of-domain actives clip to edge cells (distance filter keeps results
    exact — clipping only shrinks cell-space distance); inactives go to the
    dump row.

    `ci_offset` ([D] int32, traced) shifts the index origin by whole cells:
    used by the spatial decomposition (decomp.py) so each device's grid
    covers only its slab+halo while indices stay computed against the GLOBAL
    lattice — an integer subtraction, so per-pair arithmetic (and therefore
    physics) is bitwise independent of the decomposition.
    """
    lo = jnp.asarray(grid.lo, x.dtype)
    ci = jnp.floor((x - lo) / grid.cell).astype(jnp.int32)
    if ci_offset is not None:
        ci = ci - ci_offset[None, :]
    ci = jnp.clip(ci, 0, jnp.asarray(grid.shape, jnp.int32) - 1)
    # ravel, last axis fastest (so ±1 in the last axis is contiguous in rows)
    flat = ci[:, 0]
    for a in range(1, grid.dim):
        flat = flat * grid.shape[a] + ci[:, a]
    flat = jnp.where(active, flat, grid.dump_row)
    return ci, flat


def build_tiles(flat, grid: GridSpec):
    """Counting sort by cell → (tile [n_rows, cap], order, starts, counts).

    tile[c] lists the particle indices in cell c in ascending original-index
    order (stable sort ⇒ canonical accumulation order, SURVEY.md §7 hard-
    part 4), padded with sentinel N.
    """
    n = flat.shape[0]
    order = jnp.argsort(flat)  # stable → within-cell ascending index
    sorted_flat = flat[order]
    counts = jnp.bincount(flat, length=grid.n_rows)
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    rank = jnp.arange(n, dtype=jnp.int32) - starts[sorted_flat].astype(jnp.int32)
    tile = jnp.full((grid.n_rows, grid.cap), n, jnp.int32)
    # rank >= cap falls out of bounds and is dropped (static-cap overflow)
    tile = tile.at[sorted_flat, rank].set(
        order.astype(jnp.int32), mode="drop"
    )
    return tile, order, starts, counts


def cell_overflow(x, active, grid: GridSpec):
    """Max particles in any real cell minus cap (>0 ⇒ tile overflow)."""
    _, flat = cell_index(x, active, grid)
    counts = jnp.bincount(flat, length=grid.n_rows)
    return jnp.max(counts[: grid.n_cells]) - grid.cap


def _neighbor_rows(ci, grid: GridSpec):
    """For each particle's cell multi-index [C, D], the 3^D adjacent flat
    row ids [C, 3^D]; out-of-grid neighbors point at the always-empty row."""
    shape = jnp.asarray(grid.shape, jnp.int32)
    rows = []
    for off in itertools.product((-1, 0, 1), repeat=grid.dim):
        idx = ci + jnp.asarray(off, jnp.int32)[None, :]
        valid = jnp.all((idx >= 0) & (idx < shape[None, :]), axis=-1)
        idxc = jnp.clip(idx, 0, shape[None, :] - 1)
        flat = idxc[:, 0]
        for a in range(1, grid.dim):
            flat = flat * grid.shape[a] + idxc[:, a]
        rows.append(jnp.where(valid, flat, grid.empty_row))
    return jnp.stack(rows, axis=1)


# ---------------------------------------------------------------------------
# Fused density + EOS + forces over the grid (XLA-ops path, SURVEY.md M1)
# ---------------------------------------------------------------------------


def _pad_trailing(arr, n_pad, value):
    pad_width = [(0, n_pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad_width, constant_values=value)


# Workspace budget for unchunked candidate matrices (floats).  Above this,
# fall back to lax.map over particle chunks (recomputing candidate indices
# per chunk to keep peak memory O(chunk·K)).
_UNCHUNKED_BUDGET = 192 * 1024 * 1024


def _density_block(xc, idx, x_pad, n, params):
    xj = x_pad[idx]                                   # [C, K, D]
    dx = xc[:, None, :] - xj
    r2 = jnp.sum(dx * dx, axis=-1)
    mask = (idx < n).astype(xc.dtype)
    return jnp.sum(physics.density_contrib(r2, mask, params), axis=-1)


def _force_block(xc, vc, pc, idx, feat_pad, n, d, params):
    """One wide gather of packed [x | v | rho | p] rows — TPU gathers cost
    per *row* fetched, so packing beats four separate gathers ~4×."""
    fj = feat_pad[idx]                                # [C, K, 2D+2]
    dx = xc[:, None, :] - fj[..., :d]
    r2 = jnp.sum(dx * dx, axis=-1)
    mask = (idx < n).astype(xc.dtype)
    return jnp.sum(
        physics.force_contrib(
            dx,
            r2,
            vc[:, None, :],
            fj[..., d : 2 * d],
            pc[:, None],
            fj[..., 2 * d + 1],
            fj[..., 2 * d],
            mask,
            params,
        ),
        axis=-2,
    )


def grid_density(x, active, params: SimParams, grid: GridSpec,
                 ci_offset=None):
    """Density only (split phase for the halo-exchange step, where ghost
    rho/p must be re-imported between passes — sph_tpu/decomp.py)."""
    n, d = x.shape
    k_cand = grid.n_offsets * grid.cap
    ci, flat = cell_index(x, active, grid, ci_offset)
    tile, _, _, _ = build_tiles(flat, grid)
    far = jnp.full((1, d), 1e18, x.dtype)
    x_pad = jnp.concatenate([x, far], axis=0)

    if n * k_cand * (d + 3) <= _UNCHUNKED_BUDGET:
        rows = _neighbor_rows(ci, grid)
        idx = tile[rows].reshape(n, k_cand)
        rho = _density_block(x, idx, x_pad, n, params)
    else:
        n_padded = _round_up(n, grid.chunk)
        xq = _pad_trailing(x, n_padded - n, 0.0)
        ciq = _pad_trailing(ci, n_padded - n, 0)
        n_chunks = n_padded // grid.chunk

        def density_chunk(args):
            xc, cic = args
            rows = _neighbor_rows(cic, grid)
            idx = tile[rows].reshape(-1, k_cand)
            return _density_block(xc, idx, x_pad, n, params)

        rho = jax.lax.map(
            density_chunk,
            (
                xq.reshape(n_chunks, grid.chunk, d),
                ciq.reshape(n_chunks, grid.chunk, d),
            ),
        ).reshape(n_padded)[:n]
    return jnp.where(active, rho, params.rest_density)


def grid_forces(x, v, rho, p, active, params: SimParams, grid: GridSpec,
                ci_offset=None):
    """Pairwise forces given rho/p (split phase, see grid_density)."""
    n, d = x.shape
    k_cand = grid.n_offsets * grid.cap
    ci, flat = cell_index(x, active, grid, ci_offset)
    tile, _, _, _ = build_tiles(flat, grid)
    far = jnp.full((1, d), 1e18, x.dtype)
    feat = jnp.concatenate([x, v, rho[:, None], p[:, None]], axis=1)
    dummy = jnp.concatenate(
        [far, jnp.zeros((1, d)), jnp.ones((1, 1)), jnp.zeros((1, 1))], axis=1
    ).astype(feat.dtype)
    feat_pad = jnp.concatenate([feat, dummy], axis=0)

    if n * k_cand * (d + 3) <= _UNCHUNKED_BUDGET:
        rows = _neighbor_rows(ci, grid)
        idx = tile[rows].reshape(n, k_cand)
        f = _force_block(x, v, p, idx, feat_pad, n, d, params)
    else:
        n_padded = _round_up(n, grid.chunk)
        xq = _pad_trailing(x, n_padded - n, 0.0)
        vq = _pad_trailing(v, n_padded - n, 0.0)
        pq = _pad_trailing(p, n_padded - n, 0.0)
        ciq = _pad_trailing(ci, n_padded - n, 0)
        n_chunks = n_padded // grid.chunk

        def force_chunk(args):
            xc, vc, pc, cic = args
            rows = _neighbor_rows(cic, grid)
            idx = tile[rows].reshape(-1, k_cand)
            return _force_block(xc, vc, pc, idx, feat_pad, n, d, params)

        f = jax.lax.map(
            force_chunk,
            (
                xq.reshape(n_chunks, grid.chunk, d),
                vq.reshape(n_chunks, grid.chunk, d),
                pq.reshape(n_chunks, grid.chunk),
                ciq.reshape(n_chunks, grid.chunk, d),
            ),
        ).reshape(n_padded, d)[:n]
    return f * active[:, None].astype(x.dtype)


def grid_rho_p_f(x, v, active, params: SimParams, grid: GridSpec):
    """Density → EOS → pairwise forces using cell tiles; matches the naive
    path up to fp reduction order (tests/test_grid_equiv.py).

    Small problems run unchunked with the candidate index matrix built once
    and reused across both passes; large ones stream particle chunks through
    `lax.map` so peak memory stays O(chunk · 3^D · cap)."""
    n, d = x.shape
    k_cand = grid.n_offsets * grid.cap

    ci, flat = cell_index(x, active, grid)
    tile, _, _, _ = build_tiles(flat, grid)

    # padded particle arrays: index n is a far-away dummy (W = 0 vs anything)
    far = jnp.full((1, d), 1e18, x.dtype)
    x_pad = jnp.concatenate([x, far], axis=0)

    def _feat_pad(rho, p):
        """[N+1, 2D+2] packed rows: x | v | rho | p (dummy: far, 0, 1, 0)."""
        feat = jnp.concatenate([x, v, rho[:, None], p[:, None]], axis=1)
        dummy = jnp.concatenate(
            [far, jnp.zeros((1, d)), jnp.ones((1, 1)), jnp.zeros((1, 1))],
            axis=1,
        ).astype(feat.dtype)
        return jnp.concatenate([feat, dummy], axis=0)

    if n * k_cand * (d + 3) <= _UNCHUNKED_BUDGET:
        rows = _neighbor_rows(ci, grid)               # [N, 3^D]
        idx = tile[rows].reshape(n, k_cand)           # [N, K] — built ONCE
        rho = _density_block(x, idx, x_pad, n, params)
        rho = jnp.where(active, rho, params.rest_density)
        p = physics.eos_pressure(rho, params)
        f = _force_block(x, v, p, idx, _feat_pad(rho, p), n, d, params)
        f = f * active[:, None].astype(x.dtype)
        return rho, p, f

    # --- chunked streaming path (large N) ---
    n_padded = _round_up(n, grid.chunk)
    xq = _pad_trailing(x, n_padded - n, 0.0)
    ciq = _pad_trailing(ci, n_padded - n, 0)
    n_chunks = n_padded // grid.chunk

    def density_chunk(args):
        xc, cic = args
        rows = _neighbor_rows(cic, grid)
        idx = tile[rows].reshape(-1, k_cand)
        return _density_block(xc, idx, x_pad, n, params)

    rho = jax.lax.map(
        density_chunk,
        (
            xq.reshape(n_chunks, grid.chunk, d),
            ciq.reshape(n_chunks, grid.chunk, d),
        ),
    ).reshape(n_padded)[:n]
    rho = jnp.where(active, rho, params.rest_density)
    p = physics.eos_pressure(rho, params)

    feat_pad = _feat_pad(rho, p)
    vq = _pad_trailing(v, n_padded - n, 0.0)
    pq = _pad_trailing(p, n_padded - n, 0.0)

    def force_chunk(args):
        xc, vc, pc, cic = args
        rows = _neighbor_rows(cic, grid)
        idx = tile[rows].reshape(-1, k_cand)
        return _force_block(xc, vc, pc, idx, feat_pad, n, d, params)

    f = jax.lax.map(
        force_chunk,
        (
            xq.reshape(n_chunks, grid.chunk, d),
            vq.reshape(n_chunks, grid.chunk, d),
            pq.reshape(n_chunks, grid.chunk),
            ciq.reshape(n_chunks, grid.chunk, d),
        ),
    ).reshape(n_padded, d)[:n]
    f = f * active[:, None].astype(x.dtype)
    return rho, p, f
