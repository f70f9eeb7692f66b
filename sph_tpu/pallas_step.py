"""Fused Pallas TPU step: density + forces over per-cell neighbor tiles
(SURVEY.md C11, M3).

Why not the XLA grid path for the hot loop: TPU element-gathers cost ~2.7 ns
per fetched row regardless of width, so per-particle candidate gathers
(N × 3^D·cap rows) dominate the step by 10-100×.  This kernel removes all
per-candidate gathers.  Two Mosaic constraints shaped the design (learned by
compiling): (a) dynamic lane-dim vector slices must be provably 128-aligned,
(b) compile time is linear in statically-unrolled code, so a full per-cell
unroll is too slow to build.  Both are solved by *aligned lane groups*: the
per-cell capacity `cap` divides 128, so XC = 128/cap consecutive x-cells
form one 128-lane group; a `fori_loop` walks groups (dynamic, aligned
slices), and only the XC cells inside a group are statically unrolled.

Structure:

  1. XLA side: one scatter packs per-particle features  [x | v]
     into a *haloed* slot grid, feature axis on sublanes, (x-cell · cap) on
     lanes: feat[H0, H1, F, H2·cap].  (i-particles are transposed onto
     sublanes *inside* the kernel, [8, 128] → [128, 8] per lane group — a
     transposed HBM copy would pad its 8-lane minor dim 16×, 10+ GB at 1M.)
     The x halo is XC cells on each side (one full lane group), the y/z
     halos one row; halo cells are guaranteed empty and hold far-away dummy
     positions, so every candidate window is in-bounds and wrap-free with
     NO masks — W(r) = 0 annihilates dummy contributions (kernels.py is
     branchless).
  2. Row compaction: only occupied (z, y) rows are processed.  The occupied
     row codes are scalar-prefetched (PrefetchScalarGridSpec) and the block
     index_maps decode them, so each program fetches the 3^(D-1) neighbor
     row strips of *its* occupied row; excess programs alias row (0, 0)
     (always-empty halo) and skip compute.
  3. Kernel: fori_loop over the row's lane groups with per-group occupancy
     skip; inside, XC statically-unrolled cells, each a dense
     [cap(i-sublanes) × 3^(D-1)·3·cap(j-lanes)] pair block on the VPU with
     fixed accumulation order.
  4. Density pass → force pass, chained WITHOUT a per-particle round trip:
     the density kernel also emits lane-major (rho, EOS p) rows
     [C_rows, 2, H2·cap], which the force kernel streams as neighbor
     strips routed by a prefetched neighbor-row-position table.  The
     per-particle rho/f gathers (sublane-major [C_rows, H2·cap, ·]
     outputs, one cheap N-row gather each) only feed the State output,
     off the kernel critical path.

Capacity semantics: rank >= cap drops out of the tiles (documented static
cap; overflowed particles fall back to rest density / zero pair force);
row-compaction capacity c_rows is likewise a documented static cap;
`slot_overflow` reports both (debug/watchdog hook, SURVEY.md §5.2).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_tpu import physics
from sph_tpu.kernels import kernel_constants
from sph_tpu.neighbors import GridSpec, cell_index
from sph_tpu.params import SimParams

FEAT = 8  # packed feature columns: x(3) | v(3) | rho | p
FOUT = 4  # force output components: f(3) | pad
LANE = 128


def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests run the same kernel logic)."""
    return jax.default_backend() != "tpu"


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclass(frozen=True)
class SlotGrid:
    """Static haloed slot-grid geometry derived from a GridSpec.

    Axes: rows = all but the last grid axis ((H0, H1); H0 = 1 for 2D), x =
    last grid axis (fastest), padded so that lanes are 128-aligned groups of
    XC = 128/cap cells with a one-group halo on each side.
    """

    inner: tuple[int, ...]   # GridSpec.shape
    cap: int                 # must divide 128
    c_rows: int              # occupied-row capacity (static)
    xb_cells: int = 4        # cells batched per vector op (clipped to xc)
    engine: str = "vpu"      # "vpu" (direct per-component dx on the
    #   vector unit — the default) | "mxu" (pair math on the systolic array
    #   via the |xi-xj|² expansion + NT force reductions; kept as a tested,
    #   DOCUMENTED DEAD END: measured 15-25% slower in situ at 100k-3D
    #   because Mosaic's only accurate dot precision (HIGHEST = 6 bf16
    #   passes) costs more than the VPU ops it replaces — see ROADMAP.md)

    @property
    def dim(self) -> int:
        return len(self.inner)

    @property
    def xc(self) -> int:     # cells per 128-lane group
        return LANE // self.cap

    @property
    def xb(self) -> int:     # cells batched per vector op (divides xc)
        return min(self.xb_cells, self.xc)

    @property
    def h0(self) -> int:     # z rows (1 for 2D)
        return self.inner[0] + 2 if self.dim == 3 else 1

    @property
    def h1(self) -> int:     # y rows
        return self.inner[-2] + 2

    @property
    def h2(self) -> int:     # x cells per row incl. one-group halos
        return _round_up(self.inner[-1], self.xc) + 2 * self.xc

    @property
    def n_groups(self) -> int:
        return self.h2 // self.xc

    @property
    def lanes(self) -> int:
        return self.h2 * self.cap

    @property
    def row_offsets(self) -> tuple[tuple[int, int], ...]:
        if self.dim == 2:
            return tuple((0, dy) for dy in (-1, 0, 1))
        return tuple((dz, dy) for dz in (-1, 0, 1) for dy in (-1, 0, 1))


def slot_grid(
    grid: GridSpec,
    c_rows: int | None = None,
    xb_cells: int = 4,
    engine: str = "vpu",
) -> SlotGrid:
    if LANE % grid.cap != 0:
        raise ValueError(f"pallas path needs cap | 128, got {grid.cap}")
    if engine not in ("mxu", "vpu"):
        raise ValueError(f"engine must be 'mxu' or 'vpu', got {engine!r}")
    dim = len(grid.shape)
    inner_rows = (grid.shape[0] + 2 if dim == 3 else 1) * (grid.shape[-2] + 2)
    if c_rows is None:
        # always-correct when the row space is small; else a documented cap
        c_rows = inner_rows if inner_rows <= 4096 else 4096
    return SlotGrid(
        inner=grid.shape,
        cap=grid.cap,
        c_rows=min(c_rows, inner_rows),
        xb_cells=xb_cells,
        engine=engine,
    )


# ---------------------------------------------------------------------------
# XLA side: slot addressing, scatters, row compaction
# ---------------------------------------------------------------------------


def cell_ranks(flat, n_rows: int):
    """Within-cell rank per particle (stable: ascending original index)."""
    n = flat.shape[0]
    order = jnp.argsort(flat)
    sorted_flat = flat[order]
    counts = jnp.bincount(flat, length=n_rows)
    starts = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]]
    )
    rank_sorted = jnp.arange(n, dtype=jnp.int32) - starts[sorted_flat].astype(
        jnp.int32
    )
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
    return rank, counts


def _pack_rows6(x, v):
    """[N, 6] scatter rows: x(3) | v(3).  rho/p are NOT scattered into feat
    — they live in the rp-slot arrays (density-kernel output / scatter_rp);
    feat columns 6, 7 stay at their zero init."""
    n, d = x.shape
    return jnp.concatenate(
        [
            x,
            jnp.zeros((n, 3 - d), x.dtype),       # pad x to 3 columns
            v,
            jnp.zeros((n, 3 - d), v.dtype),
        ],
        axis=1,
    )  # [N, 6]


@dataclass(frozen=True)
class SlotAddr:
    """Per-particle slot addressing + row compaction, built once per step."""

    s0: jax.Array         # scatter-safe halo-z (out of bounds ⇒ dropped)
    h1: jax.Array
    hx: jax.Array
    pos: jax.Array        # lane position hx·cap + rank
    valid: jax.Array      # in a real cell and within cap
    counts: jax.Array     # [H0, H1, 1, H2] int32 per-cell occupancy
    gcounts: jax.Array    # [H0, H1, 1, n_groups] int32 per-group occupancy
    row_codes: jax.Array  # [c_rows] i32: gz·H1 + gy of occupied rows
    n_occ: jax.Array      # [1] i32, clipped to c_rows
    row_pos: jax.Array    # [N] i32 position of the particle's row
    nbr_pos: jax.Array    # [R, c_rows] i32 compacted position of each
    #   neighbor row, clamped in-range for the BlockSpec index_map
    nbr_ok: jax.Array     # [R, c_rows] i32 1 iff the neighbor row IS in the
    #   compacted set.  0 covers two cases: (a) row unoccupied — harmless,
    #   its feat slots are all dummies so pairs annihilate anyway; (b) row
    #   occupied but dropped by c_rows overflow — there the feat strip holds
    #   REAL positions while nbr_pos points at an unrelated row's rho/p
    #   strip, so the force kernel must zero these pairs exactly (the
    #   documented zero-pair-force fallback; unmasked this produced huge
    #   bogus forces via rho=0 → 1/rho=1e12 — ADVICE r1)


def build_addr(x, active, grid: GridSpec, sg: SlotGrid, ci_offset=None) -> SlotAddr:
    n, _ = x.shape
    ci, flat = cell_index(x, active, grid, ci_offset)
    in_cell = flat < grid.n_cells
    h0 = (ci[:, 0] + 1) if sg.dim == 3 else jnp.zeros((n,), jnp.int32)
    h1 = ci[:, -2] + 1
    hx = ci[:, -1] + sg.xc                     # one-group x halo
    n_hrows = sg.h0 * sg.h1 * sg.h2
    hrow = (h0 * sg.h1 + h1) * sg.h2 + hx
    hrow = jnp.where(in_cell, hrow, n_hrows)
    rank, _ = cell_ranks(hrow, n_hrows + 1)
    valid = in_cell & (rank < sg.cap)
    pos = hx * sg.cap + rank
    s0 = jnp.where(valid, h0, sg.h0)

    counts_flat_idx = (s0 * sg.h1 + h1) * sg.h2 + hx
    counts = (
        jnp.zeros((sg.h0 * sg.h1 * sg.h2,), jnp.int32)
        .at[counts_flat_idx]
        .add(jnp.where(valid, 1, 0), mode="drop")
        .reshape(sg.h0, sg.h1, 1, sg.h2)
    )
    gcounts = jnp.sum(
        counts.reshape(sg.h0, sg.h1, 1, sg.n_groups, sg.xc), axis=-1
    )

    row_occ = jnp.sum(counts[:, :, 0, :], axis=-1).reshape(-1) > 0  # [H0*H1]
    n_occ = jnp.minimum(jnp.sum(row_occ.astype(jnp.int32)), sg.c_rows)[None]
    row_codes = jnp.nonzero(row_occ, size=sg.c_rows, fill_value=0)[0].astype(
        jnp.int32
    )
    # Excess/pad programs must decode to a row whose whole offset stencil is
    # in-bounds: (1, 1) in 3D, (0, 1) in 2D (no z axis, dz always 0).  Fill
    # code 0 = row (0, 0) would send the dy/dz = -1 index maps to NEGATIVE
    # block indices -> out-of-bounds DMA (a real device fault on TPU,
    # found the hard way).
    safe_code = jnp.int32(sg.h1 + 1 if sg.dim == 3 else 1)
    in_range = jnp.arange(sg.c_rows, dtype=jnp.int32) < n_occ[0]
    row_codes = jnp.where(in_range, row_codes, safe_code)
    row_inv = jnp.full((sg.h0 * sg.h1,), sg.c_rows, jnp.int32)
    row_inv = row_inv.at[row_codes].set(
        jnp.arange(sg.c_rows, dtype=jnp.int32)
    )
    # pad entries clobbered row_inv[safe_code]; restore its true occupied
    # position (first matching code), or c_rows if row (1,1) is empty
    is_true = (row_codes == safe_code) & in_range
    true_pos = jnp.argmax(is_true).astype(jnp.int32)
    row_inv = row_inv.at[safe_code].set(
        jnp.where(jnp.any(is_true), true_pos, sg.c_rows)
    )
    row_pos = row_inv[h0 * sg.h1 + h1]
    # Per-row neighbor positions in compacted space (for the force kernel's
    # rho/p strips).  Occupied codes are always interior (real cells map to
    # halo coords 1..H-2), so code + dz·H1 + dy never leaves [0, H0·H1).
    # [R, c_rows]: R-major so SMEM's pad-minor-dim-to-128 hits the long
    # axis (the [c_rows, R] orientation padded R 9→128 = SMEM OOM at 100k)
    offs = jnp.array(
        [dz * sg.h1 + dy for dz, dy in sg.row_offsets], jnp.int32
    )
    nbr_raw = row_inv[row_codes[None, :] + offs[:, None]]
    nbr_pos = jnp.minimum(nbr_raw, sg.c_rows - 1)
    nbr_ok = (nbr_raw < sg.c_rows).astype(jnp.int32)
    return SlotAddr(
        s0=s0,
        h1=h1,
        hx=hx,
        pos=pos,
        valid=valid,
        counts=counts,
        gcounts=gcounts,
        row_codes=row_codes,
        n_occ=n_occ.astype(jnp.int32),
        row_pos=row_pos,
        nbr_pos=nbr_pos,
        nbr_ok=nbr_ok,
    )


def _flat_slot_idx(addr: SlotAddr, sg: SlotGrid, ncols: int):
    """[N, ncols] flat element indices of each particle's feature slots in
    the flattened feat array (out of bounds for dropped particles).

    Scatters/gathers with a SINGLE flat index vector lower to the fast TPU
    path; multi-coordinate advanced indexing (three index vectors) lowers
    to a per-element loop — measured 95 ms vs a few ms at 1M."""
    base = ((addr.s0 * sg.h1 + addr.h1) * FEAT) * sg.lanes + addr.pos
    return base[:, None] + (
        jnp.arange(ncols, dtype=jnp.int32) * sg.lanes
    )[None, :]


def scatter_slots(addr: SlotAddr, rows, sg: SlotGrid):
    """Scatter packed [N, 8] rows → feat [H0, H1, 8, lanes].

    The far-dummy init column goes through an optimization_barrier: without
    it XLA constant-folds the broadcast into a slot-grid-sized literal,
    which blows up the (remote) compile at large grids.  (No transposed
    copy: a [lanes, 8] array pads its 8-lane minor dim 16× in HBM — 10+ GB
    at 1M — so the kernels transpose the self block in VMEM instead.)"""
    feat = jnp.broadcast_to(
        _init_row(rows.dtype)[None, None, :, None],
        (sg.h0, sg.h1, FEAT, sg.lanes),
    )
    flat = feat.reshape(-1).at[_flat_slot_idx(addr, sg, rows.shape[1])].set(
        rows, mode="drop"
    )
    return flat.reshape(sg.h0, sg.h1, FEAT, sg.lanes)


def _init_row(dtype):
    """Empty-slot feature row: far-away dummy position, zeros elsewhere.
    The optimization_barrier stops XLA constant-folding broadcasts of it
    into slot-grid-sized literals (remote-compile blowup at large grids)."""
    return jax.lax.optimization_barrier(
        jnp.array([1e18, 1e18, 1e18, 0, 0, 0, 0, 0], dtype)
    )


def init_slot_cache(sg: SlotGrid, n: int, dtype=jnp.float32):
    """Persistent slot cache: (background feat grid, prev slot indices).

    `prev_idx` starts at `size` (out of bounds ⇒ the first park drops), so a
    fresh cache behaves exactly like a full re-init.  Carried through the
    scan by `step.make_advance` so the ~full-grid background fill happens
    once per *dispatch* instead of once per *step* (ROADMAP §persistent
    slots: the per-step init writes were the scatter phase's dominant cost).
    """
    feat = jnp.broadcast_to(
        _init_row(dtype)[None, None, :, None], (sg.h0, sg.h1, FEAT, sg.lanes)
    )
    size = sg.h0 * sg.h1 * FEAT * sg.lanes
    prev_idx = jnp.full((n, 6), size, jnp.int32)  # 6 scattered cols (x|v)
    return feat, prev_idx


def scatter_slots_cached(feat, prev_idx, addr: SlotAddr, rows, sg: SlotGrid):
    """Park each particle's previous slots (restore background row), then
    scatter the new rows — two N×8 scatters instead of a full-grid re-init.

    Every occupied slot is owned by exactly one particle and every particle
    parks exactly the slots it wrote last step, so after the park the grid
    is bitwise the background; the rewrite then reproduces `scatter_slots`
    exactly (tested bitwise in test_pallas_equiv.py).  Dropped/inactive
    particles hold out-of-bounds indices on both sides (mode="drop")."""
    park = jnp.broadcast_to(
        _init_row(rows.dtype)[None, : rows.shape[1]], rows.shape
    )
    idx = _flat_slot_idx(addr, sg, rows.shape[1])
    flat = feat.reshape(-1)
    flat = flat.at[prev_idx].set(park, mode="drop")
    flat = flat.at[idx].set(rows, mode="drop")
    return flat.reshape(sg.h0, sg.h1, FEAT, sg.lanes), idx


def slot_overflow(x, active, grid: GridSpec, sg: SlotGrid):
    """(cell overflow count, row overflow count): >0 ⇒ static caps dropped
    work this step."""
    addr = build_addr(x, active, grid, sg)
    _, flat = cell_index(x, active, grid)
    cell_over = jnp.sum((~addr.valid) & (flat < grid.n_cells))
    row_occ = jnp.sum(addr.counts[:, :, 0, :], axis=-1).reshape(-1) > 0
    row_over = jnp.sum(row_occ.astype(jnp.int32)) - addr.n_occ[0]
    return cell_over, row_over


# ---------------------------------------------------------------------------
# Kernels: fori_loop over aligned lane groups, XC cells unrolled inside
# ---------------------------------------------------------------------------


def _group_loop(sg: SlotGrid, gcount_ref, group_body):
    """Run group_body(g) for every occupied group g."""

    def body(g, _):
        @pl.when(gcount_ref[0, 0, 0, g] > 0)
        def _():
            group_body(g)

        return 0

    # groups 0 and n_groups-1 are the empty x halo: skip them
    jax.lax.fori_loop(1, sg.n_groups - 1, body, 0)


def _group_windows(strips, g):
    """Per-strip candidate windows for group g, ALL features at once:
    R × [FEAT, 3·LANE].  An [8, X] load costs the same tile footprint as a
    [1, X] load (sublanes pad to 8), so loading all feature rows together
    is ~8× fewer ops than per-feature windows."""
    start = pl.multiple_of((g - 1) * LANE, LANE)
    return [s[0, 0, :, pl.ds(start, 3 * LANE)] for s in strips]


def _cand_block(wins, k, cap, xb):
    """Static cell-batch slice across all strips and features: the union
    candidate cells (k-1 .. k+xb) of cells k..k+xb-1, i.e. lanes
    [(xc + k - 1)·cap, +(xb+2)·cap) of each strip window, concatenated →
    [FEAT, R·(xb+2)·cap].

    The union is exact physics: a candidate ≥2 cells away from an i-cell is
    ≥ h away, so its contribution is identically zero (branchless kernels).
    Batching xb cells per vector op trades (xb+2)/3 extra pair-elements for
    1/xb the op-issue count — a win while the kernels are issue-bound."""
    xc = LANE // cap
    a = (xc + k - 1) * cap
    w = (xb + 2) * cap
    return jnp.concatenate([win[:, a : a + w] for win in wins], axis=1)


def _self_block(center_ref, g):
    """i-particles of group g on sublanes: [128, FEAT], via an in-VMEM
    transpose of the center strip's aligned lane block (cheaper than
    keeping a transposed HBM copy, whose 8-lane minor dim pads 16×)."""
    start = pl.multiple_of(g * LANE, LANE)
    return jnp.transpose(center_ref[0, 0, :, pl.ds(start, LANE)])


def _density_kernel(codes_ref, n_ref, nbr_ref, nbrok_ref, gcount_ref, *refs,
                    sg, params):
    """Density pass.  TWO outputs: out_ref [1, lanes, 1] per-slot rho
    (sublane-major, cheap per-particle gather) and rp_ref [1, 2, lanes]
    lane-major (rho, EOS p) rows, which the force kernel streams as
    neighbor strips — the EOS runs HERE so no per-particle gather/
    re-scatter sits between the two kernels."""
    strips, out_ref, rp_ref = refs[:-2], refs[-2], refs[-1]
    center_ref = strips[len(strips) // 2]
    cap = sg.cap
    c_p, _, _ = kernel_constants(params.dim, params.h, params.kernel_norm)
    h2k = params.h * params.h
    out_ref[...] = jnp.zeros_like(out_ref)
    rp_ref[...] = jnp.zeros_like(rp_ref)

    d_dim = params.dim

    @pl.when(pl.program_id(0) < n_ref[0])
    def _():
        def group(g):
            it = _self_block(center_ref, g)           # [128, FEAT], once/group
            wins = _group_windows(strips, g)          # R × [FEAT, 384]
            start = pl.multiple_of(g * LANE, 8)
            xb = sg.xb
            rhos = []
            for k in range(0, sg.xc, xb):
                cand = _cand_block(wins, k, cap, xb)  # [FEAT, R·(xb+2)·cap]
                r2 = None
                # 2D: skip the z column — zero for every real particle, and
                # the far x-column already annihilates dummy pairs
                for c in range(d_dim):
                    xi = it[k * cap : (k + xb) * cap, c : c + 1]  # [xb·cap, 1]
                    d = xi - cand[c : c + 1, :]
                    r2 = d * d if r2 is None else r2 + d * d
                q = jnp.maximum(h2k - r2, 0.0)
                rho = (params.mass * c_p) * jnp.sum(
                    q * q * q, axis=1, keepdims=True
                )  # [xb·cap, 1]
                out_ref[0, pl.ds(start + k * cap, xb * cap), 0:1] = rho
                rhos.append(rho)
            # lane-dim stores must be 128-aligned: assemble the whole
            # group's [2, LANE] (rho, EOS p) block and store once at g·LANE
            rho_g = jnp.concatenate(rhos, axis=0)     # [LANE, 1]
            rp = jnp.concatenate(
                [rho_g, physics.eos_pressure(rho_g, params)], axis=1
            )
            rp_ref[0, 0:2, pl.ds(pl.multiple_of(g * LANE, LANE), LANE)] = (
                jnp.transpose(rp)
            )

        _group_loop(sg, gcount_ref, group)


def _force_kernel(codes_ref, n_ref, nbr_ref, nbrok_ref, gcount_ref, *refs, sg, params):
    """Force pass.  feat strips carry x|v; rho and EOS pressure stream in
    as separate lane-major rp strips (density-kernel output, routed per
    row by the prefetched neighbor-position table nbr_ref)."""
    n_r = len(sg.row_offsets)
    strips, rp_strips = refs[: n_r], refs[n_r : 2 * n_r]
    out_ref = refs[-1]
    center_ref = strips[n_r // 2]
    rp_center = rp_strips[n_r // 2]
    cap = sg.cap
    d_dim = params.dim
    _, c_s, c_v = kernel_constants(d_dim, params.h, params.kernel_norm)
    hk = params.h
    out_ref[...] = jnp.zeros_like(out_ref)

    # program_id must be read at kernel top level (inside the pl.when body
    # it has no interpret-mode binding — the cond body lowers as plain CPU
    # jax where the primitive has no rule)
    i_prog = pl.program_id(0)

    @pl.when(i_prog < n_ref[0])
    def _():
        # Per-strip neighbor-row validity mask, constant per program: a
        # neighbor row dropped by c_rows overflow has REAL feat positions
        # but an unrelated row's rho/p strip aliased in — those pairs must
        # contribute exactly zero force (documented fallback).  Folding the
        # mask into inv_rho_j zeroes both coef_p and coef_v.
        w_c = (sg.xb + 2) * cap
        nbr_mask = jnp.concatenate(
            [
                jnp.broadcast_to(
                    nbrok_ref[s_i, i_prog].astype(out_ref.dtype), (1, w_c)
                )
                for s_i in range(n_r)
            ],
            axis=1,
        )  # [1, R·(xb+2)·cap]

        def group(g):
            it = _self_block(center_ref, g)           # [128, FEAT], once/group
            wins = _group_windows(strips, g)          # R × [FEAT, 384]
            start_l = pl.multiple_of(g * LANE, LANE)
            pT = jnp.transpose(
                rp_center[0, 1:2, pl.ds(start_l, LANE)]
            )                                         # [128, 1] self pressure
            rp_wins = [
                s[0, 0:2, pl.ds(pl.multiple_of((g - 1) * LANE, LANE), 3 * LANE)]
                for s in rp_strips
            ]                                         # R × [2, 384]
            start = pl.multiple_of(g * LANE, 8)
            xb = sg.xb
            for k in range(0, sg.xc, xb):
                cand = _cand_block(wins, k, cap, xb)  # [FEAT, R·(xb+2)·cap]
                cand_rp = _cand_block(rp_wins, k, cap, xb)  # [2, R·(xb+2)·cap]

                def self_col(c, k=k):
                    return it[k * cap : (k + xb) * cap, c : c + 1]

                def cand_col(c, cand=cand):
                    return cand[c : c + 1, :]

                dx = []
                r2 = None
                for c in range(d_dim):
                    dc = self_col(c) - cand_col(c)
                    dx.append(dc)
                    r2 = dc * dc if r2 is None else r2 + dc * dc
                # one rsqrt replaces sqrt + divide (multi-cycle VPU ops);
                # same form as kernels.pair_scales so pallas == grid bitwise
                inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
                t = jnp.maximum(hk - r2 * inv_r, 0.0)
                s = c_s * t * t * inv_r * (r2 > 1e-24)
                inv_rho_j = nbr_mask / jnp.maximum(cand_rp[0:1, :], 1e-12)
                p_i = pT[k * cap : (k + xb) * cap, 0:1]
                coef_p = (
                    (params.mass * 0.5)
                    * (p_i + cand_rp[1:2, :])
                    * inv_rho_j
                    * s
                )
                coef_v = (
                    (params.viscosity * params.mass) * inv_rho_j * (c_v * t)
                )
                for c in range(d_dim):
                    fc = jnp.sum(
                        coef_p * dx[c]
                        + coef_v * (cand_col(3 + c) - self_col(3 + c)),
                        axis=1,
                        keepdims=True,
                    )  # [xb·cap, 1]
                    out_ref[
                        0, pl.ds(start + k * cap, xb * cap), c : c + 1
                    ] = fc

        _group_loop(sg, gcount_ref, group)


# ---------------------------------------------------------------------------
# MXU pair engine: r² via the |xi−xj|² = bi + bj − 2·xi·xj expansion (K=3
# matmul on the systolic array) and force reductions as NT matmuls
# Σⱼ coef·[xj|1] — the VPU stops doing per-component dx math entirely.
#
# fp32 safety: the expansion cancels catastrophically at absolute coords
# (~800² vs r²~1), so both sides are first centered on the candidate
# window (|rel| ≤ ~6 cells ⇒ r² abs error ~1e-2 at bf16x3/fp32 — a
# documented ~1e-4-relative force tolerance vs the exact-dx "vpu" engine).
# Empty-slot dummies stay at 1e18: bj ~ 3e36 < fp32 max, q = t = 0, and
# every coefficient is exactly zero before it meets a 1e18 in a matmul.
# ---------------------------------------------------------------------------

# Measured (bench/probe_mxu2.py): DEFAULT (single bf16 pass) rounds the
# centered coordinates to bf16 — r² abs err ~150 at window scale, unusable;
# HIGHEST keeps r² to ~0.007 abs.  HIGH is not lowered by Mosaic.
MXU_PRECISION = jax.lax.Precision.HIGHEST


def _window_center(sg: SlotGrid, grid, code, g, d_dim):
    """Traced window-center coordinates, ordered like the position
    components in the feat rows (3D: [z(h0), y(h1), x(lanes)])."""
    cell = grid.cell
    xc = sg.xc
    gf = g.astype(jnp.float32)
    # lanes of group g cover halo x-cells [g·xc, (g+1)·xc); halo cell hx is
    # inner cell hx − xc, so the group's x midpoint is lo + ((g+0.5)·xc − xc)·cell
    x_c = grid.lo[-1] + ((gf + 0.5) * xc - xc) * cell
    gy = (code % sg.h1).astype(jnp.float32)
    y_c = grid.lo[-2] + (gy - 0.5) * cell     # halo row gy = inner gy−1
    if d_dim == 2:
        return [y_c, x_c]
    gz = (code // sg.h1).astype(jnp.float32)
    z_c = grid.lo[0] + (gz - 0.5) * cell
    return [z_c, y_c, x_c]


def _centered_self(it, cvec, d_dim):
    """it[:, 0:d] − center → [128, d] (per-component: Mosaic-friendly)."""
    return jnp.concatenate(
        [it[:, c : c + 1] - cvec[c] for c in range(d_dim)], axis=1
    )


def _centered_cand(cand, cvec, d_dim):
    """cand[0:d, :] − center → [d, CAND]."""
    return jnp.concatenate(
        [cand[c : c + 1, :] - cvec[c] for c in range(d_dim)], axis=0
    )


def _mxu_r2(xik, bik, cj, bj):
    """r² block [B, CAND] from centered coords; clamped ≥ 0 (the expansion
    rounds slightly negative for near-coincident pairs — sqrt safety)."""
    dot = jax.lax.dot_general(
        xik, cj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=MXU_PRECISION,
    )
    return jnp.maximum((bik - (dot + dot)) + bj, 0.0)


def _density_kernel_mxu(codes_ref, n_ref, nbr_ref, nbrok_ref, gcount_ref,
                        *refs, sg, params, grid):
    """Density pass, MXU engine.  Same outputs as _density_kernel."""
    strips, out_ref, rp_ref = refs[:-2], refs[-2], refs[-1]
    center_ref = strips[len(strips) // 2]
    cap = sg.cap
    c_p, _, _ = kernel_constants(params.dim, params.h, params.kernel_norm)
    h2k = params.h * params.h
    out_ref[...] = jnp.zeros_like(out_ref)
    rp_ref[...] = jnp.zeros_like(rp_ref)
    d_dim = params.dim
    i_prog = pl.program_id(0)

    @pl.when(i_prog < n_ref[0])
    def _():
        code = codes_ref[i_prog]

        def group(g):
            it = _self_block(center_ref, g)           # [128, FEAT]
            wins = _group_windows(strips, g)          # R × [FEAT, 384]
            cvec = _window_center(sg, grid, code, g, d_dim)
            xi = _centered_self(it, cvec, d_dim)      # [128, d]
            bi = jnp.sum(xi * xi, axis=1, keepdims=True)
            start = pl.multiple_of(g * LANE, 8)
            xb = sg.xb
            rhos = []
            for k in range(0, sg.xc, xb):
                cand = _cand_block(wins, k, cap, xb)  # [FEAT, CAND]
                cj = _centered_cand(cand, cvec, d_dim)
                bj = jnp.sum(cj * cj, axis=0, keepdims=True)
                sl = slice(k * cap, (k + xb) * cap)
                r2 = _mxu_r2(xi[sl, :], bi[sl, :], cj, bj)
                q = jnp.maximum(h2k - r2, 0.0)
                rho = (params.mass * c_p) * jnp.sum(
                    q * q * q, axis=1, keepdims=True
                )
                out_ref[0, pl.ds(start + k * cap, xb * cap), 0:1] = rho
                rhos.append(rho)
            rho_g = jnp.concatenate(rhos, axis=0)     # [LANE, 1]
            rp = jnp.concatenate(
                [rho_g, physics.eos_pressure(rho_g, params)], axis=1
            )
            rp_ref[0, 0:2, pl.ds(pl.multiple_of(g * LANE, LANE), LANE)] = (
                jnp.transpose(rp)
            )

        _group_loop(sg, gcount_ref, group)


def _force_kernel_mxu(codes_ref, n_ref, nbr_ref, nbrok_ref, gcount_ref,
                      *refs, sg, params, grid):
    """Force pass, MXU engine.

    Pair force Σⱼ coef_p·(xi−xj) + coef_v·(vj−vi) splits into rank-1 and
    matmul terms:  (Σcoef_p)·xi − Σcoef_p·xj  +  Σcoef_v·vj − (Σcoef_v)·vi,
    so each coef matrix reduces through ONE NT matmul against [feat | 1]."""
    n_r = len(sg.row_offsets)
    strips, rp_strips = refs[:n_r], refs[n_r : 2 * n_r]
    out_ref = refs[-1]
    center_ref = strips[n_r // 2]
    rp_center = rp_strips[n_r // 2]
    cap = sg.cap
    d_dim = params.dim
    _, c_s, c_v = kernel_constants(d_dim, params.h, params.kernel_norm)
    hk = params.h
    out_ref[...] = jnp.zeros_like(out_ref)
    i_prog = pl.program_id(0)

    @pl.when(i_prog < n_ref[0])
    def _():
        code = codes_ref[i_prog]
        w_c = (sg.xb + 2) * cap
        nbr_mask = jnp.concatenate(
            [
                jnp.broadcast_to(
                    nbrok_ref[s_i, i_prog].astype(out_ref.dtype), (1, w_c)
                )
                for s_i in range(n_r)
            ],
            axis=1,
        )  # [1, R·(xb+2)·cap] — see _force_kernel

        def group(g):
            it = _self_block(center_ref, g)           # [128, FEAT]
            wins = _group_windows(strips, g)
            cvec = _window_center(sg, grid, code, g, d_dim)
            xi = _centered_self(it, cvec, d_dim)      # [128, d]
            start_l = pl.multiple_of(g * LANE, LANE)
            pT = jnp.transpose(
                rp_center[0, 1:2, pl.ds(start_l, LANE)]
            )                                         # [128, 1] self pressure
            rp_wins = [
                s[0, 0:2, pl.ds(pl.multiple_of((g - 1) * LANE, LANE), 3 * LANE)]
                for s in rp_strips
            ]
            bi = jnp.sum(xi * xi, axis=1, keepdims=True)
            start = pl.multiple_of(g * LANE, 8)
            xb = sg.xb
            for k in range(0, sg.xc, xb):
                cand = _cand_block(wins, k, cap, xb)  # [FEAT, CAND]
                cand_rp = _cand_block(rp_wins, k, cap, xb)  # [2, CAND]
                cj = _centered_cand(cand, cvec, d_dim)
                bj = jnp.sum(cj * cj, axis=0, keepdims=True)
                sl = slice(k * cap, (k + xb) * cap)
                r2 = _mxu_r2(xi[sl, :], bi[sl, :], cj, bj)
                inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
                r = r2 * inv_r
                t = jnp.maximum(hk - r, 0.0)
                # s(r)=c_s t²/r, exactly zero at r→0 (self/coincident pairs)
                s = c_s * t * t * inv_r * (r2 > 1e-24)
                inv_rho_j = nbr_mask / jnp.maximum(cand_rp[0:1, :], 1e-12)
                p_i = pT[sl, 0:1]
                coef_p = (
                    (params.mass * 0.5)
                    * (p_i + cand_rp[1:2, :])
                    * (inv_rho_j * s)
                )
                coef_v = (params.viscosity * params.mass * c_v) * (
                    inv_rho_j * t
                )
                ones = jnp.ones((1, cj.shape[1]), cj.dtype)
                a_p = jnp.concatenate([cj, ones], axis=0)  # [d+1, CAND]
                a_v = jnp.concatenate(
                    [cand[3 : 3 + d_dim, :], ones], axis=0
                )
                m_p = jax.lax.dot_general(
                    coef_p, a_p, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MXU_PRECISION,
                )  # [B, d+1]: Σcoef_p·xj_rel | Σcoef_p
                m_v = jax.lax.dot_general(
                    coef_v, a_v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MXU_PRECISION,
                )  # [B, d+1]: Σcoef_v·vj | Σcoef_v
                vi = it[sl, 3 : 3 + d_dim]
                f = (
                    m_p[:, d_dim : d_dim + 1] * xi[sl, :]
                    - m_p[:, 0:d_dim]
                    + m_v[:, 0:d_dim]
                    - m_v[:, d_dim : d_dim + 1] * vi
                )
                out_ref[0, pl.ds(start + k * cap, xb * cap), 0:d_dim] = f

        _group_loop(sg, gcount_ref, group)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _specs(sg: SlotGrid):
    """Block specs: group counts (SMEM), feat strips, rho/p strips."""
    h1 = sg.h1

    def center_map(i, codes, n, nbrs, nbrok):
        r = codes[i]
        return r // h1, r % h1, 0, 0

    gcount_spec = pl.BlockSpec(
        (1, 1, 1, sg.n_groups), center_map, memory_space=pltpu.SMEM
    )

    def strip_map_factory(dz, dy):
        def strip_map(i, codes, n, nbrs, nbrok):
            r = codes[i]
            return r // h1 + dz, r % h1 + dy, 0, 0

        return strip_map

    strip_specs = [
        pl.BlockSpec(
            (1, 1, FEAT, sg.lanes),
            strip_map_factory(dz, dy),
            memory_space=pltpu.VMEM,
        )
        for dz, dy in sg.row_offsets
    ]

    def rp_map_factory(s):
        def rp_map(i, codes, n, nbrs, nbrok):
            return nbrs[s, i], 0, 0

        return rp_map

    rp_specs = [
        pl.BlockSpec(
            (1, 2, sg.lanes), rp_map_factory(s), memory_space=pltpu.VMEM
        )
        for s in range(len(sg.row_offsets))
    ]
    return gcount_spec, strip_specs, rp_specs


def _prefetch_args(addr: SlotAddr):
    return addr.row_codes, addr.n_occ, addr.nbr_pos, addr.nbr_ok


def _call_density(feat, addr: SlotAddr, sg, params, grid):
    """→ (rho_slot [c_rows, lanes, 1], rp_slot [c_rows, 2, lanes])."""
    gcount_spec, strip_specs, _ = _specs(sg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(sg.c_rows,),
        in_specs=[gcount_spec] + strip_specs,
        out_specs=[
            pl.BlockSpec(
                (1, sg.lanes, 1),
                lambda i, codes, n, nbrs, nbrok: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, sg.lanes),
                lambda i, codes, n, nbrs, nbrok: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    if sg.engine == "mxu":
        kern = functools.partial(
            _density_kernel_mxu, sg=sg, params=params, grid=grid
        )
    else:
        kern = functools.partial(_density_kernel, sg=sg, params=params)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((sg.c_rows, sg.lanes, 1), feat.dtype),
            jax.ShapeDtypeStruct((sg.c_rows, 2, sg.lanes), feat.dtype),
        ],
        interpret=_interpret(),
    )(
        *_prefetch_args(addr),
        addr.gcounts,
        *([feat] * len(strip_specs)),
    )


def _call_force(feat, rp, addr: SlotAddr, sg, params, grid):
    """→ f_slot [c_rows, lanes, FOUT]."""
    gcount_spec, strip_specs, rp_specs = _specs(sg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(sg.c_rows,),
        in_specs=[gcount_spec] + strip_specs + rp_specs,
        out_specs=pl.BlockSpec(
            (1, sg.lanes, FOUT),
            lambda i, codes, n, nbrs, nbrok: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    if sg.engine == "mxu":
        kern = functools.partial(
            _force_kernel_mxu, sg=sg, params=params, grid=grid
        )
    else:
        kern = functools.partial(_force_kernel, sg=sg, params=params)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (sg.c_rows, sg.lanes, FOUT), feat.dtype
        ),
        interpret=_interpret(),
    )(
        *_prefetch_args(addr),
        addr.gcounts,
        *([feat] * len(strip_specs)),
        *([rp] * len(rp_specs)),
    )


# ---------------------------------------------------------------------------
# Full fused pass: density → EOS → forces
# ---------------------------------------------------------------------------


def pallas_rho_p_f(
    x,
    v,
    active,
    params: SimParams,
    grid: GridSpec,
    c_rows: int | None = None,
    xb_cells: int = 4,
    engine: str = "vpu",
    addr: SlotAddr | None = None,
):
    """Drop-in replacement for neighbors.grid_rho_p_f, Pallas-fused.

    `addr` (a SlotAddr from build_addr) reuses a neighbor structure built
    at an earlier step — valid while every particle has moved < skin/2
    since it was built (GridSpec.for_scene skin; step.make_advance
    sort_every)."""
    rho, p, f, _ = _rho_p_f_impl(
        x, v, active, params, grid, c_rows, xb_cells, cache=None,
        engine=engine, addr=addr,
    )
    return rho, p, f


def pallas_rho_p_f_cached(
    x,
    v,
    active,
    params: SimParams,
    grid: GridSpec,
    cache,
    c_rows: int | None = None,
    xb_cells: int = 4,
    engine: str = "vpu",
):
    """Like pallas_rho_p_f, but reuses the persistent slot cache (park +
    rewrite instead of full-grid re-init).  Returns (rho, p, f, new_cache);
    bitwise identical to the uncached path."""
    return _rho_p_f_impl(
        x, v, active, params, grid, c_rows, xb_cells, cache=cache,
        engine=engine,
    )


def _rho_p_f_impl(
    x, v, active, params, grid, c_rows, xb_cells, cache, engine="vpu",
    addr=None,
):
    n, d = x.shape
    sg = slot_grid(grid, c_rows, xb_cells, engine=engine)

    if addr is None:
        addr = build_addr(x, active, grid, sg)

    rows = _pack_rows6(x, v)
    if cache is None:
        feat = scatter_slots(addr, rows, sg)
        idx = None
    else:
        feat, idx = scatter_slots_cached(cache[0], cache[1], addr, rows, sg)
    rho_slot, rp_slot = _call_density(feat, addr, sg, params, grid)
    # forces consume rho + EOS p straight from rp_slot (kernel-side EOS) —
    # the per-particle gather below is only for the State output and runs
    # OFF the kernel critical path
    f_slot = _call_force(feat, rp_slot, addr, sg, params, grid)

    ok = addr.valid & (addr.row_pos < sg.c_rows)
    # single flat index vector: multi-coordinate advanced indexing lowers to
    # a much slower gather on TPU than one flattened row gather
    flat_idx = (
        jnp.minimum(addr.row_pos, sg.c_rows - 1) * sg.lanes + addr.pos
    )
    rho = rho_slot.reshape(-1)[flat_idx]
    rho = jnp.where(ok, rho, params.rest_density)
    p = physics.eos_pressure(rho, params)

    # fully-1D flatten: reshape(-1, FOUT) would force a relayout whose
    # 4-lane minor dim pads 32x (9+ GB of padding at 1M — an HBM OOM)
    f_flat = f_slot.reshape(-1)
    f = jnp.stack(
        [f_flat[flat_idx * FOUT + c] for c in range(d)], axis=1
    )
    f = jnp.where(ok[:, None], f, 0.0)
    new_cache = None if cache is None else (feat, idx)
    return rho, p, f, new_cache


def pallas_density(x, active, params: SimParams, grid: GridSpec,
                   engine: str = "vpu", ci_offset=None):
    """Density-only phase (split API for the halo-exchange step, mirroring
    neighbors.grid_density — sph_tpu/decomp.py re-imports ghost rho/p
    between phases).  `ci_offset` shifts the cell lattice per device for
    slab-local grids (see neighbors.cell_index); the mxu engine derives
    window centers from grid.lo and is incompatible with a shifted lattice."""
    if engine == "mxu" and ci_offset is not None:
        raise ValueError("ci_offset requires engine='vpu'")
    n, _ = x.shape
    sg = slot_grid(grid, engine=engine)
    addr = build_addr(x, active, grid, sg, ci_offset)
    feat = scatter_slots(addr, _pack_rows6(x, jnp.zeros_like(x)), sg)
    rho_slot, _ = _call_density(feat, addr, sg, params, grid)
    ok = addr.valid & (addr.row_pos < sg.c_rows)
    flat_idx = jnp.minimum(addr.row_pos, sg.c_rows - 1) * sg.lanes + addr.pos
    rho = rho_slot.reshape(-1)[flat_idx]
    return jnp.where(ok, rho, params.rest_density)


def scatter_rp(addr: SlotAddr, rho, p, sg: SlotGrid):
    """Scatter EXTERNAL per-particle rho/p (e.g. halo-exchanged ghost
    values, decomp.py) into the [c_rows, 2, lanes] rp-slot layout the
    force kernel streams."""
    ok = addr.valid & (addr.row_pos < sg.c_rows)
    size = sg.c_rows * 2 * sg.lanes
    base = jnp.where(ok, addr.row_pos * 2 * sg.lanes + addr.pos, size)
    idx2 = base[:, None] + jnp.array([0, 1], jnp.int32)[None, :] * sg.lanes
    rp = jnp.stack([rho, p], axis=1)
    flat = jnp.zeros((size,), rho.dtype).at[idx2].set(rp, mode="drop")
    return flat.reshape(sg.c_rows, 2, sg.lanes)


def pallas_forces(x, v, rho, p, active, params: SimParams, grid: GridSpec,
                  engine: str = "vpu", ci_offset=None):
    """Force-only phase given rho/p (split API, see pallas_density)."""
    if engine == "mxu" and ci_offset is not None:
        raise ValueError("ci_offset requires engine='vpu'")
    n, d = x.shape
    sg = slot_grid(grid, engine=engine)
    addr = build_addr(x, active, grid, sg, ci_offset)
    feat = scatter_slots(addr, _pack_rows6(x, v), sg)
    rp = scatter_rp(addr, rho, p, sg)
    f_slot = _call_force(feat, rp, addr, sg, params, grid)
    ok = addr.valid & (addr.row_pos < sg.c_rows)
    flat_idx = jnp.minimum(addr.row_pos, sg.c_rows - 1) * sg.lanes + addr.pos
    f_flat = f_slot.reshape(-1)
    f = jnp.stack([f_flat[flat_idx * FOUT + c] for c in range(d)], axis=1)
    return jnp.where(ok[:, None], f, 0.0)
