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
slices), and only cell batches inside a group are statically unrolled.

Layout (round-2 redesign — everything lives in COMPACTED ROW space):

  1. Row compaction FIRST: only occupied (z, y) rows exist in memory.
     Occupied rows take compacted positions 1..n_occ; **position 0 is a
     reserved always-empty DUMMY row** (far-away dummy positions, rho 0).
     Every neighbor-row lookup that misses (row unoccupied, outside the
     grid, or dropped by the c_rows cap) routes to row 0, whose dummy
     features annihilate every pair term (W(r) = 0, s(r) = 0) — no
     validity masks anywhere in the kernels.  (Round 1 kept full-grid
     haloed feat arrays + an nbr_ok mask; the compacted layout is ~2.4×
     smaller at 1M — 285 MB vs 696 MB — and structurally cannot produce
     the ADVICE-r1 aliased-row garbage forces.)
  2. XLA side: one scatter packs per-particle features [x | v] into
     feat[c_rows, F, lanes]: feature axis on sublanes, (x-cell · cap) on
     lanes, with a one-group x halo on each side of the lane axis so every
     candidate window is in-bounds and wrap-free.
  3. Kernels fetch the 3^(D-1) neighbor row strips of *their* row through
     a scalar-prefetched row table (PrefetchScalarGridSpec index maps) —
     the same routing for feat strips and (rho, p) strips.
  4. Kernel: fori_loop over the row's lane groups with per-group occupancy
     skip; inside, a statically-unrolled cell batch (xb cells per vector
     op — union candidate windows; extras annihilate by compact support),
     each a dense [xb·cap (i-sublanes) × 3^(D-1)·(xb+2)·cap (j-lanes)]
     pair block on the VPU with fixed accumulation order.
  5. Density pass → force pass, chained WITHOUT a per-particle round trip:
     the density kernel computes the EOS in-kernel and emits lane-major
     (rho, p) rows [c_rows, 2, lanes] which the force kernel streams as
     neighbor strips.  The force kernel emits lane-major forces
     [c_rows, FOUT, lanes].  Per-particle values are element-gathered from
     these slot arrays only where a State is materialized — once per step
     on the classic path, once per `sort_every` block on the slot-resident
     path (step.make_advance).

Capacity semantics: rank >= cap drops out of the tiles (documented static
cap; overflowed particles fall back to rest density / zero pair force);
row-compaction capacity c_rows is likewise a documented static cap (dropped
rows' particles leave pair physics entirely); `slot_overflow` reports both
(debug/watchdog hook, SURVEY.md §5.2).

Engines: round 1 also carried an MXU pair engine (r² via the
|xi−xj|² = bi+bj−2·xi·xj expansion as K=3 matmuls).  Measured 15-25% SLOWER
in situ than the VPU engine at dam3d_100k — Mosaic's only accurate dot
precision (HIGHEST = 6 bf16 passes) costs more than the VPU ops it
replaces — and removed in the round-2 layout migration (ROADMAP.md dead
ends; code in git history).
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

FEAT = 8  # packed feature columns: x(3) | v(3) | movable | spare
FOUT = 4  # force output components: f(3) | pad
LANE = 128


def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests run the same kernel logic)."""
    return jax.default_backend() != "tpu"


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclass(frozen=True)
class SlotGrid:
    """Static slot-grid geometry derived from a GridSpec.

    Rows = compacted occupied (z, y) rows (c_rows incl. the dummy row 0);
    lanes = (x-cell · cap), padded so that lanes are 128-aligned groups of
    XC = 128/cap cells with a one-group halo on each side.
    """

    inner: tuple[int, ...]   # GridSpec.shape
    cap: int                 # SLOT-cell capacity (= GridSpec.cap / xsub);
    #                          must divide 128
    c_rows: int              # compacted-row capacity incl. dummy row 0
    xb_cells: int = 4        # slot-cells batched per vector op (clipped to xc)
    cell: float = 0.0        # FULL cell edge length (= GridSpec.cell); the
    #                          bf16 kernels need it to fold static
    #                          cell-center offsets back into the relative
    #                          features (x axis uses cell/xsub)
    xsub: int = 1            # x-cells split into xsub slot-cells each (see
    #                          GridSpec.xsub); candidate margin = xsub slots
    #                          = exactly one full cell, same support/skin
    #                          guarantee as xsub=1
    batch_skip: bool = False  # per-xb-batch i-occupancy skip (round 4):
    #                          lax.cond the batch's pair math on "any real
    #                          i-particle in these xb·cap lanes" (background
    #                          slots sit at 1e18).  Exactness contract: a
    #                          skipped batch contains ONLY background lanes,
    #                          which are never gathered back to particles
    #                          (and whose rho/p the force kernel never uses:
    #                          far pairs zero s/t) — so per-PARTICLE outputs
    #                          are bitwise-identical, while the raw slot
    #                          arrays may differ on those phantom lanes (two
    #                          coincident 1e18 sentinels give d=0, q=h²>0 →
    #                          the non-skip path writes garbage rho there;
    #                          the skip writes 0).  Do NOT diff/checksum raw
    #                          slot arrays across this knob.  Pays on
    #                          FRAGMENTED rows (emitter jets: 0.76 µs per
    #                          particle vs the splash's 0.068 — see ROADMAP
    #                          round-5 queue 1); measured a wash on dense
    #                          dams in round 2, so it is enabled per scene
    #                          (emitter scenes, fp32 only — bf16 features
    #                          are cell-relative so the 1e18 test fails).
    row_pair: bool = False   # 2 compacted rows per kernel program (ROADMAP
    #                          round-3 queue 1): halves the program count +
    #                          per-program preamble; strip DMA volume is
    #                          unchanged (compacted rows are not spatially
    #                          adjacent, so the two rows' strip sets don't
    #                          merge).  c_rows is padded even.
    packed: bool = False     # PACKED-ROW layout (round 5, the sparse-scene
    #                          mode): each compacted row's particles occupy
    #                          lanes 0..count-1 contiguously (pos = within-
    #                          row rank) instead of per-cell cap slots, and
    #                          the kernels pair each 128-lane i-group
    #                          against the neighbor rows' occupied blocks
    #                          (compact support annihilates far-x pairs
    #                          branchlessly, so no x windowing is needed).
    #                          Work scales with ceil(count/128) per row
    #                          instead of occupied-x-span — measured-model
    #                          0.34× the slot work at the settled emitters3d
    #                          (mean cell occupancy 2.16) and 2.5× WORSE at
    #                          the dense 1M splash: a scene-gated mode.
    row_lanes: int = 0       # packed: static per-row particle capacity
    #                          (multiple of 128); overflow is audited like
    #                          the cell cap.

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
    def h0(self) -> int:     # z rows incl. halo (1 for 2D)
        return self.inner[0] + 2 if self.dim == 3 else 1

    @property
    def h1(self) -> int:     # y rows incl. halo
        return self.inner[-2] + 2
    @property
    def h2(self) -> int:     # x SLOT-cells per row incl. one-group halos
        return _round_up(self.inner[-1] * self.xsub, self.xc) + 2 * self.xc

    @property
    def n_groups(self) -> int:
        if self.packed:
            return self.row_lanes // LANE
        return self.h2 // self.xc

    @property
    def lanes(self) -> int:
        if self.packed:
            return self.row_lanes
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
    row_pair: bool = False,
    batch_skip: bool = False,
) -> SlotGrid:
    if grid.cap % grid.xsub != 0:
        raise ValueError(
            f"cap {grid.cap} must be divisible by xsub {grid.xsub}"
        )
    cap_slot = grid.cap // grid.xsub
    if LANE % cap_slot != 0:
        raise ValueError(
            f"pallas path needs slot cap | 128, got {cap_slot} "
            f"(cap {grid.cap} / xsub {grid.xsub})"
        )
    dim = len(grid.shape)
    inner_rows = (grid.shape[0] + 2 if dim == 3 else 1) * (grid.shape[-2] + 2)
    if c_rows is None:
        # always-correct when the row space is small; else a documented cap
        c_rows = inner_rows if inner_rows <= 4096 else 4096
    c_rows = min(c_rows, inner_rows) + 1  # +1: reserved dummy row 0
    if row_pair and c_rows % 2:
        c_rows += 1  # pad even: the last program's second row is a skip
    return SlotGrid(
        inner=grid.shape,
        cap=cap_slot,
        c_rows=c_rows,
        xb_cells=xb_cells,
        cell=grid.cell,
        xsub=grid.xsub,
        batch_skip=batch_skip,
        row_pair=row_pair,
    )


def packed_grid(
    grid: GridSpec, row_lanes: int | None = None, c_rows: int | None = None
) -> SlotGrid:
    """Packed-row SlotGrid (see SlotGrid.packed) — the sparse-scene kernel
    layout.  `row_lanes` is the static per-row particle capacity (rounded
    up to 128); the default sizes it at half a full row of the slot cap
    (generous for the sparse scenes the mode is for — emitters3d's settled
    worst row holds 148 particles vs the preset's default of 384) and
    overflow is audited exactly like the cell cap."""
    if grid.xsub != 1:
        raise ValueError("packed rows do not compose with xsub")
    dim = len(grid.shape)
    if row_lanes is None:
        row_lanes = max(256, grid.cap * grid.shape[-1] // 2)
    row_lanes = _round_up(row_lanes, LANE)
    inner_rows = (grid.shape[0] + 2 if dim == 3 else 1) * (grid.shape[-2] + 2)
    if c_rows is None:
        c_rows = inner_rows if inner_rows <= 4096 else 4096
    c_rows = min(c_rows, inner_rows) + 1  # +1: reserved dummy row 0
    return SlotGrid(
        inner=grid.shape,
        cap=grid.cap,     # kept for GridSpec parity/audit surfaces only
        c_rows=c_rows,
        cell=grid.cell,
        packed=True,
        row_lanes=row_lanes,
    )


# ---------------------------------------------------------------------------
# XLA side: slot addressing, row compaction, scatters
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
    """[N, 6] scatter rows: x(3) | v(3) (2D pads the third component)."""
    n, d = x.shape
    return jnp.concatenate(
        [
            x,
            jnp.zeros((n, 3 - d), x.dtype),
            v,
            jnp.zeros((n, 3 - d), v.dtype),
        ],
        axis=1,
    )


def _rel_rows(x, v, addr: "SlotAddr"):
    """bf16 feature rows: positions CELL-RELATIVE (x − the center of the
    cell the ADDR binned the particle into), velocities absolute, both
    rounded to bfloat16 (precision="bf16").

    Cell-relative keeps |stored x| ≤ ~1.5·cell so bf16's 8-bit mantissa
    yields ~0.4% of a cell of position error instead of being meaningless
    at domain scale; the kernels rebuild absolute pair distances from the
    STATIC inter-cell offsets (cells are a known lattice — see
    _bf16_offsets).  The reference frame is `addr.center` — the BUILD-TIME
    cell assignment — because under `sort_every` reuse the slot's lane
    still encodes that cell even after the particle drifts across a cell
    edge; using the current cell would silently shift the pair distances
    by whole cells."""
    return _pack_rows6(x - addr.center, v).astype(jnp.bfloat16)


def _bf16_offsets(sg: SlotGrid, d: int, cell: float):
    """Static center-offset tensors for the bf16 cell-relative kernels.

    Returns (ioff [LANE, FEAT], joffs {k: [FEAT, R·(xb+2)·cap]}), fp32:
    ioff folds each i-particle's cell center into its upcast self block
    (x lane axis only; i's own row is the y/z origin), joffs[k] folds
    each candidate's center into the upcast candidate block (x from the
    lane layout, y/z from the strip's static (dz, dy)).  After both folds,
    xi' − xj' is the absolute pair distance, so the pair math is unchanged
    — the folds are one [128, FEAT] add per group plus one [FEAT, W] add
    per candidate block (~2% extra issue vs the ~15 ops/pair main loop).

    Built from broadcasted_iota INSIDE the kernel trace (pallas_call
    rejects captured array constants; iota + selects lower fine and run
    once per program, outside the group loop)."""
    cap, xb, xm = sg.cap, sg.xb, sg.xsub
    w_seg = (xb + 2 * xm) * cap
    n_r = len(sg.row_offsets)
    cf = jnp.float32(cell)                   # full cell (y/z rows)
    cfx = jnp.float32(cell / xm)             # slot-cell width (x lane axis)

    sub = jax.lax.broadcasted_iota(jnp.int32, (LANE, FEAT), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (LANE, FEAT), 1)
    ioff = jnp.where(col == d - 1, (sub // cap).astype(jnp.float32) * cfx, 0.0)

    w = n_r * w_seg
    row = jax.lax.broadcasted_iota(jnp.int32, (FEAT, w), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (FEAT, w), 1)
    strip = lane // w_seg
    if d == 3:
        dz = strip // 3 - 1
        dy = strip % 3 - 1
    else:
        dz = jnp.zeros_like(strip)
        dy = strip - 1
    joffs = {}
    for k in range(0, sg.xc, xb):
        xoff = ((lane % w_seg) // cap + (k - xm)).astype(jnp.float32) * cfx
        j = jnp.where(row == d - 1, xoff, 0.0)
        j = jnp.where(row == d - 2, dy.astype(jnp.float32) * cf, j)
        if d == 3:
            j = jnp.where(row == 0, dz.astype(jnp.float32) * cf, j)
        joffs[k] = j
    return ioff, joffs


@dataclass(frozen=True)
class SlotAddr:
    """Per-particle slot addressing + row compaction, built once per step
    (or once per `sort_every` block — positions may go stale by up to
    skin/2, see GridSpec.for_scene)."""

    pos: jax.Array        # [N] lane position hx·cap + rank
    valid: jax.Array      # [N] in a real cell and within cap
    row_pos: jax.Array    # [N] compacted row of the particle's (z, y) row;
    #   0 (= the dummy row) iff the row was dropped by the c_rows cap —
    #   treat as invalid
    gcounts: jax.Array    # [c_rows, 1, n_groups] i32 per-group occupancy
    n_occ: jax.Array      # [1] i32 number of real compacted rows
    nbr_pos: jax.Array    # [R, c_rows] i32 compacted position of each
    #   neighbor row; 0 (dummy) when the neighbor row is unoccupied,
    #   outside the grid, or dropped — its dummy features annihilate
    #   every pair term, so the kernels need no validity masks
    overflow: jax.Array   # [] i32 particles dropped by the static caps AT
    #   BUILD TIME (cell cap + row cap) — the block-resident advance
    #   accumulates this across rebuilds so a mid-run compression spike
    #   cannot drop physics silently (final-state audits would miss it)
    row_code: jax.Array   # [c_rows] i32 halo (z, y) row code of each
    #   compacted row (entry 0 = dummy); lets slot-space consumers recover
    #   absolute cell centers (precision="bf16" cell-relative features)
    center: jax.Array     # [N, D] fp32 center of the cell each particle was
    #   binned into at build time — the bf16 cell-relative reference frame
    #   (fixed for the whole reuse window, like the slot assignment itself)


# all-array dataclass → registered pytree, so a SlotAddr can ride a
# lax.scan carry / lax.cond operand (the auto-rebuild resident advance
# carries the live addressing across block boundaries)
jax.tree_util.register_dataclass(
    SlotAddr,
    data_fields=[
        "pos", "valid", "row_pos", "gcounts", "n_occ", "nbr_pos",
        "overflow", "row_code", "center",
    ],
    meta_fields=[],
)


def build_addr(x, active, grid: GridSpec, sg: SlotGrid, ci_offset=None) -> SlotAddr:
    n, _ = x.shape
    ci, flat = cell_index(x, active, grid, ci_offset)
    in_cell = flat < grid.n_cells
    h0 = (ci[:, 0] + 1) if sg.dim == 3 else jnp.zeros((n,), jnp.int32)
    h1 = ci[:, -2] + 1
    if sg.packed:
        # packed-row layout: pos = within-(z,y)-row rank (stable), no cell
        # slots; a row's particles fill lanes 0..count-1 contiguously so
        # per-group occupancy is a prefix (the kernels skip whole empty
        # 128-blocks via jblocks, see _density_kernel_packed)
        code_p = h0 * sg.h1 + h1
        n_codes_p = sg.h0 * sg.h1
        rank, _ = cell_ranks(
            jnp.where(in_cell, code_p, n_codes_p), n_codes_p + 1
        )
        valid = in_cell & (rank < sg.lanes)
        pos = rank
        gx = jnp.minimum(rank, sg.lanes - 1) // LANE
        sx = ci[:, -1]  # unused for addressing; keeps `center` shared below
    elif sg.xsub == 1:
        sx = ci[:, -1]
    else:
        # finer x binning: slot-cell index on the xsub-subdivided lattice,
        # clamped into the full cell ci assigned (so fp rounding between
        # the two floor computations can never split row/lane binning)
        cell_x = grid.cell / sg.xsub
        sxf = jnp.floor((x[:, -1] - grid.lo[-1]) / cell_x).astype(jnp.int32)
        if ci_offset is not None:
            sxf = sxf - ci_offset[-1] * sg.xsub
        base_sx = ci[:, -1] * sg.xsub
        sx = jnp.clip(sxf, base_sx, base_sx + sg.xsub - 1)
    if not sg.packed:
        hx = sx + sg.xc                        # one-group x halo
        n_hrows = sg.h0 * sg.h1 * sg.h2
        hrow = (h0 * sg.h1 + h1) * sg.h2 + hx
        hrow = jnp.where(in_cell, hrow, n_hrows)
        rank, _ = cell_ranks(hrow, n_hrows + 1)
        valid = in_cell & (rank < sg.cap)
        pos = hx * sg.cap + rank
        gx = hx // sg.xc

    code = h0 * sg.h1 + h1                     # (z, y) row code, interior
    n_codes = sg.h0 * sg.h1
    row_occ = (
        jnp.zeros((n_codes,), jnp.int32)
        .at[jnp.where(valid, code, n_codes)]
        .add(1, mode="drop")
    ) > 0
    usable = sg.c_rows - 1                     # row 0 is the dummy
    n_occ = jnp.minimum(jnp.sum(row_occ.astype(jnp.int32)), usable)[None]
    row_codes = jnp.nonzero(row_occ, size=usable, fill_value=0)[0].astype(
        jnp.int32
    )
    in_range = jnp.arange(usable, dtype=jnp.int32) < n_occ[0]
    # row_inv: code -> compacted position (1..n_occ); 0 = dummy for
    # unoccupied/dropped rows.  Pad entries write position 0 to a spare
    # dump slot so they cannot clobber a real code.
    targets = jnp.where(in_range, row_codes, n_codes)
    row_inv = (
        jnp.zeros((n_codes + 1,), jnp.int32)
        .at[targets]
        .set(
            jnp.where(
                in_range, 1 + jnp.arange(usable, dtype=jnp.int32), 0
            )
        )
    )
    row_pos = row_inv[code]                    # 0 iff dropped by c_rows cap
    ok = valid & (row_pos > 0)
    overflow = jnp.sum(((~valid) & in_cell).astype(jnp.int32)) + jnp.sum(
        (valid & (row_pos == 0)).astype(jnp.int32)
    )

    gcounts = (
        jnp.zeros((sg.c_rows * sg.n_groups,), jnp.int32)
        .at[jnp.where(ok, row_pos * sg.n_groups + gx, 0)]
        .add(jnp.where(ok, 1, 0), mode="drop")
        .reshape(sg.c_rows, 1, sg.n_groups)
    )

    # Neighbor table in compacted space.  Occupied codes are interior
    # (real cells map to halo coords 1..H-2), so code + dz·H1 + dy stays in
    # [0, n_codes) for real rows; the dummy/pad entries use a safe interior
    # code so the lookup index stays in range (their programs skip compute
    # via zero gcounts, and whatever row their strips alias is read-only).
    # [R, c_rows]: R-major so SMEM's pad-minor-dim-to-128 hits the long
    # axis (the [c_rows, R] orientation padded R 9→128 = SMEM OOM at 100k).
    safe_code = jnp.int32(sg.h1 + 1 if sg.dim == 3 else 1)
    codes_ext = jnp.concatenate(
        [safe_code[None], jnp.where(in_range, row_codes, safe_code)]
    )  # [c_rows] code of each compacted position (0 = dummy -> safe)
    offs = jnp.array(
        [dz * sg.h1 + dy for dz, dy in sg.row_offsets], jnp.int32
    )
    nbr_idx = jnp.clip(codes_ext[None, :] + offs[:, None], 0, n_codes)
    nbr_pos = row_inv[nbr_idx]
    # the dummy row's own strips must stay the dummy row (its program is
    # skipped, but keep the invariant tight)
    nbr_pos = nbr_pos.at[:, 0].set(0)
    ci_glob = ci if ci_offset is None else ci + ci_offset[None, :]
    center = jnp.asarray(grid.lo, x.dtype) + (
        ci_glob.astype(x.dtype) + 0.5
    ) * jnp.asarray(grid.cell, x.dtype)
    if sg.xsub > 1:
        # x reference = the SLOT-cell center (matches the lane binning)
        sx_glob = sx if ci_offset is None else sx + ci_offset[-1] * sg.xsub
        cx = jnp.asarray(grid.lo[-1], x.dtype) + (
            sx_glob.astype(x.dtype) + 0.5
        ) * jnp.asarray(grid.cell / sg.xsub, x.dtype)
        center = jnp.concatenate([center[:, :-1], cx[:, None]], axis=1)
    return SlotAddr(
        pos=pos,
        valid=valid,
        row_pos=row_pos,
        gcounts=gcounts,
        n_occ=n_occ.astype(jnp.int32),
        nbr_pos=nbr_pos,
        overflow=overflow,
        row_code=codes_ext,
        center=center,
    )


def _flat_slot_idx(addr: SlotAddr, sg: SlotGrid, ncols: int):
    """[N, ncols] flat element indices of each particle's feature slots in
    the flattened feat array (out of bounds for dropped particles, so a
    mode='drop' scatter skips them — including the dummy row 0).

    Scatters/gathers with a SINGLE flat index vector lower to the fast TPU
    path; multi-coordinate advanced indexing (three index vectors) lowers
    to a per-element loop — measured 95 ms vs a few ms at 1M."""
    ok = addr.valid & (addr.row_pos > 0)
    size = sg.c_rows * FEAT * sg.lanes
    base = jnp.where(
        ok, addr.row_pos * (FEAT * sg.lanes) + addr.pos, size
    )
    return base[:, None] + (
        jnp.arange(ncols, dtype=jnp.int32) * sg.lanes
    )[None, :]


def _init_row(dtype):
    """Empty-slot feature row: far-away dummy position, zeros elsewhere.
    The optimization_barrier stops XLA constant-folding broadcasts of it
    into slot-grid-sized literals (remote-compile blowup at large grids)."""
    return jax.lax.optimization_barrier(
        jnp.array([1e18, 1e18, 1e18, 0, 0, 0, 0, 0], dtype)
    )


def _stage_transpose_kernel(s_ref, o_ref):
    o_ref[0] = jnp.transpose(s_ref[0])


def _stage_to_feat(stag, sg: SlotGrid):
    """[c_rows·lanes, FEAT] feature-minor staging → [c_rows, FEAT, lanes]
    kernel layout, one Pallas program per compacted row (an XLA swapaxes
    on the minor-dim-8 staging array measured ~40 ms SLOWER than the
    direct scatter at 1M — Mosaic's in-VMEM tile transpose is the fast
    path for this shape)."""
    stag3 = stag.reshape(sg.c_rows, sg.lanes, FEAT)
    return pl.pallas_call(
        _stage_transpose_kernel,
        grid=(sg.c_rows,),
        in_specs=[
            pl.BlockSpec((1, sg.lanes, FEAT), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, FEAT, sg.lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (sg.c_rows, FEAT, sg.lanes), stag.dtype
        ),
        interpret=_interpret(),
    )(stag3)


def scatter_slots(addr: SlotAddr, rows, sg: SlotGrid, staged: bool = False):
    """Scatter packed [N, ncols] rows → feat [c_rows, FEAT, lanes].

    staged=True: scatter into a FEATURE-MINOR staging array
    [c_rows·lanes, FEAT] — each particle's features are then CONTIGUOUS,
    one row-scatter per particle — then transpose to the kernel layout
    with the Pallas tile-transpose above.  Bitwise-identical output.
    Measured (bench/probe_r3c/r3d.py at 1M): the XLA-swapaxes form of the
    transpose is a dead end (96 ms vs 57 direct — minor-dim-8 layouts
    transpose terribly through XLA); the Pallas-transpose form is what
    this flag now selects.  Default stays the direct scatter unless the
    measurement says otherwise."""
    if staged:
        ncols = rows.shape[1]
        if ncols < FEAT:
            init_tail = jax.lax.optimization_barrier(
                jnp.zeros((FEAT - ncols,), rows.dtype)
            )
            rows = jnp.concatenate(
                [rows, jnp.broadcast_to(init_tail[None, :],
                                        (rows.shape[0], FEAT - ncols))],
                axis=1,
            )
        size = sg.c_rows * sg.lanes
        ok = addr.valid & (addr.row_pos > 0)
        base = jnp.where(ok, addr.row_pos * sg.lanes + addr.pos, size)
        stag = jnp.broadcast_to(
            _init_row(rows.dtype)[None, :], (size, FEAT)
        )
        stag = stag.at[base].set(rows, mode="drop")
        return _stage_to_feat(stag, sg)
    feat = jnp.broadcast_to(
        _init_row(rows.dtype)[None, :, None],
        (sg.c_rows, FEAT, sg.lanes),
    )
    flat = feat.reshape(-1).at[_flat_slot_idx(addr, sg, rows.shape[1])].set(
        rows, mode="drop"
    )
    return flat.reshape(sg.c_rows, FEAT, sg.lanes)


def pack2bf16(a, b):
    """Two fp32 arrays → one fp32-typed array carrying (bf16(a) << 16 |
    bf16(b)) bitwise.  RTNE rounding via astype(bfloat16).  The packed
    value is NOT numerically meaningful — transport only."""
    ah = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    bh = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16
    ).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        (ah << 16) | bh, jnp.float32
    )


def unpack2bf16(p):
    """Inverse of pack2bf16: packed fp32 → (a, b) fp32 (bf16-valued)."""
    u = jax.lax.bitcast_convert_type(p, jnp.uint32)
    a = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return a, b


def scatter_slots_packed(addr: SlotAddr, rows, sg: SlotGrid, bg_row):
    """scatter_slots for a NON-feat column layout: [N, ncols] rows →
    [c_rows, ncols, lanes], empty slots filled with `bg_row` ([ncols]).

    The packed-bf16 rebuild transport (VERDICT r4 item 4a): the scatter
    phase's cost has a large fixed component plus ~6-7 ms per COLUMN at
    1M (ROADMAP: 7 cols 81 ms / 3 cols 55 / 2 cols 46 isolated), so
    packing the six x/v transport columns into three bf16-pair columns
    shrinks the per-rebuild scatter; a dense elementwise unpack after the
    scatter (sequential-bandwidth, ~1 ms at 1M) restores fp32 slot
    arrays, so the KERNELS stay fp32 — precision loss is confined to one
    bf16 round-trip of cell-relative x / absolute v per rebuild."""
    ncols = rows.shape[1]
    ok = addr.valid & (addr.row_pos > 0)
    size = sg.c_rows * ncols * sg.lanes
    base = jnp.where(ok, addr.row_pos * (ncols * sg.lanes) + addr.pos, size)
    idx = base[:, None] + (
        jnp.arange(ncols, dtype=jnp.int32) * sg.lanes
    )[None, :]
    out = jnp.broadcast_to(
        jax.lax.optimization_barrier(bg_row)[None, :, None],
        (sg.c_rows, ncols, sg.lanes),
    )
    flat = out.reshape(-1).at[idx].set(rows, mode="drop")
    return flat.reshape(sg.c_rows, ncols, sg.lanes)


def slot_overflow(x, active, grid: GridSpec, sg: SlotGrid, ci_offset=None):
    """(cell overflow count, row overflow count): >0 ⇒ static caps dropped
    work this step."""
    addr = build_addr(x, active, grid, sg, ci_offset)
    _, flat = cell_index(x, active, grid, ci_offset)
    cell_over = jnp.sum((~addr.valid) & (flat < grid.n_cells))
    row_over = jnp.sum(
        (addr.valid & (addr.row_pos == 0)).astype(jnp.int32)
    )
    return cell_over, row_over


# ---------------------------------------------------------------------------
# Kernels: fori_loop over aligned lane groups, xb-cell batches unrolled
# ---------------------------------------------------------------------------


def _group_loop(sg: SlotGrid, count_fn, group_body):
    """Run group_body(g) for every occupied group g; `count_fn(g)` reads
    the per-group occupancy (parametrized for row-pair programs, whose
    gcount block carries one row per paired compute row)."""

    def body(g, _):
        @pl.when(count_fn(g) > 0)
        def _():
            group_body(g)

        return 0

    if sg.packed:
        # packed rows have no x-halo groups; occupancy is a lane prefix
        jax.lax.fori_loop(0, sg.n_groups, body, 0)
        return
    # groups 0 and n_groups-1 are the empty x halo: skip them
    jax.lax.fori_loop(1, sg.n_groups - 1, body, 0)


def _group_windows(strips, g):
    """Per-strip candidate windows for group g, ALL features at once:
    R × [F, 3·LANE].  An [8, X] load costs the same tile footprint as a
    [1, X] load (sublanes pad to 8), so loading all feature rows together
    is ~8× fewer ops than per-feature windows."""
    start = pl.multiple_of((g - 1) * LANE, LANE)
    return [s[0, :, pl.ds(start, 3 * LANE)] for s in strips]


def _cand_block(wins, k, cap, xb, xm=1):
    """Static cell-batch slice across all strips and features: the union
    candidate slot-cells (k-xm .. k+xb+xm-1) of slot-cells k..k+xb-1, i.e.
    lanes [(xc + k - xm)·cap, +(xb+2·xm)·cap) of each strip window,
    concatenated → [F, R·(xb+2·xm)·cap].

    The union is exact physics: `xm` slot-cells span exactly one FULL grid
    cell (xm = xsub), so a candidate beyond the margin is ≥ cell ≥ h(+skin)
    away and its contribution is identically zero (branchless kernels).
    Batching xb cells per vector op trades margin overhead for 1/xb the
    op-issue count — and subdividing x-cells (xsub > 1) shrinks the margin
    dead-width from cap lanes to cap/xsub lanes per side, the round-2
    answer to the cap² padding (ROADMAP.md item 1)."""
    xc = LANE // cap
    a = (xc + k - xm) * cap
    w = (xb + 2 * xm) * cap
    return jnp.concatenate([win[:, a : a + w] for win in wins], axis=1)


def _self_block(center_ref, g):
    """i-particles of group g on sublanes: [128, FEAT], via an in-VMEM
    transpose of the center strip's aligned lane block (cheaper than
    keeping a transposed HBM copy, whose 8-lane minor dim pads 16×)."""
    start = pl.multiple_of(g * LANE, LANE)
    return jnp.transpose(center_ref[0, :, pl.ds(start, LANE)])


def _density_kernel(n_ref, nbr_ref, gcount_ref, *refs, sg, params):
    """Density pass → lane-major (rho, EOS p) rows rp[c_rows, 2, lanes].
    The EOS runs HERE so no per-particle gather/re-scatter sits between
    the density and force kernels; the dummy row 0 keeps rho = 0 (its
    1e18 features annihilate everything downstream).

    row_pair mode: each program handles `nw = 2` consecutive compacted
    rows (`which` below) — same math per row, half the programs."""
    nw = 2 if sg.row_pair else 1
    n_r = len(sg.row_offsets)
    strips_all, rp_ref = refs[:-1], refs[-1]
    cap = sg.cap
    c_p, _, _ = kernel_constants(params.dim, params.h, params.kernel_norm)
    h2k = params.h * params.h
    rp_ref[...] = jnp.zeros_like(rp_ref)

    d_dim = params.dim
    bf16 = params.precision == "bf16"
    if bf16:
        ioff_c, joff_c = _bf16_offsets(sg, d_dim, sg.cell)
    i_prog = pl.program_id(0)

    for which in range(nw):
        strips = strips_all[which * n_r : (which + 1) * n_r]
        center_ref = strips[n_r // 2]
        row = i_prog * nw + which

        @pl.when((row > 0) & (row <= n_ref[0]))
        def _(strips=strips, center_ref=center_ref, which=which):
            def group(g):
                it = _self_block(center_ref, g)       # [128, FEAT], once/group
                if bf16:
                    it = it.astype(jnp.float32) + jnp.asarray(ioff_c)
                wins = _group_windows(strips, g)      # R × [FEAT, 384]
                xb = sg.xb
                rhos = []
                for k in range(0, sg.xc, xb):
                    def rho_batch(k=k):
                        cand = _cand_block(wins, k, cap, xb, sg.xsub)
                        if bf16:
                            cand = cand.astype(jnp.float32) + jnp.asarray(
                                joff_c[k]
                            )
                        r2 = None
                        # 2D: skip the z column — zero for every real
                        # particle, and the far x-column already
                        # annihilates dummy pairs
                        for c in range(d_dim):
                            xi = it[k * cap : (k + xb) * cap, c : c + 1]
                            d = xi - cand[c : c + 1, :]
                            r2 = d * d if r2 is None else r2 + d * d
                        q = jnp.maximum(h2k - r2, 0.0)
                        return (params.mass * c_p) * jnp.sum(
                            q * q * q, axis=1, keepdims=True
                        )  # [xb·cap, 1]

                    if sg.batch_skip:
                        # skip i-empty batches: only never-gathered
                        # background lanes live there, so the 0 written
                        # here (vs the phantom rho coincident 1e18
                        # sentinels would compute) is invisible per
                        # particle — see SlotGrid.batch_skip
                        occ_b = jnp.min(
                            it[k * cap : (k + xb) * cap, 0]
                        ) < 1e17
                        rho = jax.lax.cond(
                            occ_b, rho_batch,
                            lambda: jnp.zeros(
                                (xb * cap, 1), jnp.float32
                            ),
                        )
                    else:
                        rho = rho_batch()
                    rhos.append(rho)
                # lane-dim stores must be 128-aligned: assemble the whole
                # group's [2, LANE] (rho, EOS p) block, store once at g·LANE
                rho_g = jnp.concatenate(rhos, axis=0)     # [LANE, 1]
                rp = jnp.concatenate(
                    [rho_g, physics.eos_pressure(rho_g, params)], axis=1
                )
                rp_ref[
                    which, 0:2, pl.ds(pl.multiple_of(g * LANE, LANE), LANE)
                ] = jnp.transpose(rp)

            _group_loop(sg, lambda g: gcount_ref[which, 0, g], group)


def _force_kernel(n_ref, nbr_ref, gcount_ref, *refs, sg, params):
    """Force pass → lane-major f[c_rows, FOUT, lanes].  feat strips carry
    x|v; rho and EOS pressure stream in as lane-major rp strips (density-
    kernel output), both routed per row by the prefetched neighbor table.
    No validity masks: missing/dropped neighbor rows alias the dummy row 0,
    whose 1e18 positions zero s(r) and t before the rho=0 reciprocal can
    hurt.  row_pair: see _density_kernel."""
    nw = 2 if sg.row_pair else 1
    n_r = len(sg.row_offsets)
    strips_all = refs[: nw * n_r]
    rp_all = refs[nw * n_r : 2 * nw * n_r]
    out_ref = refs[-1]
    cap = sg.cap
    d_dim = params.dim
    _, c_s, c_v = kernel_constants(d_dim, params.h, params.kernel_norm)
    hk = params.h
    out_ref[...] = jnp.zeros_like(out_ref)

    bf16 = params.precision == "bf16"
    if bf16:
        ioff_c, joff_c = _bf16_offsets(sg, d_dim, sg.cell)
    i_prog = pl.program_id(0)

    for which in range(nw):
        strips = strips_all[which * n_r : (which + 1) * n_r]
        rp_strips = rp_all[which * n_r : (which + 1) * n_r]
        center_ref = strips[n_r // 2]
        rp_center = rp_strips[n_r // 2]
        row = i_prog * nw + which

        @pl.when((row > 0) & (row <= n_ref[0]))
        def _(strips=strips, rp_strips=rp_strips, center_ref=center_ref,
              rp_center=rp_center, which=which):
            def group(g):
                it = _self_block(center_ref, g)       # [128, FEAT], once/group
                if bf16:
                    it = it.astype(jnp.float32) + jnp.asarray(ioff_c)
                wins = _group_windows(strips, g)      # R × [FEAT, 384]
                start_l = pl.multiple_of(g * LANE, LANE)
                pT = jnp.transpose(
                    rp_center[0, 1:2, pl.ds(start_l, LANE)]
                )                                     # [128, 1] self pressure
                rp_wins = _group_windows(rp_strips, g)  # R × [2, 384]
                xb = sg.xb
                f_rows = []
                for k in range(0, sg.xc, xb):
                    def f_batch(k=k):
                        cand = _cand_block(wins, k, cap, xb, sg.xsub)
                        if bf16:
                            cand = cand.astype(jnp.float32) + jnp.asarray(
                                joff_c[k]
                            )
                        cand_rp = _cand_block(rp_wins, k, cap, xb, sg.xsub)

                        def self_col(c, k=k, it=it):
                            return it[k * cap : (k + xb) * cap, c : c + 1]

                        def cand_col(c, cand=cand):
                            return cand[c : c + 1, :]

                        dx = []
                        r2 = None
                        for c in range(d_dim):
                            dc = self_col(c) - cand_col(c)
                            dx.append(dc)
                            r2 = dc * dc if r2 is None else r2 + dc * dc
                        # one rsqrt replaces sqrt + divide (multi-cycle VPU
                        # ops); same form as kernels.pair_scales → pallas ==
                        # grid bitwise
                        inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
                        t = jnp.maximum(hk - r2 * inv_r, 0.0)
                        s = c_s * t * t * inv_r * (r2 > 1e-24)
                        inv_rho_j = 1.0 / jnp.maximum(
                            cand_rp[0:1, :], 1e-12
                        )
                        p_i = pT[k * cap : (k + xb) * cap, 0:1]
                        coef_p = (
                            (params.mass * 0.5)
                            * (p_i + cand_rp[1:2, :])
                            * inv_rho_j
                            * s
                        )
                        coef_v = (
                            (params.viscosity * params.mass)
                            * inv_rho_j
                            * (c_v * t)
                        )
                        fc = [
                            jnp.sum(
                                coef_p * dx[c]
                                + coef_v
                                * (cand_col(3 + c) - self_col(3 + c)),
                                axis=1,
                                keepdims=True,
                            )
                            for c in range(d_dim)
                        ]  # d × [xb·cap, 1]
                        return jnp.concatenate(fc, axis=1)  # [xb·cap, d]

                    if sg.batch_skip:
                        # same i-empty skip as the density kernel (exact
                        # per particle; phantom-lane values may differ)
                        occ_b = jnp.min(
                            it[k * cap : (k + xb) * cap, 0]
                        ) < 1e17
                        fb = jax.lax.cond(
                            occ_b, f_batch,
                            lambda: jnp.zeros(
                                (xb * cap, d_dim), jnp.float32
                            ),
                        )
                    else:
                        fb = f_batch()
                    f_rows.append(fb)
                # one aligned lane-major store per group (like the rp store)
                f_g = jnp.concatenate(f_rows, axis=0)     # [LANE, d]
                out_ref[which, 0:d_dim, pl.ds(start_l, LANE)] = (
                    jnp.transpose(f_g)
                )

            _group_loop(sg, lambda g: gcount_ref[which, 0, g], group)


def _packed_base(strips):
    """Concat of every neighbor strip's FIRST 128-lane block: the packed
    kernels' common-case candidate window (rows with ≤128 particles are one
    block; dummy/unoccupied rows contribute 1e18 lanes that annihilate)."""
    return jnp.concatenate(
        [s[0, :, pl.ds(0, LANE)] for s in strips], axis=1
    )


def _density_kernel_packed(n_ref, nbr_ref, jb_ref, gcount_ref, *refs,
                           sg, params):
    """Packed-row density pass (SlotGrid.packed): each 128-lane i-group of
    a compacted row pairs against the CONCATENATED first blocks of its
    3^(D-1) neighbor rows in one vector op, plus one [128, 128] op per
    occupied extra block (jb_ref = per-row occupied-block count, prefetched
    to SMEM; extra blocks are rare in the sparse scenes this mode is for).
    No x windowing: compact support annihilates far-x pairs branchlessly —
    the same exactness argument as the slot kernels' union margins.  Same
    arithmetic form as _density_kernel (shared rsqrt/EOS conventions)."""
    n_r = len(sg.row_offsets)
    strips, rp_ref = refs[:-1], refs[-1]
    center_ref = strips[n_r // 2]
    c_p, _, _ = kernel_constants(params.dim, params.h, params.kernel_norm)
    h2k = params.h * params.h
    d_dim = params.dim
    rp_ref[...] = jnp.zeros_like(rp_ref)
    row = pl.program_id(0)

    @pl.when((row > 0) & (row <= n_ref[0]))
    def _():
        def group(g):
            it = _self_block(center_ref, g)          # [128, FEAT]

            def rho_of(cand):
                r2 = None
                for c in range(d_dim):
                    d = it[:, c : c + 1] - cand[c : c + 1, :]
                    r2 = d * d if r2 is None else r2 + d * d
                q = jnp.maximum(h2k - r2, 0.0)
                return (params.mass * c_p) * jnp.sum(
                    q * q * q, axis=1, keepdims=True
                )                                    # [128, 1]

            rho = rho_of(_packed_base(strips))
            for jg in range(1, sg.n_groups):
                for s_idx in range(n_r):
                    start = pl.multiple_of(jg * LANE, LANE)
                    rho = rho + jax.lax.cond(
                        jb_ref[nbr_ref[s_idx, row]] > jg,
                        lambda s=strips[s_idx], start=start: rho_of(
                            s[0, :, pl.ds(start, LANE)]
                        ),
                        lambda: jnp.zeros((LANE, 1), jnp.float32),
                    )
            rp = jnp.concatenate(
                [rho, physics.eos_pressure(rho, params)], axis=1
            )
            rp_ref[
                0, 0:2, pl.ds(pl.multiple_of(g * LANE, LANE), LANE)
            ] = jnp.transpose(rp)

        _group_loop(sg, lambda g: gcount_ref[0, 0, g], group)


def _force_kernel_packed(n_ref, nbr_ref, jb_ref, gcount_ref, *refs,
                         sg, params):
    """Packed-row force pass — see _density_kernel_packed for the window
    scheme and _force_kernel for the (identical) pair arithmetic."""
    n_r = len(sg.row_offsets)
    strips = refs[:n_r]
    rp_strips = refs[n_r : 2 * n_r]
    out_ref = refs[-1]
    center_ref = strips[n_r // 2]
    rp_center = rp_strips[n_r // 2]
    _, c_s, c_v = kernel_constants(params.dim, params.h, params.kernel_norm)
    hk = params.h
    d_dim = params.dim
    out_ref[...] = jnp.zeros_like(out_ref)
    row = pl.program_id(0)

    @pl.when((row > 0) & (row <= n_ref[0]))
    def _():
        def group(g):
            it = _self_block(center_ref, g)          # [128, FEAT]
            start_l = pl.multiple_of(g * LANE, LANE)
            pT = jnp.transpose(
                rp_center[0, 1:2, pl.ds(start_l, LANE)]
            )                                        # [128, 1] self pressure

            def f_of(cand, cand_rp):
                dx = []
                r2 = None
                for c in range(d_dim):
                    dc = it[:, c : c + 1] - cand[c : c + 1, :]
                    dx.append(dc)
                    r2 = dc * dc if r2 is None else r2 + dc * dc
                inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
                t = jnp.maximum(hk - r2 * inv_r, 0.0)
                s = c_s * t * t * inv_r * (r2 > 1e-24)
                inv_rho_j = 1.0 / jnp.maximum(cand_rp[0:1, :], 1e-12)
                coef_p = (
                    (params.mass * 0.5)
                    * (pT + cand_rp[1:2, :])
                    * inv_rho_j
                    * s
                )
                coef_v = (
                    (params.viscosity * params.mass) * inv_rho_j * (c_v * t)
                )
                fc = [
                    jnp.sum(
                        coef_p * dx[c]
                        + coef_v
                        * (cand[3 + c : 4 + c, :] - it[:, 3 + c : 4 + c]),
                        axis=1,
                        keepdims=True,
                    )
                    for c in range(d_dim)
                ]
                return jnp.concatenate(fc, axis=1)   # [128, d]

            f = f_of(_packed_base(strips), _packed_base(rp_strips))
            for jg in range(1, sg.n_groups):
                for s_idx in range(n_r):
                    start = pl.multiple_of(jg * LANE, LANE)
                    f = f + jax.lax.cond(
                        jb_ref[nbr_ref[s_idx, row]] > jg,
                        lambda s=strips[s_idx], r=rp_strips[s_idx],
                        start=start: f_of(
                            s[0, :, pl.ds(start, LANE)],
                            r[0, :, pl.ds(start, LANE)],
                        ),
                        lambda: jnp.zeros((LANE, d_dim), jnp.float32),
                    )
            out_ref[0, 0:d_dim, pl.ds(start_l, LANE)] = jnp.transpose(f)

        _group_loop(sg, lambda g: gcount_ref[0, 0, g], group)


def _jblocks(addr: SlotAddr, sg: SlotGrid):
    """[c_rows] i32 occupied-128-block count per compacted row (a prefix
    count — packed lanes fill contiguously); prefetched to SMEM so the
    packed kernels can skip empty extra blocks of neighbor rows."""
    return jnp.sum(
        (addr.gcounts[:, 0, :] > 0).astype(jnp.int32), axis=-1
    )


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _specs(sg: SlotGrid):
    """Block specs: per-group counts (SMEM), feat strips, rho/p strips —
    all routed through the prefetched compacted neighbor-row table.
    row_pair mode doubles the strip lists (one set per paired row) and
    widens the gcount/output blocks to 2 rows."""
    nw = 2 if sg.row_pair else 1

    def gcount_map(i, n, nbrs):
        return i, 0, 0

    gcount_spec = pl.BlockSpec(
        (nw, 1, sg.n_groups), gcount_map, memory_space=pltpu.SMEM
    )

    def strip_map_factory(s, which):
        def strip_map(i, n, nbrs):
            return nbrs[s, nw * i + which], 0, 0

        return strip_map

    strip_specs = [
        pl.BlockSpec(
            (1, FEAT, sg.lanes),
            strip_map_factory(s, w),
            memory_space=pltpu.VMEM,
        )
        for w in range(nw)
        for s in range(len(sg.row_offsets))
    ]
    rp_specs = [
        pl.BlockSpec(
            (1, 2, sg.lanes),
            strip_map_factory(s, w),
            memory_space=pltpu.VMEM,
        )
        for w in range(nw)
        for s in range(len(sg.row_offsets))
    ]
    return gcount_spec, strip_specs, rp_specs


def _specs_packed(sg: SlotGrid):
    """Packed-mode block specs: like _specs, with a third scalar-prefetch
    operand (the _jblocks table) in every index-map signature."""

    def gcount_map(i, n, nbrs, jb):
        return i, 0, 0

    gcount_spec = pl.BlockSpec(
        (1, 1, sg.n_groups), gcount_map, memory_space=pltpu.SMEM
    )

    def strip_map_factory(s):
        def strip_map(i, n, nbrs, jb):
            return nbrs[s, i], 0, 0

        return strip_map

    strip_specs = [
        pl.BlockSpec(
            (1, FEAT, sg.lanes), strip_map_factory(s),
            memory_space=pltpu.VMEM,
        )
        for s in range(len(sg.row_offsets))
    ]
    rp_specs = [
        pl.BlockSpec(
            (1, 2, sg.lanes), strip_map_factory(s),
            memory_space=pltpu.VMEM,
        )
        for s in range(len(sg.row_offsets))
    ]
    return gcount_spec, strip_specs, rp_specs


def _call_density(feat, addr: SlotAddr, sg, params):
    """→ rp_slot [c_rows, 2, lanes] lane-major (rho, EOS p)."""
    if sg.packed:
        gcount_spec, strip_specs, _ = _specs_packed(sg)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(sg.c_rows,),
            in_specs=[gcount_spec] + strip_specs,
            out_specs=pl.BlockSpec(
                (1, 2, sg.lanes),
                lambda i, n, nbrs, jb: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        kern = functools.partial(_density_kernel_packed, sg=sg, params=params)
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (sg.c_rows, 2, sg.lanes), jnp.float32
            ),
            interpret=_interpret(),
        )(
            addr.n_occ,
            addr.nbr_pos,
            _jblocks(addr, sg),
            addr.gcounts,
            *([feat] * len(strip_specs)),
        )
    nw = 2 if sg.row_pair else 1
    gcount_spec, strip_specs, _ = _specs(sg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(sg.c_rows // nw,),
        in_specs=[gcount_spec] + strip_specs,
        out_specs=pl.BlockSpec(
            (nw, 2, sg.lanes),
            lambda i, n, nbrs: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kern = functools.partial(_density_kernel, sg=sg, params=params)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sg.c_rows, 2, sg.lanes), jnp.float32),
        interpret=_interpret(),
    )(
        addr.n_occ,
        addr.nbr_pos,
        addr.gcounts,
        *([feat] * len(strip_specs)),
    )


def _call_force(feat, rp, addr: SlotAddr, sg, params):
    """→ f_slot [c_rows, FOUT, lanes] lane-major."""
    if sg.packed:
        gcount_spec, strip_specs, rp_specs = _specs_packed(sg)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(sg.c_rows,),
            in_specs=[gcount_spec] + strip_specs + rp_specs,
            out_specs=pl.BlockSpec(
                (1, FOUT, sg.lanes),
                lambda i, n, nbrs, jb: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        kern = functools.partial(_force_kernel_packed, sg=sg, params=params)
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (sg.c_rows, FOUT, sg.lanes), jnp.float32
            ),
            interpret=_interpret(),
        )(
            addr.n_occ,
            addr.nbr_pos,
            _jblocks(addr, sg),
            addr.gcounts,
            *([feat] * len(strip_specs)),
            *([rp] * len(rp_specs)),
        )
    nw = 2 if sg.row_pair else 1
    gcount_spec, strip_specs, rp_specs = _specs(sg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(sg.c_rows // nw,),
        in_specs=[gcount_spec] + strip_specs + rp_specs,
        out_specs=pl.BlockSpec(
            (nw, FOUT, sg.lanes),
            lambda i, n, nbrs: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kern = functools.partial(_force_kernel, sg=sg, params=params)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (sg.c_rows, FOUT, sg.lanes), jnp.float32
        ),
        interpret=_interpret(),
    )(
        addr.n_occ,
        addr.nbr_pos,
        addr.gcounts,
        *([feat] * len(strip_specs)),
        *([rp] * len(rp_specs)),
    )


# ---------------------------------------------------------------------------
# Per-particle extraction (element-gathers from the lane-major slot arrays)
# ---------------------------------------------------------------------------


def _gather_rho(rp_slot, addr: SlotAddr, sg: SlotGrid, params):
    ok = addr.valid & (addr.row_pos > 0)
    flat = (addr.row_pos * 2) * sg.lanes + addr.pos  # row 0 → dummy rho 0
    rho = rp_slot.reshape(-1)[flat]
    return jnp.where(ok, rho, params.rest_density), ok


def slot_rows_view(slot):
    """[c_rows, C, lanes] → [c_rows·lanes, C] feature-minor view (ONE
    dense transpose): a particle's C components become contiguous, so a
    per-particle read is one row-gather instead of C strided element-
    gathers (TPU gathers cost per ROW fetched — measured ~2.9 ms per
    element-gather pass at 1M vs ~0.12 ms for the 94 MB transpose)."""
    return jnp.swapaxes(slot, 1, 2).reshape(-1, slot.shape[1])


def _gather_f(f_slot, addr: SlotAddr, sg: SlotGrid, d: int, ok):
    rows = slot_rows_view(f_slot)
    base = addr.row_pos * sg.lanes + addr.pos   # row 0 = dummy, masked below
    f = rows[base][:, :d]
    return jnp.where(ok[:, None], f, 0.0)


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
    addr: SlotAddr | None = None,
    row_pair: bool = False,
    batch_skip: bool = False,
    packed_rows: bool = False,
    row_lanes: int | None = None,
):
    """Drop-in replacement for neighbors.grid_rho_p_f, Pallas-fused.

    `addr` (a SlotAddr from build_addr) reuses a neighbor structure built
    at an earlier step — valid while every particle has moved < skin/2
    since it was built (GridSpec.for_scene skin; step.make_advance
    sort_every).  A reused addr composes with any batch_skip setting:
    the flag changes kernel scheduling only, never the addressing.
    packed_rows selects the sparse-scene packed-row layout (the addr must
    then come from a packed build too — SlotGrid.packed)."""
    n, d = x.shape
    if packed_rows:
        if params.precision == "bf16":
            raise ValueError("packed rows do not compose with bf16 features")
        sg = packed_grid(grid, row_lanes, c_rows)
    else:
        sg = slot_grid(grid, c_rows, xb_cells, row_pair=row_pair,
                       batch_skip=batch_skip)
    if addr is None:
        addr = build_addr(x, active, grid, sg)
    rows = (
        _rel_rows(x, v, addr)
        if params.precision == "bf16"
        else _pack_rows6(x, v)
    )
    feat = scatter_slots(addr, rows, sg)
    rp_slot = _call_density(feat, addr, sg, params)
    f_slot = _call_force(feat, rp_slot, addr, sg, params)
    rho, ok = _gather_rho(rp_slot, addr, sg, params)
    p = physics.eos_pressure(rho, params)
    f = _gather_f(f_slot, addr, sg, d, ok)
    return rho, p, f


@dataclass(frozen=True)
class SplitCtx:
    """Shared slot context for the split density/force phases (decomp.py's
    halo-exchange step): ONE build_addr + ONE feature scatter serve both
    kernel calls — the per-phase wrappers below each used to rebuild them,
    doubling the two most expensive XLA-side phases per spatial step.
    Numerically neutral: both phases see the identical addressing/features
    they would have built independently (the density kernel never reads
    the v columns)."""

    sg: SlotGrid
    addr: SlotAddr
    feat: jax.Array


def pallas_split_build(x, v, active, params: SimParams, grid: GridSpec,
                       ci_offset=None) -> SplitCtx:
    """Build the shared SplitCtx (see class docstring).  `ci_offset`
    shifts the cell lattice per device for slab-local grids
    (see neighbors.cell_index)."""
    sg = slot_grid(grid)
    addr = build_addr(x, active, grid, sg, ci_offset)
    rows = (
        _rel_rows(x, v, addr)
        if params.precision == "bf16"
        else _pack_rows6(x, v)
    )
    feat = scatter_slots(addr, rows, sg)
    return SplitCtx(sg=sg, addr=addr, feat=feat)


def pallas_density_split(ctx: SplitCtx, params: SimParams):
    """Density-only phase over a prebuilt SplitCtx → per-particle rho."""
    rp_slot = _call_density(ctx.feat, ctx.addr, ctx.sg, params)
    rho, _ = _gather_rho(rp_slot, ctx.addr, ctx.sg, params)
    return rho


def pallas_forces_split(ctx: SplitCtx, rho, p, params: SimParams, d: int):
    """Force-only phase over a prebuilt SplitCtx, given external per-
    particle rho/p (e.g. with halo-exchanged ghost values re-imported)."""
    rp = scatter_rp(ctx.addr, rho, p, ctx.sg)
    f_slot = _call_force(ctx.feat, rp, ctx.addr, ctx.sg, params)
    ok = ctx.addr.valid & (ctx.addr.row_pos > 0)
    return _gather_f(f_slot, ctx.addr, ctx.sg, d, ok)


def pallas_density(x, active, params: SimParams, grid: GridSpec,
                   ci_offset=None):
    """Density-only phase (split API for the halo-exchange step, mirroring
    neighbors.grid_density — sph_tpu/decomp.py re-imports ghost rho/p
    between phases)."""
    ctx = pallas_split_build(
        x, jnp.zeros_like(x), active, params, grid, ci_offset
    )
    return pallas_density_split(ctx, params)


def scatter_rp(addr: SlotAddr, rho, p, sg: SlotGrid):
    """Scatter EXTERNAL per-particle rho/p (e.g. halo-exchanged ghost
    values, decomp.py) into the [c_rows, 2, lanes] rp-slot layout the
    force kernel streams.  (Direct strided scatter: the staged-transpose
    form measured slower — see scatter_slots.)"""
    ok = addr.valid & (addr.row_pos > 0)
    size = sg.c_rows * 2 * sg.lanes
    base = jnp.where(ok, addr.row_pos * 2 * sg.lanes + addr.pos, size)
    idx2 = base[:, None] + jnp.array([0, 1], jnp.int32)[None, :] * sg.lanes
    rp = jnp.stack([rho, p], axis=1)
    flat = jnp.zeros((size,), rho.dtype).at[idx2].set(rp, mode="drop")
    return flat.reshape(sg.c_rows, 2, sg.lanes)


def pallas_forces(x, v, rho, p, active, params: SimParams, grid: GridSpec,
                  ci_offset=None):
    """Force-only phase given rho/p (split API, see pallas_density)."""
    ctx = pallas_split_build(x, v, active, params, grid, ci_offset)
    return pallas_forces_split(ctx, rho, p, params, x.shape[1])
