"""Fused Pallas TPU kernel for the atlas splatter's accumulation loop.

The jnp scan in splat_atlas.py launches several small XLA ops per particle
group (~14 us/step of launch overhead, measured).  This kernel fuses the
whole loop: one ``pallas_call`` iterates the sorted groups — SUBGROUPS of
them per grid step, because the per-step pipeline overhead (~3.4 us,
measured) would otherwise dominate — evaluating the low-rank kernel profiles
on the VPU, forming deposits with bf16 MXU matmuls (f32 accumulation), and
accumulating into a dynamically-positioned atlas window kept resident in
VMEM for as long as consecutive groups share it (DMA-flushed to HBM only on
window change).

Data layout keeps particles in the *lane* dimension everywhere: profiles are
built as (rows, rank*G) / (cols, rank*G) by pure broadcasting, so no
relayouts are needed on the inputs; the deposit is

    win[c] += dot((P * coef_c) [R, rank*G], Q [W, rank*G], contract lanes)

Performance structure (measured on v5e; see benchmarks/breakdown.py):

* The DMA window is 256 columns, 128-aligned (Mosaic requires lane-aligned
  dynamic HBM offsets), but the column profiles Q are evaluated over only
  PROFILE_COLS=128 columns anchored at the group's *exact* column start; the
  (rows, 128) contribution is placed at the right lane offset inside the
  window with a dynamic-shift ``pltpu.roll``.  This halves the dominant VPU
  work without changing the group span allowance.
* Group classification (inactive / all-tiny / maskless / masked) is
  precomputed vectorized in XLA and passed as a prefetched scalar flag
  array, so the kernel does no cross-lane reductions.
* The kernel profiles are polynomials constrained to vanish at the support
  edge (ops/kernels.py), so support handling is a clamp of t^2 — no masks.
  Footprint masks are only needed for coarsest-level splats whose smoothing
  is clamped above SPLAT_MAX_HALF_SIZE_PX (support wider than the footprint,
  truncation compensated by the normalization table); groups containing any
  such splat take the rare FLAG_MASKED path.

Group specializations (driven by the sort key, see splat_atlas.py):
* all-tiny groups (CIC splats) take a rank-1 hat-only path — no polynomial
  evaluation, a G-wide (not rank*G) contraction;
* fully-masked groups (bucket padding, LOD remainders — sorted to the end
  via the sentinel key) skip compute entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels

WINDOW_ROWS = 64
WINDOW_COLS = 256   # DMA window: 128-px logical span + 128 for lane alignment
PROFILE_COLS = 128  # columns over which Q profiles are evaluated (then rolled)
COL_ALIGN = 128
SUBGROUPS = 8       # particle groups processed per grid step
ROW_QUANTUM = 96    # DMA band anchors snap to this; the band is
                    # window_rows + ROW_QUANTUM + 8 tall and deposits land at
                    # a dynamic in-band row offset.  Quantizing the anchor
                    # makes consecutive groups share the band: measured on
                    # the 2^22 presorted scene this cuts band changes 4x
                    # (2395 -> 584) and flush+load traffic 2x (942 -> 459 MB
                    # per frame) vs re-anchoring at every 8-row shift.

# group classification flags (prefetched scalars; computed in splat_atlas)
FLAG_INACTIVE = 0   # all coefficients zero: skip entirely
FLAG_ALL_TINY = 1   # every particle is a CIC splat: rank-1 hat path
FLAG_POLY = 2       # no tiny, no oversize splats: pure clamped polynomials
FLAG_MIXED = 3      # tiny + polynomial splats, none oversize
FLAG_MASKED = 4     # contains oversize (footprint-truncated) splats

# size classes: per-group profile-evaluation extents (rows, cols).  Median
# presorted groups span only ~4-15 rows x 15-33 cols (measured), so
# evaluating the full window for every group wastes most of the VPU work.
# The combined prefetched flag is kind * 4 + size_class; TINY and POLY
# groups whose supported span (plus anchor-alignment slack) fits a smaller
# class take it, everything else uses the full window.
SIZE_CLASSES = ((16, 32), (32, 64), (48, 128), (None, None))
FULL_CLASS = len(SIZE_CLASSES) - 1

SUPPORT2 = kernels.KERNEL_SUPPORT ** 2

# Skip the window *load* DMA for first-touch windows (base atlas all-zero):
# the VMEM scratch is zero-filled instead, halving window-change DMA traffic
# in the main pass.  Exactness: a window is "fresh" only if no earlier group
# touched any band/column window overlapping it.  Bands are band_rows tall
# on a qa-row anchor grid and windows window_cols wide on a COL_ALIGN grid,
# so two bands/windows overlap iff their cell indices differ by at most
# (band_rows-1)//qa rows / (window_cols-1)//COL_ALIGN columns — the min-pool
# neighbourhood is sized from exactly those radii (band_rows > 2*qa in every
# shipped presorted config, so a fixed 3x3 pool would falsely mark bands
# fresh and zero-clobber earlier deposits).  Default for the ``fresh_skip``
# parameter; A/B-tested in tests/test_splat_pallas_fresh.py.
FRESH_SKIP = True


def _profiles_lanes(t2, tiny, lrk, signed: bool):
    """(n, rank*G) profiles (lane-concatenated over rank) with CIC hats.

    t2: (n, G) squared offsets, already clamped to the support, so the
    edge-constrained polynomials are exactly zero outside; tiny: (1, G) CIC
    flags broadcast over rows, or None when the group has no tiny splats.
    """
    hat = None
    if tiny is not None:
        hat = jnp.maximum(0.0, 1.0 - jnp.sqrt(jnp.maximum(t2, 0.0)))
    pieces = []
    for k in range(lrk.rank):
        acc = jnp.full_like(t2, float(lrk.coeffs[k][0]))
        for c in lrk.coeffs[k][1:]:
            acc = acc * t2 + float(c)
        if signed:
            acc = acc * float(lrk.signs[k])
        if tiny is not None:
            acc = jnp.where(tiny, hat if k == 0 else jnp.zeros_like(t2), acc)
        pieces.append(acc)
    return jnp.concatenate(pieces, axis=1)


def _deposit(win_ref, lrk, C: int, foot: float, window_cols: int,
             rows_eval: int, cols_eval: int, rolled: bool, group: int,
             kind: int, ay, ax, ih, coefs, w0, cbase, c0, ro):
    """Deposit one group into the window scratch at static eval extents.

    ay/ax/ih: (1, G) rows; coefs: list of C (1, G) channel coefficient rows;
    w0/cbase/c0: scalar anchors (w0 = the group's 8-aligned row anchor,
    cbase = exact column base, c0 = the aligned DMA window column start the
    contribution is roll-placed into); ro = w0 - band row start (8-aligned
    dynamic in-band offset of the deposit).  Profiles are evaluated over
    (rows_eval, cols_eval) only; the size class chosen in splat_atlas
    guarantees every fitting particle's footprint lies inside.
    """
    o = cbase - c0
    tiny0 = ih < 0.0
    ih2 = ih * ih
    rank = lrk.rank

    cols = jax.lax.broadcasted_iota(jnp.int32, (cols_eval, group), 0
                                    ).astype(jnp.float32)
    dx = cbase.astype(jnp.float32) + cols - ax    # (Wq, G)

    # row segmentation keeps each branch's live temporaries (the channel-
    # stacked (C*S, rank*G) matmul operand) bounded: past ~192 stacked rows
    # Mosaic's scoped-vmem estimate stops the grid pipelining and every
    # step serializes (measured ~4 us/group at C=3 with 96-row extents)
    seg = max(8, ((192 // C) // 8) * 8)

    def accum_seg(pc_all, q, r0, s_rows):
        # (C*S, rank*G) @ (Wq, rank*G)^T; placed with one roll and
        # accumulated per channel via static row slices
        con = jax.lax.dot_general(
            pc_all, q, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if rolled:
            con = jnp.concatenate(
                [con, jnp.zeros((C * s_rows, window_cols - cols_eval),
                                jnp.float32)], axis=1)
            con = pltpu.roll(con, o, 1)
        for c in range(C):
            sl = (c, pl.ds(pl.multiple_of(ro + r0, 8), s_rows), slice(None))
            win_ref[sl] = win_ref[sl] + con[c * s_rows:(c + 1) * s_rows]

    # bf16 inputs, f32 accumulation: profile quantization (~0.2%) is far
    # below the reference's own texture discretization error

    masked = kind == FLAG_MASKED
    tiny = None if kind == FLAG_POLY else tiny0
    if kind != FLAG_ALL_TINY:
        tx2 = jnp.minimum(dx * dx * ih2, SUPPORT2)
        Q = _profiles_lanes(tx2, tiny, lrk, signed=False)
        if masked:
            xmask = ((dx > -foot) & (dx <= foot)).astype(jnp.float32)
            Q = Q * jnp.tile(xmask, (1, rank))
        Qb = Q.astype(jnp.bfloat16)
    else:
        Qb = jnp.maximum(0.0, 1.0 - jnp.abs(dx)).astype(jnp.bfloat16)

    for r0 in range(0, rows_eval, seg):
        s_rows = min(seg, rows_eval - r0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (s_rows, group), 0
                                        ).astype(jnp.float32)
        dy = (w0 + r0).astype(jnp.float32) + rows - ay       # (S, G)

        if kind == FLAG_ALL_TINY:
            # rank-1 cloud-in-cell path: hat profiles, G-wide contraction
            Ph = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
            pc = jnp.concatenate([(Ph * coefs[c]) for c in range(C)], axis=0)
            accum_seg(pc.astype(jnp.bfloat16), Qb, r0, s_rows)
            continue

        ty2 = jnp.minimum(dy * dy * ih2, SUPPORT2)
        P = _profiles_lanes(ty2, tiny, lrk, signed=True)
        if masked:
            # oversize splats (support beyond the footprint window):
            # truncate at the footprint, compensated by the norm table
            ymask = ((dy > -foot) & (dy <= foot)).astype(jnp.float32)
            P = P * jnp.tile(ymask, (1, rank))
        pc = jnp.concatenate(
            [P * jnp.tile(coefs[c], (1, rank)) for c in range(C)], axis=0)
        accum_seg(pc.astype(jnp.bfloat16), Qb, r0, s_rows)


def _group_body(win_ref, lrk, C: int, foot: float, window_rows: int,
                window_cols: int, profile_cols: int, group: int,
                fl, ay, ax, ih, coefs, w0, cbase, c0, ro):
    """Dispatch one group on its combined (kind, size-class) flag."""
    rolled = profile_cols != window_cols

    def classes_for(kind):
        # MIXED/MASKED are rare (band boundaries, clamped coarse splats):
        # full extents only, keeping the branch count small
        if kind in (FLAG_ALL_TINY, FLAG_POLY) and rolled:
            return range(len(SIZE_CLASSES))
        return (FULL_CLASS,)

    for kind in (FLAG_ALL_TINY, FLAG_POLY, FLAG_MIXED, FLAG_MASKED):
        for sz in classes_for(kind):
            r_e, c_e = SIZE_CLASSES[sz]
            rows_eval = window_rows if r_e is None else min(r_e, window_rows)
            cols_eval = profile_cols if c_e is None else min(c_e, profile_cols)

            @pl.when(fl == kind * 4 + sz)
            def _(rows_eval=rows_eval, cols_eval=cols_eval, kind=kind):
                _deposit(win_ref, lrk, C, foot, window_cols, rows_eval,
                         cols_eval, rolled, group, kind, ay, ax, ih, coefs,
                         w0, cbase, c0, ro)


def _make_kernel(n_steps: int, group: int, C: int, lrk, foot: float,
                 window_cols: int, profile_cols: int, window_rows: int,
                 band_rows: int, subgroups: int = SUBGROUPS):
    rolled = profile_cols != window_cols

    def kernel(wb_ref, w0_ref, c0_ref, ce_ref, fl_ref, fr_ref, ay_ref, ax_ref,
               ih_ref, *rest):
        # rest: C per-channel coef refs (separate (1, S, G) blocks: a fused
        # (1, S, C, G) block's (C, G) inner tile costs ~2.8 us/group of
        # relayout at C >= 3, measured), atlas in/out, scratch, semaphores
        coef_refs = rest[:C]
        atlas_out_ref = rest[C + 1]
        win_ref, sem_in, sem_out = rest[C + 2:C + 5]
        g = pl.program_id(0)

        def win_slice(idx):
            return (slice(None),
                    pl.ds(pl.multiple_of(wb_ref[idx], 8), band_rows),
                    pl.ds(pl.multiple_of(c0_ref[idx], COL_ALIGN),
                          window_cols))

        def flush(idx):
            out = pltpu.make_async_copy(win_ref,
                                        atlas_out_ref.at[win_slice(idx)],
                                        sem_out)
            out.start()
            out.wait()

        def load(idx):
            dma = pltpu.make_async_copy(atlas_out_ref.at[win_slice(idx)],
                                        win_ref, sem_in)
            dma.start()
            dma.wait()

        for s in range(subgroups):
            ig = g * subgroups + s
            wb = pl.multiple_of(wb_ref[ig], 8)
            w0 = pl.multiple_of(w0_ref[ig], 8)
            c0 = pl.multiple_of(c0_ref[ig], COL_ALIGN)
            ro = pl.multiple_of(w0 - wb, 8)

            first = ig == 0
            prev = jnp.maximum(ig - 1, 0)
            changed = first | (wb != wb_ref[prev]) | (c0 != c0_ref[prev])

            fresh = fr_ref[ig] == 1

            @pl.when(changed & jnp.logical_not(first))
            def _(prev=prev):
                flush(prev)

            @pl.when(changed & jnp.logical_not(fresh))
            def _(ig=ig):
                load(ig)

            @pl.when(changed & fresh)
            def _():
                win_ref[...] = jnp.zeros((C, band_rows, window_cols),
                                         jnp.float32)

            cbase = ce_ref[ig] if rolled else c0
            coefs = [cref[0, s][None, :] for cref in coef_refs]
            _group_body(win_ref, lrk, C, foot, window_rows, window_cols,
                        profile_cols, group, fl_ref[ig],
                        ay_ref[0, s][None, :], ax_ref[0, s][None, :],
                        ih_ref[0, s][None, :], coefs, w0, cbase, c0, ro)

            if s == subgroups - 1:
                @pl.when(g == n_steps - 1)
                def _(wb=wb, c0=c0):
                    sl = (slice(None), pl.ds(wb, band_rows),
                          pl.ds(c0, window_cols))
                    out = pltpu.make_async_copy(win_ref, atlas_out_ref.at[sl],
                                                sem_out)
                    out.start()
                    out.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("atlas_rows", "atlas_cols", "C", "group",
                                    "interpret", "window_cols",
                                    "window_rows", "fresh_skip", "subgroups"))
def accumulate_groups_pallas(ay_g, ax_g, ih_g, coef_g, w0, c0, ce, flags, *,
                             atlas_rows: int, atlas_cols: int, C: int,
                             group: int, interpret: bool = False,
                             atlas0=None, window_cols: int = WINDOW_COLS,
                             window_rows: int = WINDOW_ROWS,
                             fresh_skip: bool = FRESH_SKIP,
                             subgroups: int = SUBGROUPS):
    """Run the fused accumulation.

    ay_g/ax_g/ih_g: (n_groups, 1, G); coef_g: (n_groups, C, G), or a
    C-list/tuple of (n_groups, G) per-channel arrays (the feed kernel emits
    channels separately — passing them through avoids a relayout);
    w0: (n_groups,) int32 row starts (8-aligned); c0: (n_groups,) int32 col
    starts (COL_ALIGN-aligned); ce: (n_groups,) int32 exact column bases with
    ``c0 <= ce <= c0 + window_cols - PROFILE_COLS`` (profiles are evaluated
    over [ce, ce + PROFILE_COLS)); flags: (n_groups,) int32 FLAG_* group
    classes.  n_groups must be a multiple of ``subgroups``.  When
    ``window_cols`` differs from the default, profiles span the whole window
    (no roll) and ``ce`` must equal ``c0`` (the spill pass uses this with
    full-width windows).  Accumulates on top of ``atlas0`` (zeros if None);
    returns the atlas (C, atlas_rows, atlas_cols).
    """
    n_groups = w0.shape[0]
    assert n_groups % subgroups == 0, (n_groups, subgroups)
    n_steps = n_groups // subgroups
    lrk = kernels.lowrank_kernel()
    from .splat_atlas import FOOT
    profile_cols = PROFILE_COLS if window_cols == WINDOW_COLS else window_cols

    # band anchors: quantize the per-group row anchor so consecutive groups
    # share the (taller) DMA band; the +8 absorbs the 8-alignment of the
    # clipped bottom edge so ro + window_rows always fits the band.  The
    # window scratch must stay under ~512KB: beyond it Mosaic stops
    # pipelining the grid and every step serializes (measured: a 614KB
    # scratch at C=3 cost ~4 us/group even with the deposit disabled)
    max_band = (512 * 1024 // (C * window_cols * 4)) // 8 * 8
    qa = min(ROW_QUANTUM, max_band - window_rows - 8)
    qa = (qa // 8) * 8
    band_rows = window_rows + qa + 8
    if qa >= 8 and band_rows <= atlas_rows:
        wb_top = ((atlas_rows - band_rows) // 8) * 8
        wb = jnp.clip((w0 // qa) * qa, 0, wb_top)
    else:
        band_rows = window_rows  # no VMEM headroom (or tiny atlas): 1:1
        wb = w0

    # first-touch flags: 1 where no earlier group's window can overlap this
    # group's band.  Built without scatters (slow on TPU): a one-hot
    # (n_groups, n_cells) min-reduce gives the earliest-touch index per
    # (band, column) cell, a min-pool sized by the true overlap radii —
    # bands anchored on a qa grid span band_rows rows, so anchors up to
    # (band_rows-1)//qa cells apart overlap (and analogously for columns) —
    # extends it to the overlap neighbourhood, and an exact row-gather reads
    # it back per group (indices exceed bf16's exact-integer range, so a
    # default-precision matmul readback would corrupt the flags).  Only
    # valid when the base atlas is all-zero (atlas0 is None) and windows
    # ride the quantized band grid.
    n_cells = 0
    if atlas0 is None and fresh_skip and band_rows != window_rows:
        n_r = atlas_rows // qa + 1
        n_c = atlas_cols // COL_ALIGN
        n_cells = n_r * n_c
    if n_cells and n_groups * n_cells <= (1 << 25):
        rad_r = (band_rows - 1) // qa
        rad_c = (window_cols - 1) // COL_ALIGN
        cell = (wb // qa) * n_c + c0 // COL_ALIGN
        idxf = jnp.arange(n_groups, dtype=jnp.float32)
        onehot = cell[:, None] == jnp.arange(n_cells, dtype=cell.dtype)
        earliest = jnp.min(
            jnp.where(onehot, idxf[:, None], jnp.float32(n_groups)), axis=0)
        padded = jnp.pad(earliest.reshape(n_r, n_c), ((rad_r, rad_r),
                                                      (rad_c, rad_c)),
                         constant_values=float(n_groups))
        pooled = earliest.reshape(n_r, n_c)
        for dr in range(2 * rad_r + 1):
            for dc in range(2 * rad_c + 1):
                pooled = jnp.minimum(pooled, padded[dr:dr + n_r, dc:dc + n_c])
        mine = jnp.take(pooled.reshape(-1), cell)
        fresh = (mine == idxf).astype(jnp.int32)
    else:
        fresh = jnp.zeros_like(w0)

    kernel = _make_kernel(n_steps, group, C, lrk, float(FOOT), window_cols,
                          profile_cols, window_rows, band_rows,
                          subgroups=subgroups)

    # blocks carry SUBGROUPS groups per step; each coef channel rides its
    # own (1, S, G) block (a combined (1, S, C, G) block's (C, G) inner
    # tile triggers a measured ~2.8 us/group Mosaic relayout at C >= 3)
    ay_b = ay_g.reshape(n_steps, subgroups, group)
    ax_b = ax_g.reshape(n_steps, subgroups, group)
    ih_b = ih_g.reshape(n_steps, subgroups, group)
    if isinstance(coef_g, (list, tuple)):
        coef_bs = [cc.reshape(n_steps, subgroups, group) for cc in coef_g]
        assert len(coef_bs) == C
    else:
        coef_bs = [coef_g[:, c, :].reshape(n_steps, subgroups, group)
                   for c in range(C)]

    row_spec = pl.BlockSpec((1, subgroups, group), lambda g, *_: (g, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_steps,),
        in_specs=[row_spec] * (3 + C) + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((C, band_rows, window_cols), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    if atlas0 is None:
        atlas0 = jnp.zeros((C, atlas_rows, atlas_cols), dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, atlas_rows, atlas_cols), jnp.float32),
        # atlas input follows 6 scalar-prefetch + (3 + C) tensor inputs
        input_output_aliases={9 + C: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(wb, w0, c0, ce, flags, fresh, ay_b, ax_b, ih_b, *coef_bs, atlas0)


def group_flags(ih_groups: jnp.ndarray, coef_groups: jnp.ndarray,
                h_max: float, sizes: jnp.ndarray | None = None) -> jnp.ndarray:
    """Classify groups for the kernel's specialized paths, vectorized.

    ih_groups: (n_groups, G) signed inverse smoothing (negative = tiny CIC);
    coef_groups: (n_groups, G, C) fit-masked deposit coefficients;
    h_max: level-pixel smoothing above which footprints are truncated
    (config.SPLAT_MAX_HALF_SIZE_PX) — only clamped coarsest-level splats
    exceed it; sizes: (n_groups,) int32 SIZE_CLASSES index per group (from
    the group's row/col span), or None to force the full window everywhere.

    Returns the combined prefetched flag kind * 4 + size_class (size only
    differentiates TINY/POLY groups; the rare kinds always run full).
    """
    active = jnp.abs(coef_groups).sum(axis=(1, 2)) > 0.0
    all_tiny = ih_groups.max(axis=1) < 0.0
    any_tiny = ih_groups.min(axis=1) < 0.0
    big_th = (1.0 / h_max) * (1.0 - 1e-6)
    any_big = ((ih_groups > 0.0) & (ih_groups < big_th)).any(axis=1)
    kind = jnp.where(
        ~active, FLAG_INACTIVE,
        jnp.where(all_tiny, FLAG_ALL_TINY,
                  jnp.where(any_big, FLAG_MASKED,
                            jnp.where(any_tiny, FLAG_MIXED,
                                      FLAG_POLY)))).astype(jnp.int32)
    if sizes is None:
        sz = jnp.full_like(kind, FULL_CLASS)
    else:
        sz = jnp.where((kind == FLAG_ALL_TINY) | (kind == FLAG_POLY),
                       sizes.astype(jnp.int32), FULL_CLASS)
    return kind * 4 + sz
