"""Fused Pallas TPU kernel for z-buffered (max-composite) splatting.

The surface render mode keeps the *front-most* fragment per pixel
(reference: src/topsy/sph.py:459-656 — depth test ``greater`` with replace
blending), which cannot be expressed as the additive kernel's matmul
deposit.  This kernel reuses the atlas splatter's structure — sorted
presorted groups, banded DMA windows with quantized anchors, per-group
(kind, size-class) prefetched flags (ops/splat_pallas.py) — but the
deposit evaluates each particle's hemisphere depth field

    depth(dy, dx) = z01 + sqrt(max(4 - (dy^2+dx^2)/h^2, 0)) * h_clip/2

directly on the VPU, reduces the winner across the group's particle lanes
per window column (depth max + value-of-max), and merges the group result
into a two-plane (depth, value) VMEM window with a front-most select.

Unlike the additive kernel there is no matmul: the per-column winner
reduction is VPU work whose lowering overheads (not raw element count)
dominate — measured 7-53 us per 512-particle group depending on size
class, i.e. ~10-70M particles/s: ~2 orders of magnitude over the XLA
scatter-max fallback (ops/zsplat.py, ~0.1M particles/s on v5e), and
enough for interactive surface LOD frames.  Further headroom (batch-
chunked rank-3 fields, SMEM-fed scalars) is bounded by Mosaic's ~0.3 us
dynamic-loop iterations, unroll code-size limits, and the 1MB SMEM
scalar-prefetch budget — see the repo ARCHITECTURE notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .splat_pallas import (COL_ALIGN, FULL_CLASS, PROFILE_COLS, ROW_QUANTUM,
                           SIZE_CLASSES, SUBGROUPS, WINDOW_COLS, WINDOW_ROWS)

NEG = -3.0e38  # effectively -inf for depth comparisons, finite for math

FLAG_SKIP = 0      # no valid fragment in the group
FLAG_ACTIVE = 1    # active: combined flag is FLAG_ACTIVE * 4 + size_class


def _max_deposit(win_ref, window_cols: int, rows_eval: int, cols_eval: int,
                 rolled: bool, group: int, ay, ax, ih, z, hch, val,
                 w0, cbase, c0, ro):
    """Deposit one group's front-most fragments into the window scratch.

    ay/ax/ih/z/hch/val: (1, G) rows (ih <= 0 marks invalid particles);
    anchors as in splat_pallas._deposit.  Per window column, the (R, G)
    hemisphere depth field is evaluated and the winner reduced across the
    particle lanes (depth max, then value-of-max).  Columns ≤ 64 are
    statically unrolled; wider extents loop dynamically (Mosaic dynamic
    iterations carry a measured ~0.3 us fixed cost, so wide columns and
    the full-width spill windows pay it — acceptable for the rare classes
    and pathological scenes they serve).
    """
    o = cbase - c0
    valid = ih > 0.0
    ih2 = ih * ih
    foot = 8.0  # splat_atlas.FOOT: deterministic truncation of oversize
    rows = jax.lax.broadcasted_iota(jnp.int32, (rows_eval, group), 0
                                    ).astype(jnp.float32)
    dy = w0.astype(jnp.float32) + rows - ay                      # (R, G)
    A = dy * dy
    vmask = valid & (dy > -foot) & (dy <= foot)
    zrow = jnp.where(valid, z, NEG)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows_eval, cols_eval), 1)

    def col_body(c, res):
        res_d, res_v = res
        dx = cbase.astype(jnp.float32) + c.astype(jnp.float32) - ax  # (1, G)
        t = 4.0 - (A + dx * dx) * ih2                                # (R, G)
        k = jnp.sqrt(jnp.maximum(t, 0.0))
        inside = (dx > -foot) & (dx <= foot)
        dep = jnp.where((t > 0.0) & vmask & inside, zrow + k * hch, NEG)
        dmax = jnp.max(dep, axis=1, keepdims=True)                   # (R, 1)
        # value of the winning fragment (ties keep the larger value —
        # z-fighting order is unspecified in the reference rasterizer too)
        vmax = jnp.max(jnp.where(dep >= dmax, val, NEG), axis=1,
                       keepdims=True)
        m = lane == c
        return (jnp.where(m, dmax, res_d), jnp.where(m, vmax, res_v))

    init = jnp.full((rows_eval, cols_eval), NEG, jnp.float32)
    if cols_eval <= 64:
        res_d, res_v = init, init
        for c in range(cols_eval):
            res_d, res_v = col_body(jnp.int32(c), (res_d, res_v))
    else:
        res_d, res_v = jax.lax.fori_loop(0, cols_eval, col_body,
                                         (init, init))

    if rolled:
        padw = window_cols - cols_eval
        res_d = pltpu.roll(jnp.concatenate(
            [res_d, jnp.full((rows_eval, padw), NEG, jnp.float32)], axis=1),
            o, 1)
        res_v = pltpu.roll(jnp.concatenate(
            [res_v, jnp.full((rows_eval, padw), NEG, jnp.float32)], axis=1),
            o, 1)

    sl_d = (0, pl.ds(ro, rows_eval), slice(None))
    sl_v = (1, pl.ds(ro, rows_eval), slice(None))
    cur_d = win_ref[sl_d]
    cur_v = win_ref[sl_v]
    take = (res_d > cur_d) | ((res_d == cur_d) & (res_v > cur_v))
    win_ref[sl_d] = jnp.where(take, res_d, cur_d)
    win_ref[sl_v] = jnp.where(take, res_v, cur_v)


def _group_body(win_ref, window_rows: int, window_cols: int,
                profile_cols: int, group: int, fl, ay, ax, ih, z, hch, val,
                w0, cbase, c0, ro):
    rolled = profile_cols != window_cols
    classes = range(len(SIZE_CLASSES)) if rolled else (FULL_CLASS,)
    for sz in classes:
        r_e, c_e = SIZE_CLASSES[sz]
        rows_eval = window_rows if r_e is None else min(r_e, window_rows)
        cols_eval = profile_cols if c_e is None else min(c_e, profile_cols)

        @pl.when(fl == FLAG_ACTIVE * 4 + sz)
        def _(rows_eval=rows_eval, cols_eval=cols_eval):
            _max_deposit(win_ref, window_cols, rows_eval, cols_eval, rolled,
                         group, ay, ax, ih, z, hch, val, w0, cbase, c0, ro)


def _make_kernel(n_steps: int, group: int, window_cols: int,
                 profile_cols: int, window_rows: int, band_rows: int,
                 subgroups: int = SUBGROUPS):
    def kernel(wb_ref, w0_ref, c0_ref, ce_ref, fl_ref, ay_ref, ax_ref,
               ih_ref, pay_ref, atlas_in_ref, atlas_out_ref, win_ref,
               sem_in, sem_out):
        del atlas_in_ref  # aliased with atlas_out_ref
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

            @pl.when(changed & jnp.logical_not(first))
            def _(prev=prev):
                flush(prev)

            @pl.when(changed)
            def _(ig=ig):
                load(ig)

            rolled = profile_cols != window_cols
            cbase = ce_ref[ig] if rolled else c0
            _group_body(win_ref, window_rows, window_cols, profile_cols,
                        group, fl_ref[ig],
                        ay_ref[0, s][None, :], ax_ref[0, s][None, :],
                        ih_ref[0, s][None, :],
                        pay_ref[0, s, 0][None, :], pay_ref[0, s, 1][None, :],
                        pay_ref[0, s, 2][None, :], w0, cbase, c0, ro)

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
                   static_argnames=("atlas_rows", "atlas_cols", "group",
                                    "interpret", "window_cols",
                                    "window_rows", "subgroups"))
def accumulate_max_groups_pallas(ay_g, ax_g, ih_g, pay_g, w0, c0, ce, flags,
                                 *, atlas_rows: int, atlas_cols: int,
                                 group: int, interpret: bool = False,
                                 atlas0=None, window_cols: int = WINDOW_COLS,
                                 window_rows: int = WINDOW_ROWS,
                                 subgroups: int = SUBGROUPS):
    """Max-composite accumulation over sorted groups.

    ay_g/ax_g/ih_g: (n_groups, 1, G) with ih <= 0 marking invalid
    particles; pay_g: (n_groups, 3, G) payload rows [z01, h_clip_half,
    value]; anchors/flags as in splat_pallas.accumulate_groups_pallas with
    flags = FLAG_ACTIVE*4+size or FLAG_SKIP.  Returns the two-plane atlas
    (2, atlas_rows, atlas_cols) = [depth, value]; background depth is 0 (a
    cleared z-buffer, as the reference).
    """
    n_groups = w0.shape[0]
    assert n_groups % subgroups == 0, (n_groups, subgroups)
    n_steps = n_groups // subgroups
    profile_cols = PROFILE_COLS if window_cols == WINDOW_COLS else window_cols

    # cap the scratch under ~512KB (see splat_pallas: larger scratches
    # serialize the Mosaic grid pipeline)
    max_band = (512 * 1024 // (2 * window_cols * 4)) // 8 * 8
    qa = min(ROW_QUANTUM, max_band - window_rows - 8)
    qa = (qa // 8) * 8
    band_rows = window_rows + qa + 8
    if qa >= 8 and band_rows <= atlas_rows:
        wb_top = ((atlas_rows - band_rows) // 8) * 8
        wb = jnp.clip((w0 // qa) * qa, 0, wb_top)
    else:
        band_rows = window_rows
        wb = w0

    kernel = _make_kernel(n_steps, group, window_cols, profile_cols,
                          window_rows, band_rows, subgroups=subgroups)

    ay_b = ay_g.reshape(n_steps, subgroups, group)
    ax_b = ax_g.reshape(n_steps, subgroups, group)
    ih_b = ih_g.reshape(n_steps, subgroups, group)
    pay_b = pay_g.reshape(n_steps, subgroups, 3, group)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, subgroups, group), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((1, subgroups, group), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((1, subgroups, group), lambda g, *_: (g, 0, 0)),
            pl.BlockSpec((1, subgroups, 3, group),
                         lambda g, *_: (g, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, band_rows, window_cols), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    if atlas0 is None:
        atlas0 = jnp.zeros((2, atlas_rows, atlas_cols), dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, atlas_rows, atlas_cols),
                                       jnp.float32),
        input_output_aliases={9: 0},  # atlas input (after 5 scalar + 4 tensor)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(wb, w0, c0, ce, flags, ay_b, ax_b, ih_b, pay_b, atlas0)
