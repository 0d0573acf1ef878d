"""Atlas-windowed z-buffered splatting: the TPU fast path for surface mode.

Drives ops/zsplat_pallas.py with the same presorted (bucket, Morton)
machinery as the additive atlas splatter (ops/splat_atlas.py): per-group
support-tight window anchors, size classes, banded DMA windows, and exact
spill tiers — but the deposit keeps the front-most hemisphere fragment per
pixel instead of accumulating (reference: src/topsy/sph.py:459-656).

Requires presorted input (the per-frame band sort is never paid: surface
interactive frames use the column-LOD slices, exports the full presorted
arrays).  The XLA scatter-max path (ops/zsplat.py) remains the reference
implementation for CPU tests and non-presorted fallbacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .splat import H_MIN, H_TRUNC, PyramidSpec, default_pyramid, exp2_int, \
    levels_from_buckets, project
from .splat_atlas import BAND, COL_PAD, FOOT, ROW_PAD, atlas_layout
from .zsplat import HEMI_SUPPORT
from .zsplat_pallas import (FLAG_ACTIVE, FULL_CLASS, PROFILE_COLS,
                            SIZE_CLASSES, SUBGROUPS, WINDOW_COLS,
                            accumulate_max_groups_pallas)

GROUP = 512


def zsplat_atlas(pos_smooth, values, matrix, resolution, scale,
                 presorted_buckets, density_cut=0.0, extra_mask=None,
                 pyramid: PyramidSpec | None = None, giants="none",
                 group: int | None = None, subgroups: int | None = None,
                 spill_group_cap: int | None = None,
                 t3_cap: int | None = None):
    """(N,4) x (N,>=2 [mass, qty]) -> ((res, res, 2) [value, depth], dropped).

    Same output contract as zsplat.zsplat_scatter; ``presorted_buckets``
    is required (arrays in ops/morton.py order).  Background depth is 0.

    ``giants``: 'none' keeps the truncated/squeezed windowed hemisphere for
    over-window splats (the zsplat_scatter-compatible legacy behavior), or
    a smoothing-bucket threshold — those splats are dropped here and the
    caller max-composites the exact dense layer
    (ops/splat_giant.zsplat_giant_image) instead.

    ``spill_group_cap`` / ``t3_cap``: spill-tier budget overrides.  The
    whole-tier surface column path raises both (as the additive path does,
    render/sph._render_block_columns_fields) — decimation-tier groups
    cover 8x the volume of main-layout groups, so whole-tier CHANGE frames
    at 2^26-2^27 overflow the default budgets and silently drop splats.
    Setting ``t3_cap`` also switches tier 3 to the unconditional group=1
    pallas pass (the cond-wrapped scan costs ~150 us per straggler when
    taken — see splat_atlas's identical policy).
    """
    if pyramid is None:
        pyramid = default_pyramid(resolution)
    interpret = jax.default_backend() != "tpu"

    n = pos_smooth.shape[0]
    # ``group`` override: the surface column path passes the slice width so
    # each original presorted group keeps its own (tight) window — flat
    # slices reshape to one row per original group instead of merging
    # pad_group/width of them (merged unions flood the spill tiers, see
    # render/sph._render_block_columns_fields); ``subgroups`` scales the
    # kernel's groups-per-step so the per-step pipeline latency amortizes
    # over an unchanged particle count
    G = group if group is not None else (
        GROUP if n >= 1 << 18 else (128 if n >= 1 << 14 else 64))
    sg = SUBGROUPS if subgroups is None else subgroups
    pad_quantum = G * sg
    n_pad = max(pad_quantum, ((n + pad_quantum - 1) // pad_quantum) * pad_quantum)

    row_offs, atlas_rows, atlas_cols = atlas_layout(pyramid)
    res_per_level = jnp.asarray(pyramid.level_resolutions, dtype=jnp.float32)
    row_offs_arr = jnp.asarray(row_offs, dtype=jnp.float32)

    # ---- front-end: projection, level placement, payload -------------------
    cx, cy, z01, h_px, visible = project(pos_smooth, matrix, resolution, scale)
    px_per_world = resolution / (2.0 * scale)
    lev = levels_from_buckets(presorted_buckets, px_per_world,
                              pyramid.num_levels)
    from .splat import assign_levels
    lev, h_eff, _tiny = assign_levels(h_px, pyramid.num_levels, lev=lev)
    h_eff = jnp.clip(h_eff, H_MIN, H_TRUNC)
    inv_lev_scale = exp2_int(-lev)
    cx_l = (cx + 0.5) * inv_lev_scale - 0.5
    cy_l = (cy + 0.5) * inv_lev_scale - 0.5

    mass = values[:, 0]
    qty = values[:, 1]
    h_world = pos_smooth[:, 3]
    rho = mass / jnp.maximum(h_world, 1e-30) ** 3
    ok = visible & (rho > density_cut)
    if extra_mask is not None:
        ok = ok & extra_mask
    if giants != "none":
        from .splat_giant import GIANT_H
        h_l = h_px * inv_lev_scale
        ok = ok & ~((h_l > GIANT_H)
                    & (presorted_buckets >= jnp.asarray(giants, jnp.int32)))
    h_clip_half = h_world / scale * 0.5

    res_l = res_per_level[lev]
    margin = float(COL_PAD) - FOOT + 4.0
    cyc = jnp.clip(cy_l, -margin, res_l + margin)
    cxc = jnp.clip(cx_l, -margin, res_l + margin)
    ay = row_offs_arr[lev] + cyc
    ax = COL_PAD + cxc
    sentinel_ay = float(atlas_rows - ROW_PAD + FOOT + 2.0)
    ay = jnp.where(jnp.isnan(ay), sentinel_ay, ay)
    ax = jnp.where(jnp.isnan(ax), float(COL_PAD), ax)
    ok = ok & jnp.isfinite(z01) & jnp.isfinite(h_clip_half)
    inv_h = jnp.where(ok, 1.0 / h_eff, -1.0)
    z01c = jnp.nan_to_num(z01)
    hchc = jnp.nan_to_num(h_clip_half)

    def pad_to(x, fill):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)])

    ay_s = pad_to(ay, sentinel_ay)
    ax_s = pad_to(ax, float(COL_PAD))
    ih_s = pad_to(inv_h, -1.0)
    z_s = pad_to(z01c, 0.0)
    hch_s = pad_to(hchc, 0.0)
    val_s = pad_to(qty, 0.0)

    # ---- anchors, classes, fits (as splat_atlas, support-tight) ------------
    n_groups = n_pad // G
    sup_s = jnp.where(ih_s > 0.0,
                      jnp.minimum(HEMI_SUPPORT / jnp.abs(ih_s), FOOT), 1.0)
    ay_lo = ay_s - sup_s
    ay_hi = ay_s + sup_s
    ax_lo = ax_s - sup_s
    ax_hi = ax_s + sup_s
    lo_r = ay_lo.reshape(n_groups, G).min(axis=1)
    hi_r = ay_hi.reshape(n_groups, G).max(axis=1)
    lo_c = ax_lo.reshape(n_groups, G).min(axis=1)
    hi_c = ax_hi.reshape(n_groups, G).max(axis=1)
    window_rows = 96
    w0 = (jnp.floor(lo_r / BAND).astype(jnp.int32) * BAND)
    w0 = jnp.clip(w0, 0, ((atlas_rows - window_rows) // BAND) * BAND)
    c0e = jnp.floor(lo_c).astype(jnp.int32)
    c0 = jnp.clip((c0e // 128) * 128, 0, atlas_cols - WINDOW_COLS)
    c0e = jnp.clip(c0e, c0, c0 + WINDOW_COLS - PROFILE_COLS)

    w0_rep = jnp.repeat(w0, G).astype(jnp.float32)
    c0_rep = jnp.repeat(c0e, G).astype(jnp.float32)
    fits = ((ay_hi < w0_rep + window_rows)
            & (ax_hi < c0_rep + PROFILE_COLS)
            & (ax_lo >= c0_rep))
    ih_fit = jnp.where(fits, ih_s, -jnp.abs(ih_s))

    w0f = w0.astype(jnp.float32)
    c0ef = c0e.astype(jnp.float32)
    sizes = jnp.full_like(w0, FULL_CLASS)
    for sz in range(len(SIZE_CLASSES) - 2, -1, -1):
        r_e, c_e = SIZE_CLASSES[sz]
        r_e = window_rows if r_e is None else min(r_e, window_rows)
        c_e = PROFILE_COLS if c_e is None else c_e
        fit_sz = (hi_r < w0f + r_e) & (hi_c < c0ef + c_e)
        sizes = jnp.where(fit_sz, sz, sizes)
    active = (ih_fit > 0.0).reshape(n_groups, G).any(axis=1)
    flags = jnp.where(active, FLAG_ACTIVE * 4 + sizes, 0).astype(jnp.int32)

    pay = jnp.stack([z_s, hch_s, val_s], axis=0)          # (3, n_pad)
    pay_g = pay.reshape(3, n_groups, G).transpose(1, 0, 2)

    atlas = accumulate_max_groups_pallas(
        ay_s.reshape(n_groups, 1, G), ax_s.reshape(n_groups, 1, G),
        ih_fit.reshape(n_groups, 1, G), pay_g, w0, c0, c0e, flags,
        atlas_rows=atlas_rows, atlas_cols=atlas_cols, group=G,
        interpret=interpret, window_rows=window_rows, subgroups=sg)

    # ---- spill tiers (mirrors splat_atlas; max semantics) ------------------
    spilled = ~fits & (ih_s > 0.0)
    per_group_spill = spilled.reshape(n_groups, G).sum(axis=1)
    n_spill = per_group_spill.sum()
    G_SPILL = max(16, G // 8)
    k_groups = min(n_groups, (config.SPLAT_SPILL_GROUP_CAP
                              if spill_group_cap is None
                              else spill_group_cap))
    k_groups = max(1, (k_groups * (G // G_SPILL)) // SUBGROUPS) \
        * SUBGROUPS * G_SPILL // G
    spill_cap = k_groups * G

    def do_spill(atlas):
        _, top_idx = jax.lax.top_k(per_group_spill, k_groups)
        # layout order: keep gathered groups Morton-adjacent so spill
        # subgroups share DMA bands (see splat_atlas.spill_pass)
        top_idx = jnp.sort(top_idx)

        def gather(arr):
            return jnp.take(arr.reshape(n_groups, G, -1), top_idx,
                            axis=0).reshape(spill_cap, -1)

        valid = gather(spilled)[:, 0]
        s_ay = gather(ay_s)[:, 0]
        s_ax = gather(ax_s)[:, 0]
        s_ih = jnp.where(valid, jnp.abs(gather(ih_s)[:, 0]), -1.0)
        s_z = gather(z_s)[:, 0]
        s_hch = gather(hch_s)[:, 0]
        s_val = gather(val_s)[:, 0]

        n_sg = spill_cap // G_SPILL
        valid2 = valid.reshape(n_sg, G_SPILL)
        ay2 = s_ay.reshape(n_sg, G_SPILL)
        ay2m = jnp.where(valid2, ay2, jnp.inf).min(axis=1)
        ay2m = jnp.where(jnp.isfinite(ay2m), ay2m, float(ROW_PAD))
        sw0 = (jnp.floor((ay2m - FOOT) / BAND).astype(jnp.int32) * BAND)
        sw0 = jnp.clip(sw0, 0, ((atlas_rows - window_rows) // BAND) * BAND)
        sc0 = jnp.zeros_like(sw0)

        sw0_rep = jnp.repeat(sw0, G_SPILL).astype(jnp.float32)
        fits2 = (s_ay + FOOT < sw0_rep + window_rows) & valid
        s_ih2 = jnp.where(fits2, s_ih, -jnp.abs(s_ih))
        straggler = ~fits2 & valid
        n3 = straggler.sum()

        active2 = (s_ih2 > 0.0).reshape(n_sg, G_SPILL).any(axis=1)
        sflags = jnp.where(active2, FLAG_ACTIVE * 4 + FULL_CLASS, 0
                           ).astype(jnp.int32)
        spay = jnp.stack([s_z, s_hch, s_val], axis=0)
        spay_g = spay.reshape(3, n_sg, G_SPILL).transpose(1, 0, 2)
        atlas = accumulate_max_groups_pallas(
            s_ay.reshape(n_sg, 1, G_SPILL), s_ax.reshape(n_sg, 1, G_SPILL),
            s_ih2.reshape(n_sg, 1, G_SPILL), spay_g, sw0, sc0, sc0, sflags,
            atlas_rows=atlas_rows, atlas_cols=atlas_cols, group=G_SPILL,
            interpret=interpret, atlas0=atlas, window_cols=atlas_cols,
            window_rows=window_rows)

        # tier 3: per-particle dynamic windows, max-merged sequentially
        T3 = min(1024 if t3_cap is None else t3_cap, spill_cap)

        if t3_cap is not None:
            # the whole-tier surface column path: run tier 3 as an
            # UNCONDITIONAL group=1 pallas pass (top_k compaction, windows
            # fit by construction, inactive when no stragglers) — the
            # cond-wrapped scan below costs ~150 us per step when taken,
            # which at t3_cap=4096 would dwarf the whole frame (same
            # policy and rationale as splat_atlas's tier 3)
            from .splat_pallas import COL_ALIGN
            _, idx3 = jax.lax.top_k(straggler.astype(jnp.float32)
                                    * (2.0 - jnp.arange(spill_cap,
                                                        dtype=jnp.float32)
                                       / spill_cap), T3)
            valid3 = jnp.take(straggler, idx3)
            t_ay = jnp.take(s_ay, idx3)
            t_ax = jnp.take(s_ax, idx3)
            t_ih = jnp.where(valid3, jnp.abs(jnp.take(s_ih, idx3)), -1.0)
            t_z = jnp.take(s_z, idx3)
            t_hch = jnp.take(s_hch, idx3)
            t_val = jnp.take(s_val, idx3)
            tw0 = (jnp.floor((t_ay - FOOT) / BAND).astype(jnp.int32) * BAND)
            tw0 = jnp.clip(tw0, 0,
                           ((atlas_rows - window_rows) // BAND) * BAND)
            ce_raw = jnp.floor(t_ax - FOOT).astype(jnp.int32)
            tc0 = jnp.clip((ce_raw // COL_ALIGN) * COL_ALIGN, 0,
                           atlas_cols - WINDOW_COLS)
            tce = jnp.clip(ce_raw, tc0, tc0 + WINDOW_COLS - PROFILE_COLS)
            tflags = jnp.where(valid3, FLAG_ACTIVE * 4 + FULL_CLASS, 0
                               ).astype(jnp.int32)
            tpay = jnp.stack([t_z, t_hch, t_val], axis=0)
            atlas = accumulate_max_groups_pallas(
                t_ay.reshape(T3, 1, 1), t_ax.reshape(T3, 1, 1),
                t_ih.reshape(T3, 1, 1), tpay.reshape(3, T3, 1
                                                     ).transpose(1, 0, 2),
                tw0, tc0, tce, tflags, atlas_rows=atlas_rows,
                atlas_cols=atlas_cols, group=1, interpret=interpret,
                atlas0=atlas, window_rows=window_rows)
            not_gathered = n_spill - valid.sum()
            return atlas, not_gathered + jnp.maximum(n3 - T3, 0)

        def do_t3(atlas):
            big3 = jnp.int32(np.iinfo(np.int32).max)
            key3 = jnp.where(straggler,
                             jnp.arange(spill_cap, dtype=jnp.int32), big3)
            ops3 = jax.lax.sort(
                (key3, s_ay, s_ax, jnp.abs(s_ih), s_z, s_hch, s_val),
                num_keys=1)
            valid3 = ops3[0][:T3] < big3
            t_ay, t_ax, t_ih, t_z, t_hch, t_val = (o[:T3] for o in ops3[1:])
            tw0 = (jnp.floor((t_ay - FOOT) / BAND).astype(jnp.int32) * BAND)
            tw0 = jnp.clip(tw0, 0, ((atlas_rows - window_rows) // BAND) * BAND)
            tc0 = jnp.clip(jnp.floor(t_ax - FOOT).astype(jnp.int32),
                           0, atlas_cols - WINDOW_COLS)
            rows_w = jnp.arange(window_rows, dtype=jnp.float32)
            cols_w = jnp.arange(WINDOW_COLS, dtype=jnp.float32)

            def tbody(atlas, inputs):
                v3, ayp, axp, ihp, zp, hchp, valp, w0p, c0p = inputs
                dy = w0p.astype(jnp.float32) + rows_w - ayp
                dx = c0p.astype(jnp.float32) + cols_w - axp
                t = 4.0 - (dy[:, None] ** 2 + dx[None, :] ** 2) * ihp ** 2
                k = jnp.sqrt(jnp.maximum(t, 0.0))
                inside = ((dy > -FOOT) & (dy <= FOOT))[:, None] \
                    & ((dx > -FOOT) & (dx <= FOOT))[None, :]
                dep = jnp.where((t > 0.0) & v3 & inside, zp + k * hchp,
                                -jnp.inf)
                cur = jax.lax.dynamic_slice(
                    atlas, (0, w0p, c0p), (2, window_rows, WINDOW_COLS))
                front = dep > cur[0]
                new = jnp.stack([jnp.where(front, dep, cur[0]),
                                 jnp.where(front, valp, cur[1])])
                return jax.lax.dynamic_update_slice(atlas, new,
                                                    (0, w0p, c0p)), None

            atlas, _ = jax.lax.scan(
                tbody, atlas,
                (valid3, t_ay, t_ax, t_ih, t_z, t_hch, t_val, tw0, tc0))
            return atlas

        atlas = jax.lax.cond(n3 > 0, do_t3, lambda a: a, atlas)
        not_gathered = n_spill - valid.sum()
        return atlas, not_gathered + jnp.maximum(n3 - T3, 0)

    atlas, dropped = jax.lax.cond(n_spill > 0, do_spill,
                                  lambda a: (a, jnp.int32(0)), atlas)

    return collapse_max_atlas(atlas, pyramid), dropped


def collapse_max_atlas(atlas: jnp.ndarray, pyramid: PyramidSpec):
    """Max-composite the channel-major (2=[depth, value], rows, cols) atlas
    pyramid into a (res, res, 2) [value, depth] image (the zsplat contract).

    Coarse levels are upsampled with coverage-normalized bilinear filtering
    (ops/composite.upsample2x_zmax_cm): interpolating (depth, value)
    directly would smear silhouettes into the empty background — a raw
    bilinear collapse measured up to 2^level fine pixels of spurious faint
    coverage beyond the true footprint, which the reference's rasterizer
    (exact fragments at full resolution) never produces.  Upsampled coarse
    content loses against finer content only where the finer fragment is in
    front — the occlusion analogue of the additive collapse (same rule as
    zsplat._collapse_max)."""
    from .composite import upsample2x_zmax_cm
    row_offs, _, _ = atlas_layout(pyramid)
    levels = []
    for l, res_l in enumerate(pyramid.level_resolutions):
        r0 = row_offs[l]
        levels.append(atlas[:, r0:r0 + res_l, COL_PAD:COL_PAD + res_l])
    out = levels[-1]
    for l in range(pyramid.num_levels - 2, -1, -1):
        target = pyramid.level_resolutions[l]
        up = upsample2x_zmax_cm(out)[:, :target, :target]
        fine = levels[l]
        front = fine[0] >= up[0]
        out = jnp.where(front[None], fine, up)
    depth = jnp.maximum(out[0], 0.0)
    value = jnp.where(out[0] > 0.0, out[1], 0.0)
    return jnp.stack([value, depth], axis=-1)
