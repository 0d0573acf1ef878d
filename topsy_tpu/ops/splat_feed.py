"""Fused Pallas front-end ("feed") kernel for the presorted splat path.

The XLA front-end (splat.splat_coefficients + the anchor/flag stages of
splat_atlas.splat_atlas) is bandwidth-bound across ~60 materialized array
traversals (measured 1.33-1.78 ms at 2^22 on v5e, vs ~0.22 ms of
irreducible traffic).  Fusion stops at the group reductions, the
``jnp.repeat`` broadcasts and the (n_groups, G, C) -> (n_groups, C, G)
relayout, none of which XLA can sink into one pass.

This kernel computes the whole front-end in a single bandwidth-optimal
sweep: projection, level math, deposit coefficients, the per-group window
anchors (min/max reductions over the lane axis), fit masks, size classes
and dispatch flags — emitting exactly the operand layout
``accumulate_groups_pallas`` consumes (particles in lanes, channel-major
coefficients, int32 anchor/flag vectors for scalar prefetch).

Inputs are the *transposed* presorted layout: per-field (n_groups, GROUP)
matrices (x, y, z, h and per-channel values) so every block read is
contiguous and group reductions are row reductions.  The particle store
holds presorted data in this layout (render/store.py).

A scalar-prefetched group offset ``g0`` lets the EXPORT piece loop feed
[g0, g0 + piece) directly from the full arrays — no dynamic_slice copies —
and a (start, count) particle range replaces the XLA range mask.

Reference parity: this replaces the per-frame work of the reference's
vertex shader + accumulation setup (reference: src/topsy/sph.py:268-362,
shaders/sph.wgsl); the math is identical to splat.splat_coefficients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels
from .splat import H_MIN, H_MAX, H_TRUNC, _norm_poly
from .splat_pallas import (COL_ALIGN, PROFILE_COLS, WINDOW_COLS,
                           FLAG_ALL_TINY, FLAG_INACTIVE, FLAG_MASKED,
                           FLAG_MIXED, FLAG_POLY, FULL_CLASS, SIZE_CLASSES)

F32_MAX = float(np.finfo(np.float32).max)


def _feed_kernel_body(sp_i, sp_f, pergroup, x, y, z, h, vals, mask,
                      outs, *, C_in: int, depth_channel: bool, group: int,
                      b_g: int, resolution: int, atlas_rows: int,
                      atlas_cols: int, window_rows: int, band: int,
                      col_pad: float, foot: float, ranged: bool,
                      norm_coeffs, norm_centre: float, norm_halfwidth: float,
                      sentinel_ay: float):
    """The per-block computation (shared by the pallas kernel and tests)."""
    gi = pl.program_id(0)

    m = [sp_f[k] for k in range(12)]           # world->clip rows 0..2
    ppw = sp_f[12]                             # pixels per world unit
    inv_ppw = sp_f[13]

    res_half = resolution * 0.5
    cxw = x * m[0] + y * m[1] + z * m[2] + m[3]
    cyw = x * m[4] + y * m[5] + z * m[6] + m[7]
    z01 = x * m[8] + y * m[9] + z * m[10] + m[11]
    cx = (cxw + 1.0) * res_half - 0.5
    cy = (1.0 - cyw) * res_half - 0.5
    h_px = h * ppw
    visible = ((z01 >= 0.0) & (z01 <= 1.0) & (h_px > 0.0)
               & (h_px <= F32_MAX))
    if ranged:
        g0 = sp_i[0]
        start = sp_i[1]
        count = sp_i[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (b_g, group), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (b_g, group), 1)
        p = (g0 + gi * b_g + row) * group + lane
        visible = visible & (p >= start) & (p < start + count)
    if mask is not None:
        visible = visible & (mask > 0.0)

    inv_lev = pergroup[:, 1:2]                 # 2^-level, per group
    lev_scale = pergroup[:, 2:3]               # 2^level
    row_off = pergroup[:, 3:4]                 # atlas row offset of the level
    res_l = pergroup[:, 4:5]                   # level resolution

    h_l = h_px * inv_lev
    tiny = h_l < H_MIN
    h_eff = jnp.where(tiny, 1.0, jnp.clip(h_l, H_MIN, H_TRUNC))
    cx_l = (cx + 0.5) * inv_lev - 0.5
    cy_l = (cy + 0.5) * inv_lev - 0.5
    h_eff_world = h_eff * lev_scale * inv_ppw

    t = (jnp.clip(h_eff, 0.4, H_TRUNC) - norm_centre) * (1.0 / norm_halfwidth)
    acc = jnp.full_like(t, float(norm_coeffs[0]))
    for c in norm_coeffs[1:]:
        acc = acc * t + float(c)
    c_norm = jnp.where(tiny, 1.0, acc)
    w = c_norm / (h_eff_world * h_eff_world)
    w = jnp.where(visible, w, 0.0)

    # giants (support wider than the deposit window, h_l > foot/SUPPORT)
    # whose smoothing bucket >= sp_i[3] are excluded here and rendered
    # exactly by the caller's dense full-support pass over the layout's
    # static candidate pool (ops/splat_giant.py; render/sph._giant_layer).
    # The bucket criterion survives column slicing and mesh slabbing
    # unchanged; sp_i[3] = BUCKET_DISABLED turns the gate off (giants keep
    # the mass-conserving truncated deposit).
    bucket = pergroup[:, 0:1]
    giant = ((~tiny) & (h_l > foot / kernels.KERNEL_SUPPORT)
             & (bucket >= sp_i[3].astype(jnp.float32)))
    w = jnp.where(giant, 0.0, w)

    margin = col_pad - foot + 4.0
    cyc = jnp.clip(cy_l, -margin, res_l + margin)
    cxc = jnp.clip(cx_l, -margin, res_l + margin)
    ay = row_off + cyc
    ax = col_pad + cxc
    ih = jnp.where(tiny, -1.0, 1.0 / h_eff)
    ay = jnp.where(ay == ay, ay, sentinel_ay)  # NaN projections -> sentinel
    ax = jnp.where(ax == ax, ax, col_pad)

    sup = jnp.where(tiny, 1.0,
                    jnp.minimum(kernels.KERNEL_SUPPORT * h_eff, foot))
    ay_lo = ay - sup
    ay_hi = ay + sup
    ax_lo = ax - sup
    ax_hi = ax + sup
    lo_r = jnp.min(ay_lo, axis=1, keepdims=True)
    hi_r = jnp.max(ay_hi, axis=1, keepdims=True)
    lo_c = jnp.min(ax_lo, axis=1, keepdims=True)
    hi_c = jnp.max(ax_hi, axis=1, keepdims=True)

    w0_top = float(((atlas_rows - window_rows) // band) * band)
    w0f = jnp.clip(jnp.floor(lo_r * (1.0 / band)) * band, 0.0, w0_top)
    ce_raw = jnp.floor(lo_c)
    c0f = jnp.clip(jnp.floor(ce_raw * (1.0 / COL_ALIGN)) * COL_ALIGN,
                   0.0, float(atlas_cols - WINDOW_COLS))
    cef = jnp.clip(ce_raw, c0f, c0f + float(WINDOW_COLS - PROFILE_COLS))

    fits = ((ay_hi < w0f + window_rows) & (ax_hi < cef + PROFILE_COLS)
            & (ax_lo >= cef))

    C = C_in + (1 if depth_channel else 0)
    coefs = [vals[c] * w for c in range(C_in)]
    if depth_channel:
        coefs.append(vals[0] * z01 * w)
    cfit = [jnp.where(fits, cc, 0.0) for cc in coefs]
    abssum = jnp.abs(cfit[0])
    for cc in cfit[1:]:
        abssum = abssum + jnp.abs(cc)
    spill_any = jnp.abs(coefs[0])
    for cc in coefs[1:]:
        spill_any = spill_any + jnp.abs(cc)
    spilled = (~fits) & (spill_any > 0.0)
    cspill = [jnp.where(spilled, cc, 0.0) for cc in coefs]
    nspill = jnp.sum(spilled.astype(jnp.int32), axis=1, keepdims=True)

    # size classes: smallest profile-evaluation extent covering the group's
    # supported span (same scan as splat_atlas)
    sizes = jnp.full((b_g, 1), FULL_CLASS, jnp.int32)
    for sz in range(len(SIZE_CLASSES) - 2, -1, -1):
        r_e, c_e = SIZE_CLASSES[sz]
        r_e = window_rows if r_e is None else min(r_e, window_rows)
        c_e = PROFILE_COLS if c_e is None else c_e
        fit_sz = (hi_r < w0f + r_e) & (hi_c < cef + c_e)
        sizes = jnp.where(fit_sz, sz, sizes)

    active = jnp.sum(abssum, axis=1, keepdims=True) > 0.0
    ih_max = jnp.max(ih, axis=1, keepdims=True)
    ih_min = jnp.min(ih, axis=1, keepdims=True)
    big_th = (1.0 / H_MAX) * (1.0 - 1e-6)
    any_big = jnp.max(jnp.where((ih > 0.0) & (ih < big_th), 1.0, 0.0),
                      axis=1, keepdims=True) > 0.0
    kind = jnp.where(
        ~active, FLAG_INACTIVE,
        jnp.where(ih_max < 0.0, FLAG_ALL_TINY,
                  jnp.where(any_big, FLAG_MASKED,
                            jnp.where(ih_min < 0.0, FLAG_MIXED,
                                      FLAG_POLY)))).astype(jnp.int32)
    szc = jnp.where((kind == FLAG_ALL_TINY) | (kind == FLAG_POLY), sizes,
                    FULL_CLASS)
    flags = kind * 4 + szc

    (ay_o, ax_o, ih_o, cfit_o, cspill_o, w0_o, c0_o, ce_o, fl_o, ns_o) = outs
    ay_o[...] = ay
    ax_o[...] = ax
    ih_o[...] = ih
    for c in range(C):
        cfit_o[c][...] = cfit[c]
        cspill_o[c][...] = cspill[c]
    w0_o[...] = w0f.astype(jnp.int32)
    c0_o[...] = c0f.astype(jnp.int32)
    ce_o[...] = cef.astype(jnp.int32)
    fl_o[...] = flags
    ns_o[...] = nspill


@functools.partial(
    jax.jit,
    static_argnames=("C_in", "depth_channel", "resolution", "atlas_rows",
                     "atlas_cols", "window_rows", "band", "col_pad", "foot",
                     "piece_groups", "ranged", "has_mask", "interpret",
                     "sentinel_ay", "norm_mode"))
def splat_feed_pallas(fields, values, pergroup, params_f, sp_i, mask=None, *,
                      C_in: int, depth_channel: bool, resolution: int,
                      atlas_rows: int, atlas_cols: int, window_rows: int,
                      band: int, col_pad: float, foot: float,
                      piece_groups: int, ranged: bool, has_mask: bool,
                      interpret: bool, sentinel_ay: float,
                      norm_mode: str = "lowrank"):
    """Run the fused front-end over piece_groups groups starting at sp_i[0].

    fields: (x, y, z, h) each (n_groups, G) f32 (full presorted arrays);
    values: tuple of C_in (n_groups, G) f32 channel rows;
    pergroup: (n_groups, 8) f32 [bucket, 2^-lev, 2^lev, row_off, res_l, ...];
    params_f: (16,) f32 [m00..m23 (12), px_per_world, 1/px_per_world, ...];
    sp_i: (4,) i32 [g0, start, count, 0] — g0 must be a piece-block multiple;
    mask: optional (n_groups, G) f32 extra mask (>0 = keep), e.g. the cell
    culling table expanded once per selection change (NOT per frame).

    Returns (ay, ax, ih, cfit (C,...), cspill (C,...), w0, c0, ce, flags,
    nspill) where per-particle arrays are (piece_groups, G) f32 and
    per-group vectors are (piece_groups,) i32.
    """
    x, y, z, h = fields
    n_groups, group = x.shape
    C = C_in + (1 if depth_channel else 0)
    assert len(values) == C_in

    # block height: biggest power of two <= 64 dividing piece_groups
    b_g = 64
    while piece_groups % b_g:
        b_g //= 2
    n_steps = piece_groups // b_g

    coeffs, centre, halfwidth = _norm_poly(norm_mode)

    def kernel(sp_i_ref, sp_f_ref, pg_ref, x_ref, y_ref, z_ref, h_ref, *rest):
        vals = [rest[c][...] for c in range(C_in)]
        k = C_in
        mask_v = None
        if has_mask:
            mask_v = rest[k][...]
            k += 1
        out_refs = rest[k:]
        ay_o, ax_o, ih_o = out_refs[0], out_refs[1], out_refs[2]
        cfit_o = list(out_refs[3:3 + C])
        cspill_o = list(out_refs[3 + C:3 + 2 * C])
        w0_o, c0_o, ce_o, fl_o, ns_o = out_refs[3 + 2 * C:8 + 2 * C]
        _feed_kernel_body(
            sp_i_ref, sp_f_ref, pg_ref[...], x_ref[...], y_ref[...],
            z_ref[...], h_ref[...], vals, mask_v,
            (ay_o, ax_o, ih_o, cfit_o, cspill_o, w0_o, c0_o, ce_o, fl_o,
             ns_o),
            C_in=C_in, depth_channel=depth_channel, group=group, b_g=b_g,
            resolution=resolution, atlas_rows=atlas_rows,
            atlas_cols=atlas_cols, window_rows=window_rows, band=band,
            col_pad=col_pad, foot=foot, ranged=ranged, norm_coeffs=coeffs,
            norm_centre=centre, norm_halfwidth=halfwidth,
            sentinel_ay=sentinel_ay)

    def in_map(gi, sp_i_ref, sp_f_ref):
        return (sp_i_ref[0] // b_g + gi, 0)

    def out_map(gi, sp_i_ref, sp_f_ref):
        return (gi, 0)

    field_spec = pl.BlockSpec((b_g, group), in_map)
    pg_spec = pl.BlockSpec((b_g, 8), in_map)
    in_specs = [pg_spec] + [field_spec] * (4 + C_in)
    if has_mask:
        in_specs.append(field_spec)

    big_spec = pl.BlockSpec((b_g, group), out_map)
    small_spec = pl.BlockSpec((b_g, 1), out_map)
    out_specs = [big_spec] * (3 + 2 * C) + [small_spec] * 5
    pp = (piece_groups, group)
    gg = (piece_groups, 1)
    out_shape = ([jax.ShapeDtypeStruct(pp, jnp.float32)] * (3 + 2 * C)
                 + [jax.ShapeDtypeStruct(gg, jnp.int32)] * 5)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    inputs = [pergroup, x, y, z, h] + list(values)
    if has_mask:
        inputs.append(mask)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(sp_i, params_f, *inputs)

    ay, ax, ih = outs[0], outs[1], outs[2]
    cfit = list(outs[3:3 + C])
    cspill = list(outs[3 + C:3 + 2 * C])
    w0, c0, ce, flags, nspill = [o.reshape(piece_groups)
                                 for o in outs[3 + 2 * C:]]
    return ay, ax, ih, cfit, cspill, w0, c0, ce, flags, nspill
