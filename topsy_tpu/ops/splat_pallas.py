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
WINDOW_COLS = 256  # 128-px logical window + 128 for lane alignment of c0
COL_ALIGN = 128
SUBGROUPS = 4      # particle groups processed per grid step


def _profiles_lanes(t2, tiny, lrk, signed: bool):
    """(n, rank*G) profiles (lane-concatenated over rank) with CIC hats.

    t2: (n, G) squared offsets; tiny: (1, G) CIC flags broadcast over rows,
    or None when the group is known to contain no tiny splats.
    """
    hat = None
    if tiny is not None:
        hat = jnp.maximum(0.0, 1.0 - jnp.sqrt(jnp.maximum(t2, 0.0)))
    pieces = []
    for k in range(lrk.rank):
        acc = jnp.full_like(t2, float(lrk.coeffs[k][0]))
        for c in lrk.coeffs[k][1:]:
            acc = acc * t2 + float(c)
        acc = jnp.where(t2 <= kernels.KERNEL_SUPPORT ** 2, acc, 0.0)
        if signed:
            acc = acc * float(lrk.signs[k])
        if tiny is not None:
            acc = jnp.where(tiny, hat if k == 0 else jnp.zeros_like(t2), acc)
        pieces.append(acc)
    return jnp.concatenate(pieces, axis=1)


def _make_kernel(n_steps: int, group: int, C: int, lrk, foot: float,
                 window_cols: int):

    def kernel(w0_ref, c0_ref, ay_ref, ax_ref, ih_ref, coef_ref,
               atlas_in_ref, atlas_out_ref, win_ref, sem_in, sem_out):
        del atlas_in_ref  # aliased with atlas_out_ref
        g = pl.program_id(0)

        def flush(idx):
            sl = (slice(None),
                  pl.ds(pl.multiple_of(w0_ref[idx], 8), WINDOW_ROWS),
                  pl.ds(pl.multiple_of(c0_ref[idx], COL_ALIGN), window_cols))
            out = pltpu.make_async_copy(win_ref, atlas_out_ref.at[sl], sem_out)
            out.start()
            out.wait()

        def load(idx):
            sl = (slice(None),
                  pl.ds(pl.multiple_of(w0_ref[idx], 8), WINDOW_ROWS),
                  pl.ds(pl.multiple_of(c0_ref[idx], COL_ALIGN), window_cols))
            dma = pltpu.make_async_copy(atlas_out_ref.at[sl], win_ref, sem_in)
            dma.start()
            dma.wait()

        for s in range(SUBGROUPS):
            ig = g * SUBGROUPS + s
            w0 = pl.multiple_of(w0_ref[ig], 8)
            c0 = pl.multiple_of(c0_ref[ig], COL_ALIGN)

            first = ig == 0
            prev = jnp.maximum(ig - 1, 0)
            changed = first | (w0 != w0_ref[prev]) | (c0 != c0_ref[prev])

            @pl.when(changed & jnp.logical_not(first))
            def _(prev=prev):
                flush(prev)

            @pl.when(changed)
            def _(ig=ig):
                load(ig)

            ay = ay_ref[0, s][None, :]                    # (1, G)
            ax = ax_ref[0, s][None, :]
            ih = ih_ref[0, s][None, :]
            tiny = ih < 0.0
            ih2 = ih * ih

            coef_any = jnp.max(jnp.abs(coef_ref[0, s, 0]))
            for c in range(1, C):
                coef_any = jnp.maximum(coef_any,
                                       jnp.max(jnp.abs(coef_ref[0, s, c])))
            group_active = coef_any > 0.0
            all_tiny = jnp.max(ih) < 0.0
            any_tiny = jnp.min(ih) < 0.0

            rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW_ROWS, group), 0
                                            ).astype(jnp.float32)
            cols = jax.lax.broadcasted_iota(jnp.int32, (window_cols, group), 0
                                            ).astype(jnp.float32)
            dy = w0.astype(jnp.float32) + rows - ay       # (R, G)
            dx = c0.astype(jnp.float32) + cols - ax       # (W, G)

            # bf16 inputs, f32 accumulation: profile quantization (~0.2%) is
            # far below the reference's own texture discretization error

            @pl.when(group_active & all_tiny)
            def _(s=s, dy=dy, dx=dx):
                # rank-1 cloud-in-cell path: hat profiles, G-wide contraction
                Ph = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
                Qh = jnp.maximum(0.0, 1.0 - jnp.abs(dx)).astype(jnp.bfloat16)
                for c in range(C):
                    PC = (Ph * coef_ref[0, s, c][None, :]).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        PC, Qh, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    win_ref[c, :, :] += contrib

            def poly_body(s, dy, dx, tiny, ih2):
                ymask = ((dy > -foot) & (dy <= foot)).astype(jnp.float32)
                xmask = ((dx > -foot) & (dx <= foot)).astype(jnp.float32)
                ty2 = dy * dy * ih2
                tx2 = dx * dx * ih2
                rank = lrk.rank
                P = _profiles_lanes(ty2, tiny, lrk, signed=True) \
                    * jnp.tile(ymask, (1, rank))          # (R, rank*G)
                Q = (_profiles_lanes(tx2, tiny, lrk, signed=False)
                     * jnp.tile(xmask, (1, rank))).astype(jnp.bfloat16)
                for c in range(C):
                    coef_c = jnp.tile(coef_ref[0, s, c][None, :], (1, rank))
                    PC = (P * coef_c).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        PC, Q, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    win_ref[c, :, :] += contrib

            # pure-polynomial groups (the common case away from dense
            # fields; tiny segregation makes mixed groups rare band
            # boundaries) skip the CIC hat/select work entirely
            @pl.when(group_active & jnp.logical_not(any_tiny))
            def _(s=s, dy=dy, dx=dx, ih2=ih2):
                poly_body(s, dy, dx, None, ih2)

            @pl.when(group_active & any_tiny & jnp.logical_not(all_tiny))
            def _(s=s, dy=dy, dx=dx, tiny=tiny, ih2=ih2):
                poly_body(s, dy, dx, tiny, ih2)

            if s == SUBGROUPS - 1:
                @pl.when(g == n_steps - 1)
                def _(w0=w0, c0=c0):
                    sl = (slice(None), pl.ds(w0, WINDOW_ROWS),
                          pl.ds(c0, window_cols))
                    out = pltpu.make_async_copy(win_ref, atlas_out_ref.at[sl],
                                                sem_out)
                    out.start()
                    out.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("atlas_rows", "atlas_cols", "C", "group",
                                    "interpret", "window_cols"))
def accumulate_groups_pallas(ay_g, ax_g, ih_g, coef_g, w0, c0, *,
                             atlas_rows: int, atlas_cols: int, C: int,
                             group: int, interpret: bool = False,
                             atlas0=None, window_cols: int = WINDOW_COLS):
    """Run the fused accumulation.

    ay_g/ax_g/ih_g: (n_groups, 1, G); coef_g: (n_groups, C, G);
    w0: (n_groups,) int32 row starts (8-aligned); c0: (n_groups,) int32 col
    starts (128-aligned).  n_groups must be a multiple of SUBGROUPS.
    Accumulates on top of ``atlas0`` (zeros if None); returns the atlas
    (C, atlas_rows, atlas_cols).
    """
    n_groups = w0.shape[0]
    assert n_groups % SUBGROUPS == 0, n_groups
    n_steps = n_groups // SUBGROUPS
    lrk = kernels.lowrank_kernel()
    from .splat_atlas import FOOT

    kernel = _make_kernel(n_steps, group, C, lrk, float(FOOT), window_cols)

    # blocks carry SUBGROUPS groups per step
    ay_b = ay_g.reshape(n_steps, SUBGROUPS, group)
    ax_b = ax_g.reshape(n_steps, SUBGROUPS, group)
    ih_b = ih_g.reshape(n_steps, SUBGROUPS, group)
    coef_b = coef_g.reshape(n_steps, SUBGROUPS, C, group)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, SUBGROUPS, group), lambda g, w0r, c0r: (g, 0, 0)),
            pl.BlockSpec((1, SUBGROUPS, group), lambda g, w0r, c0r: (g, 0, 0)),
            pl.BlockSpec((1, SUBGROUPS, group), lambda g, w0r, c0r: (g, 0, 0)),
            pl.BlockSpec((1, SUBGROUPS, C, group),
                         lambda g, w0r, c0r: (g, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((C, WINDOW_ROWS, window_cols), jnp.float32),
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
        input_output_aliases={6: 0},  # atlas input (after 2 scalar + 4 tensor)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(w0, c0, ay_b, ax_b, ih_b, coef_b, atlas0)
