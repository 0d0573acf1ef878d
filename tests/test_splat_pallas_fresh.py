"""FRESH_SKIP exactness on the presorted window_rows=96 geometry.

The fresh-window optimization skips the band *load* DMA when no earlier
group's band can overlap.  The presorted configs have band_rows > 2*qa
(window_rows=96, C=2: band 200 on a 96-row anchor grid), so bands two
anchor-cells apart still overlap — a min-pool of radius 1 would falsely
mark a band fresh when the group order jumps backward by >= 2 cells, and
the zero-fill + flush would erase earlier deposits (ADVICE r2, high).

This drives ops/splat_pallas.accumulate_groups_pallas directly (interpret
mode, as in tests/test_splat_atlas.py) with exactly that anchor pattern and
asserts the fresh_skip=True atlas is bit-identical to fresh_skip=False.
"""

import numpy as np
import jax.numpy as jnp

from topsy_tpu.ops import splat_pallas
from topsy_tpu.ops.splat_pallas import (FLAG_INACTIVE, FLAG_POLY, FULL_CLASS,
                                        SUBGROUPS)

G = 128
C = 2
ATLAS_ROWS = 768
ATLAS_COLS = 256
WINDOW_ROWS = 96  # the presorted-path geometry (splat_atlas.py:230)


def _run(fresh_skip):
    n_groups = SUBGROUPS
    ay = np.zeros((n_groups, 1, G), np.float32)
    ax = np.zeros((n_groups, 1, G), np.float32)
    ih = np.ones((n_groups, 1, G), np.float32)
    coef = np.zeros((n_groups, C, G), np.float32)
    w0 = np.zeros(n_groups, np.int32)
    c0 = np.zeros(n_groups, np.int32)
    ce = np.zeros(n_groups, np.int32)
    flags = np.full(n_groups, FLAG_INACTIVE * 4 + FULL_CLASS, np.int32)

    # group 0: anchored two qa-cells down (wb=192, band [192,392)); its
    # particle deposits into rows 192..204 — the first rows of its band,
    # which are also the LAST rows of a band anchored at cell 0.
    w0[0] = 192
    ay[0, 0, 0] = 196.0
    ax[0, 0, 0] = 60.0
    ih[0, 0, 0] = 0.25  # h=4: polynomial splat, support 8 px
    coef[0, 0, 0] = 1.0
    coef[0, 1, 0] = 2.0
    flags[0] = FLAG_POLY * 4 + FULL_CLASS

    # group 1: jumps BACKWARD to cell 0 (band [0,200) overlaps group 0's
    # deposits at rows 192..199).  A radius-1 fresh pool misses group 0 and
    # zero-clobbers those rows on flush.
    w0[1] = 0
    ay[1, 0, 0] = 10.0
    ax[1, 0, 0] = 60.0
    ih[1, 0, 0] = 0.25
    coef[1, 0, 0] = 1.0
    coef[1, 1, 0] = -1.0
    flags[1] = FLAG_POLY * 4 + FULL_CLASS

    # groups 2..7: inactive padding sharing group 1's window (no churn)
    atlas = splat_pallas.accumulate_groups_pallas(
        jnp.asarray(ay), jnp.asarray(ax), jnp.asarray(ih), jnp.asarray(coef),
        jnp.asarray(w0), jnp.asarray(c0), jnp.asarray(ce), jnp.asarray(flags),
        atlas_rows=ATLAS_ROWS, atlas_cols=ATLAS_COLS, C=C, group=G,
        interpret=True, window_rows=WINDOW_ROWS, fresh_skip=fresh_skip)
    return np.asarray(atlas)


def test_fresh_skip_backward_band_jump_is_exact():
    base = _run(fresh_skip=False)
    # the hazard zone must actually contain deposits, or the test is vacuous
    assert np.abs(base[:, 192:200, :]).sum() > 0.0
    opt = _run(fresh_skip=True)
    np.testing.assert_array_equal(opt, base)
