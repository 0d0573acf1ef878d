"""EXACT k-nearest-neighbour smoothing lengths ON DEVICE.

The reference computes smoothing lengths with pynbody's host KD-tree
(reference: src/topsy/loader.py:222-238, h = 0.5 * distance to the nn-th
neighbour).  ``ops/knn.py`` estimates the same quantity statistically (~10%
scatter); this module computes the exact answer with a TPU-native search —
no KD-tree, no data-dependent control flow inside jit, no per-particle
gathers:

1. **Morton sort** the particles (one 3-operand ``lax.sort``), so that any
   contiguous range is a compact spatial region.
2. **Tile** the sorted array into tiles of S particles and compute each
   tile's bounding box (a reshape + min/max reduce).
3. **Per query block** (B consecutive sorted particles): pick the T tiles
   with the smallest block-bbox-to-tile-bbox distance, gather them with T
   contiguous ``dynamic_slice``s, form the (B, T*S) squared-distance
   matrix by broadcasting, and ``top_k`` the nn-th smallest.
4. **Verify exactness**: the pass's nn-th distances are upper bounds
   (candidates are a subset of all particles).  For each block, every tile
   whose bbox distance is within the block's largest nn-th distance was
   guaranteed needed; if more than T such tiles exist anywhere, the pass
   MAY have missed a neighbour — double T and rerun (a host loop; each T
   compiles once).  When the count fits, the result is provably exact:
   any excluded tile is farther from every query than that query's
   current nn-th neighbour.

All shapes are static; the hot loop is a scan of slice + broadcast +
top_k steps (VPU/bandwidth bound).  Cost control: a cheap per-block LOCAL
pass (the query's own +-1 tiles) bounds each query's radius first; blocks
whose needed tiles all sit inside that window — most of them, away from
dense/sparse interfaces — skip the expensive selected-tile pass entirely
(lax.cond).  tests/test_knn_native.py asserts float-tolerance agreement
with a KD-tree and the native grid search on a 3-dex density-contrast
scene; benchmarks/knn_scale.py validates at 10^6 on the chip.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

BLOCK = 512       # queries per step
TILE = 256        # candidate tile size
BIG = jnp.float32(3.0e38)


def _spread8(v):
    x = v & 0xFF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


@jax.jit
def _morton_order(pos):
    """Permutation sorting ``pos`` along a 16-bit-per-axis Morton curve."""
    lo = jnp.min(pos, axis=0)
    hi = jnp.max(pos, axis=0)
    span = jnp.maximum((hi - lo).max(), 1e-30)
    q = jnp.clip((pos - lo) / span * 65535.0, 0.0, 65535.0).astype(jnp.int32)
    lo24 = (_spread8(q[:, 0]) | (_spread8(q[:, 1]) << 1)
            | (_spread8(q[:, 2]) << 2))
    hi24 = (_spread8(q[:, 0] >> 8) | (_spread8(q[:, 1] >> 8) << 1)
            | (_spread8(q[:, 2] >> 8) << 2))
    idx = jnp.arange(pos.shape[0], dtype=jnp.int32)
    _, _, perm = jax.lax.sort((hi24, lo24, idx), num_keys=2)
    return perm


def _kth_smallest(d2, nn: int, S: int):
    """Per-row nn-th smallest of (B, m*S) via per-tile top_k then a merge —
    XLA's top_k over very wide fused rows is pathologically slow (measured
    15x on CPU); two narrow stages are fast everywhere."""
    B, m = d2.shape[0], d2.shape[1] // S
    per_tile = jax.lax.top_k((-d2).reshape(B, m, S), min(nn, S))[0]
    merged = per_tile.reshape(B, m * min(nn, S))
    return -jax.lax.top_k(merged, nn)[0][:, nn - 1]


@functools.partial(jax.jit, static_argnames=("T", "nn", "n_real"))
def _tiled_kth_d2(pos_sorted, *, T: int, nn: int, n_real: int):
    """(kth squared distance per sorted slot, violation count).

    ``pos_sorted``: (N, 3) Morton-sorted, N a multiple of BLOCK (and of
    TILE), padded beyond ``n_real`` with far sentinels.  Violations > 0
    means some block NEEDED more than T tiles (see below) — the caller
    reruns with a doubled T.

    Per block, three stages:
    1. local pass — nn-th distance among the query's own +-1 tiles
       (contiguous slice): a per-query upper-bound radius;
    2. selection — a tile is NEEDED by query i iff its bbox gap to x_i is
       within i's local radius (any farther tile provably contains no true
       neighbour of i); select the block's needed-tile union, nearest
       fill-ins after;
    3. main pass — exact nn-th distance over the T selected tiles, with a
       violation flag when the needed union exceeded T.
    """
    n = pos_sorted.shape[0]
    B, S = BLOCK, TILE
    ntiles = n // S
    tiles = pos_sorted.reshape(ntiles, S, 3)
    t_lo = tiles.min(axis=1)
    t_hi = tiles.max(axis=1)
    padded = jnp.concatenate([
        jnp.full((S, 3), -1e19, jnp.float32), pos_sorted,
        jnp.full((S, 3), 1e19, jnp.float32)])

    def body(carry, s):
        out, violations = carry
        block = jax.lax.dynamic_slice(pos_sorted, (s, 0), (B, 3))
        qidx = s + jnp.arange(B, dtype=jnp.int32)
        q_real = qidx < n_real

        # stage 1: local upper-bound radius from the contiguous +-1-tile
        # window (B + 2S candidates)
        lcand = jax.lax.dynamic_slice(padded, (s, 0), (B + 2 * S, 3))
        lidx = s - S + jnp.arange(B + 2 * S, dtype=jnp.int32)
        ld = block[:, None, :] - lcand[None, :, :]
        ld2 = jnp.minimum((ld * ld).sum(-1), BIG)
        ld2 = jnp.where((qidx[:, None] == lidx[None, :])
                        | (lidx[None, :] < 0)
                        | (lidx[None, :] >= n_real), BIG, ld2)
        kth_local = _kth_smallest(ld2, nn, S)

        # stage 2: per-query needed tiles within the local radius
        qgap = jnp.maximum(jnp.maximum(t_lo[None, :, :] - block[:, None, :],
                                       block[:, None, :] - t_hi[None, :, :]),
                           0.0)
        q_t_d2 = jnp.minimum((qgap * qgap).sum(axis=2), BIG)  # (B, ntiles)
        needed = ((q_t_d2 <= kth_local[:, None]) & q_real[:, None]).any(axis=0)
        # tiles already fully scanned by the local window
        ts = s // S
        own = (jnp.arange(ntiles, dtype=jnp.int32) >= ts - 1) \
            & (jnp.arange(ntiles, dtype=jnp.int32) <= ts + B // S)
        n_needed = needed.sum()
        # if every needed tile is inside the local window, kth_local is
        # already exact for the whole block — skip the main pass (most
        # blocks, outside dense/sparse interfaces)
        main_required = (needed & ~own).any()

        def main_pass(_):
            # needed tiles first (forced by a large score offset), nearest
            # others as fill-in
            score = jnp.where(needed, q_t_d2.min(axis=0) - 4.0e38,
                              q_t_d2.min(axis=0))
            _, sel = jax.lax.top_k(-score, T)
            cand = jnp.concatenate(
                [jax.lax.dynamic_slice(pos_sorted, (sel[t] * S, 0), (S, 3))
                 for t in range(T)], axis=0)
            cidx = (sel[:, None] * S
                    + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)
            d = block[:, None, :] - cand[None, :, :]
            d2 = jnp.minimum((d * d).sum(-1), BIG)
            d2 = jnp.where((qidx[:, None] == cidx[None, :])
                           | (cidx[None, :] >= n_real), BIG, d2)
            return jnp.minimum(_kth_smallest(d2, nn, S), kth_local)

        kth = jax.lax.cond(main_required, main_pass,
                           lambda _: kth_local, None)
        violations = violations + (main_required
                                   & (n_needed > T)).astype(jnp.int32)
        out = jax.lax.dynamic_update_slice(out, kth, (s,))
        return (out, violations), None

    out = jnp.zeros((n,), jnp.float32)
    (out, violations), _ = jax.lax.scan(
        body, (out, jnp.int32(0)),
        jnp.arange(0, n, B, dtype=jnp.int32))
    return out, violations


def knn_smooth_device(positions, nn: int = 32, initial_tiles: int = 64,
                      max_doublings: int = 4) -> jnp.ndarray:
    """Exact smoothing lengths h = 0.5 * d_nn on device (pynbody
    convention; device analogue of native.knn_smooth,
    native/_native.cpp:92-186).

    Runs the tiled verified search, doubling the per-block tile budget
    until the exactness proof holds (one small scalar readback per
    attempt — load-time only).  Positions may be numpy or device arrays;
    the result stays on device, in the input order.
    """
    pos = jnp.asarray(positions, dtype=jnp.float32)
    n = pos.shape[0]
    if n <= BLOCK:
        # small snapshot: brute force is exact and cheaper than sorting
        k = min(nn, n - 1)
        d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
        d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(BIG)
        kth = -jax.lax.top_k(-d2, k)[0][:, k - 1]
        return 0.5 * jnp.sqrt(kth)

    perm = _morton_order(pos)
    quantum = max(BLOCK, TILE)
    npad = ((n + quantum - 1) // quantum) * quantum
    sorted_pos = pos[perm]
    if npad > n:
        sorted_pos = jnp.concatenate(
            [sorted_pos, jnp.full((npad - n, 3), 1e19, jnp.float32)])

    T = min(initial_tiles, npad // TILE)
    for attempt in range(max_doublings + 1):
        kth_sorted, violations = _tiled_kth_d2(sorted_pos, T=T, nn=nn,
                                               n_real=n)
        v = int(violations)  # one scalar readback
        if v == 0 or T >= npad // TILE:
            break
        T = min(2 * T, npad // TILE)
        logger.info("knn_smooth_device: %d blocks unverified, "
                    "retrying with T=%d tiles", v, T)
    if v > 0:
        logger.warning("knn_smooth_device: %d blocks still unverified at "
                       "T=%d; results there may be slight overestimates", v, T)
    kth = jnp.zeros((n,), jnp.float32).at[perm].set(kth_sorted[:n])
    return 0.5 * jnp.sqrt(kth)
