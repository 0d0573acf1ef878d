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
4. **Verify exactness PER QUERY**: the pass's nn-th distances are upper
   bounds (candidates are a subset of all particles).  A query is proven
   exact when every unselected tile's bbox gap exceeds its found nn-th
   distance; the flag rides in the output's sign.
5. **Finish the flagged queries** (dense/sparse interfaces, where
   overlapping Morton tile bboxes spoil the cheap proof) with a streaming
   brute-force pass: every particle flows past them in bounded-memory
   distance tiles, chunk ranges pruned by bbox gap against the tiled
   pass's upper-bound radii.  Exact for every particle, no retries.

All shapes are static; the hot loop is a scan of slice + broadcast +
top_k steps (VPU/bandwidth bound).  Cost control: a cheap per-block LOCAL
pass (the query's own +-1 tiles) bounds each query's radius first; blocks
whose needed tiles all sit inside that window — most of them, away from
dense/sparse interfaces — skip the expensive selected-tile pass entirely
(lax.cond).  tests/test_knn_native.py asserts float-tolerance agreement
with a KD-tree and the native grid search on a 3-dex density-contrast
scene; benchmarks/knn_scale.py validates on the chip and documents the
axon-runtime crash envelope that config.KNN_DEVICE_MAX_N gates around.
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
    """Per sorted slot: the kth squared distance, SIGN-ENCODED with the
    per-slot unverified flag (flagged slots hold -(kth+1)).

    ``pos_sorted``: (N, 3) Morton-sorted, N a multiple of BLOCK (and of
    TILE), padded beyond ``n_real`` with far sentinels.  A flagged slot's
    kth is an overestimate whose exactness could not be proven within the
    T-tile budget — the caller finishes exactly those queries with the
    streaming brute-force pass (_brute_kth_d2).

    Per block, three stages:
    1. local pass — nn-th distance among the query's own +-1 tiles
       (contiguous slice): a per-query upper-bound radius;
    2. selection — a tile is NEEDED by query i iff its bbox gap to x_i is
       within i's local radius (any farther tile provably contains no true
       neighbour of i); select the block's needed-tile union, nearest
       fill-ins after;
    3. main pass — nn-th distance over the T selected tiles, then a
       per-query exactness proof against the tightened radius.
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

    def body(out, s):
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
        # if every needed tile is inside the local window, kth_local is
        # already exact for the whole block — skip the main pass (most
        # blocks, outside dense/sparse interfaces)
        main_required = (needed & ~own).any()

        def main_pass(_):
            # needed tiles first — the BOUNDED offset preserves the
            # nearest-first ordering WITHIN the needed set, so even an
            # over-budget block (violation) scans the closest needed tiles
            # and degrades gracefully rather than arbitrarily
            score = q_t_d2.min(axis=0)
            score = jnp.where(needed, jnp.minimum(score, 1e18) - 1e19,
                              score)
            _, sel = jax.lax.top_k(-score, T)

            # stream the selected tiles in fixed-size chunks, carrying the
            # running nn smallest distances — memory stays bounded at any
            # T (a single (B, T*S) tile matrix is ~0.5 GB at T=1024)
            TC = min(T, 32)
            top0 = jnp.full((B, nn), BIG, jnp.float32)

            def make_chunk(tc):
                def chunk(base, top):
                    cand = jnp.concatenate(
                        [jax.lax.dynamic_slice(
                            pos_sorted, (sel[base + t] * S, 0), (S, 3))
                         for t in range(tc)], axis=0)
                    cidx = (jax.lax.dynamic_slice(
                        sel, (base,), (tc,))[:, None] * S
                        + jnp.arange(S, dtype=jnp.int32)[None, :]
                    ).reshape(-1)
                    d = block[:, None, :] - cand[None, :, :]
                    d2 = jnp.minimum((d * d).sum(-1), BIG)
                    d2 = jnp.where((qidx[:, None] == cidx[None, :])
                                   | (cidx[None, :] >= n_real), BIG, d2)
                    per_tile = -jax.lax.top_k((-d2).reshape(B, tc, S),
                                              min(nn, S))[0]
                    merged = jnp.concatenate(
                        [per_tile.reshape(B, tc * min(nn, S)), top], axis=1)
                    return -jax.lax.top_k(-merged, nn)[0]
                return chunk

            full_chunk = make_chunk(TC)
            top = jax.lax.fori_loop(
                0, T // TC, lambda ci, tp: full_chunk(ci * TC, tp), top0)
            if T % TC:  # static remainder so T may be ANY tile count
                top = make_chunk(T % TC)(jnp.int32((T // TC) * TC), top)
            return jnp.minimum(top[:, nn - 1], kth_local)

        kth = jax.lax.cond(main_required, main_pass,
                           lambda _: kth_local, None)
        # PER-QUERY exactness proof against the TIGHTENED radius: kth
        # (after the main pass) is far smaller than kth_local near
        # dense/sparse interfaces, so far fewer tiles remain needed.
        # Soundness: a tile with gap > kth_i cannot hold anything closer
        # than query i's found nn-th neighbour.  The membership test is
        # scatter-free and conservative: any tile scoring no better than
        # the worst SELECTED tile counts as possibly unselected (ties only
        # over-report, sending a few extra queries to the brute pass).
        score2 = q_t_d2.min(axis=0)
        score2 = jnp.where(needed, jnp.minimum(score2, 1e18) - 1e19, score2)
        _, sel2 = jax.lax.top_k(-score2, T)
        # EXACT membership via a small equality matrix (ntiles x T) — no
        # scatter; a conservative threshold test flagged 65% of queries at
        # interface-heavy scenes, drowning the brute finishing pass
        selected = (jnp.arange(ntiles, dtype=jnp.int32)[:, None]
                    == sel2[None, :]).any(axis=1)
        unselected = (~selected) & jnp.bool_(T < ntiles)
        # arithmetic formulation (f32 where + min-reduce, no 2-D bool
        # reduction): the nearest unselected tile per query
        min_unsel = jnp.min(
            jnp.where(unselected[None, :], q_t_d2, BIG), axis=1)
        q_missed = main_required & q_real & (min_unsel <= kth)
        # the flag rides in the SIGN of the single f32 output (flagged
        # slots store -(kth+1)): a second carry array / bool carry in this
        # scan crashed the TPU runtime at 2^20-scale shapes, while the
        # single-f32-carry program is stable
        enc = jnp.where(q_missed, -(kth + 1.0), kth)
        out = jax.lax.dynamic_update_slice(out, enc, (s,))
        return out, None

    out = jnp.zeros((n,), jnp.float32)
    out, _ = jax.lax.scan(body, out,
                          jnp.arange(0, n, B, dtype=jnp.int32))
    return out


_BRUTE_CHUNK = 4096  # candidate rows per streaming brute-force step


@functools.partial(jax.jit, static_argnames=("nn", "n_real"))
def _brute_kth_d2(pos_sorted, uidx, q_pos, kth_ub, *, nn: int,
                  n_real: int):
    """Exact nn-th squared distance for the query slots in ``uidx`` —
    the finishing pass for queries the tiled search could not verify
    (dense/sparse interfaces where overlapping tile bboxes spoil the
    cheap proof).  Streams every particle past the queries in
    (512, _BRUTE_CHUNK) distance tiles with a running top-nn carry, but
    SKIPS chunks provably irrelevant to the whole query block:
    ``kth_ub`` (the tiled pass's per-query upper bounds) caps every
    query's true radius, so a chunk whose bbox gap to the block exceeds
    the block's largest bound cannot contribute (queries arrive in
    Morton order, so blocks are spatially coherent and the test bites).
    Seeding the carry with ``kth_ub`` keeps the result exact:
    min(exact, upper bound) = exact.  ``pos_sorted`` length must be a
    _BRUTE_CHUNK multiple; ``uidx`` length a 512 multiple (pad with a
    repeated slot)."""
    n = pos_sorted.shape[0]
    B, CC = BLOCK, _BRUTE_CHUNK
    nq = uidx.shape[0]
    chunks = pos_sorted.reshape(n // CC, CC, 3)
    c_lo = chunks.min(axis=1)
    c_hi = chunks.max(axis=1)

    def qblock(q0):
        qslots = jax.lax.dynamic_slice(uidx, (q0,), (B,))
        # query positions pre-gathered OUTSIDE the scan (q_pos): a row
        # gather inside the scan was the last unusual op in a program
        # that kept crashing this TPU runtime at 10^6 scale
        qp = jax.lax.dynamic_slice(q_pos, (q0, 0), (B, 3))
        ub = jax.lax.dynamic_slice(kth_ub, (q0,), (B,))
        b_lo = qp.min(axis=0)
        b_hi = qp.max(axis=0)
        r2max = ub.max()
        gap = jnp.maximum(jnp.maximum(c_lo - b_hi[None, :],
                                      b_lo[None, :] - c_hi), 0.0)
        c_gap2 = (gap * gap).sum(axis=1)          # (n/CC,)
        # seed with the upper bound: min(exact, ub) = exact
        top0 = jnp.broadcast_to(ub[:, None], (B, nn)).astype(jnp.float32)

        def compute(ci, top):
            cand = jax.lax.dynamic_slice(pos_sorted, (ci * CC, 0), (CC, 3))
            cidx = ci * CC + jnp.arange(CC, dtype=jnp.int32)
            d = qp[:, None, :] - cand[None, :, :]
            d2 = jnp.minimum((d * d).sum(-1), BIG)
            d2 = jnp.where((qslots[:, None] == cidx[None, :])
                           | (cidx[None, :] >= n_real), BIG, d2)
            per = -jax.lax.top_k((-d2).reshape(B, CC // TILE, TILE),
                                 min(nn, TILE))[0]
            merged = jnp.concatenate(
                [per.reshape(B, (CC // TILE) * min(nn, TILE)), top], axis=1)
            return -jax.lax.top_k(-merged, nn)[0]

        # relevant chunks form a contiguous-ish index range (queries and
        # candidates share the Morton order): iterate only [lo, hi] with
        # traced bounds — no per-chunk cond (a cond inside fori inside
        # scan crashed this TPU runtime at scale)
        rel = c_gap2 <= r2max
        idx = jnp.arange(n // CC, dtype=jnp.int32)
        lo = jnp.min(jnp.where(rel, idx, n // CC))
        hi = jnp.max(jnp.where(rel, idx, -1))
        top = jax.lax.fori_loop(lo, hi + 1, compute, top0)
        return top[:, nn - 1]

    _, kth = jax.lax.scan(lambda c, q0: (c, qblock(q0)), None,
                          jnp.arange(0, nq, B, dtype=jnp.int32))
    return kth.reshape(nq)


def knn_smooth_device(positions, nn: int = 32,
                      initial_tiles: int = 64) -> jnp.ndarray:
    """Exact smoothing lengths h = 0.5 * d_nn on device (pynbody
    convention; device analogue of native.knn_smooth,
    native/_native.cpp:92-186).

    Runs the tiled verified search once, then finishes the (typically few
    percent of) queries whose per-query exactness proof failed within the
    tile budget with the streaming brute-force pass — exact for every
    particle, bounded memory throughout, two small readbacks total.
    Positions may be numpy or device arrays; the result stays on device,
    in the input order.
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
    quantum = max(BLOCK, TILE, _BRUTE_CHUNK)
    npad = ((n + quantum - 1) // quantum) * quantum
    sorted_pos = pos[perm]
    if npad > n:
        sorted_pos = jnp.concatenate(
            [sorted_pos, jnp.full((npad - n, 3), 1e19, jnp.float32)])

    T = min(initial_tiles, npad // TILE)
    enc = _tiled_kth_d2(sorted_pos, T=T, nn=nn, n_real=n)
    enc_np = np.asarray(enc)  # one (n,) f32 readback, load-time only
    kth_sorted = jnp.abs(jnp.where(enc < -0.5, -enc - 1.0, enc))

    # finishing pass: queries whose exactness proof failed within the
    # tile budget (typically a few percent, at dense/sparse interfaces
    # where hundreds of tiles genuinely intersect the query ball) stream
    # past ALL particles — still exact, still bounded memory; one small
    # mask readback decides whether it runs at all
    uidx = np.flatnonzero(enc_np < -0.5)
    if len(uidx):
        logger.info("knn_smooth_device: brute-force finishing pass for "
                    "%d/%d queries", len(uidx), n)
        npq = ((len(uidx) + BLOCK - 1) // BLOCK) * BLOCK
        uidx_pad = jnp.asarray(np.concatenate(
            [uidx, np.full(npq - len(uidx), uidx[0], uidx.dtype)]),
            jnp.int32)
        kth_b = _brute_kth_d2(sorted_pos, uidx_pad,
                              jnp.take(sorted_pos, uidx_pad, axis=0),
                              jnp.take(kth_sorted, uidx_pad),
                              nn=nn, n_real=n)
        kth_sorted = kth_sorted.at[uidx_pad].set(kth_b)
    kth = jnp.zeros((n,), jnp.float32).at[perm].set(kth_sorted[:n])
    return 0.5 * jnp.sqrt(kth)
