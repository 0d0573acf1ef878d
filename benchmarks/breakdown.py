"""Stage-by-stage timing of the splat pipeline on the real TPU.

Times, at the bench configuration (2^22 particles, 1024 res, C=2):
  * full splat_atlas
  * the coefficient front-end (project/level-assign)
  * the lax.sort (7 operands)
  * the Pallas group-accumulation kernel alone
  * collapse_atlas
Run: PYTHONPATH="/root/repo:$PYTHONPATH" python benchmarks/breakdown.py [log2n]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _sync(out):
    # block_until_ready does not flush the axon tunnel; force a readback of a
    # device-side scalar (reading the array itself would ship MBs over the
    # ~28ms-latency tunnel and swamp the measurement)
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def timed(fn, *args, reps=30, rounds=3):
    # reps must be high: the axon tunnel costs ~0.45 ms per dispatch
    # (measured), so 5 reps would inflate every stage by ~5 ms
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best, out


def main():
    import jax
    import jax.numpy as jnp

    from topsy_tpu import camera
    from topsy_tpu.loaders import TestDataLoader
    from topsy_tpu.ops import kernels, splat_atlas
    from topsy_tpu.ops.splat import default_pyramid, splat_coefficients

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log2n
    resolution = 1024
    scale = 200.0

    loader = TestDataLoader(n, seed=1337)
    pos_smooth = jnp.asarray(loader.get_pos_smooth())
    mass = loader.get_mass()
    qty = loader.get_named_quantity("test-quantity")
    values = jnp.asarray(np.stack([mass, mass * qty], axis=1))
    matrix = jnp.asarray(
        camera.world_to_clip_matrix(np.eye(3), np.zeros(3), scale), jnp.float32)

    pyramid = default_pyramid(resolution)
    C = 2

    # ---- full pipeline ----------------------------------------------------
    full = jax.jit(lambda ps, vals, m: splat_atlas.splat_atlas(
        ps, vals, m, resolution, scale)[0])
    t_full, _ = timed(full, pos_smooth, values, matrix)

    # ---- front-end: coefficients ------------------------------------------
    front = jax.jit(lambda ps, vals, m: splat_coefficients(
        ps, vals, m, resolution, scale, pyramid, None, mode="lowrank"))
    t_front, parts = timed(front, pos_smooth, values, matrix)

    # ---- sort (as in splat_atlas, 4 + C operands) --------------------------
    row_offs, atlas_rows, atlas_cols = splat_atlas.atlas_layout(pyramid)

    def keyed(parts):
        res_per_level = jnp.asarray(pyramid.level_resolutions, jnp.float32)
        row_offs_arr = jnp.asarray(row_offs, jnp.float32)
        lev = parts["level"]
        res_l = res_per_level[lev]
        margin = float(splat_atlas.COL_PAD) - splat_atlas.FOOT + 4.0
        cy = jnp.clip(parts["cy"], -margin, res_l + margin)
        cx = jnp.clip(parts["cx"], -margin, res_l + margin)
        ay = row_offs_arr[lev] + cy
        ax = splat_atlas.COL_PAD + cx
        inv_h = jnp.where(parts["tiny"], -1.0, 1.0 / parts["h_eff"])
        band = jnp.floor(ay / splat_atlas.BAND).astype(jnp.int32)
        xkey = jnp.clip(jnp.floor(ax).astype(jnp.int32), 0, 2047)
        key = band * 4096 + jnp.where(parts["tiny"], 0, 2048) + xkey
        return key, ay, ax, inv_h, parts["coef"]

    @jax.jit
    def sort_only(parts):
        key, ay, ax, inv_h, coef = keyed(parts)
        ops = (key, ay, ax, inv_h) + tuple(coef[:, c] for c in range(C))
        return jax.lax.sort(ops, num_keys=1)

    t_sort, sorted_ops = timed(sort_only, parts)

    @jax.jit
    def sort_kidx(parts):
        key, *_ = keyed(parts)
        idx = jax.lax.broadcasted_iota(jnp.int32, (key.shape[0], 1), 0)[:, 0]
        return jax.lax.sort((key, idx), num_keys=1)

    t_sort2, _ = timed(sort_kidx, parts)

    @jax.jit
    def gather_rows(parts, idx):
        _, ay, ax, inv_h, coef = keyed(parts)
        payload = jnp.concatenate(
            [ay[:, None], ax[:, None], inv_h[:, None], coef], axis=1)
        return jnp.take(payload, idx, axis=0)

    _, (skey, sidx) = timed(sort_kidx, parts)
    t_gather, _ = timed(gather_rows, parts, sidx)

    # ---- pallas kernel alone ------------------------------------------------
    from topsy_tpu.ops import splat_pallas
    G = splat_atlas.GROUP
    _, ay_s, ax_s, inv_h_s = sorted_ops[:4]
    coef_s = jnp.stack(sorted_ops[4:], axis=-1)
    n_pad = ay_s.shape[0]
    n_groups = n_pad // G
    ay_g2 = ay_s[:n_groups * G].reshape(n_groups, G)
    ax_g2 = ax_s[:n_groups * G].reshape(n_groups, G)
    w0 = (jnp.floor(ay_g2.min(axis=1) / splat_atlas.BAND).astype(jnp.int32)
          * splat_atlas.BAND - 2 * splat_atlas.BAND)
    w0 = jnp.clip(w0, 0, atlas_rows - splat_atlas.WINDOW_ROWS)
    c0e = jnp.floor(ax_g2.min(axis=1) - splat_atlas.FOOT).astype(jnp.int32)
    c0 = jnp.clip((c0e // splat_pallas.COL_ALIGN) * splat_pallas.COL_ALIGN,
                  0, atlas_cols - splat_pallas.WINDOW_COLS)
    c0e = jnp.clip(c0e, c0,
                   c0 + splat_pallas.WINDOW_COLS - splat_pallas.PROFILE_COLS)

    ng4 = (n_groups // splat_pallas.SUBGROUPS) * splat_pallas.SUBGROUPS
    m = ng4 * G
    from topsy_tpu.ops.splat import H_MAX
    flags = splat_pallas.group_flags(
        inv_h_s[:m].reshape(ng4, G),
        coef_s[:m].reshape(ng4, G, C), H_MAX)

    kern = jax.jit(lambda ay, ax, ih, cf, w, c, e, fl:
                   splat_pallas.accumulate_groups_pallas(
                       ay, ax, ih, cf, w, c, e, fl, atlas_rows=atlas_rows,
                       atlas_cols=atlas_cols, C=C, group=G))
    args = (ay_s[:m].reshape(ng4, 1, G), ax_s[:m].reshape(ng4, 1, G),
            inv_h_s[:m].reshape(ng4, 1, G),
            coef_s[:m].reshape(ng4, G, C).transpose(0, 2, 1),
            w0[:ng4], c0[:ng4], c0e[:ng4], flags)
    t_kern, _ = timed(kern, *args)

    # ---- collapse ----------------------------------------------------------
    atlas = jnp.zeros((C, atlas_rows, atlas_cols), jnp.float32)
    coll = jax.jit(lambda a: splat_atlas.collapse_atlas(a, pyramid))
    t_coll, _ = timed(coll, atlas)

    # ---- presorted (bench) path --------------------------------------------
    from topsy_tpu.ops import morton
    ps_np = np.asarray(pos_smooth)
    values_np = np.asarray(values)
    layout = morton.build_presorted(ps_np)
    ps_pre = jnp.asarray(layout.apply(ps_np, fill=morton.PAD_POS))
    vals_pre = jnp.asarray(layout.apply(values_np))
    buckets = jnp.asarray(layout.buckets)
    pre_full = jax.jit(lambda ps, vals, m, b: splat_atlas.splat_atlas(
        ps, vals, m, resolution, scale, presorted_buckets=b)[0])
    t_pre, _ = timed(pre_full, ps_pre, vals_pre, matrix, buckets)

    from topsy_tpu.ops.splat import levels_from_buckets
    px_per_world = resolution / (2.0 * scale)

    pre_front = jax.jit(lambda ps, vals, m, b: splat_coefficients(
        ps, vals, m, resolution, scale, pyramid, None, mode="lowrank",
        level_override=levels_from_buckets(b, px_per_world,
                                           pyramid.num_levels)))
    t_pre_front, _ = timed(pre_front, ps_pre, vals_pre, matrix, buckets)

    def row(name, t):
        print(f"{name:28s} {t*1e3:9.3f} ms   {n/t/1e6:8.1f} M/s")

    print(f"n = 2^{log2n} = {n}, groups = {n_groups}, backend = {jax.default_backend()}")
    row("full splat_atlas (presort)", t_pre)
    row("presort front-end", t_pre_front)
    row("full splat_atlas", t_full)
    row("front-end coefficients", t_front)
    row(f"lax.sort ({4 + C} operands)", t_sort)
    row("lax.sort (key+idx only)", t_sort2)
    row("row-gather payload (take)", t_gather)
    row("pallas accumulate", t_kern)
    row("collapse_atlas", t_coll)
    acc = t_front + t_sort + t_kern + t_coll
    row("sum of stages", acc)
    print(f"pallas per-group: {t_kern/ng4*1e6:.2f} us "
          f"({ng4} groups, G={G})")


if __name__ == "__main__":
    main()
