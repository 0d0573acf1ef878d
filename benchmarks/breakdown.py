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


def roofline(log2n: int = 24, resolution: int = 1024):
    """Achieved-vs-peak accounting for the PRODUCT frame's accumulate
    kernel (VERDICT r4 item 2).

    Builds the bench configuration (TestDataDeviceLoader at 2^log2n via
    the product store), times the fused-feed stages on the chip, pulls the
    per-group (kind, size-class) flags to the host, and prices each
    hardware term of the kernel's work model:

    * MXU: bf16 deposit matmuls, 2*C*R*Wq*rank*G FLOPs per group
      (hat groups contract at width G);
    * VPU: profile evaluation, ~(R+Wq)*G*(2*rank*(ncoef-1)+5) elementwise
      ops per group;
    * VMEM: the window read-modify-write, 2*C*R*256*4 bytes per group
      (columns are the full DMA window regardless of the size class);
    * HBM: window flush+load DMA at band changes (counted from the group
      anchor sequence; FRESH_SKIP halves loads).

    Peaks: v5e MXU bf16 197 TFLOP/s; VPU 4.2 T elementwise-ops/s and VMEM
    RMW ~281 GB/s (both MEASURED on this chip — CLAUDE.md notes: 0.7 us
    per 96x256 f32 read-modify-write); HBM 819 GB/s.  The binding term is
    the one whose implied time is the largest share of the measured
    kernel time.
    """
    import jax
    import jax.numpy as jnp

    from topsy_tpu import camera
    from topsy_tpu.loaders import TestDataDeviceLoader
    from topsy_tpu.ops import kernels, splat_atlas, splat_pallas
    from topsy_tpu.render.store import ParticleStore

    n = 1 << log2n
    scale = 200.0
    print(f"roofline: n=2^{log2n}, res={resolution}, "
          f"backend={jax.default_backend()}")

    loader = TestDataDeviceLoader(n, seed=1337)
    store = ParticleStore(loader)
    store.ensure_presorted()
    fields = store.presorted_fields()
    values_cm = store.presorted_values_cm_for("mass_and_quantity")
    gb = store.presorted_group_buckets
    matrix = jnp.asarray(camera.world_to_clip_matrix(
        np.eye(3), np.zeros(3), scale), jnp.float32)

    # stage timings through the fused-feed product path (one jitted fn per
    # stage so the trace cache holds across reps)
    def make(stop):
        return jax.jit(lambda f, v, m, g: splat_atlas.splat_atlas_fields(
            f, v, m, resolution, scale, g, giants="none",
            _stop_after=stop)[0])
    stages = {s: make(s) for s in ("feed", "kernel", None)}
    t_feed, _ = timed(stages["feed"], fields, values_cm, matrix, gb,
                      reps=10)
    t_kernel, _ = timed(stages["kernel"], fields, values_cm, matrix, gb,
                        reps=10)
    t_full, _ = timed(stages[None], fields, values_cm, matrix, gb, reps=10)
    t_accum = t_kernel - t_feed
    row_t = lambda k, v: print(f"{k:30s} {v*1e3:9.3f} ms")
    row_t("feed front-end", t_feed)
    row_t("accumulate kernel (delta)", t_accum)
    row_t("full (incl spill+collapse)", t_full)

    # per-group flags from the flat presorted path (same groups/windows)
    anchors = jax.jit(lambda ps, vals, m, b: splat_atlas.splat_atlas(
        ps, vals, m, resolution, scale, presorted_buckets=b,
        _stop_after="anchors"))
    w0_, c0_, c0e_, _coef, flags = anchors(
        store.pos_smooth_presorted,
        store.presorted_values_for("mass_and_quantity"),
        matrix, store.presorted_buckets)
    flags = np.asarray(flags)
    w0_np = np.asarray(w0_)
    c0_np = np.asarray(c0_)
    kind = flags // 4
    size = flags % 4
    G = splat_atlas.GROUP
    C = 2
    window_rows = 96
    lrk = kernels.lowrank_kernel()
    rank, ncoef = lrk.rank, lrk.coeffs.shape[1]

    mxu_flops = vpu_ops = vmem_bytes = 0.0
    counts = {}
    for sz in range(len(splat_pallas.SIZE_CLASSES)):
        r_e, c_e = splat_pallas.SIZE_CLASSES[sz]
        R = window_rows if r_e is None else min(r_e, window_rows)
        Wq = splat_pallas.PROFILE_COLS if c_e is None else c_e
        for k in range(5):
            m = int(((kind == k) & (size == sz)).sum())
            if m == 0 or k == splat_pallas.FLAG_INACTIVE:
                continue
            counts[(k, sz)] = m
            width = G if k == splat_pallas.FLAG_ALL_TINY else rank * G
            mxu_flops += m * 2.0 * C * R * Wq * width
            vpu_ops += m * (R + Wq) * G * (2 * rank * (ncoef - 1) + 5)
            vmem_bytes += m * 2.0 * C * R * 256 * 4
    print("group classes (kind,size->count):",
          {k: v for k, v in sorted(counts.items())})

    band_rows = window_rows + splat_pallas.ROW_QUANTUM + 8
    anchor = (w0_np // splat_pallas.ROW_QUANTUM) * splat_pallas.ROW_QUANTUM
    changes = int(np.count_nonzero(
        (np.diff(anchor) != 0) | (np.diff(c0_np) != 0))) + 1
    hbm_bytes = changes * C * band_rows * 256 * 4 * 1.5  # flush + ~half loads

    PEAK = {"MXU bf16 FLOP/s": 197e12, "VPU ops/s": 4.2e12,
            "VMEM RMW B/s": 281e9, "HBM B/s": 819e9}
    terms = [("MXU bf16 FLOP/s", mxu_flops), ("VPU ops/s", vpu_ops),
             ("VMEM RMW B/s", vmem_bytes), ("HBM B/s", hbm_bytes)]
    print(f"{'term':18s} {'work':>12s} {'implied ms':>11s} "
          f"{'% of kernel':>12s} {'achieved/peak':>14s}")
    for name, work in terms:
        implied = work / PEAK[name]
        ach = work / t_accum / PEAK[name]
        print(f"{name:18s} {work:12.3e} {implied*1e3:11.3f} "
              f"{implied / t_accum * 100:11.1f}% {ach*100:13.1f}%")
    print(f"measured kernel {t_accum*1e3:.3f} ms; splats/s "
          f"{n / t_full / 1e6:.0f} M (windowed passes only, giants=none)")


if __name__ == "__main__":
    if "roofline" in sys.argv[1:]:
        args = [a for a in sys.argv[1:] if a != "roofline"]
        roofline(int(args[0]) if args else 24,
                 int(args[1]) if len(args) > 1 else 1024)
    else:
        main()
