"""Probe the Pallas accumulation kernel's cost structure on the real chip.

Times accumulate_groups_pallas on the exact bench-configuration feed
(2^22 presorted particles) under controlled flag substitutions:
  * real flags (the production mix)
  * all INACTIVE (skip deposits entirely)    -> pipeline/control floor
  * all forced FULL size class               -> size-class win
  * histogram of the real (kind, size) flags -> what the mix actually is

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python benchmarks/kernel_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _sync(out):
    import jax.numpy as jnp
    float(jnp.sum(out))


def timed(fn, *args, reps=30, rounds=3):
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
    from topsy_tpu.ops import morton, splat_atlas, splat_pallas

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log2n
    resolution = 1024
    scale = 200.0

    loader = TestDataLoader(n, seed=1337)
    ps_np = loader.get_pos_smooth().astype(np.float32)
    mass = loader.get_mass()
    qty = loader.get_named_quantity("test-quantity")
    values_np = np.stack([mass, mass * qty], axis=1).astype(np.float32)
    layout = morton.build_presorted(ps_np)
    pos_smooth = jnp.asarray(layout.apply(ps_np, fill=morton.PAD_POS))
    values = jnp.asarray(layout.apply(values_np))
    buckets = jnp.asarray(layout.buckets)
    matrix = jnp.asarray(
        camera.world_to_clip_matrix(np.eye(3), np.zeros(3), scale),
        jnp.float32)

    # build the exact kernel feed the bench path uses
    anchors = jax.jit(lambda ps, vals, m, b: splat_atlas.splat_atlas(
        ps, vals, m, resolution, scale, presorted_buckets=b,
        _stop_after="anchors"))
    w0, c0, c0e, coef_fit, flags = anchors(pos_smooth, values, matrix,
                                           buckets)
    front = jax.jit(lambda ps, vals, m, b: splat_atlas.splat_atlas(
        ps, vals, m, resolution, scale, presorted_buckets=b,
        _stop_after="frontend"))
    ay_s, ax_s, inv_h_s, coef_s = front(pos_smooth, values, matrix, buckets)

    from topsy_tpu.ops.splat import default_pyramid
    pyramid = default_pyramid(resolution)
    row_offs, atlas_rows, atlas_cols = splat_atlas.atlas_layout(pyramid)
    G = splat_atlas.GROUP
    C = 2
    n_pad = ay_s.shape[0]
    n_groups = n_pad // G

    flags_np = np.asarray(flags)
    kinds = flags_np // 4
    sizes = flags_np % 4
    print(f"groups={n_groups}  kind histogram:",
          {k: int((kinds == k).sum()) for k in range(5)})
    print("size histogram (tiny/poly only):",
          {s: int((sizes[(kinds == 1) | (kinds == 2)] == s).sum())
           for s in range(4)})
    # window-change statistics
    w0_np = np.asarray(w0)
    c0_np = np.asarray(c0)
    qa = splat_pallas.ROW_QUANTUM
    wb = (w0_np // qa) * qa
    changes = 1 + int(((wb[1:] != wb[:-1]) | (c0_np[1:] != c0_np[:-1])).sum())
    print(f"band changes: {changes} ({changes / n_groups:.1%} of groups)")

    def run(flags_in):
        f = jax.jit(lambda ay, ax, ih, cf, w, c, ce, fl:
                    splat_pallas.accumulate_groups_pallas(
                        ay.reshape(n_groups, 1, G),
                        ax.reshape(n_groups, 1, G),
                        ih.reshape(n_groups, 1, G),
                        cf.reshape(n_groups, G, C).transpose(0, 2, 1),
                        w, c, ce, fl, atlas_rows=atlas_rows,
                        atlas_cols=atlas_cols, C=C, group=G,
                        interpret=False, window_rows=96))
        return timed(f, ay_s, ax_s, inv_h_s, coef_fit, w0, c0, c0e,
                     flags_in)

    t_real, _ = run(flags)
    print(f"real flags:      {t_real * 1e3:8.3f} ms"
          f"  ({t_real / n_groups * 1e6:.3f} us/group)")

    t_inact, _ = run(jnp.zeros_like(flags))
    print(f"all INACTIVE:    {t_inact * 1e3:8.3f} ms"
          f"  ({t_inact / n_groups * 1e6:.3f} us/group)")

    full = (flags // 4) * 4 + splat_pallas.FULL_CLASS
    t_full, _ = run(full)
    print(f"forced FULL sz:  {t_full * 1e3:8.3f} ms"
          f"  ({t_full / n_groups * 1e6:.3f} us/group)")

    sz0 = jnp.where((flags // 4 == 1) | (flags // 4 == 2),
                    (flags // 4) * 4, flags)
    t_sz0, _ = run(sz0)
    print(f"forced (16,32):  {t_sz0 * 1e3:8.3f} ms"
          f"  ({t_sz0 / n_groups * 1e6:.3f} us/group)  [lower bound, wrong image]")

    # single band (no window changes): isolates the window-DMA stall
    def run_anchor(flags_in, w, c, ce):
        f = jax.jit(lambda ay, ax, ih, cf, w, c, ce, fl:
                    splat_pallas.accumulate_groups_pallas(
                        ay.reshape(n_groups, 1, G),
                        ax.reshape(n_groups, 1, G),
                        ih.reshape(n_groups, 1, G),
                        cf.reshape(n_groups, G, C).transpose(0, 2, 1),
                        w, c, ce, fl, atlas_rows=atlas_rows,
                        atlas_cols=atlas_cols, C=C, group=G,
                        interpret=False, window_rows=96))
        return timed(f, ay_s, ax_s, inv_h_s, coef_fit, w, c, ce, flags_in)

    zw = jnp.zeros_like(w0)
    t_ib, _ = run_anchor(jnp.zeros_like(flags), zw, zw, zw)
    print(f"INACTIVE 1band:  {t_ib * 1e3:8.3f} ms"
          f"  ({t_ib / n_groups * 1e6:.3f} us/group)  [no window DMA]")
    t_rb, _ = run_anchor(flags, zw, zw, zw)
    print(f"real 1band:      {t_rb * 1e3:8.3f} ms"
          f"  ({t_rb / n_groups * 1e6:.3f} us/group)  [wrong image]")


if __name__ == "__main__":
    main()
