"""A/B a splat_pallas toggle on the real chip: timing + bit-exactness.

Usage: PYTHONPATH=... python benchmarks/ab_kernel.py [TOGGLE [log2n]]
Times the full presorted splat_atlas and the kernel alone with the module
toggle (default HALF_RMW) off and on, and checks the images agree.
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
    toggle = sys.argv[1] if len(sys.argv) > 1 else "HALF_RMW"
    log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 22

    import jax
    import jax.numpy as jnp

    from topsy_tpu import camera
    from topsy_tpu.loaders import TestDataLoader
    from topsy_tpu.ops import morton, splat_atlas, splat_pallas

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

    results = {}
    for setting in (False, True):
        setattr(splat_pallas, toggle, setting)
        fn = jax.jit(lambda ps, vals, m, b: splat_atlas.splat_atlas(
            ps, vals, m, resolution, scale, presorted_buckets=b)[0])
        t, im = timed(fn, pos_smooth, values, matrix, buckets)
        results[setting] = (t, np.asarray(im))
        print(f"{toggle}={setting}:  full splat {t * 1e3:8.3f} ms "
              f"({n / t / 1e6:7.1f} M splats/s)")
        fn._clear_cache()

    a, b = results[False][1], results[True][1]
    diff = np.abs(a - b).max()
    rel = diff / max(np.abs(a).max(), 1e-30)
    print(f"max abs diff: {diff:.3e}  (rel {rel:.3e})")
    print(f"speedup: {results[False][0] / results[True][0]:.4f}x")


if __name__ == "__main__":
    main()
