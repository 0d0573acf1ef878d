"""Occlusion (surface) renderer tests: z-buffer semantics vs a brute-force
numpy rasterization of the same hemisphere-splat rules."""

import numpy as np
import pytest

import jax.numpy as jnp

from topsy_tpu import camera
from topsy_tpu.ops import zsplat


RES = 64
SCALE = 10.0


def brute_zbuffer(ps, qty, mass, res, scale, density_cut=0.0):
    """Direct per-pixel emulation of the reference's depth-test pipeline
    (reference: shaders/sph.wgsl:94-158): frag depth = clip_z + k * h/scale/2,
    greater-compare, output (quantity, depth)."""
    m = camera.world_to_clip_matrix(np.eye(3), np.zeros(3), scale)
    out = np.zeros((res, res, 2))
    for i in range(len(ps)):
        x, y, z, h = ps[i]
        rho = mass[i] / h**3
        if rho <= density_cut:
            continue
        clip = m @ np.array([x, y, z, 1.0])
        if not (0 <= clip[2] <= 1):
            continue
        cx = (clip[0] + 1) * res / 2 - 0.5
        cy = (1 - clip[1]) * res / 2 - 0.5
        h_px = h * res / (2 * scale)
        r = 2 * h_px
        for py in range(max(0, int(cy - r)), min(res, int(cy + r) + 2)):
            for px in range(max(0, int(cx - r)), min(res, int(cx + r) + 2)):
                q = np.hypot(px - cx, py - cy) / h_px
                if q >= 2.0:
                    continue
                k = np.sqrt(4 - q * q)
                depth = clip[2] + k * h / scale * 0.5
                if depth > out[py, px, 1]:
                    out[py, px] = (qty[i], depth)
    return out


def test_front_most_wins():
    # two overlapping spheres at different depths
    ps = np.array([[0.0, 0.0, 0.0, 2.0],
                   [3.0, 0.0, 4.0, 2.0]], dtype=np.float32)
    mass = np.ones(2, dtype=np.float32)
    qty = np.array([10.0, 20.0], dtype=np.float32)
    vals = np.stack([mass, qty], axis=1)
    m = camera.world_to_clip_matrix(np.eye(3), np.zeros(3), SCALE)
    im = np.asarray(zsplat.zsplat_scatter(jnp.asarray(ps), jnp.asarray(vals),
                                          jnp.asarray(m), RES, SCALE))
    # centre pixel: both spheres cover it; the z=4 one is in front (its rim
    # fragments still out-depth the first sphere's crown, as in the
    # reference's frag-depth rule)
    centre = im[RES // 2, RES // 2]
    assert centre[0] == pytest.approx(20.0)
    assert centre[1] > 0.5
    # region covered only by the first sphere
    left = im[RES // 2, 25]
    assert left[0] == pytest.approx(10.0)


def test_matches_bruteforce_zbuffer():
    rng = np.random.RandomState(0)
    n = 60
    ps = np.zeros((n, 4), dtype=np.float32)
    ps[:, :3] = rng.uniform(-5, 5, (n, 3))
    ps[:, 3] = rng.uniform(0.8, 2.5, n)
    mass = np.ones(n, dtype=np.float32)
    qty = rng.uniform(1, 5, n).astype(np.float32)
    vals = np.stack([mass, qty], axis=1)

    m = camera.world_to_clip_matrix(np.eye(3), np.zeros(3), SCALE)
    im = np.asarray(zsplat.zsplat_scatter(jnp.asarray(ps), jnp.asarray(vals),
                                          jnp.asarray(m), RES, SCALE))
    ref = brute_zbuffer(ps, qty, mass, RES, SCALE)

    # depth fields agree closely; the pyramid assigns big splats to coarse
    # levels, so compare where footprints are resolved (level 0, h_px <= 3.5)
    covered = (ref[..., 1] > 0) & (im[..., 1] > 0)
    assert covered.sum() > 100
    depth_err = np.abs(im[..., 1] - ref[..., 1])[covered]
    assert np.median(depth_err) < 0.02
    # winning quantity matches on most pixels (the pyramid's bilinear
    # collapse blends values across winner boundaries, so rims differ)
    same_winner = (im[..., 0] == ref[..., 0]) | ~covered
    assert same_winner.mean() > 0.7


def test_density_cut_removes_diffuse():
    ps = np.array([[0.0, 0.0, 0.0, 0.5],    # dense: rho = 8 m/unit^3
                   [3.0, 0.0, 0.0, 4.0]],   # diffuse: rho ~ 0.016
                  dtype=np.float32)
    mass = np.ones(2, dtype=np.float32)
    vals = np.stack([mass, np.array([1.0, 2.0], np.float32)], axis=1)
    m = camera.world_to_clip_matrix(np.eye(3), np.zeros(3), SCALE)
    im_all = np.asarray(zsplat.zsplat_scatter(jnp.asarray(ps), jnp.asarray(vals),
                                              jnp.asarray(m), RES, SCALE,
                                              density_cut=0.0))
    im_cut = np.asarray(zsplat.zsplat_scatter(jnp.asarray(ps), jnp.asarray(vals),
                                              jnp.asarray(m), RES, SCALE,
                                              density_cut=1.0))
    assert (im_all[..., 1] > 0).sum() > (im_cut[..., 1] > 0).sum()
    assert im_cut[..., 0].max() == pytest.approx(1.0)  # only the dense particle


def test_density_cut_percentiles():
    mass = np.ones(1000)
    smooth = np.linspace(0.5, 2.0, 1000)
    table = zsplat.density_cut_percentiles(mass, smooth)
    assert len(table) == 101
    assert table[0] <= table[50] <= table[100]
    assert table[0] == pytest.approx((1 / 2.0**3))
    assert table[100] == pytest.approx((1 / 0.5**3))
