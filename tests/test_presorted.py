"""Sort-free (bucket, Morton) presorted splat path (ops/morton.py).

Covers: layout construction invariants, the bucket-derived level guarantee
(h_eff never exceeds the footprint bound), image equality between the
presorted and sorted engines, and the renderer-level EXPORT switch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import topsy_tpu
from topsy_tpu import camera
from topsy_tpu.canvas import OffscreenCanvas
from topsy_tpu.loaders import TestDataLoader
from topsy_tpu.ops import morton, splat_atlas
from topsy_tpu.ops.splat import H_MAX, default_pyramid, levels_from_buckets


@pytest.fixture(scope="module")
def snap():
    loader = TestDataLoader(50000, seed=1337)
    ps = loader.get_pos_smooth().astype(np.float32)
    mass = loader.get_mass().astype(np.float32)
    qty = loader.get_named_quantity("test-quantity").astype(np.float32)
    values = np.stack([mass, mass * qty], axis=1)
    return ps, values


def test_layout_invariants(snap):
    ps, _ = snap
    layout = morton.build_presorted(ps)
    n = len(ps)
    # a permutation: every particle appears exactly once
    assert sorted(layout.order) == list(range(n))
    # destinations are unique and inside the padded output
    assert len(np.unique(layout.dst)) == n
    assert layout.dst.max() < layout.n_out
    assert layout.n_out % 4096 == 0
    # buckets are non-decreasing along the output (runs are contiguous)
    out_buckets = layout.buckets
    assert np.all(np.diff(out_buckets) >= 0)
    # each particle landed in a slot of its own bucket
    b_in = morton.smoothing_buckets(ps[:, 3])
    assert np.array_equal(out_buckets[layout.dst], b_in[layout.order])
    # runs padded to the group size: bucket changes only at multiples of 512
    change = np.flatnonzero(np.diff(out_buckets)) + 1
    assert np.all(change % 512 == 0)


def test_bucket_levels_bound_h_eff(snap):
    ps, _ = snap
    resolution, scale = 256, 120.0
    pyramid = default_pyramid(resolution)
    buckets = jnp.asarray(morton.smoothing_buckets(ps[:, 3]))
    px_per_world = resolution / (2.0 * scale)
    lev = np.asarray(levels_from_buckets(buckets, px_per_world,
                                         pyramid.num_levels))
    h_px = ps[:, 3] * px_per_world
    h_l = h_px * 2.0 ** (-lev.astype(np.float64))
    unclamped = lev < pyramid.num_levels - 1
    assert h_l[unclamped].max() <= H_MAX * (1 + 1e-5)


@pytest.mark.parametrize("rot_deg", [0.0, 35.0])
def test_presorted_matches_sorted(snap, rot_deg):
    ps, values = snap
    layout = morton.build_presorted(ps)
    ps_p = layout.apply(ps, fill=morton.PAD_POS)
    vals_p = layout.apply(values)

    import scipy.spatial.transform as sst
    rot = sst.Rotation.from_euler("xy", [rot_deg, rot_deg * 0.7],
                                  degrees=True).as_matrix()
    resolution, scale = 256, 120.0
    matrix = jnp.asarray(camera.world_to_clip_matrix(rot, np.zeros(3), scale),
                         jnp.float32)

    im_sorted, d0 = jax.jit(lambda a, b, m: splat_atlas.splat_atlas(
        a, b, m, resolution, scale))(jnp.asarray(ps), jnp.asarray(values),
                                     matrix)
    im_pre, d1 = jax.jit(lambda a, b, m, k: splat_atlas.splat_atlas(
        a, b, m, resolution, scale, presorted_buckets=k))(
        jnp.asarray(ps_p), jnp.asarray(vals_p), matrix,
        jnp.asarray(layout.buckets))

    assert int(d0) == 0
    assert int(d1) == 0
    im_sorted = np.asarray(im_sorted)
    im_pre = np.asarray(im_pre)
    # identical mass (order-independent additive deposit; level choices may
    # differ near bucket edges, shifting where a splat is rasterized between
    # adjacent pyramid levels, so pixels agree to the upsample tolerance)
    # level choices differ near bucket edges; the discrete normalization is
    # phase-averaged per level, so totals agree to ~1e-4, not bit-exactly
    assert im_pre[..., 0].sum() == pytest.approx(im_sorted[..., 0].sum(),
                                                 rel=1e-3)
    corr = np.corrcoef(im_pre[..., 0].ravel(), im_sorted[..., 0].ravel())[0, 1]
    assert corr > 0.999


def test_renderer_export_uses_presorted(snap, monkeypatch):
    vis = topsy_tpu.test(20000, render_resolution=128,
                         canvas_class=OffscreenCanvas)
    vis.show_status = False
    # the one-time presort is only built once exports repeat (a one-shot
    # save must not pay it)
    np.asarray(vis.get_sph_image())
    assert getattr(vis._sph._store, "_presorted_layout", None) is None
    vis._sph.invalidate()
    im_pre = np.asarray(vis.get_sph_image())
    assert getattr(vis._sph._store, "_presorted_layout", None) is not None

    from topsy_tpu import config
    monkeypatch.setattr(config, "EXPORT_USE_PRESORTED", False)
    vis._sph.invalidate()
    im_sorted = np.asarray(vis.get_sph_image())
    assert im_pre.sum() == pytest.approx(im_sorted.sum(), rel=1e-3)
    corr = np.corrcoef(np.nan_to_num(im_pre).ravel(),
                       np.nan_to_num(im_sorted).ravel())[0, 1]
    assert corr > 0.999
