"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: the reduced
framebuffer must be invariant to the shard count (SURVEY.md §4)."""

import numpy as np
import pytest

import jax

from topsy_tpu import camera
from topsy_tpu.loaders import TestDataLoader
from topsy_tpu.parallel import DistributedSplatter, make_mesh, strided_shard, unstride


RES = 64
SCALE = 200.0


@pytest.fixture(scope="module")
def data():
    loader = TestDataLoader(6000, seed=3)
    ps = loader.get_pos_smooth()
    mass = loader.get_mass()
    qty = loader.get_named_quantity("test-quantity")
    vals = np.stack([mass, mass * qty], axis=1)
    matrix = camera.world_to_clip_matrix(np.eye(3), np.zeros(3), SCALE)
    return ps, vals, matrix


def test_strided_shard_roundtrip():
    arr = np.arange(23 * 3, dtype=np.float32).reshape(23, 3)
    sh = strided_shard(arr, 4)
    assert sh.shape == (4, 6, 3)
    assert np.all(sh[1, 0] == arr[1])
    assert np.all(sh[3, 2] == arr[11])
    back = unstride(sh)
    assert np.all(back[:23] == arr)


def test_shard_count_invariance(data):
    ps, vals, matrix = data
    assert jax.device_count() >= 8, "tests must run with 8 virtual devices"

    images = {}
    for n_dev in (1, 2, 8):
        mesh = make_mesh(n_dev)
        ds = DistributedSplatter(mesh, ps, vals, RES)
        images[n_dev] = np.asarray(ds.render(matrix, SCALE))

    for n_dev in (2, 8):
        np.testing.assert_allclose(images[n_dev], images[1], rtol=1e-4,
                                   atol=1e-12 + 1e-6 * np.abs(images[1]).max())


def test_lod_prefix_balanced_and_correct(data):
    """A prefix LOD range on the sharded path equals the same range
    rendered single-chip."""
    ps, vals, matrix = data
    k = 2000
    mesh8 = make_mesh(8)
    ds8 = DistributedSplatter(mesh8, ps, vals, RES)
    im8 = np.asarray(ds8.render(matrix, SCALE, 0, k))

    mesh1 = make_mesh(1)
    ds1 = DistributedSplatter(mesh1, ps, vals, RES)
    im1 = np.asarray(ds1.render(matrix, SCALE, 0, k))

    np.testing.assert_allclose(im8, im1, rtol=1e-4,
                               atol=1e-12 + 1e-6 * np.abs(im1).max())
    assert im1[..., 0].sum() > 0


def test_presorted_multichip_matches_sorted(data):
    """The sort-free presorted slabs reproduce the sorted multi-chip render
    (levels may differ by one near bucket edges; distributions must agree)."""
    ps, vals, matrix = data
    mesh = make_mesh(8)
    sp = DistributedSplatter(mesh, ps, vals, RES)
    im_sorted = np.asarray(sp.render(matrix, SCALE))
    im_pre, dropped = sp.render_presorted(matrix, SCALE)
    im_pre = np.asarray(im_pre)
    assert int(dropped) == 0
    assert im_pre[..., 0].sum() == pytest.approx(im_sorted[..., 0].sum(),
                                                 rel=1e-3)
    corr = np.corrcoef(im_pre[..., 0].ravel(),
                       im_sorted[..., 0].ravel())[0, 1]
    assert corr > 0.999


def test_columns_multichip_cover_and_scale(data):
    """Sort-free column LOD over the mesh: summed column slices equal the
    full presorted render; one slice scaled by the exact real-count factor
    is a fair subsample."""
    ps, vals, matrix = data
    mesh = make_mesh(8)
    sp = DistributedSplatter(mesh, ps, vals, RES)
    im_full, d0 = sp.render_presorted(matrix, SCALE)
    im_full = np.asarray(im_full)
    assert int(d0) == 0
    layout = sp.presorted_layout
    pg = layout.pad_group

    acc = None
    for c0 in range(0, pg, 128):
        im, d = sp.render_columns(matrix, SCALE, c0, 128)
        assert int(d) == 0
        acc = np.asarray(im) if acc is None else acc + np.asarray(im)
    assert acc[..., 0].sum() == pytest.approx(im_full[..., 0].sum(), rel=1e-4)
    corr = np.corrcoef(acc[..., 0].ravel(), im_full[..., 0].ravel())[0, 1]
    assert corr > 0.9999

    im1, _ = sp.render_columns(matrix, SCALE, 0, 128)
    rendered_real = int(layout.real_per_column[:128].sum())
    scaled = np.asarray(im1)[..., 0] * (layout.n_real / rendered_real)
    assert scaled.sum() == pytest.approx(im_full[..., 0].sum(), rel=0.05)


def test_presorted_multichip_shard_invariance(data):
    """Presorted output is invariant to the mesh size."""
    ps, vals, matrix = data
    im1, d1 = DistributedSplatter(make_mesh(1), ps, vals,
                                  RES).render_presorted(matrix, SCALE)
    im8, d8 = DistributedSplatter(make_mesh(8), ps, vals,
                                  RES).render_presorted(matrix, SCALE)
    assert int(d1) == 0 and int(d8) == 0
    np.testing.assert_allclose(np.asarray(im8), np.asarray(im1), rtol=1e-3,
                               atol=1e-6 * float(np.abs(np.asarray(im1)).max()))
