"""On-device presort build (ops/morton_device.py).

Validates the layout contract independently of the host implementation
(permutation, run structure, bucket guarantee, shuffle fairness) and
image-level equivalence with the host-built layout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from topsy_tpu import camera
from topsy_tpu.loaders import TestDataLoader
from topsy_tpu.ops import morton, morton_device, splat_atlas


@pytest.fixture(scope="module")
def snap():
    loader = TestDataLoader(50000, seed=1337)
    ps = loader.get_pos_smooth().astype(np.float32)
    mass = loader.get_mass().astype(np.float32)
    qty = loader.get_named_quantity("test-quantity").astype(np.float32)
    values = np.stack([mass, mass * qty], axis=1)
    return ps, values


@pytest.fixture(scope="module")
def dlayout(snap):
    ps, _ = snap
    layout = morton_device.build_presorted_device(ps)
    assert layout is not None
    return layout


def test_device_layout_invariants(snap, dlayout):
    ps, _ = snap
    n = len(ps)
    layout = dlayout
    gidx = np.asarray(layout.gidx)
    assert layout.n_real == n
    assert layout.n_out % 4096 == 0
    assert len(gidx) == layout.n_out
    real = gidx < n
    # real slots gather each particle exactly once; pads carry the sentinel
    assert np.array_equal(np.sort(gidx[real]), np.arange(n))
    assert np.all(gidx[~real] == n)
    # real slots are a prefix of every pad_group group
    pg = layout.pad_group
    r2 = real.reshape(-1, pg)
    assert np.all(r2[:, :-1] >= r2[:, 1:])
    assert np.array_equal(layout.real_per_column, r2.sum(axis=0))
    # buckets non-decreasing, changes only at run_quantum multiples
    buckets = np.asarray(layout.buckets)
    assert np.all(np.diff(buckets) >= 0)
    change = np.flatnonzero(np.diff(buckets)) + 1
    assert np.all(change % layout.run_quantum == 0)


def test_device_buckets_bound_smoothing(snap, dlayout):
    """Each real slot's bucket upper edge bounds its particle's h (the
    level-derivation guarantee, ops/splat.levels_from_buckets)."""
    ps, _ = snap
    layout = dlayout
    gidx = np.asarray(layout.gidx)
    buckets = np.asarray(layout.buckets)
    real = gidx < len(ps)
    h = ps[gidx[real], 3]
    upper = 2.0 ** ((buckets[real] + 1.0) * morton.DELTA_OCTAVE)
    assert np.all(h <= upper * (1 + 1e-5))
    lower = 2.0 ** (buckets[real] * morton.DELTA_OCTAVE)
    # f32 log2 may flip the floor at bucket boundaries only
    frac_below = (h < lower * (1 - 1e-5)).mean()
    assert frac_below < 1e-3


def test_device_shuffle_randomizes_groups(dlayout):
    layout = dlayout
    gidx = np.asarray(layout.gidx)
    real = gidx < layout.n_real
    pg = layout.pad_group
    g_id = np.repeat(np.arange(len(gidx) // pg), pg)
    same = real[1:] & real[:-1] & (g_id[1:] == g_id[:-1])
    # without shuffling, within-group sources would be sorted ascending
    asc = (np.diff(gidx.astype(np.int64)) > 0)[same[: len(gidx) - 1]]
    assert asc.mean() < 0.9


def test_device_apply_and_image_matches_host(snap, dlayout):
    ps, values = snap
    layout = dlayout
    ps_p = np.asarray(layout.apply(ps, fill=morton.PAD_POS))
    vals_p = np.asarray(layout.apply(values))
    gidx = np.asarray(layout.gidx)
    real = gidx < len(ps)
    assert np.array_equal(ps_p[real], ps[gidx[real]])
    assert np.all(ps_p[~real] == morton.PAD_POS)
    assert np.all(vals_p[~real] == 0.0)

    host = morton.build_presorted(ps)
    ps_h = host.apply(ps, fill=morton.PAD_POS)
    vals_h = host.apply(values)
    resolution, scale = 256, 120.0
    matrix = jnp.asarray(
        camera.world_to_clip_matrix(np.eye(3), np.zeros(3), scale),
        jnp.float32)
    im_d, dd = jax.jit(lambda a, b, m, k: splat_atlas.splat_atlas(
        a, b, m, resolution, scale, presorted_buckets=k))(
        jnp.asarray(ps_p), jnp.asarray(vals_p), matrix, layout.buckets)
    im_h, dh = jax.jit(lambda a, b, m, k: splat_atlas.splat_atlas(
        a, b, m, resolution, scale, presorted_buckets=k))(
        jnp.asarray(ps_h), jnp.asarray(vals_h), matrix,
        jnp.asarray(host.buckets))
    assert int(dd) == 0
    assert int(dh) == 0
    im_d = np.asarray(im_d)
    im_h = np.asarray(im_h)
    assert im_d[..., 0].sum() == pytest.approx(im_h[..., 0].sum(), rel=1e-3)
    corr = np.corrcoef(im_d[..., 0].ravel(), im_h[..., 0].ravel())[0, 1]
    assert corr > 0.9999


def test_device_build_small_and_odd_sizes():
    """Non-power-of-two n exercises the capacity padding/fake-run path."""
    for n in (3000, 5000):
        loader = TestDataLoader(n, seed=7)
        ps = loader.get_pos_smooth().astype(np.float32)
        layout = morton_device.build_presorted_device(ps)
        assert layout is not None
        gidx = np.asarray(layout.gidx)
        real = gidx < n
        assert np.array_equal(np.sort(gidx[real]), np.arange(n))
        assert layout.n_out % 4096 == 0
