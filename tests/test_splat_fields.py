"""The fused feed-kernel presorted path (ops/splat_feed.py +
splat_atlas.splat_atlas_fields).

Compares the transposed-field fast path against the legacy presorted
splat_atlas path (same image contract), checks mass conservation against
the scatter ground truth, the piece loop (group offsets + particle
ranges), and culling masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from topsy_tpu import camera
from topsy_tpu.loaders import TestDataLoader
from topsy_tpu.ops import morton, splat, splat_atlas

RES, SCALE = 256, 120.0


@pytest.fixture(scope="module")
def presorted():
    loader = TestDataLoader(50000, seed=1337)
    ps = loader.get_pos_smooth().astype(np.float32)
    mass = loader.get_mass().astype(np.float32)
    qty = loader.get_named_quantity("test-quantity").astype(np.float32)
    values = np.stack([mass, mass * qty], axis=1)
    layout = morton.build_presorted(ps)
    ps_p = layout.apply(ps, fill=morton.PAD_POS)
    vals_p = layout.apply(values)
    return ps, values, layout, ps_p, vals_p


def _fields_of(ps_p, vals_p, layout):
    G = layout.pad_group
    ng = layout.n_out // G
    fields = tuple(jnp.asarray(ps_p[:, k].reshape(ng, G)) for k in range(4))
    values_cm = tuple(jnp.asarray(vals_p[:, c].reshape(ng, G))
                      for c in range(vals_p.shape[1]))
    group_buckets = jnp.asarray(layout.buckets.reshape(ng, G)[:, 0])
    return fields, values_cm, group_buckets


def _matrix(rot_deg=0.0):
    if rot_deg:
        import scipy.spatial.transform as sst
        rot = sst.Rotation.from_euler("xy", [rot_deg, rot_deg * 0.7],
                                      degrees=True).as_matrix()
    else:
        rot = np.eye(3)
    return jnp.asarray(camera.world_to_clip_matrix(rot, np.zeros(3), SCALE),
                       jnp.float32)


@pytest.mark.parametrize("rot_deg", [0.0, 35.0])
def test_fields_matches_legacy_presorted(presorted, rot_deg):
    ps, values, layout, ps_p, vals_p = presorted
    fields, values_cm, group_buckets = _fields_of(ps_p, vals_p, layout)
    matrix = _matrix(rot_deg)

    im_leg, d0 = jax.jit(lambda a, b, m, k: splat_atlas.splat_atlas(
        a, b, m, RES, SCALE, presorted_buckets=k))(
        jnp.asarray(ps_p), jnp.asarray(vals_p), matrix,
        jnp.asarray(layout.buckets))
    im_f, d1 = jax.jit(lambda f, v, m, k: splat_atlas.splat_atlas_fields(
        f, v, m, RES, SCALE, k))(fields, values_cm, matrix, group_buckets)

    assert int(d0) == 0
    assert int(d1) == 0
    im_leg = np.asarray(im_leg)
    im_f = np.asarray(im_f)
    # same level choices (same buckets), same deposit math; grouping and
    # bf16 summation order differ between the engines
    assert im_f[..., 0].sum() == pytest.approx(im_leg[..., 0].sum(), rel=1e-3)
    assert np.abs(im_f - im_leg).max() <= 0.01 * np.abs(im_leg).max()
    corr = np.corrcoef(im_f[..., 0].ravel(), im_leg[..., 0].ravel())[0, 1]
    assert corr > 0.9999


def test_fields_mass_conservation(presorted):
    ps, values, layout, ps_p, vals_p = presorted
    fields, values_cm, group_buckets = _fields_of(ps_p, vals_p, layout)
    matrix = _matrix()
    im, dropped = splat_atlas.splat_atlas_fields(
        fields, values_cm, matrix, RES, SCALE, group_buckets)
    assert int(dropped) == 0
    ref = splat.splat_scatter(jnp.asarray(ps), jnp.asarray(values), matrix,
                              RES, SCALE)
    im = np.asarray(im)
    ref = np.asarray(ref)
    assert im[..., 0].sum() == pytest.approx(ref[..., 0].sum(), rel=0.01)
    corr = np.corrcoef(im[..., 0].ravel(), ref[..., 0].ravel())[0, 1]
    assert corr > 0.999


def test_fields_piece_loop_sums_to_full(presorted):
    ps, values, layout, ps_p, vals_p = presorted
    fields, values_cm, group_buckets = _fields_of(ps_p, vals_p, layout)
    matrix = _matrix(20.0)
    ng = layout.n_out // layout.pad_group
    n_total = layout.n_out

    im_full, _ = splat_atlas.splat_atlas_fields(
        fields, values_cm, matrix, RES, SCALE, group_buckets)

    # split at a SUBGROUPS multiple that exercises unequal piece sizes
    g_split = (ng // 2 // 16) * 16
    acc = None
    for g0, pg in ((0, g_split), (g_split, ng - g_split)):
        assert pg % 8 == 0
        im, _ = splat_atlas.splat_atlas_fields(
            fields, values_cm, matrix, RES, SCALE, group_buckets,
            piece=(jnp.int32(g0), pg))
        acc = im if acc is None else acc + im
    np.testing.assert_allclose(np.asarray(acc), np.asarray(im_full),
                               rtol=1e-4, atol=1e-5)


def test_fields_particle_range(presorted):
    ps, values, layout, ps_p, vals_p = presorted
    fields, values_cm, group_buckets = _fields_of(ps_p, vals_p, layout)
    matrix = _matrix()
    ng = layout.n_out // layout.pad_group
    n_total = layout.n_out
    half = (n_total // 2 // 4096) * 4096

    im_full, _ = splat_atlas.splat_atlas_fields(
        fields, values_cm, matrix, RES, SCALE, group_buckets)
    im_a, _ = splat_atlas.splat_atlas_fields(
        fields, values_cm, matrix, RES, SCALE, group_buckets,
        prange=(jnp.int32(0), jnp.int32(half)))
    im_b, _ = splat_atlas.splat_atlas_fields(
        fields, values_cm, matrix, RES, SCALE, group_buckets,
        prange=(jnp.int32(half), jnp.int32(n_total - half)))
    np.testing.assert_allclose(np.asarray(im_a + im_b), np.asarray(im_full),
                               rtol=1e-4, atol=1e-5)


def test_fields_depth_channel_matches_legacy(presorted):
    """The feed kernel's in-kernel depth channel (values0 * clip_z * w)
    agrees with the legacy depth_channel path."""
    ps, values, layout, ps_p, vals_p = presorted
    fields, values_cm, group_buckets = _fields_of(ps_p, vals_p, layout)
    matrix = _matrix(15.0)
    im_leg, d0 = jax.jit(lambda a, b, m, k: splat_atlas.splat_atlas(
        a, b, m, RES, SCALE, presorted_buckets=k, depth_channel=True))(
        jnp.asarray(ps_p), jnp.asarray(vals_p), matrix,
        jnp.asarray(layout.buckets))
    im_f, d1 = jax.jit(lambda f, v, m, k: splat_atlas.splat_atlas_fields(
        f, v, m, RES, SCALE, k, depth_channel=True))(
        fields, values_cm, matrix, group_buckets)
    assert int(d0) == 0
    assert int(d1) == 0
    im_leg = np.asarray(im_leg)
    im_f = np.asarray(im_f)
    assert im_f.shape[-1] == 3
    assert im_f[..., 2].sum() == pytest.approx(im_leg[..., 2].sum(), rel=1e-3)
    assert np.abs(im_f - im_leg).max() <= 0.01 * np.abs(im_leg).max()


def test_renderer_feed_path_matches_legacy():
    """_render_presorted_fields (the renderer wiring of the feed path)
    produces the same EXPORT image as the legacy presorted loop."""
    import topsy_tpu
    from topsy_tpu.canvas import OffscreenCanvas

    vis = topsy_tpu.test(20000, render_resolution=128,
                         canvas_class=OffscreenCanvas)
    vis.show_status = False
    np.asarray(vis.get_sph_image())       # first export: sorted path
    vis._sph.invalidate()
    vis._sph._force_feed = True           # feed path via the interpreter
    im_feed = np.asarray(vis.get_sph_image())
    assert getattr(vis._sph._store, "_presorted_fields", None) is not None

    vis._sph._force_feed = False
    vis._sph.invalidate()
    im_leg = np.asarray(vis.get_sph_image())
    assert np.nansum(im_feed) == pytest.approx(np.nansum(im_leg), rel=1e-3)
    corr = np.corrcoef(np.nan_to_num(im_feed).ravel(),
                       np.nan_to_num(im_leg).ravel())[0, 1]
    assert corr > 0.999


@pytest.mark.parametrize("width", [256, 128])
def test_columns_fields_matches_legacy(presorted, width):
    """The interactive column slice through the feed kernel agrees with
    the legacy column path (same slice, same merged grouping)."""
    from topsy_tpu.render.sph import (_render_block_columns,
                                      _render_block_columns_fields)
    ps, values, layout, ps_p, vals_p = presorted
    fields, values_cm, group_buckets = _fields_of(ps_p, vals_p, layout)
    matrix = _matrix(10.0)
    pg = layout.pad_group

    from topsy_tpu.ops.splat_giant import BUCKET_DISABLED
    im_leg, d0 = _render_block_columns(
        jnp.asarray(ps_p), jnp.asarray(vals_p), jnp.asarray(layout.buckets),
        None, None, matrix, jnp.float32(SCALE), jnp.int32(128),
        jnp.int32(BUCKET_DISABLED),
        resolution=RES, width=width, depth_channel=False, pad_group=pg)
    im_f, d1 = _render_block_columns_fields(
        fields, values_cm, group_buckets, None, matrix, jnp.float32(SCALE),
        jnp.int32(128), jnp.int32(BUCKET_DISABLED),
        resolution=RES, width=width, depth_channel=False,
        pad_group=pg)
    assert int(d0) == 0
    assert int(d1) == 0
    im_leg = np.asarray(im_leg)
    im_f = np.asarray(im_f)
    assert im_f[..., 0].sum() == pytest.approx(im_leg[..., 0].sum(), rel=1e-3)
    assert np.abs(im_f - im_leg).max() <= 0.01 * np.abs(im_leg).max()


def test_fields_three_channels_matches_legacy(presorted):
    """C_in=3 (the RGB renderer's shape) through the feed kernel."""
    ps, values, layout, ps_p, vals_p = presorted
    rng = np.random.RandomState(11)
    v3 = np.stack([values[:, 0],
                   values[:, 0] * rng.random_sample(len(values)),
                   values[:, 0] * rng.random_sample(len(values))], axis=1)
    v3_p = layout.apply(v3.astype(np.float32))
    G = layout.pad_group
    ng = layout.n_out // G
    fields = tuple(jnp.asarray(ps_p[:, k].reshape(ng, G)) for k in range(4))
    values_cm = tuple(jnp.asarray(v3_p[:, c].reshape(ng, G))
                      for c in range(3))
    gb = jnp.asarray(layout.buckets.reshape(ng, G)[:, 0])
    matrix = _matrix()
    im_leg, d0 = jax.jit(lambda a, b, m, k: splat_atlas.splat_atlas(
        a, b, m, RES, SCALE, presorted_buckets=k))(
        jnp.asarray(ps_p), jnp.asarray(v3_p), matrix,
        jnp.asarray(layout.buckets))
    im_f, d1 = jax.jit(lambda f, v, m, k: splat_atlas.splat_atlas_fields(
        f, v, m, RES, SCALE, k))(fields, values_cm, matrix, gb)
    assert int(d0) == 0
    assert int(d1) == 0
    im_leg = np.asarray(im_leg)
    im_f = np.asarray(im_f)
    assert im_f.shape[-1] == 3
    for c in range(3):
        assert im_f[..., c].sum() == pytest.approx(im_leg[..., c].sum(),
                                                   rel=1e-3)
    assert np.abs(im_f - im_leg).max() <= 0.01 * np.abs(im_leg).max()


def test_fields_mask_culls(presorted):
    ps, values, layout, ps_p, vals_p = presorted
    fields, values_cm, group_buckets = _fields_of(ps_p, vals_p, layout)
    matrix = _matrix()
    G = layout.pad_group
    ng = layout.n_out // G
    rng = np.random.RandomState(3)
    mask_np = (rng.random_sample(layout.n_out) < 0.5).astype(np.float32)
    mask = jnp.asarray(mask_np.reshape(ng, G))

    im_m, d = splat_atlas.splat_atlas_fields(
        fields, values_cm, matrix, RES, SCALE, group_buckets, mask=mask)
    assert int(d) == 0
    im_ref, _ = jax.jit(lambda a, b, m, k, em: splat_atlas.splat_atlas(
        a, b, m, RES, SCALE, presorted_buckets=k, extra_mask=em))(
        jnp.asarray(ps_p), jnp.asarray(vals_p), matrix,
        jnp.asarray(layout.buckets), jnp.asarray(mask_np > 0))
    im_m = np.asarray(im_m)
    im_ref = np.asarray(im_ref)
    assert im_m[..., 0].sum() == pytest.approx(im_ref[..., 0].sum(), rel=1e-3)
    assert np.abs(im_m - im_ref).max() <= 0.01 * np.abs(im_ref).max()
