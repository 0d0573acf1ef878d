"""End-to-end visualizer tests (offscreen), modelled on reference
tests/test_render_output.py and test_render_mode.py: render output sanity per
mode, rotation equivariance, quantity switching, mode switching with revert,
save paths, and recorder round trip."""

import os

import numpy as np
import pytest

import topsy_tpu
from topsy_tpu.canvas import OffscreenCanvas
from topsy_tpu.drawreason import DrawReason
from topsy_tpu.loaders import TestDataLoader
from topsy_tpu.ops import splat


RES = 128


@pytest.fixture(params=[False, True], ids=["plain", "cells"])
def vis(request):
    v = topsy_tpu.test(20000, render_resolution=RES, canvas_class=OffscreenCanvas,
                       with_cells=request.param)
    v.show_status = False
    return v


def test_density_render_matches_bruteforce(vis):
    """Distribution-level agreement with the exact numpy splatter (the
    reference compares raw maps the same way, tests/test_render_output.py:
    234-241)."""
    im = vis.get_sph_image()
    loader = TestDataLoader(20000)
    exact = splat.splat_bruteforce(loader.get_pos_smooth(),
                                   loader.get_mass()[:, None],
                                   vis._sph._matrix(), RES, vis.scale)[:, :, 0]
    assert im.mean() == pytest.approx(exact.mean(), rel=0.01)
    assert im.std() == pytest.approx(exact.std(), rel=0.05)


def test_rotation_equivariance(vis):
    im0 = vis.get_sph_image()
    vis.rotation_matrix = np.array([[0.0, -1.0, 0.0],
                                    [1.0, 0.0, 0.0],
                                    [0.0, 0.0, 1.0]])
    im90 = vis.get_sph_image()
    im0r = np.rot90(im0, k=1)
    mask = (im0r > im0r.max() * 1e-4) & (im90 > im90.max() * 1e-4)
    ratio = im90[mask] / im0r[mask]
    assert np.median(np.abs(ratio - 1)) < 0.05


def test_weighted_quantity_render(vis):
    vis.quantity_name = "test-quantity"
    assert vis.averaging
    im = vis.get_sph_image()
    finite = np.isfinite(im)
    assert np.abs(im[finite]).max() <= 1.01e-4  # bounded by the quantity range


def test_presentation_image_rgba(vis):
    pres = vis.get_presentation_image((320, 240))
    assert pres.shape == (240, 320, 4)
    assert pres.dtype == np.uint8
    assert pres[..., 0].std() > 0  # non-trivial content


def test_mode_switch_and_revert(vis):
    vis.render_mode = "rgb"
    assert vis.render_mode == "rgb"
    pres = vis.get_sph_presentation_image()
    assert pres.shape == (RES, RES, 4)
    with pytest.raises(ValueError):
        vis.render_mode = "not-a-mode"
    assert vis.render_mode == "rgb"  # unchanged after failure
    vis.render_mode = "univariate"


class RestrictedFormatCanvas(OffscreenCanvas):
    """A canvas that cannot present HDR (reference parity:
    tests/test_render_mode.py:42-49, RestrictedModeOffscreenCanvas)."""

    def supported_formats(self):
        return ("rgba8unorm",)


def test_mode_rollback_on_capability_failure():
    """Switching to a *valid* mode the canvas cannot present fails during
    initialization and reverts to the previous mode (reference:
    tests/test_render_mode.py:51-63 test_render_mode_fail)."""
    vis = topsy_tpu.test(200, render_resolution=32,
                         canvas_class=RestrictedFormatCanvas,
                         render_mode="univariate")
    original = vis.render_mode
    with pytest.raises(ValueError, match="cannot present"):
        vis.render_mode = "rgb-hdr"
    assert vis.render_mode == original
    # the reverted visualizer still renders
    im = vis.get_sph_image()
    assert np.isfinite(np.asarray(im)).all()


def test_init_fails_on_unpresentable_mode():
    """Constructing directly in an unpresentable mode raises (no previous
    mode to revert to)."""
    with pytest.raises(ValueError, match="cannot present"):
        topsy_tpu.test(200, render_resolution=32,
                       canvas_class=RestrictedFormatCanvas,
                       render_mode="rgb-hdr")


def test_hdr_mode_outputs_float16(vis):
    vis.render_mode = "rgb-hdr"
    pres = vis.get_sph_presentation_image()
    assert pres.dtype == np.float16


def test_progressive_refinement_converges(vis):
    """CHANGE draw followed by REFINEs converges to the EXPORT image."""
    # undo the compile-time-poisoned LOD adaptation from fixture setup so the
    # refinement completes in a handful of frames
    vis._sph.render_progression._recommended = 4000
    vis._sph.render(DrawReason.CHANGE)
    guard = 0
    while vis._sph.needs_refine() and guard < 100:
        vis._sph.render_progression._recommended = 4000
        vis._sph.render(DrawReason.REFINE)
        guard += 1
    partial_then_refined = np.asarray(vis._sph.get_image())
    vis._sph.invalidate(DrawReason.CHANGE)
    vis._sph.render(DrawReason.EXPORT)
    export = np.asarray(vis._sph.get_image())
    np.testing.assert_allclose(partial_then_refined.mean(), export.mean(),
                               rtol=1e-3)


def test_save_npy_and_png(vis, tmp_path):
    npy = tmp_path / "out.npy"
    vis.save(str(npy))
    arr = np.load(npy)
    assert arr.shape == (RES, RES)
    png = tmp_path / "out.png"
    vis.save(str(png))
    assert os.path.getsize(png) > 1000


def test_save_tiff_hdr(tmp_path):
    """Float16 HDR export (reference workflow: tests/test_render_output.py
    test_hdr_rgb_render writes the presentation image as an RGB tiff)."""
    vis = topsy_tpu.test(2000, render_resolution=64,
                         canvas_class=OffscreenCanvas, render_mode="rgb-hdr")
    tif = tmp_path / "out.tiff"
    vis.save(str(tif))  # tifffile when present, vendored writer otherwise
    from topsy_tpu import hdr_tiff
    arr = hdr_tiff.imread(str(tif))
    assert arr.dtype == np.float16
    assert arr.shape == (64, 64, 3)
    # the written pixels are the presentation image itself
    expect = np.asarray(vis.get_sph_presentation_image())[..., :3]
    np.testing.assert_array_equal(np.asarray(arr, np.float16),
                                  expect.astype(np.float16))
    try:
        import tifffile
    except ImportError:
        pass
    else:
        arr2 = tifffile.imread(str(tif))
        np.testing.assert_array_equal(arr2, arr)


def test_hdr_tiff_roundtrip(tmp_path):
    """Vendored float16 TIFF writer/reader round trip (RGB and grayscale)."""
    from topsy_tpu import hdr_tiff
    rng = np.random.RandomState(0)
    rgb = rng.random_sample((5, 7, 3)).astype(np.float16)
    p = tmp_path / "rt.tiff"
    hdr_tiff.imwrite(str(p), rgb)
    np.testing.assert_array_equal(hdr_tiff.imread(str(p)), rgb)
    gray = rng.random_sample((4, 6)).astype(np.float16)
    hdr_tiff.imwrite(str(p), gray)
    np.testing.assert_array_equal(hdr_tiff.imread(str(p)), gray)


def test_depth_image_and_double_click(vis):
    d = vis.get_depth_image()
    assert d.shape == (RES, RES)
    # the depth renderer is cached across probes (first-probe jit hitch)
    assert vis._sph._get_depth_renderer() is vis._sph._get_depth_renderer()
    vis.canvas.resize_complete(320, 240, 1)
    before = np.asarray(vis.position_offset).copy()
    vis.canvas.double_click(80, 60)
    after = np.asarray(vis.position_offset)
    assert not np.allclose(before, after)


def test_synchronized_visualizers():
    v1 = topsy_tpu.test(2000, render_resolution=64, canvas_class=OffscreenCanvas)
    v2 = topsy_tpu.test(2000, render_resolution=64, canvas_class=OffscreenCanvas)
    v1.synchronize_with(v2)
    v1.scale = 33.0
    v1.draw(DrawReason.CHANGE)
    assert v2.scale == 33.0
    v1.stop_synchronizing()
    assert not v1.is_synchronizing()


def test_recorder_roundtrip(tmp_path):
    import time
    from topsy_tpu.recorder import VisualizationRecorder

    vis = topsy_tpu.test(2000, render_resolution=64, canvas_class=OffscreenCanvas)
    rec = VisualizationRecorder(vis)
    rec.record()
    vis.scale = 100.0
    vis.draw(DrawReason.CHANGE)
    time.sleep(0.05)
    vis.rotate(0.2, 0.0)
    vis.draw(DrawReason.CHANGE)
    time.sleep(0.05)
    rec.stop()

    ts_file = tmp_path / "stream.pkl"
    rec.save_timestream(str(ts_file))
    rec2 = VisualizationRecorder(vis)
    rec2.load_timestream(str(ts_file))

    frames = list(rec2._replay(fps=10, resolution=(96, 64), smooth=False))
    assert len(frames) >= 1
    assert frames[0].shape == (64, 96, 3)

    mp4 = tmp_path / "movie.mp4"
    rec2.save_mp4(str(mp4), fps=10, resolution=(96, 64), smooth=False)
    assert os.path.getsize(mp4) > 0

    # smoothed replay (the default) must survive streams whose property
    # never changed after the opening t=0 event (rotation-only recordings)
    frames = list(rec2._replay(fps=10, resolution=(96, 64), smooth=True))
    assert len(frames) >= 1
    assert frames[0].shape == (64, 96, 3)


def test_status_and_crosshairs(vis):
    vis.show_status = True
    vis.crosshairs_visible = True
    vis._sph.render(DrawReason.CHANGE)
    frame = vis.draw(DrawReason.CHANGE, target=(200, 150))
    assert frame.shape == (150, 200, 4)


def test_periodic_tiling_mode():
    v = topsy_tpu.test(4000, render_resolution=64, canvas_class=OffscreenCanvas,
                       periodic_tiling=True)
    im = v.get_sph_image()
    assert np.isfinite(im).all()
    # tiled render has strictly more mass on screen than the bare panel
    bare = np.asarray(v._sph._image)[..., 0]
    tiled = np.asarray(v._sph.get_output_image())[..., 0]
    assert tiled.sum() >= bare.sum() * 0.99


def test_interactive_frame_deferred_timing_via_presentation():
    """Interactive column frames run barrier-free: render() leaves a
    pending deferred measurement, and the visualizer's presentation
    readback resolves it (notify_presentation_barrier), feeding the fps
    display and the LOD scheduler (VERDICT r4 item 1)."""
    vis = topsy_tpu.test(20000, render_resolution=48,
                         canvas_class=OffscreenCanvas)
    sph = vis._sph
    sph.render(DrawReason.CHANGE)  # activates the column path
    vis.draw(DrawReason.CHANGE)
    # the draw's np.array readback must have resolved the pending timing
    assert getattr(sph, "_pending_timing_prog", None) is None
    assert sph.last_render_fps > 0

    # a direct render without a presentation barrier leaves it pending...
    sph.render(DrawReason.CHANGE)
    assert getattr(sph, "_pending_timing_prog", None) is not None
    # ...and an explicit caller sync resolves it (the scale.py pattern)
    sph.notify_frame_time(0.004)
    assert getattr(sph, "_pending_timing_prog", None) is None
    assert sph._render_timer.last_duration == 0.004
