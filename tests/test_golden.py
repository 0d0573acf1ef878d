"""Golden-value regression of the offscreen render, in the spirit of the
reference's hard-coded downsampled pixel checks (reference:
tests/test_render_output.py) but against this renderer's own committed
baseline (cross-renderer per-pixel comparison is fragile; distribution
checks against the exact numpy splatter live in test_visualizer.py)."""

import os

import numpy as np
import pytest

import topsy_tpu
from topsy_tpu.canvas import OffscreenCanvas

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_render.npz")


@pytest.fixture(scope="module")
def vis():
    v = topsy_tpu.test(20000, render_resolution=128, canvas_class=OffscreenCanvas)
    v.show_status = False
    return v


def test_density_matches_golden(vis):
    golden = np.load(GOLDEN)["density"]
    im = vis.get_sph_image()[::16, ::16]
    np.testing.assert_allclose(im, golden, rtol=2e-2,
                               atol=2e-4 * np.abs(golden).max())


def test_quantity_matches_golden(vis):
    golden = np.load(GOLDEN)["quantity"]
    vis.quantity_name = "test-quantity"
    im = np.nan_to_num(vis.get_sph_image()[::16, ::16])
    np.testing.assert_allclose(im, golden, rtol=5e-2, atol=5e-7)
