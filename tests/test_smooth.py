"""Bilateral filter tests, modelled on reference tests/test_smooth.py:
synthetic gradient + discontinuity + noise; channel 0 untouched, edges
preserved, noise reduced."""

import numpy as np
import pytest

from topsy_tpu.ops.smooth import smooth_image, smoothing_kernel_size


@pytest.fixture
def test_image():
    rng = np.random.RandomState(0)
    h = w = 96
    img = np.zeros((h, w, 2), dtype=np.float32)
    img[..., 0] = rng.uniform(size=(h, w))  # channel 0: random, must survive
    yy = np.linspace(0, 1, h)[:, None]
    depth = np.broadcast_to(yy, (h, w)).copy()
    depth[:, w // 2:] += 2.0  # sharp discontinuity
    depth += rng.normal(scale=0.01, size=(h, w))
    img[..., 1] = depth
    return img


def test_channel0_untouched(test_image):
    out = np.asarray(smooth_image(test_image, 0.02))
    np.testing.assert_array_equal(out[..., 0], test_image[..., 0])


def test_noise_reduced(test_image):
    out = np.asarray(smooth_image(test_image, 0.02))
    # measure high-frequency noise away from the edge via row differences
    region = slice(10, 40)
    noise_before = np.diff(test_image[region, 5:40, 1], axis=0).std()
    noise_after = np.diff(out[region, 5:40, 1], axis=0).std()
    assert noise_after < 0.5 * noise_before


def test_edge_preserved(test_image):
    out = np.asarray(smooth_image(test_image, 0.02))
    w = test_image.shape[1]
    jump_before = (test_image[:, w // 2 + 2, 1] - test_image[:, w // 2 - 3, 1]).mean()
    jump_after = (out[:, w // 2 + 2, 1] - out[:, w // 2 - 3, 1]).mean()
    assert jump_after > 0.8 * jump_before


def test_kernel_size_rule():
    assert smoothing_kernel_size(1.0) == 5
    assert smoothing_kernel_size(10.0) == 41
    assert smoothing_kernel_size(1000.0) == 100  # capped


def test_constant_image_unchanged():
    img = np.ones((32, 32, 2), dtype=np.float32) * 3.0
    out = np.asarray(smooth_image(img, 0.02))
    np.testing.assert_allclose(out, img, rtol=1e-6)
