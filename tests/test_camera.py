import numpy as np
import pytest

from topsy_tpu import camera


def test_identity_matrix_centers_z():
    m = camera.world_to_clip_matrix(np.eye(3), np.zeros(3), 1.0)
    # origin maps to clip (0, 0, 0.5): z squashed into [0, 1]
    out = m @ np.array([0.0, 0, 0, 1])
    assert out == pytest.approx([0, 0, 0.5, 1.0])


def test_scale_and_offset():
    m = camera.world_to_clip_matrix(np.eye(3), np.array([1.0, 2.0, 3.0]), 10.0)
    out = m @ np.array([9.0, -2.0, -3.0, 1.0])
    # position + offset = (10, 0, 0); / scale -> (1, 0, 0); z -> 0.5
    assert out == pytest.approx([1.0, 0.0, 0.5, 1.0])


def test_rotation_applied_after_offset():
    rot = camera.x_rotation_matrix(np.pi / 2)
    m = camera.world_to_clip_matrix(rot, np.array([0.0, 0, -5.0]), 1.0)
    out = m @ np.array([0.0, 0.0, 6.0, 1.0])
    # z-displaced point (0,0,1) rotates into x
    assert out[:2] == pytest.approx([np.sin(np.pi / 2), 0.0], abs=1e-12)


def test_camera_rotate_composition():
    cam = camera.Camera(scale=2.0)
    cam.rotate(0.1, -0.2)
    expected = (camera.x_rotation_matrix(0.1)
                @ camera.y_rotation_matrix(-0.2))
    assert cam.rotation_matrix == pytest.approx(expected)
    assert np.allclose(cam.rotation_matrix @ cam.rotation_matrix.T, np.eye(3))


def test_clip_to_pixel_centres():
    res = 8
    # clip (0,0) is the exact centre of the image
    px = camera.clip_to_pixel(np.array([0.0, 0.0]), res)
    assert px == pytest.approx([3.5, 3.5])
    # top-left pixel centre
    px = camera.clip_to_pixel(np.array([-1 + 1 / res, 1 - 1 / res]), res)
    assert px == pytest.approx([0.0, 0.0])
