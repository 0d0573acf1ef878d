"""Colormap tests, modelled on reference tests/test_colormap.py: mapping
validated against matplotlib software reference; registry dispatch;
in-place-vs-recreate; mag<->vmin conversions."""

import matplotlib
import numpy as np
import pytest

from topsy_tpu.color import (BivariateColormap, Colormap, ColormapHolder,
                             NoColormap, RGBColormap, RGBHDRColormap)
from topsy_tpu.color.maps import fit_to_window
from topsy_tpu.color.surface import ColorAsSurfaceMap


def test_density_map_matches_matplotlib():
    cm = Colormap({"type": "density", "colormap_name": "viridis",
                   "vmin": -2.0, "vmax": 2.0, "log": True,
                   "weighted_average": False})
    rng = np.random.RandomState(0)
    raw = np.zeros((16, 16, 2), dtype=np.float32)
    raw[..., 0] = 10 ** rng.uniform(-3, 3, (16, 16))
    rgba = np.asarray(cm.to_rgba(raw))

    sm = matplotlib.cm.ScalarMappable(
        norm=matplotlib.colors.Normalize(vmin=-2, vmax=2), cmap="viridis")
    expected = sm.to_rgba(np.log10(raw[..., 0]))
    np.testing.assert_allclose(rgba[..., :3], expected[..., :3], atol=0.02)


def test_weighted_average_ratio():
    cm = Colormap({"type": "density", "colormap_name": "viridis",
                   "vmin": 0.0, "vmax": 1.0, "log": False,
                   "weighted_average": True})
    raw = np.zeros((4, 4, 2), dtype=np.float32)
    raw[..., 0] = 2.0
    raw[..., 1] = 1.0  # ratio = 0.5 everywhere
    rgba = np.asarray(cm.to_rgba(raw))
    lut = cm._generate_mapping_rgba_f32(1000)
    np.testing.assert_allclose(rgba[0, 0], lut[499], atol=0.01)


def test_mass_scale_compensation():
    """Partial-render rescaling must cancel exactly in log mode."""
    cm = Colormap({"type": "density", "colormap_name": "viridis",
                   "vmin": -2.0, "vmax": 2.0, "log": True,
                   "weighted_average": False})
    raw = np.zeros((8, 8, 2), dtype=np.float32)
    raw[..., 0] = 10 ** np.linspace(-2, 2, 64).reshape(8, 8)
    full = np.asarray(cm.to_rgba(raw))
    partial = np.asarray(cm.to_rgba(raw / 4.0, mass_scale=4.0))
    np.testing.assert_allclose(partial, full, atol=0.02)


def test_registry_dispatch():
    holder = ColormapHolder()
    assert isinstance(holder.impl, NoColormap)
    holder.update_parameters({"type": "density", "vmin": 0, "vmax": 1, "log": True})
    assert type(holder.impl) is Colormap
    holder.update_parameters({"type": "rgb", "hdr": False, "log": True})
    assert type(holder.impl) is RGBColormap
    holder.update_parameters({"hdr": True})
    assert type(holder.impl) is RGBHDRColormap
    holder.update_parameters({"type": "bivariate", "hdr": False})
    assert type(holder.impl) is BivariateColormap
    holder.update_parameters({"type": "surface"})
    assert type(holder.impl) is ColorAsSurfaceMap


def test_in_place_vs_recreate():
    holder = ColormapHolder()
    holder.update_parameters({"type": "density", "vmin": 0, "vmax": 1, "log": True})
    impl = holder.impl
    recreated = holder.update_parameters({"vmin": -5.0})
    assert recreated is False
    assert holder.impl is impl
    recreated = holder.update_parameters({"type": "rgb", "hdr": False, "log": True})
    assert recreated is True
    assert holder.impl is not impl


def test_mag_vmin_roundtrip():
    cm = RGBColormap({"type": "rgb", "hdr": False, "log": True})
    for mag in [18.0, 25.0, 32.0]:
        v = cm._mag_per_arcsec2_to_log_output(mag)
        assert cm._log_output_to_mag_per_arcsec2(v) == pytest.approx(mag)
    cm.update_parameters({"min_mag": 20.0, "max_mag": 30.0})
    params = cm.get_parameters()
    assert params["min_mag"] == pytest.approx(20.0)
    assert params["max_mag"] == pytest.approx(30.0)
    assert params["vmax"] > params["vmin"]


def test_bivariate_lut_consistency():
    cm = BivariateColormap({"type": "bivariate", "colormap_name": "viridis",
                            "vmin": 0.0, "vmax": 1.0, "log": False,
                            "density_vmin": -1.0, "density_vmax": 1.0,
                            "weighted_average": True})
    raw = np.zeros((4, 4, 2), dtype=np.float32)
    raw[..., 0] = 1.0            # log10 density 0 -> centre of density range
    raw[..., 1] = 0.5            # ratio 0.5 -> centre of quantity range
    rgba = np.asarray(cm.to_rgba(raw))
    lut = cm._generate_mapping_rgba_f32(1000)
    np.testing.assert_allclose(rgba[0, 0], lut[499, 499], atol=0.01)


def test_autorange_density():
    cm = Colormap({"type": "density", "colormap_name": "viridis",
                   "vmin": None, "vmax": None, "log": None,
                   "weighted_average": False})
    rng = np.random.RandomState(1)
    raw = np.zeros((64, 64, 2), dtype=np.float32)
    raw[..., 0] = 10 ** rng.normal(0, 1, (64, 64))
    cm.autorange_vmin_vmax(raw)
    p = cm.get_parameters()
    assert p["log"] is True
    assert -4 < p["vmin"] < 0 < p["vmax"] < 4


def test_autorange_negative_values_forces_linear():
    cm = Colormap({"type": "density", "colormap_name": "viridis",
                   "vmin": None, "vmax": None, "log": None,
                   "weighted_average": True})
    raw = np.zeros((32, 32, 2), dtype=np.float32)
    raw[..., 0] = 1.0
    raw[..., 1] = np.random.RandomState(2).normal(0, 1, (32, 32))
    cm.autorange_vmin_vmax(raw)
    assert cm.get_parameters()["log"] is False


def test_fit_to_window_aspect():
    square = np.zeros((64, 64, 4), dtype=np.float32)
    square[28:36, :, 0] = 1.0  # horizontal band at centre
    wide = np.asarray(fit_to_window(square, 128, 64))
    assert wide.shape == (64, 128, 4)
    # central band remains central and visible in a wide window
    assert wide[32, 64, 0] > 0.5
    tall = np.asarray(fit_to_window(square, 64, 128))
    assert tall.shape == (128, 64, 4)
    assert tall[64, 32, 0] > 0.5


def _device(arr):
    import jax.numpy as jnp
    return jnp.asarray(arr)


def test_autorange_rgb_device_matches_host():
    """RGB autorange runs on device (histogram percentile, ops/stats.py) —
    no full-framebuffer readback — and agrees with the host/numpy path to
    histogram-bin tolerance (4096 bins over the finite range)."""
    rng = np.random.RandomState(3)
    raw = (10 ** rng.normal(-2, 1.5, (64, 64, 3))).astype(np.float32)
    raw[:4] = 0.0  # empty pixels: -inf after log, must be excluded

    host = RGBColormap({"type": "rgb", "log": True, "vmin": None,
                        "vmax": None})
    host.autorange_vmin_vmax(raw)
    dev = RGBColormap({"type": "rgb", "log": True, "vmin": None,
                       "vmax": None})
    dev.autorange_vmin_vmax(_device(raw))

    span = abs(host.get_parameter("vmax") - host.get_parameter("vmin")) + 1.0
    for k in ("vmin", "vmax"):
        assert abs(host.get_parameter(k) - dev.get_parameter(k)) \
            < 0.02 * span, k


def test_autorange_bivariate_device_matches_host():
    """Bivariate autorange (both axes) device-vs-host agreement."""
    rng = np.random.RandomState(4)
    raw = np.zeros((64, 64, 2), dtype=np.float32)
    raw[..., 0] = 10 ** rng.normal(0, 1, (64, 64))
    raw[..., 1] = raw[..., 0] * 10 ** rng.normal(2, 0.5, (64, 64))
    params = {"type": "bivariate", "weighted_average": True, "vmin": None,
              "vmax": None, "log": None}
    host = BivariateColormap(dict(params))
    host.autorange_vmin_vmax(raw)
    dev = BivariateColormap(dict(params))
    dev.autorange_vmin_vmax(_device(raw))

    for k in ("vmin", "vmax", "density_vmin", "density_vmax"):
        h, d = host.get_parameter(k), dev.get_parameter(k)
        assert abs(h - d) < 0.02 * (abs(h) + 1.0), (k, h, d)
    hu = host.get_parameter("ui_range_density")
    du = dev.get_parameter("ui_range_density")
    np.testing.assert_allclose(np.asarray(hu), np.asarray(du), rtol=1e-3,
                               atol=1e-3)
