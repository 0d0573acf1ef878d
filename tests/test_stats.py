"""On-device histogram percentile tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from topsy_tpu.ops import stats


def test_percentiles_match_numpy():
    rng = np.random.RandomState(0)
    vals = rng.lognormal(0, 2, 100000).astype(np.float32)
    qs = [1.0, 50.0, 99.9]
    dev, n, lo, hi = stats.percentiles(jnp.asarray(vals), qs)
    ref = np.percentile(vals, qs)
    assert n == len(vals)
    assert lo == pytest.approx(vals.min())
    assert hi == pytest.approx(vals.max())
    # histogram resolution: 1/4096 of the range; compare within that
    span = vals.max() - vals.min()
    np.testing.assert_allclose(dev, ref, atol=span / 2048)


def test_percentiles_ignore_nonfinite():
    vals = np.array([1.0, 2.0, np.nan, np.inf, -np.inf, 3.0], np.float32)
    dev, n, lo, hi = stats.percentiles(jnp.asarray(vals), [50.0])
    assert n == 3
    assert lo == 1.0 and hi == 3.0
    assert 1.0 <= dev[0] <= 3.0


def test_autorange_device_matches_host():
    from topsy_tpu.color.maps import Colormap
    rng = np.random.RandomState(1)
    raw = np.zeros((128, 128, 2), dtype=np.float32)
    raw[..., 0] = 10 ** rng.normal(0, 1, (128, 128))

    cm_host = Colormap({"type": "density", "colormap_name": "viridis",
                        "vmin": None, "vmax": None, "log": None,
                        "weighted_average": False})
    cm_host.autorange_vmin_vmax(raw)

    cm_dev = Colormap({"type": "density", "colormap_name": "viridis",
                       "vmin": None, "vmax": None, "log": None,
                       "weighted_average": False})
    cm_dev.autorange_vmin_vmax(jnp.asarray(raw))

    ph, pd = cm_host.get_parameters(), cm_dev.get_parameters()
    assert pd["log"] is True and ph["log"] is True
    assert pd["vmin"] == pytest.approx(ph["vmin"], abs=0.02)
    assert pd["vmax"] == pytest.approx(ph["vmax"], abs=0.02)
