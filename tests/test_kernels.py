import numpy as np
import pytest

from topsy_tpu.ops import kernels


def test_radial_table_normalized():
    q, k = kernels.radial_table()
    integral = 2 * np.pi * np.trapezoid(k * q, q)
    assert abs(integral - 1.0) < 1e-6
    # kernel is monotonically decreasing and compactly supported
    assert k[0] > k[-1]
    assert k[-1] == pytest.approx(0.0, abs=1e-10)


def test_kernel_value_matches_3d_projection():
    # central value of the projected M4 spline: 2*int_0^2 w3(z) dz
    zs = np.linspace(0, 2, 100001)
    expected = 2 * np.trapezoid(kernels.spline_m4(zs), zs)
    assert kernels.kernel_value(0.0) == pytest.approx(expected, rel=1e-4)


def test_kernel_image_mass_conserving():
    for n in (64, 32, 16, 8):
        im = kernels.kernel_image(n)
        # normalized as the reference texture: sum * (4/n)^2 == 1
        assert im.sum() * (4.0 / n) ** 2 == pytest.approx(1.0, rel=1e-6)


def test_lowrank_accuracy():
    lrk = kernels.lowrank_kernel()
    xs = np.linspace(-2, 2, 161)
    X, Y = np.meshgrid(xs, xs)
    approx = lrk.eval_xy(X, Y)
    exact = kernels.kernel_value(np.sqrt(X**2 + Y**2))
    assert np.abs(approx - exact).max() / exact.max() < 2.5e-3


def test_lowrank_zero_outside_support():
    lrk = kernels.lowrank_kernel()
    vals = lrk.eval_profiles(np.array([2.01, 3.0, 10.0]))
    assert np.all(vals == 0.0)


@pytest.mark.parametrize("mode", ["exact", "lowrank"])
def test_norm_table(mode):
    hs, cs = kernels.norm_table(mode)
    # for comfortably resolved splats (support still within the window) the
    # discrete sum matches the continuous integral
    c_large = np.interp(np.log(3.0), np.log(hs), cs)
    assert c_large == pytest.approx(1.0, rel=0.01)
    # normalization grows for tiny splats (mass would otherwise be lost)
    assert cs[0] > 0
    assert np.all(np.isfinite(cs))


@pytest.mark.parametrize("mode", ["exact", "lowrank"])
def test_norm_table_exactness(mode):
    """c(h) must make the windowed discrete sum equal h^2 (phase-averaged)."""
    hs, cs = kernels.norm_table(mode)
    lrk = kernels.lowrank_kernel()
    rng = np.random.RandomState(0)
    for h in [0.8, 1.7, 3.2]:
        c = np.interp(np.log(h), np.log(hs), cs)
        total = 0.0
        n_phase = 32
        for _ in range(n_phase):
            cyx = rng.uniform(0, 1, 2)
            dy = kernels._window_offsets(cyx[0], kernels.config.SPLAT_WINDOW)
            dx = kernels._window_offsets(cyx[1], kernels.config.SPLAT_WINDOW)
            if mode == "exact":
                q = np.sqrt((dy[:, None] / h) ** 2 + (dx[None, :] / h) ** 2)
                vals = kernels.kernel_value(q)
            else:
                vals = lrk.eval_xy(np.broadcast_to(dx[None, :] / h, (len(dy), len(dx))),
                                   np.broadcast_to(dy[:, None] / h, (len(dy), len(dx))))
            total += vals.sum() * c / h**2
        assert total / n_phase == pytest.approx(1.0, rel=0.01)
