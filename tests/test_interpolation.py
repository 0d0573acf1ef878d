"""Interpolator tests, modelled on reference tests/test_interpolation.py."""

import numpy as np
import pytest

from topsy_tpu.recorder.interpolator import (
    Interpolator, LinearInterpolator, RotationInterpolator,
    SmoothedLinearInterpolator, SmoothedRotationInterpolator,
    SmoothedStepInterpolator, StepInterpolator)


def test_linear_interpolation():
    stream = [(0.0, 0.0), (1.0, 10.0), (3.0, 30.0)]
    li = LinearInterpolator(stream)
    assert li(0.0) == 0.0
    assert li(0.5) == pytest.approx(5.0)
    assert li(2.0) == pytest.approx(20.0)
    assert li(5.0) is Interpolator.no_value


def test_linear_interpolation_arrays():
    stream = [(0.0, np.zeros(3)), (2.0, np.ones(3) * 4)]
    li = LinearInterpolator(stream)
    assert np.allclose(li(1.0), [2, 2, 2])


def test_step_interpolator_only_reports_changes():
    stream = [(0.0, "a"), (1.0, "b"), (2.0, "b"), (3.0, "c")]
    si = StepInterpolator(stream)
    assert si(0.0) == "a"
    assert si(0.5) is Interpolator.no_value
    assert si(1.5) == "b"
    assert si(2.5) is Interpolator.no_value
    assert si(3.5) == "c"
    with pytest.raises(ValueError):
        si(1.0)  # non-sequential access


def test_rotation_interpolator_orthogonal():
    r0 = np.eye(3)
    th = np.pi / 2
    r1 = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    ri = RotationInterpolator([(0.0, r0), (1.0, r1)])
    mid = ri(0.5)
    assert np.allclose(mid @ mid.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(mid) == pytest.approx(1.0)


def test_smoothed_linear_endpoints():
    stream = [(0.0, 0.0), (2.0, 10.0)]
    sli = SmoothedLinearInterpolator(stream, smoothing=0.1, fps=30)
    assert sli(0.0) == pytest.approx(0.0, abs=0.5)
    v_mid = sli(1.0)
    assert 3.0 < v_mid < 7.0


def test_smoothed_rotation_orthogonal():
    r0 = np.eye(3)
    r1 = np.diag([1.0, -1.0, -1.0])
    sri = SmoothedRotationInterpolator([(0.0, r0), (2.0, r1)], smoothing=0.2)
    m = sri(1.0)
    assert np.allclose(m @ m.T, np.eye(3), atol=1e-8)


def test_smoothed_step_ramps():
    stream = [(0.0, 0.0), (1.0, 4.0)]
    ssi = SmoothedStepInterpolator(stream, smoothing=0.5)
    assert ssi(0.0) == 0.0
    v = ssi(1.0)  # transition starts: returns previous value first
    assert v == 0.0
    mid = ssi(1.25)
    assert 0.0 < mid < 4.0
    assert ssi(1.6) == 4.0


def test_smoothed_single_event_stream_is_constant():
    """Every recorded stream opens with one t=0 event; a property never
    changed afterwards must survive smoothing (used to crash with an
    empty-array reshape in gaussian_smooth)."""
    sli = SmoothedLinearInterpolator([(0.0, 3.5)], smoothing=0.25, fps=30)
    assert sli(0.0) == pytest.approx(3.5)
    sri = SmoothedRotationInterpolator([(0.0, np.eye(3))])
    assert np.allclose(sri(0.0), np.eye(3))


def test_smoothed_short_stream_survives():
    """Last event inside the first frame period (t_end*fps < 1) used to
    produce an empty dense grid."""
    sli = SmoothedLinearInterpolator([(0.0, 1.0), (0.01, 2.0)],
                                     smoothing=0.25, fps=30)
    assert np.isfinite(sli(0.0))
