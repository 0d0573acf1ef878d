"""Timestream interpolators for movie replay.

Semantics follow the reference interpolators (reference:
src/topsy/recorder/interpolator.py): linear, step, rotation (SVD
re-orthogonalization), and Gaussian-smoothed variants (resample at fixed fps
then convolve), plus the ramped smoothed-step used for scalar parameter
transitions.
"""

from __future__ import annotations

import math
from abc import ABC, abstractmethod

import numpy as np


class Interpolator(ABC):
    """Interpolates a timestream of (time, value) pairs."""

    no_value = object()

    def __init__(self, timestream):
        self._timestream = timestream

    @abstractmethod
    def __call__(self, t):
        ...


class LinearInterpolator(Interpolator):
    def __call__(self, t):
        stream = self._timestream
        for i, (t_ev, val_ev) in enumerate(stream):
            if t_ev >= t:
                if i == 0:
                    return val_ev
                t0, val0 = stream[i - 1]
                return val0 + (val_ev - val0) * (t - t0) / (t_ev - t0)
        return self.no_value


class SmoothedInterpolatorMixin:
    """Gaussian smoothing: resample the interpolated stream at ``fps`` and
    convolve with a normalized Gaussian kernel of std ``smoothing`` seconds."""

    def __init__(self, timestream, smoothing=0.25, fps=30):
        super().__init__(timestream)
        tmax = timestream[-1][0]
        self._smoothing = smoothing

        resampled = [super(SmoothedInterpolatorMixin, self).__call__(i / fps)
                     for i in range(math.floor(tmax * fps))]

        kernel = np.exp(-np.arange(-3 * smoothing * fps, 3 * smoothing * fps) ** 2
                        / (2 * smoothing ** 2 * fps ** 2))
        kernel /= kernel.sum()
        resampled = np.concatenate(
            ([resampled[0]] * (len(kernel) // 2),
             resampled,
             [resampled[-1]] * (len(kernel) // 2)))

        if resampled.ndim == 1:
            smoothed = np.convolve(resampled, kernel, mode="valid")
        else:
            smoothed = None
            for index in np.ndindex(resampled.shape[1:]):
                sl = (slice(None),) + index
                result = np.convolve(resampled[sl], kernel, mode="valid")
                if smoothed is None:
                    smoothed = np.empty((len(result),) + resampled.shape[1:])
                smoothed[sl] = result

        self._timestream = [(i / fps, val) for i, val in enumerate(smoothed)]


class SmoothedLinearInterpolator(SmoothedInterpolatorMixin, LinearInterpolator):
    pass


class RotationInterpolator(LinearInterpolator):
    """Linear matrix interpolation re-orthogonalized by SVD."""

    def __call__(self, t):
        matr = super().__call__(t)
        if matr is self.no_value:
            return matr
        u, _, vh = np.linalg.svd(matr)
        return u @ vh


class SmoothedRotationInterpolator(SmoothedInterpolatorMixin, RotationInterpolator):
    pass


class StepInterpolator(Interpolator):
    """Returns a value only when it changes; requires sequential access."""

    def __init__(self, timestream):
        super().__init__(timestream)
        self._last_value = self.no_value
        self._last_t = None

    def __call__(self, t):
        if self._last_t is not None and t < self._last_t:
            raise ValueError("StepInterpolator must be accessed sequentially")
        self._last_t = t
        for t_ev, val_ev in self._timestream[::-1]:
            if t_ev <= t:
                if val_ev != self._last_value:
                    self._last_value = val_ev
                    return self._last_value
                return self.no_value
        return self.no_value


class SmoothedStepInterpolator(StepInterpolator):
    """Step transitions ramped linearly over ``smoothing`` seconds."""

    def __init__(self, timestream, smoothing=0.25):
        self._start_value = None
        self._target_value = None
        self._transition_start = None
        self._transition_end = None
        self._smoothing = smoothing
        super().__init__(timestream)

    def __call__(self, t):
        if self._target_value is not None:
            if t >= self._transition_end:
                tv = self._target_value
                self._start_value = self._target_value = None
                self._transition_start = self._transition_end = None
                return tv
            frac = ((t - self._transition_start)
                    / (self._transition_end - self._transition_start))
            return self._start_value + (self._target_value - self._start_value) * frac

        last_value = self._last_value
        new_value = super().__call__(t)
        if new_value is self.no_value or new_value is None or new_value == last_value:
            return self.no_value
        if last_value is self.no_value or last_value is None:
            return new_value
        self._start_value = last_value
        self._target_value = new_value
        self._transition_start = t
        self._transition_end = t + self._smoothing
        return last_value
