"""Timing and miscellaneous utilities.

The reference times GPU work with blocking queue fences (reference:
src/topsy/util.py:76-115); on TPU the analogue is wall-clock timing around
``block_until_ready`` of the frame's device arrays, with the same
running-mean smoothing feeding the fps display and the LOD scheduler.
"""

from __future__ import annotations

import time

import numpy as np


class TimeDeviceOperation:
    """Context manager accumulating per-frame device-execution time."""

    def __init__(self, n_frames_smooth: int = 10):
        self.n_frames_smooth = n_frames_smooth
        self._recent: list[float] = []
        self._current_frame_duration = 0.0
        self.last_duration = 0.0

    def __enter__(self):
        self._block_start = time.perf_counter()
        return self

    def __exit__(self, *args):
        self._current_frame_duration += time.perf_counter() - self._block_start

    def end_frame(self):
        self.last_duration = self._current_frame_duration
        self._current_frame_duration = 0.0
        self._recent.append(self.last_duration)
        if len(self._recent) > self.n_frames_smooth:
            self._recent.pop(0)

    def total_time_in_frame(self) -> float:
        return self._current_frame_duration

    @property
    def running_mean_duration(self) -> float:
        if not self._recent:
            return 0.0
        return float(np.mean(self._recent))


def is_inside_ipython() -> bool:
    try:
        __IPYTHON__  # type: ignore[name-defined]  # noqa: B018
        return True
    except NameError:
        return False


def is_jupyter() -> bool:
    """True when running inside a Jupyter kernel."""
    try:
        from IPython import get_ipython
    except ImportError:
        return False
    ip = get_ipython()
    return ip is not None and ip.has_trait("kernel")


def enable_persistent_compile_cache(path: str | None = None) -> None:
    """Cache compiled XLA executables on disk across processes.

    Splat-pipeline compiles cost 40-180 s through this harness's remote
    TPU compile service; the persistent cache turns repeat compiles of an
    unchanged pipeline into a sub-second disk hit.  (The device-side
    program load on first execution is not cached and still pays its
    cost once per process.)  Safe to call more than once.
    """
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
