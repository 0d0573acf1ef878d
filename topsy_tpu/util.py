"""Timing and miscellaneous utilities.

The reference times GPU work with blocking queue fences (reference:
src/topsy/util.py:76-115); on TPU the analogue is wall-clock timing around
a device barrier, with the same running-mean smoothing feeding the fps
display and the LOD scheduler.

``jax.block_until_ready`` is the documented barrier, but under
remote-tunnel runtimes (this project's dev harness) it can return before
the device work completes — a measured 218 MB-traffic kernel "timed" at
0.06 ms through it.  The only barrier that is trustworthy everywhere is a
data-dependent readback (``device_sync``): pull one scalar of a device
computation that depends on the arrays back to the host.  Its fixed cost
(one tiny kernel + a host round trip — ~28 ms through the dev tunnel,
microseconds on a local runtime) is calibrated once (``sync_latency``) and
subtracted by ``TimeDeviceOperation.sync`` so the scheduler and the fps
display see device time, not tunnel latency.
"""

from __future__ import annotations

import time

import numpy as np


def device_sync(x) -> None:
    """Barrier: return only after every queued computation producing the
    arrays in pytree ``x`` has executed on the device.

    Implemented as a data-dependent readback (a one-element gather of each
    array leaf, reduced to one scalar, pulled to the host) because
    ``jax.block_until_ready`` is not a reliable barrier under remote-tunnel
    runtimes.  Numpy arrays and non-arrays in ``x`` are ignored.  Never
    call inside ``jit``.
    """
    import jax
    import jax.numpy as jnp

    leaves = [leaf for leaf in jax.tree_util.tree_leaves(x)
              if isinstance(leaf, jax.Array)]
    if not leaves:
        return
    s = None
    for leaf in leaves:
        v = jnp.ravel(leaf)[-1].astype(jnp.float32)
        s = v if s is None else s + v
    jax.device_get(s)


_sync_latency: float | None = None


def sync_latency() -> float:
    """Fixed cost of one ``device_sync`` on already-complete arrays —
    the host round-trip + tiny-kernel overhead, measured once per process
    (min of several runs).  ~28 ms through the dev harness's TPU tunnel,
    ~10 us on local CPU."""
    global _sync_latency
    if _sync_latency is None:
        import jax.numpy as jnp

        x = jnp.zeros(8, jnp.float32)
        device_sync(x)  # warm-up: compiles the gather kernel
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            device_sync(x)
            best = min(best, time.perf_counter() - t0)
        _sync_latency = best
    return _sync_latency


class TimeDeviceOperation:
    """Context manager accumulating per-frame device-execution time.

    Enqueue work inside ``with timer:`` blocks (cheap — dispatch is
    asynchronous); barrier on the frame's arrays with ``timer.sync(x)``,
    which charges the barrier's wall time minus the calibrated fixed
    readback latency, so the accumulated figure is device time on any
    runtime (local or tunneled)."""

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

    def sync(self, x) -> None:
        """device_sync(x), charging only the device time (the calibrated
        fixed readback latency is subtracted).  Call OUTSIDE ``with``
        blocks — it times itself."""
        lat = sync_latency()  # calibrate before timing, not during
        t0 = time.perf_counter()
        device_sync(x)
        dt = time.perf_counter() - t0
        self._current_frame_duration += max(0.0, dt - lat)

    def end_frame(self, record: bool = True):
        """Close the frame.  ``record=False`` (barrier-free EXPORT frames,
        whose accumulated figure is enqueue time, not device time) discards
        the measurement instead of polluting the fps running mean."""
        if not record:
            self._current_frame_duration = 0.0
            return
        self.last_duration = self._current_frame_duration
        self._current_frame_duration = 0.0
        self._recent.append(self.last_duration)
        if len(self._recent) > self.n_frames_smooth:
            self._recent.pop(0)

    def record_external(self, duration: float):
        """Record a frame duration measured OUTSIDE this timer — the
        deferred-feedback interactive path: the frame launches barrier-free
        and its device time is recovered from the frame's single natural
        end-of-frame barrier (the presentation readback, or the caller's
        own sync), so interactive frames pay ONE host round-trip instead of
        two.  Feeds the same running mean as in-frame measurements."""
        self.last_duration = max(0.0, duration)
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
