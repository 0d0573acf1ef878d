"""On-device statistics for colormap autoranging.

The reference computes autorange percentiles on the CPU after a texture
readback (reference: src/topsy/colormap/implementation.py:381-425).  Here the
percentile runs on device via a histogram (min/max pass + 4096-bin count +
cumulative interpolation), so only two scalars cross the host boundary; under
multi-chip rendering the framebuffer is already psum-replicated, so the same
code serves every mesh size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HIST_BINS = 4096


@functools.partial(jax.jit, static_argnames=("n_bins",))
def _percentiles_impl(values: jnp.ndarray, qs: jnp.ndarray,
                      n_bins: int = HIST_BINS):
    finite = jnp.isfinite(values)
    n_finite = finite.sum()
    safe = jnp.where(finite, values, 0.0)
    lo = jnp.where(finite, values, jnp.inf).min()
    hi = jnp.where(finite, values, -jnp.inf).max()
    span = jnp.maximum(hi - lo, 1e-30)

    idx = jnp.clip(((safe - lo) / span * n_bins).astype(jnp.int32), 0,
                   n_bins - 1)
    # bincount via one-hot matmul would be heavy; segment counting via
    # scatter is fine here (one-off, not the render hot path)
    hist = jnp.zeros((n_bins,), jnp.float32).at[idx].add(
        finite.astype(jnp.float32))
    cdf = jnp.cumsum(hist) / jnp.maximum(n_finite, 1)

    targets = qs / 100.0
    # first bin where cdf >= target, linearly interpolated inside the bin
    bin_idx = jnp.clip(jnp.searchsorted(cdf, targets), 0, n_bins - 1)
    cdf_lo = jnp.where(bin_idx > 0, cdf[jnp.maximum(bin_idx - 1, 0)], 0.0)
    cdf_hi = cdf[bin_idx]
    frac = jnp.where(cdf_hi > cdf_lo,
                     (targets - cdf_lo) / (cdf_hi - cdf_lo), 0.5)
    edges = lo + (bin_idx.astype(jnp.float32) + frac) * (span / n_bins)
    return edges, n_finite, lo, hi


def percentiles(values, qs) -> tuple:
    """Device-side percentile(s) of the finite entries of ``values``.

    Returns (percentile values array, finite count, finite min, finite max);
    all returned as numpy/python after a single small readback.
    """
    import numpy as np
    values = jnp.asarray(values).ravel()
    qs_arr = jnp.asarray(np.atleast_1d(np.asarray(qs, dtype=np.float32)))
    edges, n_finite, lo, hi = _percentiles_impl(values, qs_arr)
    return (np.asarray(edges), int(n_finite), float(lo), float(hi))
