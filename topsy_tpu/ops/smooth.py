"""Bilateral depth filtering for surface rendering.

Equivalent of the reference's compute shader (reference:
src/topsy/shaders/smooth.wgsl, colormap/surface.py:259-352): a brute-force
bilateral filter over a (kernel_size)^2 neighbourhood of the depth channel,
leaving other channels untouched.  Implemented as a lax.scan over kernel
offsets with shifted dense adds — no gathers or convs with per-pixel varying
weights needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import config


def smoothing_kernel_size(spatial_sigma: float) -> int:
    """Kernel size rule of the reference (colormap/surface.py:270-275)."""
    n_pix = int(spatial_sigma * 4) + 1
    return min(n_pix, config.MAX_SURFACE_SMOOTH_PIXELS)


@functools.partial(jax.jit, static_argnames=("kernel_size", "channel"))
def bilateral_filter(image: jnp.ndarray, spatial_sigma, range_sigma,
                     kernel_size: int, channel: int = 1) -> jnp.ndarray:
    """Bilateral-filter one channel of (H, W, C); edges use clamped samples."""
    half = kernel_size // 2
    depth = image[..., channel]
    H, W = depth.shape
    padded = jnp.pad(depth, half, mode="edge")

    offsets = np.stack(np.meshgrid(np.arange(-half, half + 1),
                                   np.arange(-half, half + 1),
                                   indexing="ij"), axis=-1).reshape(-1, 2)
    offsets = jnp.asarray(offsets, dtype=jnp.int32)

    inv_2ss = 1.0 / (2.0 * spatial_sigma * spatial_sigma)
    inv_2rs = 1.0 / (2.0 * range_sigma * range_sigma)

    def body(carry, off):
        wsum, vsum = carry
        dy, dx = off[0], off[1]
        shifted = jax.lax.dynamic_slice(padded, (half + dy, half + dx), (H, W))
        spatial2 = (dy * dy + dx * dx).astype(jnp.float32)
        w_spatial = jnp.exp(-spatial2 * inv_2ss)
        diff = shifted - depth
        w_range = jnp.exp(-(diff * diff) * inv_2rs)
        w = w_spatial * w_range
        return (wsum + w, vsum + shifted * w), None

    (wsum, vsum), _ = jax.lax.scan(body, (jnp.zeros_like(depth),
                                          jnp.zeros_like(depth)), offsets)
    filtered = vsum / wsum
    return image.at[..., channel].set(filtered)


def smooth_image(image, smoothing_scale: float, resolution: int | None = None,
                 channel: int = 1):
    """Apply the reference's parameterization: spatial sigma in pixels is
    smoothing_scale * width; range sigma is 2 * smoothing_scale."""
    image = jnp.asarray(image)
    if resolution is None:
        resolution = image.shape[1]
    sig = max(smoothing_scale, 1e-5)
    spatial_sigma = sig * resolution
    range_sigma = sig * 2.0
    ks = smoothing_kernel_size(spatial_sigma)
    return bilateral_filter(image, jnp.float32(spatial_sigma),
                            jnp.float32(range_sigma), kernel_size=ks,
                            channel=channel)
