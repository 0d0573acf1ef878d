"""Multi-chip rendering: particle-sharded splatting with an ICI framebuffer
all-reduce.

The reference is single-GPU; its particle-axis scaling constructs (split
buffers, chunked export calls — reference: src/topsy/split_buffers.py,
config.py:18-25) map here onto *data parallelism over particles*
(SURVEY.md §2.10): each chip splats its particle shard into a full-resolution
partial framebuffer, and because the blending is order-independent additive,
``psum`` over the mesh reproduces the single-chip image exactly.

Particles are sharded **round-robin over the interleaved LOD order**
(``strided_shard``): device d owns global indices i with i % D == d, so any
progressive-LOD prefix [0, K) stays load-balanced across chips, and the
per-shard LOD mask is a local comparison — no cross-chip index bookkeeping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import splat_atlas
from .mesh import PARTICLE_AXIS


def strided_shard(arr: np.ndarray, n_devices: int) -> np.ndarray:
    """Rearrange (N, ...) into (D, ceil(N/D), ...) with round-robin rows:
    out[d, j] = arr[j * D + d]; padded with zeros."""
    n = len(arr)
    per = -(-n // n_devices)
    padded = np.zeros((per * n_devices,) + arr.shape[1:], dtype=arr.dtype)
    padded[:n] = arr
    return np.ascontiguousarray(
        padded.reshape(per, n_devices, *arr.shape[1:]).swapaxes(0, 1))

def unstride(arr: np.ndarray) -> np.ndarray:
    """Inverse of strided_shard (up to padding)."""
    d, per = arr.shape[:2]
    return arr.swapaxes(0, 1).reshape(d * per, *arr.shape[2:])


class DistributedSplatter:
    """Owns particle shards on a mesh and a jitted sharded render step."""

    def __init__(self, mesh: Mesh, pos_smooth: np.ndarray, values: np.ndarray,
                 resolution: int, backend: str = "atlas",
                 depth_channel: bool = False):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_devices = mesh.shape[self.axis]
        self.resolution = resolution
        self.n = len(pos_smooth)
        self._depth_channel = depth_channel
        self._backend = backend

        sharding = NamedSharding(mesh, P(self.axis))
        self.pos_smooth = jax.device_put(
            strided_shard(np.asarray(pos_smooth, np.float32), self.n_devices),
            sharding)
        self.values = jax.device_put(
            strided_shard(np.asarray(values, np.float32), self.n_devices),
            sharding)
        self._step = self._build_step()

    def _build_step(self):
        axis = self.axis
        resolution = self.resolution
        depth_channel = self._depth_channel
        n_dev = self.n_devices

        def local_render(pos, vals, matrix, scale, start, count):
            pos = pos[0]     # strip the sharded leading axis (local block)
            vals = vals[0]
            d = jax.lax.axis_index(axis)
            local_n = pos.shape[0]
            gidx = (jnp.arange(local_n, dtype=jnp.int32) * n_dev
                    + d.astype(jnp.int32))
            mask = (gidx >= start) & (gidx < start + count)
            im, _ = splat_atlas.splat_atlas(pos, vals, matrix, resolution,
                                            scale, extra_mask=mask,
                                            depth_channel=depth_channel)
            # additive blending is exactly a sum-reduction: the partial
            # framebuffer all-reduce over ICI reproduces single-chip output
            return jax.lax.psum(im, axis)

        shard_fn = jax.shard_map(
            local_render, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False)
        return jax.jit(shard_fn)

    def render(self, matrix, scale, start: int = 0, count: int | None = None):
        """Render particles with global LOD range [start, start+count)."""
        if count is None:
            count = self.n
        return self._step(self.pos_smooth, self.values,
                          jnp.asarray(matrix, jnp.float32), jnp.float32(scale),
                          jnp.int32(start), jnp.int32(count))


@functools.lru_cache(maxsize=None)
def _warn_once(msg: str):  # pragma: no cover
    import logging
    logging.getLogger(__name__).warning(msg)
