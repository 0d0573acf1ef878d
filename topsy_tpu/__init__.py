"""topsy_tpu — a TPU-native SPH/N-body particle visualization framework.

A ground-up JAX/XLA rebuild of the capabilities of pynbody/topsy: the
rasterizer pipeline becomes tiled matmul splatting, progressive LOD becomes
contiguous prefix ranges over an interleaved particle order, and multi-chip
scaling shards the particle axis with partial framebuffers reduced over ICI.
"""

from __future__ import annotations

__version__ = "0.1.0"

from . import config  # noqa: F401
