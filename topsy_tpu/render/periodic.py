"""Periodic tiling: replicate the rendered panel over the box lattice.

Matches the reference's approach (reference: src/topsy/periodic_sph.py):
render the base panel once, then composite a (2*2+1)^3 lattice of rotated
box offsets as weighted bilinear-shifted copies; the weight fades 1 -> 0 for
|z offset| in [0.5, 1] box lengths.
"""

from __future__ import annotations

import numpy as np

from ..drawreason import DrawReason
from ..ops.composite import lattice_composite
from .sph import SPHRenderer


class PeriodicSPHRenderer(SPHRenderer):
    num_repetitions = 2

    def __init__(self, store, render_progression, resolution: int,
                 periodicity_scale: float | None = None,
                 backend: str | None = None, **kwargs):
        kwargs.setdefault("wrapping", True)
        super().__init__(store, render_progression, resolution,
                         backend=backend, **kwargs)
        self._periodicity_scale = periodicity_scale
        self._display_image = None

    def instance_offsets_and_weights(self):
        """Lattice offsets (clip units) and fade weights
        (reference: periodic_sph.py:38-54)."""
        offsets = []
        weights = []
        panel_scale = self._periodicity_scale / self.scale
        n = self.num_repetitions
        rot = np.asarray(self.rotation_matrix)
        for xoff in range(-n, n + 1):
            for yoff in range(-n, n + 1):
                for zoff in range(-n, n + 1):
                    off = rot @ np.array([xoff, yoff, zoff], dtype=np.float64)
                    if abs(off[2]) < 1.0:
                        z = abs(off[2])
                        weights.append(1.0 if z <= 0.5 else 1.0 - 2.0 * (z - 0.5))
                        offsets.append(off[:2])
        return (np.asarray(offsets, dtype=np.float32) * panel_scale,
                np.asarray(weights, dtype=np.float32))

    def _postprocess_frame(self):
        offsets_clip, weights = self.instance_offsets_and_weights()
        res = self._resolution
        # clip x -> +cols, clip y -> -rows
        offsets_px = np.stack([-offsets_clip[:, 1] * res / 2.0,
                               offsets_clip[:, 0] * res / 2.0], axis=1)
        # the base panel includes the dense giant layer (scalefactor
        # pre-divided, SPHRenderer.get_output_image) so giant wings tile
        # over the lattice like every other deposit
        self._display_image = lattice_composite(SPHRenderer.get_output_image(self),
                                                offsets_px.astype(np.float32),
                                                weights)

    def render(self, draw_reason=DrawReason.CHANGE):
        if draw_reason == DrawReason.PRESENTATION_CHANGE:
            return
        super().render(draw_reason)

    def get_output_image(self):
        return self._display_image if self._display_image is not None else self._image

    def _get_image_unscaled(self) -> np.ndarray:
        if not self.has_rendered:
            self.render(DrawReason.EXPORT)
        return np.asarray(self.get_output_image())
