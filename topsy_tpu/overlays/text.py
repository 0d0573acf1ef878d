"""Text overlay rendered via matplotlib (reference: src/topsy/text.py)."""

from __future__ import annotations

from io import BytesIO

import numpy as np

from . import Overlay


def text_to_rgba(s: str, *, dpi: float, **kwargs) -> np.ndarray:
    """Rasterize a (possibly LaTeX) string to an RGBA float array.

    Standard matplotlib recipe (mathtext-to-array), as the reference uses
    (reference: text.py:30-43)."""
    from matplotlib.figure import Figure
    import matplotlib.pyplot as plt

    fig = Figure(facecolor="none")
    fig.text(0, 0, s, **kwargs)
    with BytesIO() as buf:
        fig.savefig(buf, dpi=dpi, format="png", bbox_inches="tight", pad_inches=0)
        buf.seek(0)
        rgba = plt.imread(buf)
    return rgba


class TextOverlay(Overlay):
    def __init__(self, visualizer, text: str, clipspace_origin, logical_pixels_height,
                 *, dpi=200, **kwargs):
        self.text = text
        self.dpi = dpi
        self.clipspace_origin = clipspace_origin
        self.pixelspace_height = logical_pixels_height
        self.kwargs = kwargs
        super().__init__(visualizer)

    def get_clipspace_coordinates(self, width, height):
        im = self.get_contents()
        x, y = self.clipspace_origin
        pixel_ratio = getattr(self._visualizer.canvas, "pixel_ratio", 1.0)
        h = self.pixelspace_height * pixel_ratio / height
        w = (self.pixelspace_height * pixel_ratio * im.shape[1]
             / im.shape[0] / width)
        return x, y, w, h

    def render_contents(self) -> np.ndarray:
        return text_to_rgba(self.text, dpi=self.dpi, **self.kwargs)
