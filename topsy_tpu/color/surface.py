"""Surface colormap: bilateral depth smoothing + screen-space lighting.

Equivalent of the reference's ColorAsSurfaceMap (reference:
src/topsy/colormap/surface.py, shaders/surface.wgsl): the (value, depth) map
from the occlusion renderer is depth-smoothed with a bilateral filter, then
lit with normals from central differences of the depth field, diffuse +
ambient, optionally with a material colour taken from a 1-D colormap of the
value channel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from ..ops.smooth import smooth_image
from .maps import Colormap, sample_lut_1d, _log10


class ColorAsSurfaceMap(Colormap):
    input_channels = 2

    _default_params = {
        "depth_scale": 1.0,
        "light_direction": [0.0, 1.0 / np.sqrt(2.0), 1.0 / np.sqrt(2.0)],
        "light_color": [1.0, 1.0, 1.0],
        "ambient_color": [0.0, 0.0, 0.2],
        "smoothing_scale": 0.01,
        "weighted_average": False,
        "vmin": 0.0,
        "vmax": 1.0,
        "log": False,
        "colormap_name": config.DEFAULT_COLORMAP,
    }

    @classmethod
    def accepts_parameters(cls, parameters: dict) -> bool:
        return parameters.get("type", None) == "surface"

    def sph_raw_output_to_content(self, numpy_image: np.ndarray) -> np.ndarray:
        """The smoothed (value, depth) map (reference: surface.py:357-358)."""
        return np.asarray(smooth_image(numpy_image,
                                       self._params.get("smoothing_scale", 0.01)))

    def autorange_vmin_vmax(self, vals: np.ndarray):
        if not self._params.get("weighted_average", False):
            return  # vmin/vmax drive only the material colormap
        valid = vals[..., 1].ravel() > 0.0
        self._autorange_using_values(vals[..., 0].ravel()[valid])

    def to_rgba(self, raw_image, mass_scale: float = 1.0) -> jnp.ndarray:
        # occlusion output needs no photometric rescaling (max semantics)
        raw_image = jnp.asarray(raw_image)
        smoothed = smooth_image(raw_image, self._params.get("smoothing_scale", 0.01))
        value = smoothed[..., 0]
        depth = smoothed[..., 1] * self._params.get("depth_scale", 1.0)

        H, W = depth.shape
        texel = 1.0 / W  # normal z component (reference: surface.wgsl:52)

        # central differences with clamped edges (texture sampler semantics)
        pad = jnp.pad(depth, 1, mode="edge")
        d_left = pad[1:-1, :-2]
        d_right = pad[1:-1, 2:]
        d_up = pad[:-2, 1:-1]
        d_down = pad[2:, 1:-1]
        dX = (d_right - d_left) * 0.5
        dY = (d_down - d_up) * 0.5
        norm = jnp.sqrt(dX * dX + dY * dY + texel * texel)
        nx, ny, nz = -dX / norm, -dY / norm, texel / norm

        light = np.asarray(self._params.get("light_direction", [0.0, 0.0, 1.0]),
                           dtype=np.float32)
        n_dot_l = jnp.maximum(nx * light[0] + ny * light[1] + nz * light[2], 0.0)

        if self._params.get("weighted_average", False):
            v = _log10(value) if self._params.get("log", False) else value
            vmin, vmax = self._params["vmin"], self._params["vmax"]
            v = jnp.clip((v - vmin) / (vmax - vmin), 0.0, 1.0)
            v = jnp.where(jnp.isfinite(v), v, 0.0)
            material = sample_lut_1d(v, self.lut())[..., :3]
        else:
            material = jnp.ones((H, W, 3), dtype=jnp.float32)

        light_color = jnp.asarray(self._params.get("light_color", [1.0, 1.0, 1.0]),
                                  dtype=jnp.float32)
        ambient = jnp.asarray(self._params.get("ambient_color", [0.2, 0.2, 0.2]),
                              dtype=jnp.float32)
        shade = (light_color * n_dot_l[..., None] * material
                 + ambient * material)
        shade = shade * (jnp.clip(depth, 0.0, 0.5) * 2.0)[..., None]
        alpha = jnp.ones((H, W, 1), dtype=jnp.float32)
        return jnp.concatenate([shade, alpha], axis=-1)
