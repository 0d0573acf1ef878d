"""ColormapHolder: lifecycle manager for the active colormap.

Same contract as the reference holder (reference:
src/topsy/colormap/__init__.py:12-159): parameters are merged; the concrete
class is chosen by scanning the subclass tree with ``accepts_parameters``;
updates recreate the implementation only when the current class no longer
accepts the merged parameters.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from .. import config
from .maps import ColormapBase, NoColormap


class ColormapHolder:
    def __init__(self):
        self._impl: ColormapBase = self.instance_from_parameters({
            "colormap_name": config.DEFAULT_COLORMAP,
            "vmin": None, "vmax": None, "log": False, "type": "none",
        })

    def _check_valid(self):
        if self._impl is None or isinstance(self._impl, NoColormap):
            raise ValueError("ColormapHolder is not fully initialized")

    @classmethod
    def _iter_classes(cls, base_class=ColormapBase) -> Iterator[type[ColormapBase]]:
        for subclass in base_class.__subclasses__():
            yield subclass
            yield from cls._iter_classes(subclass)

    @classmethod
    def _class_from_parameters(cls, parameters) -> Optional[type[ColormapBase]]:
        for cl in cls._iter_classes():
            if cl.accepts_parameters(parameters):
                return cl
        return None

    @classmethod
    def instance_from_parameters(cls, parameters) -> ColormapBase:
        colormap_class = cls._class_from_parameters(parameters)
        if colormap_class is None:
            raise ValueError(f"No colormap class found for parameters: {parameters}")
        return colormap_class(parameters)

    def update_parameters(self, parameters: dict):
        """Merge parameters, recreating the implementation if needed.

        Returns True if the class changed (recreated), False for in-place."""
        all_parameters = self.get_parameters() | parameters
        if self._impl is None and self._class_from_parameters(all_parameters) is None:
            return None
        if self._impl is None or not self._impl.accepts_parameters(all_parameters):
            self._impl = self.instance_from_parameters(all_parameters)
            return True
        self._impl.update_parameters(parameters)
        return False

    def get_parameter(self, name: str):
        return self._impl.get_parameter(name)

    def get_parameters(self) -> dict:
        return self._impl.get_parameters()

    def autorange(self, sph_render_output: np.ndarray):
        self._check_valid()
        self._impl.autorange_vmin_vmax(sph_render_output)

    def to_rgba(self, raw_image, mass_scale: float = 1.0):
        self._check_valid()
        return self._impl.to_rgba(raw_image, mass_scale)

    def sph_raw_output_to_content(self, sph_raw_output: np.ndarray) -> np.ndarray:
        self._check_valid()
        return self._impl.sph_raw_output_to_content(sph_raw_output)

    def sph_raw_output_to_image(self, sph_raw_output: np.ndarray,
                                as_uint8: bool = True) -> np.ndarray:
        """Full raw->RGBA round trip as numpy (test/export convenience,
        reference: implementation.py:132-201)."""
        self._check_valid()
        rgba = np.asarray(self._impl.to_rgba(sph_raw_output, 1.0))
        if as_uint8 and not getattr(self._impl, "hdr_output", lambda: False)():
            return (np.clip(rgba, 0, 1) * 255 + 0.5).astype(np.uint8)
        return rgba

    @property
    def impl(self) -> ColormapBase:
        return self._impl

    def make_ui_controller(self, visualizer, refresh_ui_callback=None):
        from . import surface as surface_mod
        from .maps import BivariateColormap, RGBColormap
        from .ui import (BivariateColorMapController, ColorMapController,
                         RGBMapController, SurfaceMapController)
        self._check_valid()
        if isinstance(self._impl, BivariateColormap):
            return BivariateColorMapController(visualizer, refresh_ui_callback)
        if isinstance(self._impl, RGBColormap):
            return RGBMapController(visualizer, refresh_ui_callback)
        if isinstance(self._impl, surface_mod.ColorAsSurfaceMap):
            return SurfaceMapController(visualizer, refresh_ui_callback)
        return ColorMapController(visualizer, refresh_ui_callback)

    def __getitem__(self, key: str):
        return self.get_parameter(key)

    def __setitem__(self, key: str, value):
        self.update_parameters({key: value})
