from .holder import ColormapHolder  # noqa: F401
from .maps import (ColormapBase, NoColormap, Colormap, RGBColormap,  # noqa: F401
                   RGBHDRColormap, BivariateColormap)
