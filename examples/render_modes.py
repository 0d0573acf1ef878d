"""Demo: render the synthetic snapshot in every mode and save PNGs.

Run: python examples/render_modes.py [n_particles] [outdir]
"""

import sys

import numpy as np

import topsy_tpu
from topsy_tpu.canvas import OffscreenCanvas
from topsy_tpu.util import enable_persistent_compile_cache


def main():
    enable_persistent_compile_cache()  # repeat runs skip the XLA compiles
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e6)
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/topsy_tpu_demo"
    import os
    os.makedirs(outdir, exist_ok=True)

    vis = topsy_tpu.test(n, render_resolution=512, canvas_class=OffscreenCanvas,
                         with_cells=True)
    vis.show_status = False

    import matplotlib.image

    def save(name):
        frame = vis.get_presentation_image((640, 640))
        if frame.dtype != np.uint8:
            frame = (np.clip(frame.astype(np.float32), 0, 1) * 255 + 0.5
                     ).astype(np.uint8)
        path = f"{outdir}/{name}.png"
        matplotlib.image.imsave(path, frame)
        print(f"wrote {path}")

    save("density")

    vis.quantity_name = "test-quantity"
    save("weighted_quantity")

    vis.render_mode = "bivariate"
    save("bivariate")

    vis.quantity_name = None
    vis.render_mode = "rgb"
    save("rgb")

    vis.render_mode = "surface"
    save("surface")

    # a rotated, zoomed view
    vis.render_mode = "univariate"
    vis.rotate(0.7, 0.3)
    vis.scale = 60.0
    save("rotated_zoom")


if __name__ == "__main__":
    main()
