"""Demo: drive the sort-free interactive LOD loop and print frame stats.

Simulates a user rotating the view: each CHANGE frame renders an adaptive
fair subsample through the column-LOD path (no per-frame sort), REFINE
frames accumulate to full coverage while idle, and the status quantities
(fps, mass downsampling factor) mirror the reference's status line.

Run: python examples/interactive_fps.py [n_particles] [n_frames]
"""

import sys
import time

import numpy as np

import topsy_tpu
from topsy_tpu.canvas import OffscreenCanvas
from topsy_tpu.drawreason import DrawReason


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else int(1e6)
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    vis = topsy_tpu.test(n, render_resolution=1024,
                         canvas_class=OffscreenCanvas)
    vis.show_status = False
    sph = vis._sph

    # warm up (compiles the column-slice widths) and build the presort
    sph.render(DrawReason.CHANGE)

    print(f"{'frame':>5s} {'kind':>6s} {'ms':>8s} {'fps':>7s} "
          f"{'downsample':>10s}")
    for i in range(frames):
        vis.rotate(0.02, 0.01)
        t0 = time.perf_counter()
        sph.render(DrawReason.CHANGE)
        dt = time.perf_counter() - t0
        print(f"{i:5d} {'CHANGE':>6s} {dt * 1e3:8.2f} {1 / dt:7.1f} "
              f"{sph.last_render_mass_scale:9.2f}x")

    # let REFINE frames accumulate to full coverage
    t0 = time.perf_counter()
    refines = 0
    while sph.needs_refine() and refines < 64:
        sph.render(DrawReason.REFINE)
        refines += 1
    dt = time.perf_counter() - t0
    print(f"full coverage after {refines} REFINE frames "
          f"({dt * 1e3:.1f} ms, final downsample "
          f"{sph.last_render_mass_scale:.2f}x)")
    assert abs(sph.last_render_mass_scale - 1.0) < 1e-6
    im = np.asarray(vis.get_sph_image())
    print(f"image {im.shape}, density sum {im[..., 0].sum():.4g}")


if __name__ == "__main__":
    main()
