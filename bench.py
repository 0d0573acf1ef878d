"""Headline benchmark: the PRODUCT EXPORT loop on one chip.

Drives the full Visualizer (loaders -> ParticleStore -> progression ->
SPHRenderer presorted fused-feed path -> giant layer) exactly as a movie
export does: repeated ``render(DrawReason.EXPORT)`` frames over the
2^24-particle synthetic snapshot at 1024x1024 with density + weighted-
quantity channels, and reports steady-state splats/second.  This is the
path users run — not a raw kernel call.

The snapshot is generated ON DEVICE and adopted by the store without a
host upload (loaders.TestDataDeviceLoader / AbstractDataLoader
.device_arrays), and the presorted (bucket, Morton) order is built on
device too (ops/morton_device.py): in this dev harness the host tunnel
moves only ~1-40 MB/s, so uploading the 384 MB snapshot would dominate
wall time without touching the measured metric.

Timing uses the axon-trustworthy barrier (util.device_sync — a
data-dependent scalar readback; jax.block_until_ready returns without
waiting under tunneled runtimes, CLAUDE.md).  EXPORT frames run
barrier-free (throughput mode), so several frames per readback amortize
the ~28 ms tunnel sync latency below 2%; the one residual readback's
calibrated fixed cost is subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the 500M splats/s/chip north star (BASELINE.md).
"""

from __future__ import annotations

import json
import time


def main():
    from topsy_tpu.canvas import OffscreenCanvas
    from topsy_tpu.drawreason import DrawReason
    from topsy_tpu.loaders import TestDataDeviceLoader
    from topsy_tpu.util import (device_sync, enable_persistent_compile_cache,
                                sync_latency)
    from topsy_tpu.visualizer import Visualizer

    enable_persistent_compile_cache()

    n = 1 << 24
    resolution = 1024

    vis = Visualizer(data_loader_class=TestDataDeviceLoader,
                     data_loader_args=(n,),
                     data_loader_kwargs={"seed": 1337},
                     render_resolution=resolution,
                     canvas_class=OffscreenCanvas)
    vis.show_status = False
    vis.quantity_name = "test-quantity"  # density + weighted channels
    vis.scale = 200.0
    vis.store.ensure_presorted()

    # warm up: first EXPORT pays compile + program load
    vis._sph.render(DrawReason.EXPORT)
    device_sync(vis._sph._image)
    vis._sph.render(DrawReason.EXPORT)
    device_sync(vis._sph._image)
    lat = sync_latency()

    # several frames per readback so the tunnel's fixed sync latency is
    # amortized below 2%; best of several rounds because tunnel scheduling
    # adds ~3% run-to-run noise
    reps = 8
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(reps):
            vis._sph.render(DrawReason.EXPORT)
        device_sync(vis._sph._image)
        dt = (time.perf_counter() - t0 - lat) / reps
        best = min(best, dt)

    splats_per_sec = n / best
    baseline = 5e8  # north-star target (BASELINE.md)
    print(json.dumps({
        "metric": "product-EXPORT splats/sec/chip",
        "value": round(splats_per_sec, 1),
        "unit": "splats/s",
        "vs_baseline": round(splats_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
