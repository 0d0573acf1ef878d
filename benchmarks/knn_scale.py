"""Exact device-kNN validation + timing at 10^6-particle scale.

Runs ops/knn_device.knn_smooth_device on the default backend (the real TPU
chip under this harness) against the native host exact grid search
(native/_native.cpp knn_smooth) and reports max relative error + wall
times as one JSON line.  VERDICT r4 item 5's acceptance run:

    python benchmarks/knn_scale.py [log2_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << log2n

    import numpy as np

    from topsy_tpu import native
    from topsy_tpu.loaders import TestDataLoader
    from topsy_tpu.ops.knn_device import knn_smooth_device

    loader = TestDataLoader(n, seed=1337)
    pos = loader.get_positions().astype(np.float32)

    t0 = time.perf_counter()
    h_dev = knn_smooth_device(pos, 32)
    h_dev_np = np.asarray(h_dev)  # includes the device->host readback
    t_dev = time.perf_counter() - t0

    out = {"n": n, "device_s": round(t_dev, 3)}
    if native.available():
        t0 = time.perf_counter()
        h_nat = native.knn_smooth(pos, 32)
        out["native_s"] = round(time.perf_counter() - t0, 3)
        rel = np.abs(h_dev_np - h_nat) / np.maximum(h_nat, 1e-30)
        out["max_rel_err"] = float(rel.max())
        out["frac_gt_1e4"] = float((rel > 1e-4).mean())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
