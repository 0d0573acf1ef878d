"""Time the host-side presort build stage by stage.

Usage: PYTHONPATH=... python benchmarks/presort_profile.py [log2n]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << log2n

    # synthetic positions + smoothings without the (slow) GMM loader: the
    # presort cost depends only on array statistics, not the distribution
    rng = np.random.RandomState(42)
    pos = rng.standard_normal((n, 3)).astype(np.float32) * 50.0
    h = np.exp(rng.standard_normal(n).astype(np.float32) * 0.5) * 0.3
    ps = np.concatenate([pos, h[:, None]], axis=1)

    from topsy_tpu import native
    from topsy_tpu.ops import morton

    t0 = time.perf_counter()
    nat = native.presort_order(ps, morton.DELTA_OCTAVE)
    t_nat = time.perf_counter() - t0
    print(f"native presort_order: {t_nat:.2f} s "
          f"({'available' if nat is not None else 'MISSING -> numpy path'})")

    t0 = time.perf_counter()
    layout = morton.build_presorted(ps)
    t_build = time.perf_counter() - t0
    print(f"build_presorted total: {t_build:.2f} s")

    t0 = time.perf_counter()
    out = layout.apply(ps, fill=morton.PAD_POS)
    t_apply = time.perf_counter() - t0
    print(f"layout.apply (N,4): {t_apply:.2f} s  (n_out={layout.n_out})")

    # stage-level: redo the build inline with timings
    t0 = time.perf_counter()
    buckets, order = nat if nat is not None else (None, None)
    print(f"[stages] radix: {time.perf_counter() - t0:.3f} s")
    b_sorted = buckets[order]
    t0 = time.perf_counter()
    change = np.flatnonzero(np.diff(b_sorted)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(b_sorted)]])
    lens = ends - starts
    run_quantum = layout.run_quantum
    padded = ((lens + run_quantum - 1) // run_quantum) * run_quantum
    out_starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    print(f"[stages] run bounds: {time.perf_counter() - t0:.3f} s "
          f"({len(starts)} runs)")
    t0 = time.perf_counter()
    dst = np.empty(len(order), dtype=np.int64)
    for s, e, os_ in zip(starts, ends, out_starts):
        dst[s:e] = os_ + np.arange(e - s)
    print(f"[stages] dst fill: {time.perf_counter() - t0:.3f} s")
    t0 = time.perf_counter()
    g_id = dst // 512
    rnd = np.random.RandomState(1337).random_sample(len(dst))
    print(f"[stages] rng: {time.perf_counter() - t0:.3f} s")
    t0 = time.perf_counter()
    o2 = np.lexsort((rnd, g_id))
    print(f"[stages] lexsort shuffle: {time.perf_counter() - t0:.3f} s")
    t0 = time.perf_counter()
    dst_shuffled = np.empty_like(dst)
    dst_shuffled[o2] = dst
    print(f"[stages] scatter: {time.perf_counter() - t0:.3f} s")


if __name__ == "__main__":
    main()
