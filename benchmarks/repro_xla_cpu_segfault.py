"""Standalone repro for the end-of-suite XLA-CPU compiler segfault.

Observed (round 3): the XLA **CPU** compiler segfaulted while compiling a
large zsplat program ~2 h into a full-suite pytest session.  The same
compile always passes in isolation — the crash needs hundreds of compiled
executables already resident in the process, i.e. it is a compiler-state
accumulation bug upstream, not anything in this repo's programs.  The
suite mitigates by releasing executables per test module + a persistent
disk cache (tests/conftest.py); THIS script exists so a recurrence can be
diagnosed in minutes instead of re-running a 2-hour suite:

    JAX_PLATFORMS=cpu python benchmarks/repro_xla_cpu_segfault.py [n_dummy]

It performs ``n_dummy`` (default 400) distinct small compilations to
accumulate in-process compiler/executable state, then compiles and runs
the suite's single biggest program (the full zsplat_atlas pipeline at
production resolution).  Exit 0 + "SURVIVED" means the upstream bug did
not fire at this accumulation level; a segfault here is the repro.

Intentionally NO persistent compile cache and NO jax.clear_caches(): the
point is to accumulate state the way an unmitigated long session does.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_dummy = int(sys.argv[1]) if len(sys.argv) > 1 else 400

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    # phase 1: accumulate distinct executables (distinct shapes -> distinct
    # programs; mix of elementwise, reduce, sort and conv so the compiler
    # exercises multiple lowering paths, as a real suite session does)
    print(f"phase 1: {n_dummy} dummy compilations", flush=True)
    for i in range(n_dummy):
        n = 64 + i  # unique shape per iteration
        x = jnp.arange(n, dtype=jnp.float32)

        @jax.jit
        def prog(x, _n=n):
            y = jnp.sort(x * 1.5 + 2.0)
            z = jnp.convolve(y, jnp.ones(3) / 3.0, mode="same")
            return (z ** 2).sum() + jnp.tanh(z).mean()

        float(prog(x))
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{n_dummy}", flush=True)

    # phase 2: the big compile — full zsplat_atlas (surface z-buffer
    # splatter) at production resolution, the largest single program the
    # test suite builds (tests/test_zsplat_atlas.py / test_surface.py)
    print("phase 2: big zsplat_atlas compile", flush=True)
    from topsy_tpu.ops import morton, zsplat_atlas

    rng = np.random.RandomState(0)
    n = 1 << 16
    pos = rng.normal(0, 1, (n, 3)).astype(np.float32)
    smooth = (0.05 + 0.2 * rng.rand(n)).astype(np.float32)
    ps = np.concatenate([pos, smooth[:, None]], axis=1)
    layout = morton.build_presorted(ps)
    ps_s = layout.apply(ps)
    buckets = layout.buckets
    vals = np.ones((layout.n_out, 2), np.float32)
    matrix = np.eye(4, dtype=np.float32)

    im, dropped = zsplat_atlas.zsplat_atlas(
        jnp.asarray(ps_s), jnp.asarray(vals), jnp.asarray(matrix), 1024,
        jnp.float32(3.0), jnp.asarray(buckets))
    print("image sum", float(jnp.nansum(im)), "dropped", int(dropped))
    print("SURVIVED: no segfault at this accumulation level")


if __name__ == "__main__":
    main()
