"""REAL multi-process distributed execution (SURVEY.md §2.10 row 8).

Unlike tests/test_parallel.py (which simulates multi-host with
single-process `from_process_local` calls and a monkeypatched
process_count), this spawns TWO actual OS processes that initialize
``jax.distributed`` (gloo collectives), assemble per-process particle
slabs with ``jax.make_array_from_process_local_data``, negotiate the
presorted padded length with the REAL allgather-max
(`DistributedSplatter._negotiate_padded_len`), and render through the
cross-process psum step — then checks the images against a
single-process render (examples/multiprocess_render.py)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single_process(tmp_path):
    env = dict(os.environ)
    # the launcher and the fresh worker processes configure their own
    # platform/device-count; the suite's 8-virtual-device XLA_FLAGS must
    # not leak into them
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env["TOPSY_TPU_MP_PORT"] = str(_free_port())
    env["TOPSY_TPU_MP_OUT"] = str(tmp_path / "mp_render.npz")
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "multiprocess_render.py"),
         "60000", "2"],
        capture_output=True, text=True, env=env, timeout=560)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "PASS" in r.stdout, r.stdout
