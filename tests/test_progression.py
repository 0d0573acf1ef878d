"""Scheduler state-machine tests, modelled on the reference's coverage
(reference: tests/test_progression.py)."""

import numpy as np
import pytest

from topsy_tpu import config
from topsy_tpu.cells import CellLayout
from topsy_tpu.drawreason import DrawReason
from topsy_tpu.progression import RenderProgression, RenderProgressionWithCells


def drain_frame(prog, time_per_particle=0.0):
    """Run a frame to completion, returning list of (start, len) blocks."""
    blocks = []
    t = 0.0
    while (block := prog.get_block(t)) is not None:
        starts, lens = block
        blocks.extend(zip(starts, lens))
        t += time_per_particle * sum(lens)
        prog.end_block(t)
    return blocks


def test_initial_block_size():
    prog = RenderProgression(10_000_000)
    prog.start_frame(DrawReason.INITIAL_UPDATE)
    (starts, lens) = prog.get_block(0.0)
    assert starts == [0]
    assert lens == [int(config.INITIAL_PARTICLES_TO_RENDER)]


def test_export_renders_everything_chunked():
    n = int(config.MAX_PARTICLES_PER_EXPORT_RENDERCALL * 2.5)
    prog = RenderProgression(n)
    prog.start_frame(DrawReason.EXPORT)
    blocks = drain_frame(prog)
    assert sum(l for _, l in blocks) == n
    assert all(l <= config.MAX_PARTICLES_PER_EXPORT_RENDERCALL for _, l in blocks)
    # contiguous coverage
    cursor = 0
    for s, l in blocks:
        assert s == cursor
        cursor += l
    assert prog.end_frame_get_scalefactor() == pytest.approx(1.0)
    assert not prog.needs_refine()


def test_small_change_render_completes():
    prog = RenderProgression(1000)
    prog.start_frame(DrawReason.CHANGE)
    blocks = drain_frame(prog)
    assert sum(l for _, l in blocks) == 1000


def test_refine_continues_where_change_stopped():
    prog = RenderProgression(10_000_000)
    prog.start_frame(DrawReason.CHANGE)
    b = prog.get_block(0.0)
    first_len = b[1][0]
    prog.end_block(1.0 / config.TARGET_FPS)  # budget exhausted
    assert prog.get_block(1.0 / config.TARGET_FPS) is None
    prog.end_frame_get_scalefactor()
    assert prog.needs_refine()

    prog.start_frame(DrawReason.REFINE)
    b2 = prog.get_block(0.0)
    assert b2[0][0] == first_len  # continues from previous stop


def test_adaptation_slows_down_when_overbudget():
    prog = RenderProgression(10_000_000)
    prog.start_frame(DrawReason.CHANGE)
    prog.get_block(0.0)
    prog.end_block(10.0 / config.TARGET_FPS)  # 10x over budget
    prog.get_block(10.0 / config.TARGET_FPS)
    prog.end_frame_get_scalefactor()

    prog.start_frame(DrawReason.CHANGE)
    b = prog.get_block(0.0)
    assert b[1][0] < int(config.INITIAL_PARTICLES_TO_RENDER)


def test_adaptation_never_below_one():
    prog = RenderProgression(100)
    prog.start_frame(DrawReason.CHANGE)
    prog.get_block(0.0)
    prog.end_block(1e9)  # absurdly slow
    prog.end_frame_get_scalefactor()
    prog.start_frame(DrawReason.CHANGE)
    b = prog.get_block(0.0)
    assert b is not None and b[1][0] >= 1


def test_scale_factor_partial_render():
    prog = RenderProgression(1_000_000, initial_particles=100_000)
    prog.start_frame(DrawReason.CHANGE)
    prog.get_block(0.0)
    prog.end_block(1.0 / config.TARGET_FPS)
    sf = prog.end_frame_get_scalefactor()
    assert sf == pytest.approx(10.0)


@pytest.fixture
def cell_prog():
    rng = np.random.RandomState(7)
    pos = rng.uniform(-1, 1, (20_000, 3))
    layout, _ = CellLayout.from_positions(pos, -1.001, 1.001, 4)
    return RenderProgressionWithCells(layout, 20_000), layout


def test_cells_full_coverage(cell_prog):
    """Every particle must be rendered exactly once across an EXPORT frame
    (mirrors reference tests/test_progression.py coverage check)."""
    prog, layout = cell_prog
    prog.start_frame(DrawReason.EXPORT)
    blocks = drain_frame(prog)
    covered = np.zeros(20_000, dtype=int)
    for s, l in blocks:
        covered[s:s + l] += 1
    assert np.all(covered == 1)


def test_cells_progressive_coverage(cell_prog):
    """Interactive frames + refines cover everything exactly once."""
    prog, layout = cell_prog
    covered = np.zeros(20_000, dtype=int)
    prog.start_frame(DrawReason.CHANGE)
    for s, l in drain_frame(prog):
        covered[s:s + l] += 1
    prog.end_frame_get_scalefactor()
    guard = 0
    while prog.needs_refine() and guard < 100:
        prog.start_frame(DrawReason.REFINE)
        for s, l in drain_frame(prog):
            covered[s:s + l] += 1
        prog.end_frame_get_scalefactor()
        guard += 1
    assert np.all(covered == 1)


def test_cells_sphere_selection(cell_prog):
    prog, layout = cell_prog
    prog.select_sphere((0.9, 0.9, 0.9), 0.1)
    assert prog.get_fraction_volume_selected() < 1.0
    mask = prog.get_selected_cell_mask()
    assert mask is not None and mask.any() and not mask.all()
    prog.select_all()
    assert prog.get_selected_cell_mask() is None
    assert prog.get_fraction_volume_selected() == 1.0


def test_selection_generation_changes(cell_prog):
    prog, _ = cell_prog
    g0 = prog.selection_generation
    prog.select_sphere((0.9, 0.9, 0.9), 0.1)
    assert prog.selection_generation != g0
    g1 = prog.selection_generation
    prog.select_sphere((0.9, 0.9, 0.9), 0.1)
    assert prog.selection_generation == g1  # unchanged selection


def test_deferred_timing_adapts_recommendation():
    """Barrier-free interactive frames (VERDICT r4 item 1): the frame
    closes with defer_adapt=True and the LOD recommendation adapts only
    when the measured time arrives via report_deferred_timing."""
    from topsy_tpu.drawreason import DrawReason
    from topsy_tpu.progression import RenderProgression

    prog = RenderProgression(100000, initial_particles=1000)
    prog.start_frame(DrawReason.CHANGE)
    block = prog.get_block(0.0)
    assert block is not None
    prog.end_block(0.0)
    rec_before = prog._recommended
    sf = prog.end_frame_get_scalefactor(defer_adapt=True)
    assert sf > 1.0                       # photometry never waits
    assert prog._recommended == rec_before  # adaptation deferred

    # the frame took half the budget -> achievable doubles -> big jump
    prog.report_deferred_timing(0.5 / 30.0)
    assert prog._recommended != rec_before
    # a second report is a no-op (measurement already consumed)
    rec = prog._recommended
    prog.report_deferred_timing(123.0)
    assert prog._recommended == rec


def test_deferred_timing_discard():
    """A new frame starting before the previous barrier was observed
    discards the stale deferred measurement."""
    from topsy_tpu.drawreason import DrawReason
    from topsy_tpu.progression import RenderProgression

    prog = RenderProgression(100000, initial_particles=1000)
    prog.start_frame(DrawReason.CHANGE)
    prog.get_block(0.0)
    prog.end_block(0.0)
    rec = prog._recommended
    prog.end_frame_get_scalefactor(defer_adapt=True)
    prog.discard_deferred_timing()
    prog.report_deferred_timing(1e-6)  # must be ignored after discard
    assert prog._recommended == rec
