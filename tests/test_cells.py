import numpy as np
import pytest

from topsy_tpu.cells import CellLayout


@pytest.fixture
def layout():
    rng = np.random.RandomState(42)
    pos = rng.uniform(-10, 10, (5000, 3))
    layout, ordering = CellLayout.from_positions(pos, -10.001, 10.001, 4)
    return layout, ordering, pos


def test_binning_correct(layout):
    lay, ordering, pos = layout
    sorted_pos = pos[ordering]
    cell_size = 20.002 / 4
    for ci in [0, 7, 63]:
        sl = lay.cell_slice(ci)
        if sl.stop == sl.start:
            continue
        cell_pos = sorted_pos[sl]
        idx = np.floor((cell_pos + 10.001) / cell_size).astype(int)
        cids = idx[:, 2] + 4 * (idx[:, 1] + 4 * idx[:, 0])
        assert np.all(cids == ci)


def test_lengths_sum(layout):
    lay, ordering, pos = layout
    assert lay.get_num_particles() == len(pos)
    assert lay.get_num_cells() == 64


def test_cells_in_sphere(layout):
    lay, _, _ = layout
    all_cells = lay.cells_in_sphere((0, 0, 0), 100.0)
    assert len(all_cells) == 64
    some = lay.cells_in_sphere((-7.5, -7.5, -7.5), 1.0)
    assert 0 < len(some) < 64
    assert 0 in some  # corner cell containing the centre


def test_cell_index_from_offset(layout):
    lay, _, _ = layout
    for ci in [0, 13, 63]:
        off = lay.get_cell_offset(ci)
        if lay.get_cell_length(ci) > 0:
            assert lay.cell_index_from_offset(off) == ci
    with pytest.raises(ValueError):
        lay.cell_index_from_offset(-1)


def test_randomize_within_cells_preserves_structure(layout):
    lay, _, _ = layout
    reorder = lay.randomize_within_cells(np.random.RandomState(1))
    assert sorted(reorder) == list(range(lay.get_num_particles()))
    for ci in [0, 30]:
        sl = lay.cell_slice(ci)
        chunk = reorder[sl]
        assert set(chunk) == set(range(sl.start, sl.stop))


def test_interleave_prefix_matches_reference_selection(layout):
    """Global prefixes in interleave order must equal the reference's
    per-cell phase-shifted range selection (progressive_render.py:152-187)."""
    lay, _, _ = layout
    order = lay.interleave_order()
    phases = lay.default_phase_shifts()
    phi = phases / lay.get_num_cells()
    lengths = np.array([lay.get_cell_length(c) for c in range(lay.get_num_cells())])
    offsets = np.array([lay.get_cell_offset(c) for c in range(lay.get_num_cells())])

    for fraction in [0.001, 0.01, 0.3, 0.77, 1.0]:
        # reference selection: per-cell indices [0, floor(f*L + phi))
        ends = np.floor(fraction * lengths + phi).astype(int)
        ref_set = set()
        for c in range(lay.get_num_cells()):
            ref_set.update(range(offsets[c], offsets[c] + ends[c]))
        k = lay.prefix_length_for_fraction(fraction)
        assert k == len(ref_set)
        assert set(order[:k]) == ref_set


def test_positions_outside_box_raises():
    pos = np.zeros((10, 3))
    with pytest.raises(ValueError):
        CellLayout.from_positions(pos, 1.0, 2.0, 4)
