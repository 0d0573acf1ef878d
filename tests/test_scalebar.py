"""Scalebar recommendation tests across orders of magnitude, modelled on
reference tests/test_scalebar.py."""

import pytest

from topsy_tpu.overlays.scalebar import BarLengthRecommender
from topsy_tpu import units


def test_unit_conversions():
    assert units.unit_in_units("kpc", "kpc") == 1.0
    assert units.unit_in_units("Mpc", "kpc") == pytest.approx(1000.0)
    assert units.unit_in_units("pc", "kpc") == pytest.approx(1e-3)
    assert units.unit_in_units("au", "km") == pytest.approx(1.495978707e8)
    assert units.unit_in_units("km", "pc") == pytest.approx(1 / 3.0856775814913673e13)


@pytest.mark.parametrize("window_kpc,expected_unit", [
    (1e-15, "km"),       # ~ tens of km
    (2e-8, "au"),        # ~ a few au
    (0.02, "pc"),
    (20.0, "kpc"),
    (20000.0, "Mpc"),
])
def test_unit_choice_across_magnitudes(window_kpc, expected_unit):
    rec = BarLengthRecommender(window_kpc, "kpc")
    assert rec._unit_name == expected_unit


def test_quantized_lengths():
    for target, expected in [(1.0, 1.0), (1.9, 1.0), (2.0, 2.0), (4.9, 2.0),
                             (5.0, 5.0), (9.99, 5.0), (73.0, 50.0)]:
        assert BarLengthRecommender._quantize_length(target) == pytest.approx(expected)


def test_bar_length_at_most_half_window():
    for window in [0.037, 1.0, 42.0, 977.0, 123456.0]:
        rec = BarLengthRecommender(window, "kpc")
        assert rec.physical_scalebar_length_base_units <= window / 2 * 1.0001
        assert rec.physical_scalebar_length_base_units > window / 20


def test_label_formatting():
    assert BarLengthRecommender._format_scientific_latex(5.0, "kpc") == "5 kpc"
    assert BarLengthRecommender._format_scientific_latex(0.5, "pc") == "0.5 pc"
    label = BarLengthRecommender._format_scientific_latex(5e4, "km")
    assert "10^{4}" in label and label.endswith("km")


def test_update_window_width_changes_recommendation():
    rec = BarLengthRecommender(100.0, "kpc")
    l0 = rec.physical_scalebar_length_base_units
    rec.update_window_width(10000.0)
    assert rec.physical_scalebar_length_base_units > l0
    assert rec.label  # label refreshes lazily without error
