"""CLI parsing tests, modelled on reference tests/test_arg_parse.py."""

import pytest

import topsy_tpu


def test_single_window():
    [args] = topsy_tpu.parse_args(["test://1000"])
    assert args.filename == "test://1000"
    assert args.render_mode == "univariate"
    assert args.resolution == topsy_tpu.config.DEFAULT_RESOLUTION


def test_multi_window_plus_separator():
    batches = topsy_tpu.parse_args(
        ["fileA", "-q", "temp", "+", "fileB", "--render-mode", "rgb"])
    assert len(batches) == 2
    assert batches[0].filename == "fileA"
    assert batches[0].quantity == "temp"
    assert batches[1].filename == "fileB"
    assert batches[1].render_mode == "rgb"


def test_load_sphere_forms():
    [args] = topsy_tpu.parse_args(["f", "--load-sphere", "5.0"])
    assert args.load_sphere == [5.0]
    [args] = topsy_tpu.parse_args(["f", "--load-sphere", "5.0", "1", "2", "3"])
    assert args.load_sphere == [5.0, 1.0, 2.0, 3.0]
    with pytest.raises(SystemExit):
        topsy_tpu.parse_args(["f", "--load-sphere", "5.0", "1.0"])


def test_render_mode_choices():
    with pytest.raises(SystemExit):
        topsy_tpu.parse_args(["f", "--render-mode", "bogus"])
