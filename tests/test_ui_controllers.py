"""Declarative UI controller tests (modelled on reference
tests/test_jupyter_interface.py, without a browser: the widget tree is built
with real ipywidgets and the callbacks are driven directly)."""

import numpy as np
import pytest

import topsy_tpu
from topsy_tpu.canvas import OffscreenCanvas
from topsy_tpu.color.ui import (ControlSpec, LayoutSpec,
                                UnifiedColorMapController)


@pytest.fixture
def vis():
    v = topsy_tpu.test(3000, render_resolution=64, canvas_class=OffscreenCanvas)
    v.show_status = False
    return v


def find_control(spec, name):
    if isinstance(spec, ControlSpec):
        return spec if spec.name == name else None
    for child in spec.children:
        if (found := find_control(child, name)) is not None:
            return found
    return None


def test_unified_controller_layout(vis):
    ctrl = UnifiedColorMapController(vis)
    layout = ctrl.get_layout()
    assert isinstance(layout, LayoutSpec)
    mode = find_control(layout, "render_mode")
    assert mode is not None and mode.value == "univariate"
    assert find_control(layout, "colormap") is not None
    assert find_control(layout, "range") is not None


def test_mode_switch_through_controller(vis):
    ctrl = UnifiedColorMapController(vis)
    mode = find_control(ctrl.get_layout(), "render_mode")
    mode.callback("rgb")
    assert vis.render_mode == "rgb"
    layout = ctrl.get_layout()
    assert find_control(layout, "mag_range") is not None
    assert find_control(layout, "gamma") is not None


def test_quantity_and_log_callbacks(vis):
    ctrl = UnifiedColorMapController(vis)
    q = find_control(ctrl.get_layout(), "quantity")
    q.callback("test-quantity")
    assert vis.quantity_name == "test-quantity"
    log = find_control(ctrl.get_layout(), "log")
    state_before = vis.colormap.get_parameter("log")
    log.callback(not state_before)
    assert vis.colormap.get_parameter("log") == (not state_before)


def test_range_slider_callback(vis):
    ctrl = UnifiedColorMapController(vis)
    rng = find_control(ctrl.get_layout(), "range")
    rng.callback((-3.0, 4.0))
    assert vis.colormap.get_parameter("vmin") == -3.0
    assert vis.colormap.get_parameter("vmax") == 4.0


def test_surface_controller_has_lighting(vis):
    vis.render_mode = "surface"
    ctrl = UnifiedColorMapController(vis)
    layout = ctrl.get_layout()
    assert find_control(layout, "den_percentile_threshold") is not None
    assert find_control(layout, "smoothing_scale") is not None
    diffuse = find_control(layout, "diffuse_lighting")
    assert diffuse is not None and diffuse.value.startswith("#")
    diffuse.callback("#ff0000")
    assert vis.colormap.get_parameter("light_color") == pytest.approx((1.0, 0.0, 0.0))


def test_jupyter_widget_tree_builds(vis):
    """Materialize the declarative tree with real ipywidgets."""
    pytest.importorskip("ipywidgets")
    from topsy_tpu.canvas.jupyter import JupyterCanvas
    canvas = JupyterCanvas(visualizer=vis)
    ctrl = UnifiedColorMapController(vis, canvas._refresh_controls)
    canvas._refresh_controls(ctrl.get_layout(), True)
    import ipywidgets as widgets
    root = canvas._controls_box.children[0]
    assert isinstance(root, widgets.VBox)
    names = []

    def collect(w):
        if hasattr(w, "_topsy_name"):
            names.append(w._topsy_name)
        for child in getattr(w, "children", ()):
            collect(child)
    collect(root)
    assert "render_mode" in names and "colormap" in names

    # frame presentation path
    frame = np.zeros((64, 64, 4), dtype=np.uint8)
    canvas.present_frame(frame)
    assert len(canvas._image_widget.value) > 0
