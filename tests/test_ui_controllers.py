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


def test_jupyter_dom_event_wiring(vis, monkeypatch):
    """Drive JupyterCanvas._dom_event through a stubbed ipyevents module
    (reference parity: tests/test_jupyter_interface.py exercises the
    notebook UI end-to-end): drag rotates, shift-drag pans, wheel zooms,
    dblclick/keyup reach their handlers, mouseup releases the drag."""
    pytest.importorskip("ipywidgets")
    import sys
    import types

    captured = {}

    class FakeEvent:
        def __init__(self, source=None, watched_events=()):
            captured["source"] = source
            captured["watched"] = tuple(watched_events)

        def on_dom_event(self, cb):
            captured["cb"] = cb

    fake = types.ModuleType("ipyevents")
    fake.Event = FakeEvent
    monkeypatch.setitem(sys.modules, "ipyevents", fake)

    from topsy_tpu.canvas.jupyter import JupyterCanvas
    canvas = JupyterCanvas(visualizer=vis)
    assert captured["source"] is canvas._image_widget
    assert {"dragmove", "mousedown", "wheel", "dblclick"} <= set(captured["watched"])
    fire = captured["cb"]
    assert fire == canvas._dom_event

    # drag: mousedown anchors, dragmove rotates
    rot_before = np.array(vis.rotation_matrix)
    fire({"type": "mousedown", "dataX": 10, "dataY": 10})
    assert canvas._drag_active
    fire({"type": "dragmove", "dataX": 30, "dataY": 15})
    assert not np.allclose(np.array(vis.rotation_matrix), rot_before)

    # shift-drag pans in the view plane
    pos_before = np.array(vis.position_offset)
    fire({"type": "dragmove", "dataX": 50, "dataY": 15, "shiftKey": True})
    assert not np.allclose(np.array(vis.position_offset), pos_before)

    # mouseup releases the drag; further dragmoves are ignored
    fire({"type": "mouseup", "dataX": 50, "dataY": 15})
    assert not canvas._drag_active
    rot_mid = np.array(vis.rotation_matrix)
    fire({"type": "dragmove", "dataX": 80, "dataY": 40})
    assert np.allclose(np.array(vis.rotation_matrix), rot_mid)

    # wheel zooms exponentially
    scale_before = float(vis.scale)
    fire({"type": "wheel", "deltaY": 5})
    assert float(vis.scale) != scale_before

    # dblclick and keyup reach their canvas handlers
    calls = []
    monkeypatch.setattr(canvas, "double_click",
                        lambda x, y: calls.append(("dbl", x, y)))
    monkeypatch.setattr(canvas, "key_up", lambda k: calls.append(("key", k)))
    fire({"type": "dblclick", "dataX": 32, "dataY": 32})
    fire({"type": "keyup", "key": "r"})
    assert ("dbl", 32, 32) in calls and ("key", "r") in calls
