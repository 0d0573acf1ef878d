"""Qt canvas: native window with toolbar, recording and colormap popover.

Equivalent of the reference's Qt canvas (reference: src/topsy/canvas/qt/):
frames paint into a QWidget; the toolbar offers record / movie export /
snapshot / window linking / colormap controls; the mode controls are
materialized from the toolkit-agnostic ControlSpec/LayoutSpec tree.

Requires PySide6 (import-gated; the offscreen canvas is used when absent).
"""

from __future__ import annotations

import logging

import numpy as np

try:
    from PySide6 import QtCore, QtGui, QtWidgets
except ImportError as _e:  # pragma: no cover
    raise ImportError("PySide6 is required for the Qt canvas") from _e

from ..color.ui import ControlSpec, LayoutSpec, UnifiedColorMapController
from . import VisualizerCanvasBase

logger = logging.getLogger(__name__)

_app = None


def _ensure_app():
    global _app
    _app = QtWidgets.QApplication.instance()
    if _app is None:
        _app = QtWidgets.QApplication([])
    return _app


class _CanvasWidget(QtWidgets.QWidget):
    def __init__(self, owner: "QtCanvas"):
        super().__init__()
        self._owner = owner
        self._qimage = None
        self.setMouseTracking(True)
        self.setFocusPolicy(QtCore.Qt.StrongFocus)

    def set_frame(self, frame: np.ndarray):
        if frame.dtype != np.uint8:
            frame = (np.clip(frame.astype(np.float32), 0, 1) * 255 + 0.5
                     ).astype(np.uint8)
        h, w = frame.shape[:2]
        self._frame = np.ascontiguousarray(frame)
        self._qimage = QtGui.QImage(self._frame.data, w, h, 4 * w,
                                    QtGui.QImage.Format_RGBA8888)
        self.update()

    def paintEvent(self, event):
        if self._qimage is not None:
            painter = QtGui.QPainter(self)
            painter.drawImage(self.rect(), self._qimage)
            painter.end()

    # -- events forwarded to the toolkit-agnostic handler --------------------

    def mouseMoveEvent(self, e):
        buttons = (1,) if e.buttons() else ()
        mods = ("Shift",) if e.modifiers() & QtCore.Qt.ShiftModifier else ()
        self._owner.event_handler({"event_type": "pointer_move",
                                   "buttons": buttons, "modifiers": mods,
                                   "x": e.position().x(), "y": e.position().y()})

    def mousePressEvent(self, e):
        self._owner._last_x = e.position().x()
        self._owner._last_y = e.position().y()

    def mouseReleaseEvent(self, e):
        self._owner.event_handler({"event_type": "pointer_up"})

    def mouseDoubleClickEvent(self, e):
        self._owner.event_handler({"event_type": "double_click",
                                   "x": e.position().x(), "y": e.position().y()})

    def wheelEvent(self, e):
        self._owner.event_handler({"event_type": "wheel", "dx": 0,
                                   "dy": e.angleDelta().y()})

    def keyReleaseEvent(self, e):
        self._owner.event_handler({"event_type": "key_up",
                                   "key": e.text() or ""})

    def resizeEvent(self, e):
        ratio = self.devicePixelRatioF()
        self._owner.event_handler({"event_type": "resize",
                                   "width": e.size().width(),
                                   "height": e.size().height(),
                                   "pixel_ratio": ratio})


class QtCanvas(VisualizerCanvasBase):
    def __init__(self, *args, **kwargs):
        _ensure_app()
        super().__init__(*args, **kwargs)
        self._window = QtWidgets.QMainWindow()
        self._window.setWindowTitle(self.title)
        self._widget = _CanvasWidget(self)
        self._window.setCentralWidget(self._widget)
        self._window.resize(768, 768)
        self._recorder = None
        self._build_toolbar()
        self._pending_draw = None
        self._timer = QtCore.QTimer()
        self._timer.setSingleShot(True)
        self._timer.timeout.connect(self._flush_draw)

    # -- scheduling --------------------------------------------------------------

    def request_draw(self, fn):
        self._pending_draw = fn
        if not self._timer.isActive():
            self._timer.start(0)

    def _flush_draw(self):
        fn, self._pending_draw = self._pending_draw, None
        if fn is not None:
            fn()

    def call_later(self, delay, fn, *args):
        QtCore.QTimer.singleShot(int(delay * 1000), lambda: fn(*args))

    def present_frame(self, frame: np.ndarray):
        self._widget.set_frame(frame)

    # -- toolbar (reference: canvas/qt/__init__.py toolbar actions) ---------------

    def _build_toolbar(self):
        tb = QtWidgets.QToolBar("topsy_tpu")
        self._window.addToolBar(tb)

        self._record_action = tb.addAction("Record", self._toggle_record)
        tb.addAction("Save movie", self._save_movie)
        tb.addAction("Snapshot", self._snapshot)
        tb.addAction("Save script", self._save_timestream)
        tb.addAction("Load script", self._load_timestream)
        tb.addAction("Colormap", self._toggle_controls)
        self._controls_dock = None

    def _get_recorder(self):
        if self._recorder is None:
            from ..recorder import VisualizationRecorder
            self._recorder = VisualizationRecorder(self._visualizer)
        return self._recorder

    def _toggle_record(self):
        rec = self._get_recorder()
        if rec.recording:
            rec.stop()
            self._record_action.setText("Record")
        else:
            rec.record()
            self._record_action.setText("Stop")

    def _save_movie(self):
        rec = self._get_recorder()
        fname, _ = QtWidgets.QFileDialog.getSaveFileName(
            self._window, "Save movie", "", "MPEG-4 (*.mp4)")
        if fname:
            rec.save_mp4(fname, fps=30.0, resolution=(1920, 1080))

    def _snapshot(self):
        fname, _ = QtWidgets.QFileDialog.getSaveFileName(
            self._window, "Save snapshot", "",
            "Images (*.png *.pdf);;Raw content (*.npy)")
        if fname:
            self._visualizer.save(fname)

    def _save_timestream(self):
        rec = self._get_recorder()
        fname, _ = QtWidgets.QFileDialog.getSaveFileName(
            self._window, "Save camera script", "", "Timestream (*.pkl)")
        if fname:
            rec.save_timestream(fname)

    def _load_timestream(self):
        rec = self._get_recorder()
        fname, _ = QtWidgets.QFileDialog.getOpenFileName(
            self._window, "Load camera script", "", "Timestream (*.pkl)")
        if fname:
            rec.load_timestream(fname)

    def _toggle_controls(self):
        if self._controls_dock is not None:
            self._controls_dock.setVisible(not self._controls_dock.isVisible())
            return
        self._controller = UnifiedColorMapController(self._visualizer,
                                                     self._refresh_controls)
        self._controls_dock = QtWidgets.QDockWidget("Display", self._window)
        self._window.addDockWidget(QtCore.Qt.RightDockWidgetArea,
                                   self._controls_dock)
        self._refresh_controls(self._controller.get_layout(), True)

    def _refresh_controls(self, layout: LayoutSpec, new_widgets: bool):
        if self._controls_dock is None:
            return
        container = QtWidgets.QWidget()
        container.setLayout(self._build_layout(layout))
        self._controls_dock.setWidget(container)

    def _build_layout(self, spec: LayoutSpec):
        box = (QtWidgets.QHBoxLayout() if spec.type == "hbox"
               else QtWidgets.QVBoxLayout())
        for child in spec.children:
            if isinstance(child, LayoutSpec):
                inner = QtWidgets.QWidget()
                inner.setLayout(self._build_layout(child))
                box.addWidget(inner)
            else:
                box.addWidget(self._build_control(child))
        return box

    def _build_control(self, spec: ControlSpec):
        if spec.type in ("combo", "combo-edit"):
            w = QtWidgets.QComboBox()
            w.setEditable(spec.type == "combo-edit")
            w.addItems([str(o) for o in (spec.options or [])])
            w.setCurrentText(str(spec.value))
            w.currentTextChanged.connect(spec.callback)
        elif spec.type == "checkbox":
            w = QtWidgets.QCheckBox(spec.label or spec.name)
            w.setChecked(bool(spec.value))
            w.toggled.connect(spec.callback)
        elif spec.type == "slider":
            lo, hi = spec.range or (0.0, 1.0)
            w = QtWidgets.QSlider(QtCore.Qt.Horizontal)
            w.setRange(0, 1000)
            w.setValue(int(1000 * (spec.value - lo) / max(hi - lo, 1e-30)))
            w.valueChanged.connect(
                lambda v, s=spec, lo=lo, hi=hi: s.callback(lo + (hi - lo) * v / 1000))
        elif spec.type == "range_slider":
            # two spin boxes (Qt has no native range slider)
            w = QtWidgets.QWidget()
            lay = QtWidgets.QHBoxLayout(w)
            lay.setContentsMargins(0, 0, 0, 0)
            lo_box = QtWidgets.QDoubleSpinBox()
            hi_box = QtWidgets.QDoubleSpinBox()
            rng = spec.range or (0.0, 1.0)
            for b, val in ((lo_box, spec.value[0]), (hi_box, spec.value[1])):
                b.setDecimals(3)
                b.setRange(rng[0] - 100, rng[1] + 100)
                b.setValue(val)
            emit = lambda *_: spec.callback((lo_box.value(), hi_box.value()))
            lo_box.valueChanged.connect(emit)
            hi_box.valueChanged.connect(emit)
            if spec.label:
                lay.addWidget(QtWidgets.QLabel(spec.label))
            lay.addWidget(lo_box)
            lay.addWidget(hi_box)
        elif spec.type == "button":
            w = QtWidgets.QPushButton(spec.label or spec.name)
            w.clicked.connect(lambda *_: spec.callback(None))
        elif spec.type == "color_picker":
            w = QtWidgets.QPushButton(spec.label or "Colour")
            w.setStyleSheet(f"background-color: {spec.value}")

            def pick(_=None, s=spec, btn=w):
                color = QtWidgets.QColorDialog.getColor()
                if color.isValid():
                    btn.setStyleSheet(f"background-color: {color.name()}")
                    s.callback(color.name())
            w.clicked.connect(pick)
        else:
            w = QtWidgets.QLabel(str(spec.value))
        return w

    # -- window --------------------------------------------------------------------

    def show(self):
        self._window.show()
        self._visualizer.invalidate()

    def run_qt_loop(self):
        _ensure_app().exec()
