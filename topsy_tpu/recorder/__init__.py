"""Camera/parameter recording and movie export.

Same architecture as the reference recorder (reference:
src/topsy/recorder/__init__.py): a ViewSynchronizer registers the recorder as
a fake view whose setter appends timestamped property events; replay
interpolates the streams at fixed fps into offscreen frames which are encoded
to mp4 via OpenCV.  Timestreams pickle to the same (dict, end_time) layout so
recordings are interchangeable with the reference's files.
"""

from __future__ import annotations

import copy
import logging
import pickle
import time

import numpy as np

from ..drawreason import DrawReason
from ..view_synchronizer import ViewSynchronizer, _resolve_path_get, _resolve_path_set
from .interpolator import (Interpolator, LinearInterpolator,
                           RotationInterpolator, SmoothedLinearInterpolator,
                           SmoothedRotationInterpolator,
                           SmoothedStepInterpolator, StepInterpolator)

logger = logging.getLogger(__name__)


class VisualizationRecorder:
    # NB ordering matters: type/quantity first so autoscaling is not
    # retriggered by later vmin/vmax events (reference: recorder/__init__.py:27)
    _record_properties = ["colormap[type]", "quantity_name", "colormap[log]",
                          "colormap[vmin]", "colormap[vmax]", "colormap[gamma]",
                          "colormap[density_vmin]", "colormap[density_vmax]",
                          "rotation_matrix", "scale", "position_offset"]
    _interp_smoothed = [StepInterpolator, StepInterpolator, StepInterpolator,
                        SmoothedStepInterpolator, SmoothedStepInterpolator,
                        SmoothedStepInterpolator, SmoothedStepInterpolator,
                        SmoothedStepInterpolator, SmoothedRotationInterpolator,
                        SmoothedLinearInterpolator, SmoothedLinearInterpolator]
    _interp_unsmoothed = [StepInterpolator] * 8 + [RotationInterpolator,
                                                   LinearInterpolator,
                                                   LinearInterpolator]

    def __init__(self, visualizer):
        vs = ViewSynchronizer(synchronize=self._record_properties)
        vs.add_view(visualizer)
        vs.add_view(self, setter=VisualizationRecorder._add_event)
        self._recording = False
        self._playback = False
        self._recording_ends_at = None
        self._visualizer = visualizer
        self._reset_timestream()

    def _add_event(self, key, value):
        if key in self._record_properties:
            self._view_synchronizer.update_completed(self)
            if self._recording:
                self._timestream[key].append((self._time_elapsed(), copy.copy(value)))

    def _time_elapsed(self):
        return time.time() - self._t0

    def _reset_timestream(self):
        self._timestream = {
            r: [(0.0, copy.copy(_resolve_path_get(self._visualizer, r)))]
            for r in self._record_properties}

    def record(self):
        self._t0 = time.time()
        self._reset_timestream()
        self._recording = True
        self._playback = False

    def stop(self):
        if self._recording:
            self._recording_ends_at = self._time_elapsed()
        self._recording = False
        self._playback = False

    @property
    def recording(self):
        return self._recording

    def _progress_iterator(self, ntot):
        import tqdm
        return tqdm.tqdm(range(ntot), unit="frame")

    def _replay(self, fps=30.0, resolution=(1920, 1080), show_colorbar=True,
                show_scalebar=True, smooth=True, set_vmin_vmax=True,
                set_quantity=True):
        if self._recording:
            self.stop()
        if self._recording_ends_at is None:
            raise RuntimeError("Can't playback before recording")
        self._playback = True

        exclude = []
        if not set_vmin_vmax:
            exclude.extend(["vmin", "vmax"])
        if not set_quantity:
            exclude.append("quantity_name")

        try:
            self._visualizer.show_colorbar = show_colorbar
            self._visualizer.show_scalebar = show_scalebar
            classes = self._interp_smoothed if smooth else self._interp_unsmoothed
            self._interpolators = {r: c(self._timestream[r])
                                   for c, r in zip(classes, self._record_properties)
                                   if r not in exclude}

            num_frames = int(self._recording_ends_at * fps)
            for i in self._progress_iterator(num_frames):
                t = i / fps
                for p in self._record_properties:
                    if p in exclude:
                        continue
                    val = self._interpolators[p](t)
                    if val is not Interpolator.no_value:
                        _resolve_path_set(self._visualizer, p, val)

                self._visualizer.display_status("topsy_tpu", timeout=1e6)
                frame = self._visualizer.draw(DrawReason.EXPORT,
                                              target=resolution)
                if frame.dtype != np.uint8:
                    frame = (np.clip(frame.astype(np.float32), 0, 1)
                             * 255 + 0.5).astype(np.uint8)
                yield frame[:, :, :3]

            self._playback = False
        finally:
            self._visualizer.show_colorbar = True
            self._visualizer.show_scalebar = True
            self._visualizer.display_status("Complete", timeout=1.0)

    def save_mp4(self, filename, fps=30.0, resolution=(1920, 1080), *args, **kwargs):
        import cv2
        writer = cv2.VideoWriter(filename, cv2.VideoWriter.fourcc(*"mp4v"),
                                 fps, resolution)
        for image in self._replay(fps, resolution, *args, **kwargs):
            writer.write(image[:, :, ::-1])  # RGB -> BGR for OpenCV
        writer.release()
        logger.info("Saved %s", filename)

    def save_timestream(self, fname):
        with open(fname, "wb") as f:
            pickle.dump((self._timestream, self._recording_ends_at), f)

    def load_timestream(self, fname):
        with open(fname, "rb") as f:
            self._timestream, self._recording_ends_at = pickle.load(f)
