"""Detection facade + backend registry.

Re-creates the reference's Detection dispatch (python/Detection.cpp:
16-189, Detection.h:26-40) and BackendRegistry (python/BackendRegistry):
one hook table per detect_type in {background_subtraction, yolo,
precomputed, none} with init/deinit/apply. The batched pipeline role of
PipelineManager<TileImage> (core/TaskPipeline.h) maps onto the worker
pools in trex_tpu.pipeline plus device batching inside each backend.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import numpy as np

from ..track.blob import TrackBlob


class DetectionBackend:
    def init(self, settings, background=None):
        return self

    def apply(self, frame_index: int, image: np.ndarray) -> list[TrackBlob]:
        raise NotImplementedError

    def deinit(self):
        pass


class BackgroundSubtractionBackend(DetectionBackend):
    """Classic path (BackgroundSubtraction.cpp:126-347)."""

    def init(self, settings, background=None):
        self.settings = settings
        self.background = background
        return self

    def set_background(self, background):
        self.background = background

    def apply(self, frame_index, image):
        from ..pipeline import detect_frame

        return detect_frame(image, self.background, self.settings)


class YOLOBackend(DetectionBackend):
    def init(self, settings, background=None):
        from .yolo import YOLODetector

        self.settings = settings
        model_path = settings["detect_model"]
        params = batch_stats = None
        num_classes = 80
        task = "detect"
        scale = "n"
        if model_path:
            from ..models.yolo_convert import load_ultralytics_checkpoint

            loaded = load_ultralytics_checkpoint(model_path)
            params = loaded.get("params")
            batch_stats = loaded.get("batch_stats")
            num_classes = loaded.get("num_classes", 80)
            task = loaded.get("task", "detect")
            scale = loaded.get("scale", "n")
        self.detector = YOLODetector(settings, params=params,
                                     batch_stats=batch_stats,
                                     num_classes=num_classes,
                                     task=task, scale=scale)
        # region_model/region_resolution: a cheap region detector runs
        # on the downscaled full frame and the main model only on the
        # proposed crops (trex_detection_model.py:547
        # perform_region_proposal)
        self.region = None
        region_path = str(settings["region_model"] or "").strip()
        if region_path:
            from ..models.yolo_convert import load_ultralytics_checkpoint

            rl = load_ultralytics_checkpoint(region_path)
            self.region = YOLODetector(
                settings, params=rl.get("params"),
                batch_stats=rl.get("batch_stats"),
                num_classes=rl.get("num_classes", 1),
                task=rl.get("task", "detect"),
                scale=rl.get("scale", "n"),
                input_size=int(settings["region_resolution"] or 320))
        return self

    def apply(self, frame_index, image):
        # dispatch order mirrors YOLO.cpp:740-752: instance masks win,
        # then oriented boxes, then POLO points, then plain boxes
        from .yolo import (
            boxes_to_blobs,
            masks_to_blobs,
            obbs_to_blobs,
            points_to_blobs,
        )

        if self.region is not None:
            from .region import region_proposal_detect

            det = region_proposal_detect(
                image, self.region.detect, self.detector.detect,
                self.settings,
                crop_size=int(self.settings["region_resolution"]
                              or 320))
        else:
            det = self.detector.detect(image)
        if image.ndim == 3:
            import cv2

            gray = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        else:
            gray = image
        if det.masks is not None:
            return masks_to_blobs(det, gray, det.masks, self.settings)
        if det.obb is not None:
            return obbs_to_blobs(det, gray, self.settings)
        if det.points is not None:
            return points_to_blobs(det, gray, self.settings)
        return boxes_to_blobs(det, gray, self.settings)


class PrecomputedBackend(DetectionBackend):
    """External CSV/NPZ detections (python/PrecomuptedDetection.cpp:
    buildCache) — rows of (x, y, w, h, frame) become rectangle blobs."""

    def init(self, settings, background=None):
        self.settings = settings
        self.cache: dict[int, list] = {}
        path = settings["detect_precomputed_file"]
        if path:
            self.load(path)
        return self

    def load(self, path):
        path = Path(str(path))
        if not path.exists():
            raise FileNotFoundError(path)
        if path.suffix == ".npz":
            with np.load(path) as data:
                rows = np.stack([data[k] for k in
                                 ("x", "y", "w", "h", "frame")], 1)
        else:
            import csv

            with open(path) as f:
                r = csv.DictReader(f)
                rows = np.array([[float(row["x"]), float(row["y"]),
                                  float(row["w"]), float(row["h"]),
                                  float(row["frame"])] for row in r])
        for x, y, w, h, frame in rows:
            self.cache.setdefault(int(frame), []).append((x, y, w, h))

    def apply(self, frame_index, image):
        if image.ndim == 3:  # blob pixels are grayscale
            import cv2

            image = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        blobs = []
        ih, iw = image.shape[:2]
        for (x, y, w, h) in self.cache.get(frame_index, []):
            # symmetric clamp: boxes fully off ANY edge drop out
            # (min(iw-1, x) turned off-right boxes into 1-px slivers)
            x0 = int(max(0, min(iw, x)))
            y0 = int(max(0, min(ih, y)))
            x1 = int(max(0, min(iw, x + w)))
            y1 = int(max(0, min(ih, y + h)))
            if x1 <= x0 or y1 <= y0:
                continue
            # exclusive box edges -> inclusive RLE x1
            lines = np.array([[yy, x0, x1 - 1] for yy in range(y0, y1)],
                             np.int32)
            px = image[y0:y1, x0:x1].reshape(-1)
            blobs.append(TrackBlob(lines, px))
        return blobs


class NoDetection(DetectionBackend):
    """Whole frame = one object (python/NoDetection.{h,cpp})."""

    def init(self, settings, background=None):
        return self

    def apply(self, frame_index, image):
        if image.ndim == 3:  # blob pixels are grayscale
            import cv2

            image = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
        h, w = image.shape[:2]
        lines = np.stack([np.arange(h), np.zeros(h, int),
                          np.full(h, w - 1)], 1).astype(np.int32)
        return [TrackBlob(lines, image.reshape(-1))]


class Sam3Backend(DetectionBackend):
    """Prompted segmentation (python/SAM3.{h,cpp}): frame-indexed
    prompts from detect_sam3_prompt drive the SAM model
    (detect/sam3.py SamSegmenter over models/sam.py); each prompt
    object's mask becomes an instance-segmentation blob."""

    def init(self, settings, background=None):
        from .sam3 import Sam3Prompts, SamSegmenter

        self.settings = settings
        prompt = settings["detect_sam3_prompt"]
        self.prompts = Sam3Prompts.from_setting(prompt) if prompt \
            else Sam3Prompts()
        model_path = settings["detect_model"]
        if model_path and Path(str(model_path)).exists():
            self.segmenter = SamSegmenter.from_checkpoint(model_path)
        else:
            raise ValueError(
                "detect_type sam3 needs a segment-anything checkpoint "
                "in detect_model (none is bundled; the reference "
                "downloads weights at runtime)")
        return self

    def apply(self, frame_index, image):
        from .sam3 import blobs_from_masks

        objs = self.prompts.materialize(frame_index)
        if not objs:
            return []
        masks = self.segmenter.segment(image, objs)
        return blobs_from_masks(masks, image)


REGISTRY: dict[str, Callable[[], DetectionBackend]] = {
    "background_subtraction": BackgroundSubtractionBackend,
    "yolo": YOLOBackend,
    "sam3": Sam3Backend,
    "precomputed": PrecomputedBackend,
    "none": NoDetection,
}


def create_detection(settings, background=None) -> DetectionBackend:
    dtype = settings["detect_type"] or "none"
    if dtype not in REGISTRY:
        raise ValueError(f"unknown detect_type {dtype!r}; "
                         f"available: {sorted(REGISTRY)}")
    return REGISTRY[dtype]().init(settings, background)
