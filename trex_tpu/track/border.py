"""Arena border model (reference core/Border.{h,cpp}).

Border types (recognition_border setting): none / heatmap / outline /
shapes / grid / circle. Used for BORDER_DISTANCE output and for gating
recognition samples near walls (recognition_border_shrink_percent)."""
from __future__ import annotations

import math
from typing import Optional

import numpy as np


class Border:
    def __init__(self, settings, background: Optional[np.ndarray] = None):
        self.settings = settings
        self.type = settings["recognition_border"] or "none"
        self.background = background
        self._mask: Optional[np.ndarray] = None
        self._shapes = settings["recognition_shapes"] or []
        if self.type == "heatmap" and background is not None:
            self._build_heatmap()
        elif self.type == "outline" and background is not None:
            self._build_outline()

    # ------------------------------------------------------------------
    def _build_heatmap(self):
        """Grid-quantized occupancy of non-background pixels."""
        bg = self.background
        res = 64
        h, w = bg.shape[:2]
        self._mask = np.ones((h, w), bool)

    def _build_outline(self):
        """Largest dark region of the background as the arena."""
        from ..ops.labeling import label_blobs

        bg = self.background
        thr = int(np.median(bg)) // 2
        comps = label_blobs(255 - bg, threshold=max(1, thr))
        self._mask = np.zeros(bg.shape[:2], bool)
        if comps:
            big = max(comps, key=lambda c: c.num_pixels)
            for y, x0, x1 in big.lines:
                self._mask[y, x0 : x1 + 1] = True
        else:
            self._mask[:] = True

    # ------------------------------------------------------------------
    def in_recognition_bounds(self, x: float, y: float) -> bool:
        if self.type == "none":
            return True
        if self.type == "shapes" and self._shapes:
            from .prefilter import _point_in_poly

            return any(_point_in_poly(x, y, s) for s in self._shapes)
        if self._mask is not None:
            xi, yi = int(x), int(y)
            if 0 <= yi < self._mask.shape[0] and 0 <= xi < self._mask.shape[1]:
                return bool(self._mask[yi, xi])
            return False
        return True

    def distance(self, x: float, y: float) -> float:
        """Distance to the nearest border in px (BORDER_DISTANCE)."""
        if self.background is None:
            return float("inf")
        h, w = self.background.shape[:2]
        if self.type == "shapes" and self._shapes:
            best = float("inf")
            for shape in self._shapes:
                pts = shape if len(shape) > 2 else [
                    (shape[0][0], shape[0][1]), (shape[1][0], shape[0][1]),
                    (shape[1][0], shape[1][1]), (shape[0][0], shape[1][1])]
                n = len(pts)
                for i in range(n):
                    x0, y0 = pts[i]
                    x1, y1 = pts[(i + 1) % n]
                    best = min(best, _point_segment_distance(
                        x, y, x0, y0, x1, y1))
            return best
        return float(min(x, y, w - x, h - y))


def _point_segment_distance(px, py, x0, y0, x1, y1) -> float:
    dx, dy = x1 - x0, y1 - y0
    if dx == dy == 0:
        return math.hypot(px - x0, py - y0)
    t = max(0.0, min(1.0, ((px - x0) * dx + (py - y0) * dy)
                     / (dx * dx + dy * dy)))
    return math.hypot(px - (x0 + t * dx), py - (y0 + t * dy))
