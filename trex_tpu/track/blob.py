"""Tracking-stage blob: RLE lines + pixels + threshold recount.

Equivalent of the reference's commons pv::Blob (processing/PVBlob.h via
usage: recount/threshold semantics in Tracker.cpp:740-964, blob_id
everywhere). Pixel counts are cached per threshold like the reference's
`recount(threshold, background)`.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

_dense_configured = False


def _dense_lib():
    """ctypes binding for trex_blob_dense (native/labeling.cpp)."""
    global _dense_configured
    from ..io.lzo import _load

    lib = _load()
    if not _dense_configured:
        import ctypes

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.trex_blob_dense.restype = None
        lib.trex_blob_dense.argtypes = [
            i32p, ctypes.c_int64, u8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, u8p, u8p,
        ]
        _dense_configured = True
    return lib


def blob_id_from_lines(lines: np.ndarray) -> int:
    """Position/size hash of a blob — the reference's pv::bid.

    Packing (commons misc/bid.h is an absent submodule; formula
    reverse-engineered exactly against the golden fixture CSVs — all
    frame-0 blobids reproduce bit-identically):

        bid = (round_half_up((x0 + x1) / 2) << 19)   # first-line center x
            | (y0 << 6)                              # first-line y
            | (n_lines & 0x3F)                       # line count, 6 bits
    """
    if len(lines) == 0:
        return 0
    x_center = (int(lines[0, 1]) + int(lines[0, 2]) + 1) // 2  # half-up
    y0 = int(lines[0, 0])
    return ((x_center << 19) | (y0 << 6) | (len(lines) & 0x3F)) & 0xFFFFFFFF


class TrackBlob:
    """A candidate object during tracking.

    `lines`/`pixels` come from detection (pv frame); `background` is the
    session background image used for thresholded recounts.
    """

    __slots__ = ("lines", "pixels", "parent_id", "split", "flags",
                 "_bid", "_bounds", "_recount_cache", "_last_recount",
                 "_diff_cached", "stats", "tags", "prediction",
                 "store_pixels")  # encoded color pixels for pv storage

    def __init__(self, lines: np.ndarray, pixels: Optional[np.ndarray],
                 flags: int = 0, parent_id: int = -1, split: bool = False,
                 stats: Optional[np.ndarray] = None):
        self.lines = np.asarray(lines, dtype=np.int32)
        self.pixels = pixels if pixels is None else np.asarray(pixels, np.uint8)
        self.flags = flags
        self.parent_id = parent_id
        self.split = split
        self._bid = None
        self._bounds = None
        self._recount_cache: dict = {}
        self._last_recount: Optional[int] = None
        self._diff_cached = None
        # optional per-blob summary from the native labeler
        # (8 doubles: n_px, track_count, sum_x, sum_y, sxx, syy, sxy, _)
        self.stats = stats
        self.prediction = None
        self.store_pixels = None

    # -- identity ------------------------------------------------------
    @property
    def blob_id(self) -> int:
        if self._bid is None:
            self._bid = blob_id_from_lines(self.lines)
        return self._bid

    # -- geometry ------------------------------------------------------
    @property
    def bounds(self):
        """(x, y, w, h)"""
        if self._bounds is None:
            ls = self.lines
            x0 = int(ls[:, 1].min())
            y0 = int(ls[0, 0])
            x1 = int(ls[:, 2].max())
            y1 = int(ls[-1, 0])
            self._bounds = (x0, y0, x1 - x0 + 1, y1 - y0 + 1)
        return self._bounds

    @property
    def bbox_center(self):
        """Bounding-box center — used by the matching probability
        (Individual.cpp:2186-2194 uses bounds.pos()+size*0.5)."""
        x, y, w, h = self.bounds
        return (x + w * 0.5, y + h * 0.5)

    @property
    def center(self):
        """Mask centroid (image moments) — pv::Blob::center() after
        calculate_moments(); this is what the stored centroid MotionRecord
        and the X/Y#wcentroid outputs use (golden CSVs confirm)."""
        if self.stats is not None:
            n = self.stats[0]
            return (float(self.stats[2] / n), float(self.stats[3] / n))
        ys, x0s, x1s = self.lines[:, 0], self.lines[:, 1], self.lines[:, 2]
        w = (x1s - x0s + 1).astype(np.float64)
        n = w.sum()
        cx = float((0.5 * (x0s + x1s) * w).sum() / n)
        cy = float((ys * w).sum() / n)
        return (cx, cy)

    @property
    def num_pixels(self) -> int:
        if self.stats is not None:
            return int(self.stats[0])
        return int(np.sum(self.lines[:, 2] - self.lines[:, 1] + 1))

    @property
    def orientation(self) -> float:
        """Principal-axis angle from image moments of the mask."""
        if self.stats is not None:
            n, _, sx, sy, sx2, sy2, sxy = self.stats[:7]
            cx, cy = sx / n, sy / n
            mu20 = sx2 - cx * sx
            mu02 = sy2 - cy * sy
            mu11 = sxy - cx * sy
            if mu20 == mu02 and mu11 == 0:
                return 0.0
            return 0.5 * math.atan2(2 * mu11, mu20 - mu02)
        ys, x0s, x1s = self.lines[:, 0], self.lines[:, 1], self.lines[:, 2]
        w = (x1s - x0s + 1).astype(np.float64)
        n = w.sum()
        cx = float((0.5 * (x0s + x1s) * w).sum() / n)
        cy = float((ys * w).sum() / n)
        # second moments using exact sums over runs
        # sum x^2 over run [a,b] = (b(b+1)(2b+1) - (a-1)a(2a-1)) / 6
        a = x0s.astype(np.float64)
        b = x1s.astype(np.float64)
        sx2 = ((b * (b + 1) * (2 * b + 1) - (a - 1) * a * (2 * a - 1)) / 6.0).sum()
        sx = (0.5 * (a + b) * w).sum()
        mu20 = sx2 - 2 * cx * sx + cx * cx * n
        mu02 = float(((ys - cy) ** 2 * w).sum())
        mu11 = float((((0.5 * (a + b)) - cx) * (ys - cy) * w).sum())
        if mu20 == mu02 and mu11 == 0:
            return 0.0
        return 0.5 * math.atan2(2 * mu11, mu20 - mu02)

    # -- thresholded recount (pv::Blob::recount) -------------------------
    def raw_recount(self, threshold: int, background: Optional[np.ndarray],
                    absolute: bool, use_bgsub: bool) -> int:
        """Pixel count above `threshold` vs background (count in px)."""
        if threshold <= 0 or self.pixels is None or background is None \
                or not use_bgsub:
            if threshold <= 0 or self.pixels is None:
                return self.num_pixels
            # no background: threshold raw pixel values
            return int(np.count_nonzero(self.pixels >= threshold))
        diff = self._diff_values(background)
        if absolute:
            return int(np.count_nonzero(np.abs(diff) >= threshold))
        return int(np.count_nonzero(diff >= threshold))

    def _diff_values(self, background: np.ndarray) -> np.ndarray:
        """(bg - px) per mask pixel, int16, scan order (cached)."""
        if self._diff_cached is not None:
            return self._diff_cached
        ls = self.lines
        widths = ls[:, 2] - ls[:, 1] + 1
        # flat background gather: for each line, bg row offset + x range
        w = background.shape[1]
        starts = ls[:, 0].astype(np.int64) * w + ls[:, 1]
        total = int(widths.sum())
        # per-pixel flat indices: start + arange(width) per line
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(widths[:-1])]), widths)
        flat = np.repeat(starts, widths) + offs
        bg_vals = background.reshape(-1)[flat].astype(np.int16)
        out = bg_vals - self.pixels.astype(np.int16)
        self._diff_cached = out
        return out

    def recount(self, threshold: int, background=None, settings=None) -> float:
        """Thresholded size in cm^2 (cached), like pv::Blob::recount."""
        if threshold == -1:
            if self._last_recount is None:
                raise ValueError("no recount cached yet")
            return self._recount_cache[self._last_recount]
        if threshold not in self._recount_cache:
            if settings is not None:
                absolute = bool(settings["track_threshold_is_absolute"])
                use_bgsub = bool(settings["track_background_subtraction"])
                cm = settings["cm_per_pixel"] or 1.0
            else:
                absolute, use_bgsub, cm = True, True, 1.0
            cnt = self.raw_recount(threshold, background, absolute, use_bgsub)
            self._recount_cache[threshold] = cnt * cm * cm
        self._last_recount = threshold
        return self._recount_cache[threshold]

    def force_set_recount(self, threshold: int,
                          value_px2: Optional[float] = None,
                          settings=None):
        """Cache a recount from a PIXEL count (scaled to cm^2 here) —
        pv::Blob::force_set_recount takes raw pixels too."""
        cm = (settings["cm_per_pixel"] if settings else 1.0) or 1.0
        self._recount_cache[threshold] = (
            value_px2 * cm * cm if value_px2 is not None
            else self.num_pixels * cm * cm
        )
        self._last_recount = threshold

    # -- mask/pixel utilities -------------------------------------------
    def to_dense(self, pad: int = 0):
        """(mask, gray, (ox, oy)): dense uint8 crops of the blob.
        Rasterizes natively (trex_blob_dense); the python loop below is
        the fallback."""
        x, y, w, h = self.bounds
        H, W = h + 2 * pad, w + 2 * pad
        mask = np.zeros((H, W), np.uint8)
        gray = np.zeros_like(mask)
        try:
            import ctypes

            lib = _dense_lib()
            lines = np.ascontiguousarray(self.lines, np.int32)
            px = self.pixels
            if px is not None:
                px = np.ascontiguousarray(px, np.uint8)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.trex_blob_dense(
                lines.ctypes.data_as(i32p), len(lines),
                px.ctypes.data_as(u8p) if px is not None else None,
                int(x), int(y), W, H, int(pad),
                mask.ctypes.data_as(u8p), gray.ctypes.data_as(u8p))
            return mask, gray, (x - pad, y - pad)
        except OSError:
            pass
        i = 0
        for ly, x0, x1 in self.lines:
            n = x1 - x0 + 1
            r = ly - y + pad
            c = x0 - x + pad
            mask[r, c : c + n] = 1
            if self.pixels is not None:
                gray[r, c : c + n] = self.pixels[i : i + n]
            i += n
        return mask, gray, (x - pad, y - pad)

    def threshold_pixels(self, threshold: int, background: np.ndarray,
                         settings) -> "TrackBlob":
        """New blob keeping only pixels passing the track threshold test
        (lines re-segmented; pixel::threshold_blob equivalent)."""
        absolute = bool(settings["track_threshold_is_absolute"])
        keep = self._threshold_mask(threshold, background, absolute)
        return self._rebuild_from_mask(keep)

    def _threshold_mask(self, threshold: int, background, absolute) -> np.ndarray:
        diff = self._diff_values(background)
        if absolute:
            return np.abs(diff) >= threshold
        return diff >= threshold

    def _rebuild_from_mask(self, keep: np.ndarray) -> "TrackBlob":
        new_lines = []
        new_pixels = []
        i = 0
        for y, x0, x1 in self.lines:
            n = x1 - x0 + 1
            seg = keep[i : i + n]
            px = self.pixels[i : i + n] if self.pixels is not None else None
            # split kept pixels into runs
            if seg.any():
                idx = np.flatnonzero(seg)
                splits = np.flatnonzero(np.diff(idx) > 1)
                starts = np.concatenate([[0], splits + 1])
                ends = np.concatenate([splits, [len(idx) - 1]])
                for s, e in zip(starts, ends):
                    a, b = idx[s], idx[e]
                    new_lines.append((y, x0 + a, x0 + b))
                    if px is not None:
                        new_pixels.append(px[a : b + 1])
            i += n
        if not new_lines:
            return TrackBlob(np.zeros((0, 3), np.int32),
                             np.zeros((0,), np.uint8),
                             flags=self.flags, parent_id=self.blob_id)
        lines = np.array(new_lines, np.int32)
        pixels = (np.concatenate(new_pixels) if new_pixels else None)
        return TrackBlob(lines, pixels, flags=self.flags,
                         parent_id=self.blob_id)
