"""Connected-component blob extraction (host fast path).

Binds native/labeling.cpp: line-run union-find labeling with
8-connectivity over thresholded background-difference images, the
equivalent of the reference's commons `CPULabeling::run` +
`RawProcessing::generate_binary` combination
(reference BackgroundSubtraction.cpp:126-347).
"""
from __future__ import annotations

import ctypes
import threading
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..io.lzo import _load as _load_native


@dataclass
class Blob:
    """One connected component: RLE lines + raw pixel values."""

    lines: np.ndarray  # (K, 3) int32 [y, x0, x1 inclusive]
    pixels: np.ndarray  # (num_pixels,) uint8, scan order
    stats: Optional[np.ndarray] = None  # (8,) n_px, track_count, moments

    @property
    def num_pixels(self) -> int:
        return int(self.pixels.size) if self.pixels is not None else int(
            np.sum(self.lines[:, 2] - self.lines[:, 1] + 1)
        )

    def bounds(self):
        """(x, y, w, h) bounding box."""
        ys = self.lines[:, 0]
        return (
            int(self.lines[:, 1].min()), int(ys.min()),
            int(self.lines[:, 2].max() - self.lines[:, 1].min() + 1),
            int(ys.max() - ys.min() + 1),
        )

    def center(self):
        """Pixel-count-weighted center of the mask (bbox-free centroid)."""
        w = (self.lines[:, 2] - self.lines[:, 1] + 1).astype(np.float64)
        cx = (self.lines[:, 1] + self.lines[:, 2]) * 0.5
        n = w.sum()
        return (float((cx * w).sum() / n), float((self.lines[:, 0] * w).sum() / n))


_configured = False
_cfg_lock = threading.Lock()


def _lib():
    global _configured
    lib = _load_native()
    if _configured:
        return lib
    with _cfg_lock:
        return _configure(lib)


def _configure(lib):
    global _configured
    if not _configured:
        lib.trex_label_image.restype = ctypes.c_void_p
        lib.trex_label_image.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.trex_label_image2.restype = ctypes.c_void_p
        lib.trex_label_image2.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.trex_label_stats.restype = ctypes.POINTER(ctypes.c_double)
        lib.trex_label_stats.argtypes = [ctypes.c_void_p]
        for fn in ("n_blobs", "n_lines", "n_pixels"):
            getattr(lib, f"trex_label_{fn}").restype = ctypes.c_int64
            getattr(lib, f"trex_label_{fn}").argtypes = [ctypes.c_void_p]
        lib.trex_label_blob_line_start.restype = ctypes.POINTER(ctypes.c_uint32)
        lib.trex_label_blob_line_start.argtypes = [ctypes.c_void_p]
        lib.trex_label_blob_pixel_start.restype = ctypes.POINTER(ctypes.c_uint32)
        lib.trex_label_blob_pixel_start.argtypes = [ctypes.c_void_p]
        lib.trex_label_lines.restype = ctypes.POINTER(ctypes.c_int32)
        lib.trex_label_lines.argtypes = [ctypes.c_void_p]
        lib.trex_label_pixels.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.trex_label_pixels.argtypes = [ctypes.c_void_p]
        lib.trex_label_free.restype = None
        lib.trex_label_free.argtypes = [ctypes.c_void_p]
        lib.trex_label_fill.restype = None
        lib.trex_label_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.trex_split_sizes.restype = None
        lib.trex_split_sizes.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.trex_expectation.restype = None
        lib.trex_expectation.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),
        ]
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.trex_track_caches.restype = None
        lib.trex_track_caches.argtypes = [
            ctypes.c_int32, ctypes.c_int64, ctypes.c_double,
            ctypes.c_int64,
            i64p, f64p, i64p, i64p, i32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double, ctypes.c_double,
            ctypes.c_int32, ctypes.c_int32,
            f64p, f64p,
        ]
        lib.trex_track_match.restype = ctypes.c_int64
        lib.trex_track_match.argtypes = [
            i32p, ctypes.c_int32,
            f64p, f64p, f64p, f64p,
            f64p, f64p, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_int32,
            i32p, f64p,
            i32p, i32p, f64p, ctypes.c_int64,
        ]
        lib.trex_track_reactivate.restype = None
        lib.trex_track_reactivate.argtypes = [
            i32p, ctypes.c_int32,
            ctypes.c_char_p,
            f64p, f64p, f64p,
            i32p, ctypes.c_int32,
            f64p, f64p,
            ctypes.c_double, i32p,
        ]
        lib.trex_blob_stats.restype = None
        lib.trex_blob_stats.argtypes = [
            i32p, i64p, ctypes.c_char_p, i64p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, f64p,
        ]
        lib.trex_split_execute.restype = ctypes.c_int32
        lib.trex_split_execute.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            f64p, ctypes.c_int32,
            ctypes.c_int32, f64p,
        ]
        i64p_ = ctypes.POINTER(ctypes.c_int64)
        lib.trex_split_execute_batch.restype = ctypes.c_int32
        lib.trex_split_execute_batch.argtypes = [
            i32p, ctypes.c_char_p,
            i64p_, i64p_, i64p_, i32p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            f64p, ctypes.c_int32,
            ctypes.c_int32, f64p, i32p,
        ]
        lib.trex_threshold_blob.restype = ctypes.c_void_p
        lib.trex_threshold_blob.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.trex_split_scan.restype = ctypes.c_int32
        lib.trex_split_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
        ]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.trex_mode_u8_rows.restype = None
        lib.trex_mode_u8_rows.argtypes = [
            ctypes.POINTER(u8p), ctypes.c_int64, ctypes.c_int64, u8p,
        ]
        lib.trex_mean_u8.restype = None
        lib.trex_mean_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.c_int64, u8p,
        ]
        _configured = True
    return lib


def expectation_native(fish: np.ndarray, lines: np.ndarray,
                       row_lo: np.ndarray, row_hi: np.ndarray,
                       bounds: np.ndarray, max_d: float) -> np.ndarray:
    """History-split expectation counts (native, full pipeline: bbox
    proximity, grid-point sampling, mask distances, clique conflict
    resolution). fish (F,2) float64; lines (L,3) int32 (the frame's
    base line array); row_lo/row_hi (N,) int64 per-blob ranges into it;
    bounds (N,4) float64 [x0,y0,x1,y1]. Returns (N,) int32."""
    fish = np.ascontiguousarray(fish, np.float64)
    lines = np.ascontiguousarray(lines, np.int32)
    row_lo = np.ascontiguousarray(row_lo, np.int64)
    row_hi = np.ascontiguousarray(row_hi, np.int64)
    bounds = np.ascontiguousarray(bounds, np.float64)
    nf = len(fish)
    nb = len(bounds)
    out = np.zeros(nb, np.int32)
    if nf == 0 or nb == 0:
        return out
    _lib().trex_expectation(
        fish.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nf,
        lines.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        row_lo.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        row_hi.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nb,
        float(max_d),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def split_execute(lines: np.ndarray, pixels: np.ndarray,
                  background: np.ndarray, initial: int, absolute: bool,
                  expected: int, cm_sqr: float, max_shrink: float,
                  shrink_limit: float, ranges,
                  max_pieces: int = 64) -> np.ndarray:
    """One-shot native blob split (scan + materialize). Returns
    (n_pieces, 7) float64 rows [num_pixels, x0, y0, x1, y1, sum_x,
    sum_y] in frame coordinates, size-descending, shrink-filtered;
    empty when no acceptable split exists."""
    lines = np.ascontiguousarray(lines, np.int32)
    pixels = np.ascontiguousarray(pixels, np.uint8)
    background = np.ascontiguousarray(background, np.uint8)
    r = np.ascontiguousarray(ranges if ranges is not None and len(ranges) else [], np.float64).reshape(-1, 2)
    out = np.zeros((max_pieces, 7))
    h, w = background.shape
    n = _lib().trex_split_execute(
        lines.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(lines), pixels.ctypes.data_as(ctypes.c_char_p),
        background.ctypes.data_as(ctypes.c_char_p), w, h,
        int(initial), 1 if absolute else 0, int(expected),
        float(cm_sqr), float(max_shrink), float(shrink_limit),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), r.shape[0],
        max_pieces, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out[:n]


class SplitExecutor:
    """Pre-bound split_execute for a fixed background + size filter:
    the per-frame history-split loop calls this dozens of times per
    frame, so the background/ranges marshalling and the argtype lookups
    are hoisted out of the call (same results as split_execute)."""

    def __init__(self, background: np.ndarray, ranges,
                 max_pieces: int = 64):
        self._lib = _lib()
        self._bg = np.ascontiguousarray(background, np.uint8)
        self._bg_p = self._bg.ctypes.data_as(ctypes.c_char_p)
        self._h, self._w = self._bg.shape
        r = np.ascontiguousarray(
            ranges if ranges is not None and len(ranges) else [],
            np.float64).reshape(-1, 2)
        self._r = r
        self._r_p = r.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        self._nr = r.shape[0]
        self._max_pieces = max_pieces
        self._out = np.empty((max_pieces, 7))
        self._out_p = self._out.ctypes.data_as(
            ctypes.POINTER(ctypes.c_double))
        self._i32p = ctypes.POINTER(ctypes.c_int32)

    def run(self, lines: np.ndarray, pixels: np.ndarray, initial: int,
            absolute: bool, expected: int, cm_sqr: float,
            max_shrink: float, shrink_limit: float) -> np.ndarray:
        lines = np.ascontiguousarray(lines, np.int32)
        pixels = np.ascontiguousarray(pixels, np.uint8)
        n = self._lib.trex_split_execute(
            lines.ctypes.data_as(self._i32p), len(lines),
            pixels.ctypes.data_as(ctypes.c_char_p), self._bg_p,
            self._w, self._h, int(initial), 1 if absolute else 0,
            int(expected), float(cm_sqr), float(max_shrink),
            float(shrink_limit), self._r_p, self._nr,
            self._max_pieces, self._out_p)
        return self._out[:n].copy()

    def run_batch(self, lines: np.ndarray, pixels: np.ndarray,
                  line_lo, line_hi, pixel_lo, expected,
                  initial: int, absolute: bool, cm_sqr: float,
                  max_shrink: float, shrink_limit: float) -> list:
        """All of a frame's table-backed splits in one native call.
        Per job j, splits lines[line_lo[j]:line_hi[j]] with pixels at
        offset pixel_lo[j]; returns [ (n_j, 7) float64 ] per job —
        identical rows to per-job `run` calls."""
        lines = np.ascontiguousarray(lines, np.int32)
        pixels = np.ascontiguousarray(pixels, np.uint8)
        lo = np.ascontiguousarray(line_lo, np.int64)
        hi = np.ascontiguousarray(line_hi, np.int64)
        plo = np.ascontiguousarray(pixel_lo, np.int64)
        exp = np.ascontiguousarray(expected, np.int32)
        n_jobs = len(lo)
        out = np.empty((n_jobs, self._max_pieces, 7))
        counts = np.empty(n_jobs, np.int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        self._lib.trex_split_execute_batch(
            lines.ctypes.data_as(self._i32p),
            pixels.ctypes.data_as(ctypes.c_char_p),
            lo.ctypes.data_as(i64p), hi.ctypes.data_as(i64p),
            plo.ctypes.data_as(i64p),
            exp.ctypes.data_as(self._i32p), n_jobs,
            self._bg_p, self._w, self._h,
            int(initial), 1 if absolute else 0,
            float(cm_sqr), float(max_shrink), float(shrink_limit),
            self._r_p, self._nr, self._max_pieces,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            counts.ctypes.data_as(self._i32p))
        return [out[j, :counts[j]].copy() for j in range(n_jobs)]


def split_scan(image: np.ndarray, background: Optional[np.ndarray],
               initial: int, absolute: bool, expected: int,
               cm_sqr: float, max_shrink: float, shrink_limit: float,
               ranges) -> tuple[int, float]:
    """Native threshold-escalation scan with the SplitBlob evaluation
    fused in (early stop at the first keep/abort). Returns
    (best_threshold or -1, first_size in cm^2)."""
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = image.shape
    bg_ptr = None
    if background is not None:
        background = np.ascontiguousarray(background, dtype=np.uint8)
        bg_ptr = background.ctypes.data_as(ctypes.c_char_p)
    r = np.ascontiguousarray(ranges if ranges is not None and len(ranges) else [], np.float64).reshape(-1, 2)
    first_size = ctypes.c_double(0.0)
    thr = _lib().trex_split_scan(
        image.ctypes.data_as(ctypes.c_char_p), bg_ptr, w, h,
        int(initial), 1 if absolute else 0, int(expected),
        float(cm_sqr), float(max_shrink), float(shrink_limit),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), r.shape[0],
        ctypes.byref(first_size))
    return int(thr), float(first_size.value)


def split_sizes(image: np.ndarray, background: Optional[np.ndarray],
                thresholds, absolute: bool = True,
                top_k: int = 16) -> np.ndarray:
    """Component-size scan over several thresholds (SplitBlob support).

    Returns int64 (n_thr, 2 + top_k): per threshold [n_components,
    total_fg_pixels, top_k sizes descending (0-padded)]. Sizes equal the
    per-component num_pixels a full `label_blobs` call would produce for
    the same (image, background, threshold, absolute) inputs.
    """
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = image.shape
    bg_ptr = None
    if background is not None:
        background = np.ascontiguousarray(background, dtype=np.uint8)
        bg_ptr = background.ctypes.data_as(ctypes.c_char_p)
    thr = np.ascontiguousarray(thresholds, dtype=np.int32)
    out = np.zeros((thr.size, 2 + top_k), np.int64)
    _lib().trex_split_sizes(
        image.ctypes.data_as(ctypes.c_char_p), bg_ptr, w, h,
        thr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), thr.size,
        1 if absolute else 0, top_k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def label_blobs_raw(
    image: np.ndarray,
    background: Optional[np.ndarray] = None,
    threshold: int = 0,
    absolute: bool = True,
    track_threshold: int = 0,
    track_absolute: bool = True,
) -> dict:
    """Like label_blobs but returns the labeler's raw flat arrays
    (no per-blob Python objects) — the FastTracker engine's input:
    {lines (L,3) i32, pixels (P,) u8, line_start (N+1,) u32,
     pixel_start (N+1,) u32, stats (N,8) f64}."""
    image = np.ascontiguousarray(image, dtype=np.uint8)
    if image.ndim != 2:
        raise ValueError("label_blobs_raw expects a single-channel image")
    h, w = image.shape
    bg_ptr = None
    if background is not None:
        background = np.ascontiguousarray(background, dtype=np.uint8)
        if background.shape != image.shape:
            raise ValueError("background shape mismatch")
        bg_ptr = background.ctypes.data_as(ctypes.c_char_p)
    lib = _lib()
    ctx = lib.trex_label_image2(
        image.ctypes.data_as(ctypes.c_char_p), bg_ptr,
        w, h, int(threshold), 1 if absolute else 0,
        int(track_threshold), 1 if track_absolute else 0,
    )
    try:
        n_blobs = lib.trex_label_n_blobs(ctx)
        n_lines = lib.trex_label_n_lines(ctx)
        n_pixels = lib.trex_label_n_pixels(ctx)
        lines = np.empty((n_lines, 3), np.int32)
        pixels = np.empty(n_pixels, np.uint8)
        line_start = np.empty(n_blobs + 1, np.int64)
        pixel_start = np.empty(n_blobs + 1, np.int64)
        stats = np.empty((n_blobs, 8), np.float64)
        lib.trex_label_fill(
            ctx,
            lines.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pixels.ctypes.data_as(ctypes.c_char_p),
            line_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            pixel_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            stats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    finally:
        lib.trex_label_free(ctx)
    return {"lines": lines, "pixels": pixels,
            "line_start": line_start, "pixel_start": pixel_start,
            "stats": stats}


def label_blobs(
    image: np.ndarray,
    background: Optional[np.ndarray] = None,
    threshold: int = 0,
    absolute: bool = True,
    track_threshold: int = 0,
    track_absolute: bool = True,
) -> list[Blob]:
    """Extract connected components from a grayscale image.

    threshold <= 0: components of nonzero pixels of `image`.
    background given: foreground test is |img-bg| >= threshold (absolute)
    or (bg-img) >= threshold (signed, darker-than-background).
    Returned pixel values are the raw `image` values under the mask.
    """
    image = np.ascontiguousarray(image, dtype=np.uint8)
    if image.ndim != 2:
        raise ValueError("label_blobs expects a single-channel image")
    h, w = image.shape
    bg_ptr = None
    if background is not None:
        background = np.ascontiguousarray(background, dtype=np.uint8)
        if background.shape != image.shape:
            raise ValueError(
                f"background shape {background.shape} != image {image.shape}"
            )
        bg_ptr = background.ctypes.data_as(ctypes.c_char_p)
    lib = _lib()
    ctx = lib.trex_label_image2(
        image.ctypes.data_as(ctypes.c_char_p), bg_ptr,
        w, h, int(threshold), 1 if absolute else 0,
        int(track_threshold), 1 if track_absolute else 0,
    )
    return _blobs_from_ctx(lib, ctx)


def threshold_blob_native(lines: np.ndarray, pixels: np.ndarray,
                          background: np.ndarray, threshold: int,
                          absolute: bool) -> list[Blob]:
    """pixel::threshold_blob in one native call (trex_threshold_blob):
    rasterize the blob crop with background fill, label at `threshold`,
    return children with image-space lines and shifted stats."""
    lines = np.ascontiguousarray(lines, np.int32)
    pixels = np.ascontiguousarray(pixels, np.uint8)
    background = np.ascontiguousarray(background, np.uint8)
    lib = _lib()
    ctx = lib.trex_threshold_blob(
        lines.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(lines),
        pixels.ctypes.data_as(ctypes.c_char_p),
        background.ctypes.data_as(ctypes.c_char_p),
        background.shape[1], background.shape[0],
        int(threshold), 1 if absolute else 0)
    return _blobs_from_ctx(lib, ctx)


def _blobs_from_ctx(lib, ctx) -> list[Blob]:
    try:
        n_blobs = lib.trex_label_n_blobs(ctx)
        n_lines = lib.trex_label_n_lines(ctx)
        n_pixels = lib.trex_label_n_pixels(ctx)
        if n_blobs == 0:
            return []
        line_start = np.ctypeslib.as_array(
            lib.trex_label_blob_line_start(ctx), (n_blobs + 1,)
        ).copy()
        pixel_start = np.ctypeslib.as_array(
            lib.trex_label_blob_pixel_start(ctx), (n_blobs + 1,)
        ).copy()
        lines = np.ctypeslib.as_array(
            lib.trex_label_lines(ctx), (n_lines, 3)
        ).copy() if n_lines else np.zeros((0, 3), np.int32)
        pixels = np.ctypeslib.as_array(
            lib.trex_label_pixels(ctx), (n_pixels,)
        ).copy() if n_pixels else np.zeros((0,), np.uint8)
        stats = np.ctypeslib.as_array(
            lib.trex_label_stats(ctx), (n_blobs, 8)
        ).copy()
    finally:
        lib.trex_label_free(ctx)
    blobs = []
    for b in range(n_blobs):
        blobs.append(
            Blob(
                lines=lines[line_start[b] : line_start[b + 1]],
                pixels=pixels[pixel_start[b] : pixel_start[b + 1]],
                stats=stats[b],
            )
        )
    return blobs
