"""Physical tag (QR-ish) detection inside blobs.

Re-creates track::tags (reference tracking/DetectTag.{h,cpp}):
- prettify_blobs: extract square, upright crops of candidate tag regions
  from blobs (grey + binary mask)
- is_good_image: variance-of-Laplacian quality score — sharp, high-
  contrast squares rank as likely tags
- tags are matched to the nearest fish per frame via the Hungarian
  matcher (Tracker.cpp:2056-2108) and saved to `tags_path` as NPZ.
Tag payload decoding (pretrained_tagwork model) plugs in through
`decode_fn` — the bundled default is a plain ArUco-style threshold
sampler when OpenCV's aruco module is present.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional

import numpy as np

from .blob import TrackBlob


@dataclass
class Tag:
    variance: float
    blob_id: int
    image: np.ndarray  # (S, S) grey crop
    mask: np.ndarray
    frame: int = -1
    tag_id: int = -1
    p: float = 1.0  # decode confidence (blob::Prediction-style tag.p)
    center: tuple = (0.0, 0.0)


def prettify_blobs(blobs: list[TrackBlob], background: np.ndarray,
                   crop_size: int = 32, max_size=None) -> list[Tag]:
    """Square grey/mask crops around each blob candidate; crops wider
    than `max_size` (tags_maximum_image_size) are center-cropped."""
    import cv2

    out = []
    for b in blobs:
        mask, grey, (ox, oy) = b.to_dense(pad=2)
        if max_size is not None:
            mw, mh = int(max_size[0]), int(max_size[1])
            if grey.shape[0] > mh or grey.shape[1] > mw:
                cy0 = max(0, (grey.shape[0] - mh) // 2)
                cx0 = max(0, (grey.shape[1] - mw) // 2)
                grey = grey[cy0:cy0 + mh, cx0:cx0 + mw]
                mask = mask[cy0:cy0 + mh, cx0:cx0 + mw]
        h, w = grey.shape
        side = max(h, w)
        sq_g = np.zeros((side, side), np.uint8)
        sq_m = np.zeros((side, side), np.uint8)
        y0 = (side - h) // 2
        x0 = (side - w) // 2
        sq_g[y0 : y0 + h, x0 : x0 + w] = grey
        sq_m[y0 : y0 + h, x0 : x0 + w] = mask
        sq_g = cv2.resize(sq_g, (crop_size, crop_size),
                          interpolation=cv2.INTER_AREA)
        sq_m = cv2.resize(sq_m, (crop_size, crop_size),
                          interpolation=cv2.INTER_NEAREST)
        tag = is_good_image(sq_g, sq_m)
        tag.blob_id = b.blob_id
        tag.center = b.center
        out.append(tag)
    return out


def is_good_image(grey: np.ndarray, mask: np.ndarray) -> Tag:
    """Variance-of-Laplacian sharpness score over the mask interior
    (DetectTag is_good_image: high interior contrast = tag-like)."""
    try:
        import cv2

        lap = cv2.Laplacian(grey, cv2.CV_64F)
        interior = cv2.erode((mask > 0).astype(np.uint8),
                             np.ones((3, 3), np.uint8)) > 0
    except ImportError:  # pragma: no cover
        gy, gx = np.gradient(grey.astype(np.float64))
        lap = gx ** 2 + gy ** 2
        interior = mask > 0
    vals = lap[interior]
    variance = float(vals.var()) if vals.size else 0.0
    return Tag(variance=variance, blob_id=-1, image=grey, mask=mask)


def _tag_shape_ok(tag: Tag, settings) -> bool:
    """tags_threshold / tags_equalize_hist / tags_num_sides
    (grabber default_config; DetectTag's adaptive-threshold contour
    test): adaptively threshold the crop, approximate the largest
    contour as a polygon, accept side counts inside tags_num_sides."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        return True
    img = tag.image
    if settings["tags_equalize_hist"]:
        img = cv2.equalizeHist(img)
    c = int(settings["tags_threshold"])
    m = cv2.adaptiveThreshold(img, 255, cv2.ADAPTIVE_THRESH_MEAN_C,
                              cv2.THRESH_BINARY if c >= 0
                              else cv2.THRESH_BINARY_INV,
                              11, -abs(c))
    m = m & (tag.mask > 0).astype(np.uint8) * 255
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return False
    big = max(contours, key=cv2.contourArea)
    # tags_approximation: polygon coarseness (fraction of the contour
    # perimeter used as the approxPolyDP epsilon; grabber doc)
    eps = float(settings["tags_approximation"] or 0.025)
    approx = cv2.approxPolyDP(big, eps * cv2.arcLength(big, True),
                              True)
    lo, hi = settings["tags_num_sides"]
    return lo <= len(approx) <= hi


def detect_tags(noise_blobs: list[TrackBlob], background: np.ndarray,
                frame: int, min_variance: float = 100.0,
                decode_fn: Optional[Callable] = None,
                settings=None) -> list[Tag]:
    """Candidate tags among the noise blobs of a frame. With settings,
    the tags_size_range area gate and the tags_threshold/
    tags_num_sides polygon test apply (DetectTag.cpp candidates)."""
    blobs = noise_blobs
    if settings is not None:
        cm = settings["cm_per_pixel"] or 1.0
        lo, hi = settings["tags_size_range"]
        blobs = [b for b in blobs
                 if lo <= b.num_pixels * cm * cm <= hi]
    max_size = settings["tags_maximum_image_size"] \
        if settings is not None else None
    tags = [t for t in prettify_blobs(blobs, background,
                                      max_size=max_size)
            if t.variance >= min_variance]
    if settings is not None and settings["tags_debug"]:
        print(f"[tags] frame {frame}: {len(blobs)} candidates, "
              f"{len(tags)} past variance gate")
    if settings is not None:
        tags = [t for t in tags if _tag_shape_ok(t, settings)]
    for t in tags:
        t.frame = frame
        if decode_fn is not None:
            got = decode_fn(t.image)
            # ML decoders return (id, confidence); the plain ArUco
            # threshold decoder returns a bare id (p stays 1.0)
            if isinstance(got, tuple):
                t.tag_id, t.p = int(got[0]), float(got[1])
            else:
                t.tag_id = int(got)
    return tags


def match_tags_to_fish(tags: list[Tag], tracker, frame: int,
                       max_distance: float = 80.0) -> dict[int, Tag]:
    """Hungarian tag<->fish matching by distance (Tracker.cpp:2056-2108).
    Returns {identity: tag}."""
    from scipy.optimize import linear_sum_assignment

    fish = [(fid, ind.basic_stuff(frame))
            for fid, ind in sorted(tracker.individuals.items())]
    fish = [(fid, b) for fid, b in fish if b is not None]
    if not fish or not tags:
        return {}
    cost = np.full((len(fish), len(tags)), 1e6)
    for i, (fid, b) in enumerate(fish):
        fx, fy = b.centroid.pos
        for j, t in enumerate(tags):
            d = np.hypot(fx - t.center[0], fy - t.center[1])
            if d <= max_distance:
                cost[i, j] = d
    rows, cols = linear_sum_assignment(cost)
    return {fish[r][0]: tags[c] for r, c in zip(rows, cols)
            if cost[r, c] < 1e6}


def save_tags(path, tags_by_fish: dict[int, list[Tag]]):
    """NPZ layout per reference tags_path exports."""
    arrays = {}
    for fid, tags in tags_by_fish.items():
        if not tags:
            continue
        arrays[f"fish{fid}_frames"] = np.array([t.frame for t in tags])
        arrays[f"fish{fid}_ids"] = np.array([t.tag_id for t in tags])
        arrays[f"fish{fid}_variances"] = np.array(
            [t.variance for t in tags])
        arrays[f"fish{fid}_images"] = np.stack([t.image for t in tags])
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)
    return path
