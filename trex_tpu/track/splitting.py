"""Blob splitting by threshold escalation.

Re-creates the roles of the reference's SplitBlob (tracking/SplitBlob.h:
33-70 — raise the threshold step by step, re-run connected components,
score candidate splits by size ratio) and HistorySplit (tracking/
HistorySplit.h — decide how many individuals each blob is expected to
contain from per-identity history, then drive the splits).

The escalation loop is a fresh design with the same contract:
- never shrink a candidate below blob_split_global_shrink_limit *
  min(track_size_filter) nor below blob_split_max_shrink * original size
- prefer the lowest threshold that yields the requested number of
  fish-sized components
- failure returns [] and the caller treats the blob as unsplittable.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .blob import TrackBlob
from .prefilter import SizeFilters, threshold_components

MAX_THRESHOLD = 255


def _evaluate_split(expected: int, first_size: float, comps: list,
                    settings, cm_sqr: float, fish_size: SizeFilters) -> str:
    """SplitBlob::evaluate_result_multiple (SplitBlob.cpp:190-245).
    Returns 'abort' (shrunk too far -> stop raising), 'remove' (pieces
    still too big -> raise further), 'too_few', or 'keep'.
    Mutates `comps`: drops pieces below the global shrink limit."""
    total = sum(c.num_pixels for c in comps) * cm_sqr
    if total < settings["blob_split_max_shrink"] * first_size:
        return "abort"
    if fish_size:
        min_thresh = fish_size.max_range[0] * \
            settings["blob_split_global_shrink_limit"]
    else:
        min_thresh = total * settings["blob_split_max_shrink"]
    comps[:] = [c for c in comps if c.num_pixels * cm_sqr >= min_thresh]
    valid = 0
    min_size = None
    for c in comps[:expected]:
        s = c.num_pixels
        if min_size is None or s < min_size:
            min_size = s
        if not fish_size or fish_size.in_range_of_one(s * cm_sqr):
            valid += 1
    if fish_size and min_size is not None \
            and min_size * cm_sqr > fish_size.max_range[1]:
        return "remove"
    if valid < expected:
        return "too_few"
    return "keep"


def split_blob(blob: TrackBlob, expected: int, background: np.ndarray,
               settings) -> list[TrackBlob]:
    """Split `blob` into >= `expected` components by raising the threshold.

    Reference semantics (SplitBlob.cpp:406-640): starting from
    initial = max(track_threshold, track_posture_threshold)+1, find the
    SMALLEST threshold whose components pass evaluate_result_multiple
    (top-`expected` pieces fish-sized, total shrink bounded). Returns the
    components sorted largest-first (the `expected` keepers first), or []
    when no acceptable split exists.
    """
    if expected <= 1:
        return [blob]
    s = settings
    if s["blob_split_algorithm"] == "none":
        return []
    track_thr = int(s["track_threshold"])
    if s["calculate_posture"]:
        initial = max(track_thr, int(s["track_posture_threshold"])) + 1
    else:
        initial = track_thr + 1
    initial = max(1, initial)
    cm = s["cm_per_pixel"] or 1.0
    cm_sqr = cm * cm
    fish_size = SizeFilters(s["track_size_filter"])

    def components_at(thr: int) -> list[TrackBlob]:
        comps = threshold_components(blob, thr, background, s)
        comps.sort(key=lambda c: -c.num_pixels)
        return comps

    first = components_at(initial)
    first_size = (first[0].num_pixels * cm_sqr) if first else 0.0

    def evaluate(thr: int):
        comps = first if thr == initial else components_at(thr)
        comps = list(comps)
        action = _evaluate_split(expected, first_size, comps, s,
                                 cm_sqr, fish_size)
        return action, comps

    best_thr = None
    best_comps: Optional[list] = None
    # coarse scan (step 4) then refine the bracket by step 1: the goal
    # is the smallest KEEP threshold, like the reference's segmented
    # sampling search
    thr = initial
    while thr <= MAX_THRESHOLD:
        action, comps = evaluate(thr)
        if action == "keep":
            best_thr, best_comps = thr, comps
            break
        if action == "abort":
            break  # raising further only shrinks more
        thr += 4
    if best_thr is not None and best_thr > initial:
        for t in range(max(initial, best_thr - 3), best_thr):
            action, comps = evaluate(t)
            if action == "keep":
                best_thr, best_comps = t, comps
                break
    if best_comps is None:
        return []
    for c in best_comps:
        c.split = True
        c.parent_id = blob.blob_id
        c.recount(track_thr, background, s)
    return best_comps


class HistorySplit:
    """Decides which blobs must be split before matching.

    Mirrors the role of the reference's HistorySplit: for each blob,
    count how many currently-active individuals project onto it
    (expected individuals per blob); blobs with expectation > 1 are
    split via split_blob. Manual splits (`manual_splits` setting) are
    always honored.
    """

    def __init__(self, settings):
        self.settings = settings

    def expected_per_blob(self, blobs: list[TrackBlob],
                          fish_positions: list[tuple],
                          max_distance_px: float) -> list[int]:
        if not fish_positions or not blobs:
            return [0] * len(blobs)
        pos = np.asarray(fish_positions, np.float64)  # (F, 2)
        counts = [0] * len(blobs)
        assigned_best = np.full(len(pos), -1)
        best_d = np.full(len(pos), np.inf)
        for bi, b in enumerate(blobs):
            x, y, w, h = b.bounds
            cx, cy = b.center
            d = np.hypot(pos[:, 0] - cx, pos[:, 1] - cy)
            # a fish "projects onto" the blob if it is the nearest blob
            # within reach
            closer = d < best_d
            assigned_best[closer] = bi
            best_d[closer] = d[closer]
        for fi, bi in enumerate(assigned_best):
            if bi >= 0 and best_d[fi] <= max_distance_px:
                counts[bi] += 1
        return counts

    def apply(self, frame_index: int, blobs: list[TrackBlob],
              fish_positions: list[tuple], background: np.ndarray,
              noise_sink: Optional[list] = None) -> list[TrackBlob]:
        """Return the blob list with over-subscribed blobs split."""
        s = self.settings
        if not s["track_do_history_split"]:
            return blobs
        cm = s["cm_per_pixel"] or 1.0
        max_d = (s["track_max_speed"] / cm) / max(
            1.0, float(s["frame_rate"] or 25)) * 2.0
        expected = self.expected_per_blob(blobs, fish_positions, max_d)
        fish_size = SizeFilters(s["track_size_filter"])
        cm_sqr = cm * cm
        out = []
        for b, k in zip(blobs, expected):
            # also split blobs that are simply too large for one fish
            too_big = fish_size and not fish_size.in_range_of_one(
                b.recount(-1) if b._last_recount is not None
                else b.num_pixels * cm_sqr
            ) and b.num_pixels * cm_sqr > fish_size.max_range[1]
            want = max(k, 2 if too_big else 1)
            if want <= 1:
                out.append(b)
                continue
            parts = []
            while want >= 2 and not parts:
                parts = split_blob(b, want, background, self.settings)
                want -= 1
            want += 1
            if not parts:
                if noise_sink is not None and (too_big or k >= 2):
                    # blobs expected to hold >1 individual never become
                    # match candidates unless the split succeeds — the
                    # involved fish stay unassigned while merged
                    # (FilterReason::SplitFailed semantics)
                    noise_sink.append(b)
                else:
                    out.append(b)
                continue
            for i, p in enumerate(parts):
                sized = fish_size.in_range_of_one(p.num_pixels * cm_sqr)
                if i < want and (sized or not fish_size):
                    p.recount(int(s["track_threshold"]), background, s)
                    out.append(p)
                elif noise_sink is not None:
                    noise_sink.append(p)
        return out
