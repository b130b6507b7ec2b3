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


def split_blob(blob: TrackBlob, expected: int, background: np.ndarray,
               settings) -> list[TrackBlob]:
    """Split `blob` into >= `expected` components by raising the threshold.

    Returns the components sorted by size (largest first; up to
    `expected` fish-sized ones followed by leftovers as noise candidates),
    or [] if no acceptable split exists.
    """
    if expected <= 1:
        return [blob]
    base_threshold = max(1, int(settings["track_threshold"]))
    cm = settings["cm_per_pixel"] or 1.0
    cm_sqr = cm * cm
    fish_size = SizeFilters(settings["track_size_filter"])
    original = blob.recount(base_threshold, background, settings)
    if original <= 0:
        original = blob.num_pixels * cm_sqr

    min_range_start = min((lo for lo, hi in fish_size.ranges), default=0.0)
    global_limit = settings["blob_split_global_shrink_limit"] * min_range_start
    shrink_limit = settings["blob_split_max_shrink"] * original
    min_component = max(global_limit, 1 * cm_sqr)

    best: Optional[list[TrackBlob]] = None
    first_viable: Optional[list[TrackBlob]] = None

    threshold = base_threshold
    while threshold < MAX_THRESHOLD:
        threshold += max(1, threshold // 4)
        comps = threshold_components(blob, threshold, background, settings)
        if not comps:
            break
        sizes = [c.num_pixels * cm_sqr for c in comps]
        total = sum(sizes)
        if total < shrink_limit:
            break  # shrunk too far; no point escalating further
        sized = [c for c, s in zip(comps, sizes) if s >= min_component]
        if len(sized) >= expected:
            sized.sort(key=lambda c: -c.num_pixels)
            leftovers = [c for c in comps if c not in sized[:expected]]
            result = sized[:expected] + leftovers
            if first_viable is None:
                first_viable = result
            # prefer a split whose top-k components are fish-sized
            if all(fish_size.in_range_of_one(c.num_pixels * cm_sqr)
                   for c in sized[:expected]) or not fish_size:
                best = result
                break
    out = best or first_viable or []
    for c in out:
        c.split = True
        c.parent_id = blob.blob_id
    return out


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
                if too_big and noise_sink is not None:
                    # oversized blobs never become match candidates
                    # unless split succeeds (FilterReason::SplitFailed)
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
