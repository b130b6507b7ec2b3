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
from ..ops.labeling import split_sizes
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
               settings, component_cache: Optional[dict] = None
               ) -> list[TrackBlob]:
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

    # The escalation only needs component SIZES until the final
    # threshold is chosen: build the dense crop once and scan thresholds
    # with the native size-only labeler (ops.labeling.split_sizes),
    # then materialize actual components with one threshold_components
    # call. Size-identical to evaluating threshold_components at every
    # step (verified byte-identical fixture output).
    mask, gray, (ox, oy) = blob.to_dense(pad=1)
    bg_crop = np.zeros_like(gray)
    bh, bw = background.shape[:2]
    ys0, ys1 = max(0, oy), min(bh, oy + gray.shape[0])
    xs0, xs1 = max(0, ox), min(bw, ox + gray.shape[1])
    bg_crop[ys0 - oy: ys1 - oy, xs0 - ox: xs1 - ox] = \
        background[ys0:ys1, xs0:xs1]
    absolute = bool(s["track_threshold_is_absolute"])
    img = np.where(mask > 0, gray, bg_crop.astype(np.uint8))
    top_k = max(16, expected)

    def sizes_mat(thrs) -> np.ndarray:
        cache = component_cache if component_cache is not None else {}
        missing = [t for t in thrs if t not in cache]
        if missing:
            for t, row in zip(missing, split_sizes(img, bg_crop, missing,
                                                   absolute, top_k)):
                cache[t] = row
        return np.stack([cache[t] for t in thrs])

    max_shrink = float(s["blob_split_max_shrink"])
    shrink_lim = float(s["blob_split_global_shrink_limit"])

    def evaluate_rows(mat: np.ndarray, first_size: float):
        """Vectorized _evaluate_split over a (n, 2+K) size matrix.
        Sizes are sorted desc per row, so the shrink filter removes a
        suffix and top-`expected` of the filtered list is a row prefix.
        Returns (abort, keep) bool vectors."""
        n_comps = mat[:, 0]
        total = mat[:, 1].astype(np.float64) * cm_sqr
        abort = total < max_shrink * first_size
        if fish_size:
            min_thresh = np.full_like(total,
                                      fish_size.max_range[0] * shrink_lim)
        else:
            min_thresh = total * max_shrink
        sizes = mat[:, 2:].astype(np.float64) * cm_sqr  # (n, K) desc
        within = np.arange(sizes.shape[1])[None, :] \
            < np.minimum(n_comps, top_k)[:, None]
        kept = within & (sizes >= min_thresh[:, None])  # prefix per row
        take = np.minimum(kept.sum(axis=1), expected)
        if fish_size:
            in_rng = np.zeros(sizes.shape, bool)
            for lo, hi in fish_size.ranges:
                in_rng |= (sizes >= lo) & (sizes <= hi)
        else:
            in_rng = np.ones(sizes.shape, bool)
        prefix = np.arange(sizes.shape[1])[None, :] < take[:, None]
        valid = (in_rng & prefix).sum(axis=1)
        # min of the prefix = its last element (sizes descending)
        min_size = sizes[np.arange(len(take)), np.maximum(take, 1) - 1]
        remove = (take > 0) & (min_size > fish_size.max_range[1]) \
            if fish_size else np.zeros(len(take), bool)
        keep = ~abort & ~remove & (valid >= expected)
        return abort, keep

    # Scan EVERY threshold ascending until the first keep or an abort:
    # the reference's segmented multi-thread sampling covers the whole
    # band at step 1 (SplitBlob.cpp:616-660, 3 threads x offsets), so
    # keep-windows narrower than any coarse step must not be skipped.
    # Chunked: most blobs abort within the first few thresholds.
    coarse = np.arange(initial, MAX_THRESHOLD + 1)
    best_thr = None
    first_size = 0.0
    CHUNK = 16
    for c0 in range(0, len(coarse), CHUNK):
        chunk = coarse[c0:c0 + CHUNK]
        mat = sizes_mat(chunk)
        if c0 == 0:
            first_size = (float(mat[0, 2]) * cm_sqr) if mat[0, 0] > 0 \
                else 0.0
        abort_f, keep_f = evaluate_rows(mat, first_size)
        stop = keep_f | abort_f
        if stop.any():
            i = int(np.argmax(stop))
            if keep_f[i]:
                best_thr = int(chunk[i])
            break  # abort: raising further only shrinks more
    if best_thr is None:
        return []
    comps = threshold_components(blob, best_thr, background, s)
    comps.sort(key=lambda c: -c.num_pixels)
    if _evaluate_split(expected, first_size, comps, s,
                       cm_sqr, fish_size) != "keep":
        return []  # size scan and materialization disagree: be safe
    for c in comps:
        c.split = True
        c.parent_id = blob.blob_id
        c.recount(track_thr, background, s)
    return comps


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
        """Reference semantics (PPFrame::init_cache :214, :379-419):
        each fish maps to EVERY blob whose extent lies within
        max_d = track_max_speed * tdelta / cm_per_pixel * 0.5 of the
        fish's estimated position; a blob's expectation is the number
        of distinct fish mapped to it."""
        if not fish_positions or not blobs:
            return [0] * len(blobs)
        pos = np.asarray(fish_positions, np.float64)  # (F, 2)
        counts = [0] * len(blobs)
        bounds = np.array([b.bounds for b in blobs], np.float64)  # x,y,w,h
        x0 = bounds[:, 0]
        y0 = bounds[:, 1]
        x1 = bounds[:, 0] + bounds[:, 2] - 1
        y1 = bounds[:, 1] + bounds[:, 3] - 1
        for fx, fy in pos:
            # distance from the estimate to each blob's bounding box
            dx = np.maximum(0, np.maximum(x0 - fx, fx - x1))
            dy = np.maximum(0, np.maximum(y0 - fy, fy - y1))
            d = np.hypot(dx, dy)
            for bi in np.flatnonzero(d <= max_distance_px):
                counts[bi] += 1
        return counts

    def split_expectation(self, blobs: list[TrackBlob],
                          fish_positions: list[tuple],
                          max_distance_px: float) -> dict[int, int]:
        """The reference's expectation algorithm (HistorySplit.cpp:
        170-320): per connected clique of fish<->blob proximity edges
        with more fish than blobs, resolve conflicts greedily closest-
        first; every fish left without an alternative raises the split
        expectation of its best blob (plus one for the current owner).

        Returns {blob_index: expected_count}; blobs absent need no split.
        """
        if not fish_positions or not blobs:
            return {}
        bounds = np.array([b.bounds for b in blobs], np.float64)
        x0 = bounds[:, 0]
        y0 = bounds[:, 1]
        x1 = bounds[:, 0] + bounds[:, 2] - 1
        y1 = bounds[:, 1] + bounds[:, 3] - 1
        pos = np.asarray(fish_positions, np.float64)
        fx = pos[:, 0][:, None]
        fy = pos[:, 1][:, None]
        dx = np.maximum(0, np.maximum(x0[None, :] - fx, fx - x1[None, :]))
        dy = np.maximum(0, np.maximum(y0[None, :] - fy, fy - y1[None, :]))
        dmat = np.hypot(dx, dy)
        near = dmat <= max_distance_px
        # early exit: only fish touching a contested blob (>= 2 mapped
        # fish) can raise expectations — typical frames have none
        contested = near.sum(axis=0) >= 2
        if not contested.any():
            return {}
        involved = near[:, contested].any(axis=1)
        fi_idx, bi_idx = np.nonzero(near[involved])
        fish_ids = np.flatnonzero(involved)

        # The reference's blob_grid holds SAMPLED mask points (PPFrame::
        # fill_proximity_grid + insert_line, PPFrame.cpp:123-135,
        # 891-932): first/last line plus even-y lines; per line the two
        # endpoints, the midpoint, and interior points every
        # max(1, bbox_width*0.1) px (only when that step >= 5). Edges
        # exist where a sampled point lies within max_d of the estimate;
        # distances are to the sampled points (NOT the exact mask), so
        # replicate the sampling bit for bit.
        _pts_cache: dict[int, np.ndarray] = {}

        def grid_points(bi: int) -> np.ndarray:
            pts = _pts_cache.get(bi)
            if pts is not None:
                return pts
            ls = np.asarray(blobs[bi].lines)
            K = len(ls)
            if K >= 4:
                sel = [0] + [i for i in range(1, K - 1)
                             if ls[i, 0] % 2 == 0] + [K - 1]
            else:
                sel = list(range(K))
            w = blobs[bi].bounds[2]
            step = int(max(1.0, w * 0.1))
            out = []
            for i in sel:
                y = float(ls[i, 0])
                x0 = float(ls[i, 1])
                x1 = float(ls[i, 2])
                d = x1 - x0
                out.append((x0, y))
                out.append((x1, y))
                out.append((x0 + d * 0.5, y))
                if d >= 2 * step and step >= 5:
                    x = x0 + step
                    while x <= x1 - step:
                        out.append((x, y))
                        x += step
            pts = np.asarray(out, np.float64)
            _pts_cache[bi] = pts
            return pts

        def mask_distance(fx, fy, bi) -> float:
            pts = grid_points(bi)
            return float(np.min(np.hypot(pts[:, 0] - fx, pts[:, 1] - fy)))

        edges: dict[int, list] = {}
        for fi, bi in zip(fish_ids[fi_idx].tolist(), bi_idx.tolist()):
            fx, fy = fish_positions[fi]
            md = mask_distance(fx, fy, bi)
            if md <= max_distance_px:
                edges.setdefault(fi, []).append((md, bi))
        for es in edges.values():
            es.sort()

        # connected cliques over shared blobs
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

        for fi, es in edges.items():
            for _, bi in es:
                union(("f", fi), ("b", bi))
        cliques: dict = {}
        for fi in edges:
            cliques.setdefault(find(("f", fi)), ([], set()))[0].append(fi)
        for fi, es in edges.items():
            root = find(("f", fi))
            for _, bi in es:
                cliques[root][1].add(bi)

        expect: dict[int, int] = {}
        for fish_list, blob_set in cliques.values():
            if len(fish_list) <= len(blob_set):
                continue
            combos = {fi: list(edges[fi]) for fi in fish_list}
            assign_fish = {fi: combos[fi][0] for fi in fish_list}
            assign_blob: dict[int, tuple] = {}
            queue = list(fish_list)
            while queue:
                fi = queue.pop(0)
                combo = combos[fi]
                if not combo:
                    continue
                d, b = combo[0]
                if b not in assign_blob:
                    assign_blob[b] = (fi, d)
                    continue
                owner, od = assign_blob[b]
                if owner != fi:
                    if od <= d:
                        combo.pop(0)
                        queue.append(fi)
                    else:
                        assign_blob[b] = (fi, d)
                        queue.append(owner)
                        # owner must look for alternatives again
            for fi in fish_list:
                if combos[fi]:
                    continue  # still has alternatives
                d, b = assign_fish[fi]
                if b in assign_blob:
                    expect[b] = expect.get(b, 0) + 1  # current owner
                    del assign_blob[b]
                expect[b] = expect.get(b, 0) + 1
        return expect

    def apply(self, frame_index: int, blobs: list[TrackBlob],
              fish_positions: list[tuple], background: np.ndarray,
              noise_sink: Optional[list] = None) -> list[TrackBlob]:
        """Return the blob list with over-subscribed blobs split
        (HistorySplit tail: split_big + final size filter)."""
        s = self.settings
        fish_size = SizeFilters(s["track_size_filter"])
        cm = s["cm_per_pixel"] or 1.0
        cm_sqr = cm * cm
        if not s["track_do_history_split"]:
            return blobs
        # max_d = track_max_speed * tdelta / cm_per_pixel * 0.5
        # (PPFrame.cpp:214, tdelta = one frame)
        max_d = (s["track_max_speed"] / cm) / max(
            1.0, float(s["frame_rate"] or 25)) * 0.5
        expect = self.split_expectation(blobs, fish_positions, max_d)
        # manual splits always force a 2-way split
        manual = (s["manual_splits"] or {})
        manual_bids = set(manual.get(frame_index, [])
                          or manual.get(str(frame_index), []))
        out = []
        for bi, b in enumerate(blobs):
            want = expect.get(bi, 0)
            if b.blob_id in manual_bids:
                want = max(want, 2)
            if want < 2:
                out.append(b)
                continue
            # NO retry with fewer parts here: the reference's history
            # split demands exactly `expect.number` pieces
            # (allow_less_than=false, HistorySplit.cpp:184-200) — a
            # failed split sends the blob to noise and the involved
            # fish stay missing. (The start-frame split_big retry lives
            # in tracker.py where the count is only a size heuristic.)
            parts = split_blob(b, want, background, self.settings)
            if not parts:
                # split failed: the blob leaves the match candidates
                # (FilterReason::History) — involved fish stay missing
                if noise_sink is not None:
                    noise_sink.append(b)
                continue
            for p in parts:
                p.recount(int(s["track_threshold"]), background, s)
                out.append(p)
        # final size filter (HistorySplit.cpp:364-373): everything out of
        # track_size_filter becomes noise
        final = []
        for b in out:
            rec = b.recount(-1) if b._last_recount is not None \
                else b.num_pixels * cm_sqr
            if not fish_size or fish_size.in_range_of_one(rec):
                final.append(b)
            elif noise_sink is not None:
                noise_sink.append(b)
        return final
