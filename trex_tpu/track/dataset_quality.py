"""DatasetQuality: score global consecutive tracklet ranges to pick
training data (reference tracking/DatasetQuality.{h,cpp}).

A "global tracklet range" is a frame interval where a stable set of
individuals is continuously tracked. Quality per range combines the
number of individuals covered, range length, and (when available)
midline-length consistency — the accumulation curriculum consumes the
ranking (best range first)."""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass
class RangeQuality:
    start: int
    end: int
    individuals: int
    min_cells: int  # min per-fish sample count in the range
    score: float

    @property
    def length(self):
        return self.end - self.start + 1


def global_tracklet_ranges(tracker, min_length: int = 2) -> list[tuple]:
    """Maximal frame intervals where every currently-known individual is
    continuously present (the reference's global tracklet order)."""
    if not tracker.individuals:
        return []
    start = tracker.start_frame
    end = tracker.end_frame
    n = len(tracker.individuals)
    present = np.zeros((end - start + 1, n), bool)
    for i, (fid, ind) in enumerate(sorted(tracker.individuals.items())):
        for t0, t1 in ind.tracklets:
            present[max(0, t0 - start) : t1 - start + 1, i] = True
    all_present = present.all(axis=1)
    ranges = []
    i = 0
    m = len(all_present)
    while i < m:
        if all_present[i]:
            j = i
            while j + 1 < m and all_present[j + 1]:
                j += 1
            if j - i + 1 >= min_length:
                ranges.append((start + i, start + j))
            i = j + 1
        else:
            i += 1
    return ranges


def evaluate_range(tracker, frame_range: tuple) -> RangeQuality:
    t0, t1 = frame_range
    individuals = 0
    min_cells = 10 ** 9
    lengths = []
    for fid, ind in tracker.individuals.items():
        cells = sum(1 for b in ind.basic if t0 <= b.frame <= t1)
        if cells > 0:
            individuals += 1
            min_cells = min(min_cells, cells)
        for p in ind.posture:
            if t0 <= p.frame <= t1 and not math.isnan(p.midline_length):
                lengths.append(p.midline_length)
    if min_cells == 10 ** 9:
        min_cells = 0
    consistency = 1.0
    if len(lengths) > 3:
        lengths = np.asarray(lengths)
        mu = lengths.mean()
        consistency = 1.0 / (1.0 + lengths.std() / mu) if mu > 0 else 0.5
    score = individuals * 1000.0 + min_cells * consistency
    return RangeQuality(t0, t1, individuals, min_cells, score)


def best_ranges(tracker, min_length: int = 2) -> list[RangeQuality]:
    """All global ranges sorted best-first (DatasetQuality ordering)."""
    out = [evaluate_range(tracker, r)
           for r in global_tracklet_ranges(tracker, min_length)]
    out.sort(key=lambda q: (-q.score, q.start))
    return out
