#!/usr/bin/env python3
"""End-to-end VI accumulation benchmark (BASELINE config 3 measured
through the PRODUCT path, not raw training): build a 100-identity
tracked scenario (textured blobs, 4 tracklet segments per fish), run
the full accumulation curriculum (ml/accumulation.Accumulation.start:
range selection -> train -> uniqueness gate -> accumulate, matching
ui/Accumulation.cpp:914-1700), and report wall-clock + the uniqueness
trajectory. bench.py embeds the result as the
`vi100_accumulation_wall_s_uniq_steps` detail."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def build_tracker(n_id=100, frames_per_seg=40, n_seg=4, seed=0,
                  side=16, uneven=False, drift=0.0):
    """Synthetic tracked scenario: each identity is a textured square
    blob at a fixed lattice cell, present in `n_seg` tracklet segments
    separated by gaps (so accumulation has ranges to choose from).

    uneven=True drops HALF the identities from the first half of the
    segments: the best-quality range no longer covers every identity.
    drift>0 shifts each identity's texture per segment (appearance
    changes over the video): crops from adjacent ranges generalize
    poorly to the far end — exactly where coverage-driven range
    selection (Accumulation.cpp:1523, train where uniqueness is
    weakest) beats plain DatasetQuality order."""
    from trex_tpu.config import global_settings
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.individual import Individual
    from trex_tpu.track.tracker import FrameStatistics, Tracker

    rng = np.random.default_rng(seed)
    s = global_settings()
    grid = int(np.ceil(np.sqrt(n_id)))
    cell = side + 14
    H = W = grid * cell + 20
    bg = np.full((H, W), 230, np.uint8)
    protos = rng.integers(20, 170, (n_id, side, side)).astype(np.int16)
    tracker = Tracker(s, background=bg)
    gap = 10
    seg_span = frames_per_seg + gap
    T = n_seg * seg_span
    for fid in range(n_id):
        ind = Individual(fid, s)
        gx, gy = fid % grid, fid // grid
        x0 = 10 + gx * cell
        y0 = 10 + gy * cell
        for seg in range(n_seg):
            if uneven and fid % 2 == 1 and seg < n_seg // 2:
                continue  # odd identities invisible early in the video
            base = protos[fid]
            if drift > 0:
                # appearance drift: texture rolls + brightens with time
                base = np.roll(base, seg, axis=1).astype(np.float64)
                base = np.clip(base * (1.0 + drift * seg)
                               + 10 * drift * seg, 0, 220)
            for k in range(frames_per_seg):
                f = seg * seg_span + k
                jx = int(rng.integers(-3, 4))
                jy = int(rng.integers(-3, 4))
                lines = np.array(
                    [(y0 + jy + r, x0 + jx, x0 + jx + side - 1)
                     for r in range(side)], np.int32)
                px = np.clip(base
                             + rng.integers(-15, 16, (side, side)),
                             0, 255).astype(np.uint8).reshape(-1)
                ind.add(f, f / 25.0, TrackBlob(lines, px))
        tracker.individuals[fid] = ind
        tracker.active.add(fid)
    tracker._next_id = n_id
    tracker.start_frame = 0
    tracker.end_frame = T - 1
    tracker.frame_times = {f: f / 25.0 for f in range(T)}
    for f in range(T):
        tracker.statistics[f] = FrameStatistics(number_fish=n_id)
    return tracker


def run(n_id=100, max_epochs=6, max_tracklets=3, uneven=False,
        order="coverage", seed=0, n_seg=4, frames_per_seg=40,
        drift=0.0):
    from trex_tpu.config import reset_global_settings
    from trex_tpu.ml import Accumulation

    s = reset_global_settings()
    s.set("track_max_individuals", n_id)
    s.set("frame_rate", 25)
    s.set("calculate_posture", False)
    s.set("gpu_max_epochs", max_epochs)
    s.set("accumulation_max_tracklets", max_tracklets)
    tracker = build_tracker(n_id, uneven=uneven, seed=seed,
                            n_seg=n_seg, frames_per_seg=frames_per_seg,
                            drift=drift)
    acc = Accumulation(tracker, s,
                       coverage_driven=(order == "coverage"))
    t0 = time.perf_counter()
    result = acc.start()
    wall = time.perf_counter() - t0
    return {
        "wall_s": round(wall, 1),
        "order": order,
        "uneven": bool(uneven),
        "final_uniqueness": round(result.final_uniqueness, 4),
        "steps": len(result.steps),
        "trained_ranges": len(result.trained_ranges),
        "success": bool(result.success),
        "uniqueness_trajectory": [
            round(st.uniqueness, 4) for st in result.steps],
    }


def main():
    if "--ab" in sys.argv:
        # A/B: coverage-driven vs linear order on a drifting-appearance
        # uneven-visibility scenario (many candidate ranges)
        out = {o: run(n_id=24, max_epochs=4, max_tracklets=3,
                      uneven=True, drift=0.35, n_seg=8,
                      frames_per_seg=20, order=o)
               for o in ("coverage", "linear")}
    else:
        out = run()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
