"""`.results` checkpoint: full tracker state save/restore.

Role of the reference's Output::TrackingResults (tracking/Output.h:85-228,
versioned binary V_1..V_38). This implementation uses an NPZ-based
container (magic "TREXTPU_RESULTS", version 1) holding all individuals'
time series, tracklets, posture summaries, and the settings delta —
enough to resume tracking (`-load`) and re-export without re-tracking.
A reader for the reference's binary .results format is tracked as a
compatibility follow-up.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

FORMAT_VERSION = 1


def save_results(tracker, settings, path) -> Path:
    path = Path(path)
    arrays = {
        "__magic__": np.array(["TREXTPU_RESULTS"]),
        "__version__": np.array([FORMAT_VERSION]),
        "start_frame": np.array([tracker.start_frame]),
        "end_frame": np.array([tracker.end_frame]),
        "frame_times_keys": np.array(sorted(tracker.frame_times.keys()),
                                     np.int64),
        "frame_times_vals": np.array(
            [tracker.frame_times[k] for k in sorted(tracker.frame_times)],
            np.float64),
        "settings_json": np.array([json.dumps(
            settings.to_dict(only_non_default=True), default=str)]),
        "ids": np.array(sorted(tracker.individuals.keys()), np.int64),
    }
    for fid, ind in tracker.individuals.items():
        frames = np.array([b.frame for b in ind.basic], np.int64)
        pos = np.array([[b.centroid.x, b.centroid.y] for b in ind.basic],
                       np.float64).reshape(-1, 2)
        vel = np.array([[b.centroid.vx, b.centroid.vy] for b in ind.basic],
                       np.float64).reshape(-1, 2)
        angles = np.array([b.centroid.angle for b in ind.basic], np.float64)
        times = np.array([b.centroid.time for b in ind.basic], np.float64)
        npx = np.array([b.blob.num_pixels for b in ind.basic], np.int64)
        bids = np.array([b.blob.blob_id for b in ind.basic], np.int64)
        # blob masks: concatenated lines with per-frame offsets
        line_counts = np.array([len(b.blob.lines) for b in ind.basic],
                               np.int64)
        all_lines = (np.concatenate([b.blob.lines for b in ind.basic])
                     if ind.basic else np.zeros((0, 3), np.int32))
        pre = f"ind{fid}_"
        arrays[pre + "frames"] = frames
        arrays[pre + "pos"] = pos
        arrays[pre + "vel"] = vel
        arrays[pre + "angles"] = angles
        arrays[pre + "times"] = times
        arrays[pre + "num_pixels"] = npx
        arrays[pre + "blob_ids"] = bids
        arrays[pre + "line_counts"] = line_counts
        arrays[pre + "lines"] = all_lines
        arrays[pre + "tracklets"] = np.array(ind.tracklets, np.int64) \
            .reshape(-1, 2)
        pf = np.array([p.frame for p in ind.posture], np.int64)
        arrays[pre + "posture_frames"] = pf
        arrays[pre + "midline_lengths"] = np.array(
            [p.midline_length for p in ind.posture], np.float64)
        arrays[pre + "midline_angles"] = np.array(
            [p.midline_angle for p in ind.posture], np.float64)
    # savez appends ".npz" to bare names; write via a file object so the
    # checkpoint keeps the .results extension
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)
    return path


def load_results(tracker, path):
    """Restore individuals into `tracker` (positions/tracklets/posture
    summaries; pixel masks are restored as line-only blobs)."""
    from ..track.blob import TrackBlob
    from ..track.individual import BasicStuff, Individual, PostureStuff
    from ..track.motion import MotionRecord

    path = Path(path)
    with np.load(path, allow_pickle=False) as data:
        magic = str(data["__magic__"][0])
        if magic != "TREXTPU_RESULTS":
            raise ValueError(f"{path}: not a trex_tpu results file")
        version = int(data["__version__"][0])
        if version > FORMAT_VERSION:
            raise ValueError(f"{path}: unknown results version {version}")
        tracker.start_frame = int(data["start_frame"][0])
        tracker.end_frame = int(data["end_frame"][0])
        keys = data["frame_times_keys"]
        vals = data["frame_times_vals"]
        tracker.frame_times = {int(k): float(v) for k, v in zip(keys, vals)}
        for fid in data["ids"]:
            fid = int(fid)
            pre = f"ind{fid}_"
            ind = Individual(fid, tracker.settings)
            frames = data[pre + "frames"]
            pos = data[pre + "pos"]
            vel = data[pre + "vel"]
            angles = data[pre + "angles"]
            times = data[pre + "times"]
            npx = data[pre + "num_pixels"]
            line_counts = data[pre + "line_counts"]
            lines = data[pre + "lines"]
            off = 0
            for i, f in enumerate(frames):
                n = int(line_counts[i])
                blob = TrackBlob(lines[off : off + n], None)
                off += n
                rec = MotionRecord(time=float(times[i]), x=float(pos[i, 0]),
                                   y=float(pos[i, 1]),
                                   angle=float(angles[i]),
                                   vx=float(vel[i, 0]), vy=float(vel[i, 1]))
                stuff = BasicStuff(frame=int(f), blob=blob, centroid=rec,
                                   thresholded_size=int(npx[i]))
                ind._frames[int(f)] = len(ind.basic)
                ind.basic.append(stuff)
            ind.tracklets = [list(t) for t in data[pre + "tracklets"]]
            for i, f in enumerate(data[pre + "posture_frames"]):
                p = PostureStuff(
                    frame=int(f),
                    midline_length=float(data[pre + "midline_lengths"][i]),
                    midline_angle=float(data[pre + "midline_angles"][i]))
                ind.add_posture(p)
            tracker.individuals[fid] = ind
            tracker.active.add(fid)
            tracker._next_id = max(tracker._next_id, fid + 1)
    return tracker
