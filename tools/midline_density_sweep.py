#!/usr/bin/env python3
"""Microsweep of outline vertex structure (density + corner handling)
against the golden fixture. Outline::resample's emission positions are
vertex-structure sensitive (each segment restarts the 0.5px emission
grid at its first vertex), so the absent find_outer_points' vertex set
matters beyond its continuous geometry. Variants:

  moore2/moore4/moore8 : Moore trace of the Kx-upscaled mask / K
                         (diagonal corner cuts at convex corners)
  crack2/crack4/crack8 : exact crack polygon (right-angle corners)
                         subdivided into 1/K px steps
"""
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from midline_rotation_probe import load_golden  # noqa: E402
from midline_sweep import crack_trace  # noqa: E402


def subdivide(pts: np.ndarray, step: float) -> np.ndarray:
    """Insert vertices every `step` along each segment of the closed
    polygon (keeping original vertices)."""
    out = []
    L = len(pts)
    for i in range(L):
        p0 = pts[i]
        p1 = pts[(i + 1) % L]
        seg = float(np.hypot(*(p1 - p0)))
        n = max(1, int(round(seg / step)))
        for k in range(n):
            out.append(p0 + (p1 - p0) * (k / n))
    return np.asarray(out, np.float64)


def main():
    import cv2

    from trex_tpu.config import Settings, load_settings_file
    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track import posture as P
    from trex_tpu.track.blob import TrackBlob, blob_id_from_lines

    golden = load_golden()
    idx100 = np.round(np.linspace(0, 199, 100)).astype(int)
    ssum = None
    for i in idx100:
        img = cv2.imread(
            f'/root/reference/videos/test_frames/frame_{i:03d}.jpg',
            cv2.IMREAD_GRAYSCALE)
        if ssum is None:
            ssum = np.zeros(img.shape, np.uint64)
        ssum += img
    bg = np.clip(np.floor(ssum / 100 + 0.5), 0, 255).astype(np.uint8)

    s = Settings()
    load_settings_file(s, '/root/reference/videos/test.settings')

    variants = ['moore2', 'moore4', 'moore8',
                'crack2', 'crack4', 'crack8']
    score = {v: [0, 0] for v in variants}
    err = {v: [] for v in variants}

    def outline(dense, v):
        if v.startswith('moore'):
            k = int(v[5:])
            return P.trace_boundary(
                np.kron(dense, np.ones((k, k), np.uint8))) / float(k)
        k = int(v[5:])
        return subdivide(crack_trace(dense, 'corner'), 1.0 / k)

    for fr in range(200):
        frame = cv2.imread(
            f'/root/reference/videos/test_frames/frame_{fr:03d}.jpg',
            cv2.IMREAD_GRAYSCALE)
        blobs = label_blobs(frame, bg,
                            threshold=int(s['track_threshold']),
                            absolute=False)
        ours = {blob_id_from_lines(b.lines): b for b in blobs}
        for bd, (npp, gml) in golden.get(fr, {}).items():
            b = ours.get(bd)
            if b is None or b.num_pixels != npp:
                continue
            tb = TrackBlob(b.lines, b.pixels, stats=b.stats)
            dense, off = P.biggest_component(
                tb, int(s['track_posture_threshold']), bg, s, 0, 2)
            if dense is None or dense.sum() < 1:
                continue
            for v in variants:
                pts = outline(dense, v)
                if len(pts) < 8:
                    continue
                rp = P.resample(np.ascontiguousarray(pts, np.float32),
                                float(s['outline_resample']))
                mid = P.calculate_midline_from_outline(rp, s, None)
                if mid is None:
                    continue
                score[v][1] += 1
                printed = math.floor(mid.len + 0.5)
                if printed == gml:
                    score[v][0] += 1
                else:
                    err[v].append(mid.len - gml)
        if fr % 50 == 49:
            print('  frame', fr + 1,
                  {v: f'{m}/{t}' for v, (m, t) in score.items()},
                  flush=True)
    for v in variants:
        m, t = score[v]
        e = np.array(err[v]) if err[v] else np.array([0.0])
        print(f'{v}: exact {m}/{t} = {m / max(1, t):.4f} '
              f'mean_err {e.mean():+.3f} rms {np.sqrt((e**2).mean()):.3f}')


if __name__ == '__main__':
    main()
