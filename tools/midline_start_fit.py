#!/usr/bin/env python3
"""Fit the outline start-vertex/direction rule against the golden
fixture.

midline_rotation_probe.py established that 99.1% of golden
midline_length values are reachable by rotating our supersampled trace
before Outline::resample — the geometry and the downstream chain are
right, only the start/direction convention of the absent commons
pixel::find_outer_points differs. This tool scores deterministic
candidate start rules (anchor vertex x direction) by exact-match rate
on blob-matched rows.

Usage: midline_start_fit.py [--frames 200]
"""
import argparse
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from midline_rotation_probe import load_golden  # noqa: E402


def rules():
    """(name, fn(pts)->pts) candidate start/direction rules; pts is the
    (L,2) supersampled trace starting at the topmost-leftmost pixel,
    clockwise in image coords."""
    def anchor_idx(pts, key):
        if key == 'ymin_xmin':
            order = np.lexsort((pts[:, 0], pts[:, 1]))
        elif key == 'xmin_ymin':
            order = np.lexsort((pts[:, 1], pts[:, 0]))
        elif key == 'ymax_xmax':
            order = np.lexsort((-pts[:, 0], -pts[:, 1]))
        elif key == 'xmax_ymax':
            order = np.lexsort((-pts[:, 1], -pts[:, 0]))
        elif key == 'ymin_xmax':
            order = np.lexsort((-pts[:, 0], pts[:, 1]))
        elif key == 'xmin_ymax':
            order = np.lexsort((-pts[:, 1], pts[:, 0]))
        else:
            raise ValueError(key)
        return int(order[0])

    out = [('asis', lambda p: p), ('rev', lambda p: p[::-1].copy())]
    for key in ('ymin_xmin', 'xmin_ymin', 'ymax_xmax', 'xmax_ymax',
                'ymin_xmax', 'xmin_ymax'):
        def fwd(p, key=key):
            return np.roll(p, -anchor_idx(p, key), axis=0)

        def rev(p, key=key):
            q = p[::-1].copy()
            return np.roll(q, -anchor_idx(q, key), axis=0)

        out.append((f'{key}_fwd', fwd))
        out.append((f'{key}_rev', rev))
    for k in (-8, -4, -2, -1, 1, 2, 4, 8):
        out.append((f'shift{k:+d}',
                    lambda p, k=k: np.roll(p, -k, axis=0)))
    return out


def main():
    import cv2

    from trex_tpu.config import Settings, load_settings_file
    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track import posture as P
    from trex_tpu.track.blob import TrackBlob, blob_id_from_lines

    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=200)
    args = ap.parse_args()

    golden = load_golden()
    H = W = None
    idx100 = np.round(np.linspace(0, 199, 100)).astype(int)
    ssum = None
    for i in idx100:
        img = cv2.imread(
            f'/root/reference/videos/test_frames/frame_{i:03d}.jpg',
            cv2.IMREAD_GRAYSCALE)
        if ssum is None:
            H, W = img.shape
            ssum = np.zeros((H, W), np.uint64)
        ssum += img
    bg = np.clip(np.floor(ssum / 100 + 0.5), 0, 255).astype(np.uint8)

    s = Settings()
    load_settings_file(s, '/root/reference/videos/test.settings')

    RULES = rules()
    score = {name: [0, 0] for name, _ in RULES}
    err = {name: [] for name, _ in RULES}

    def printed_len(pts):
        rp = P.resample(np.ascontiguousarray(pts, np.float32),
                        float(s['outline_resample']))
        mid = P.calculate_midline_from_outline(rp, s, None)
        if mid is None:
            return None
        return math.floor(mid.len + 0.5), mid.len

    for fr in range(args.frames):
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
            pts = P.trace_boundary(
                np.kron(dense, np.ones((4, 4), np.uint8))) / 4.0
            if len(pts) < 8:
                continue
            pts = np.asarray(pts, np.float32)
            for name, fn in RULES:
                got = printed_len(fn(pts))
                if got is None:
                    continue
                pv, raw = got
                score[name][1] += 1
                if pv == gml:
                    score[name][0] += 1
                err[name].append(raw - gml)
        if fr % 50 == 49:
            best = max(score, key=lambda n: score[n][0]
                       / max(1, score[n][1]))
            m, t = score[best]
            print(f'  frame {fr + 1}: best {best} {m}/{t}', flush=True)

    for name, _ in sorted(RULES, key=lambda r: -(score[r[0]][0]
                                                 / max(1, score[r[0]][1]))):
        m, t = score[name]
        e = np.array(err[name]) if err[name] else np.array([0.0])
        print(f'{name}: exact {m}/{t} = {m / max(1, t):.4f} '
              f'mean_err {e.mean():+.3f} rms {np.sqrt((e**2).mean()):.3f}')


if __name__ == '__main__':
    main()
