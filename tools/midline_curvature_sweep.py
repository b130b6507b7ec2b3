#!/usr/bin/env python3
"""Sweep periodic::curvature formula variants against the golden
fixture (the commons CircularGraph internals are absent; our port
assumed the signed Menger circumcircle form, but the parameter doc for
outline_curvature_range_ratio says 'calculate the DISTANCE between
these points' and the in-snapshot legacy Outline::calculate_curvature
(Outline.cpp:292-320) returns -euclidean_distance(p[i-off], p[i+off])
with off = curvature_range * 2).

Scores printed midline_length exactness on blob-matched golden rows per
variant, through the python posture chain.
"""
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from midline_rotation_probe import load_golden  # noqa: E402


def make_curvature(kind):
    def curv(points, rng):
        if kind.startswith('negdist'):
            off = 2 * rng if kind == 'negdist2' else rng
            p1 = np.roll(points, off, axis=0)
            p3 = np.roll(points, -off, axis=0)
            return -np.hypot(p3[:, 0] - p1[:, 0], p3[:, 1] - p1[:, 1])
        p1 = np.roll(points, rng, axis=0)
        p2 = points
        p3 = np.roll(points, -rng, axis=0)
        a = p2 - p1
        b = p3 - p2
        cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
        d12 = np.hypot(*(p2 - p1).T)
        d23 = np.hypot(*(p3 - p2).T)
        d13 = np.hypot(*(p3 - p1).T)
        denom = np.sqrt(np.maximum(d12 * d23 * d13, 1e-12))
        c = 2.0 * cross / denom
        if kind == 'menger_abs':
            return np.abs(c)
        return c
    return curv


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
    P._force_python_chain = True

    variants = ['menger', 'menger_abs', 'negdist', 'negdist2']
    score = {v: [0, 0] for v in variants}
    err = {v: [] for v in variants}
    orig = P.periodic_curvature
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
            pts = P.trace_boundary(
                np.kron(dense, np.ones((4, 4), np.uint8))) / 4.0
            if len(pts) < 8:
                continue
            rp = P.resample(np.ascontiguousarray(pts, np.float32),
                            float(s['outline_resample']))
            for v in variants:
                P.periodic_curvature = make_curvature(v)
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
    P.periodic_curvature = orig
    for v in variants:
        m, t = score[v]
        e = np.array(err[v]) if err[v] else np.array([0.0])
        print(f'{v}: exact {m}/{t} = {m / max(1, t):.4f} '
              f'mean_err {e.mean():+.3f} rms {np.sqrt((e**2).mean()):.3f}')


if __name__ == '__main__':
    main()
