#!/usr/bin/env python3
"""Decisive probe for the midline_length strict-parity residual: is the
golden value REACHABLE by rotating/reversing our traced outline polygon
before Outline::resample?

For every blob-matched golden row (same blobid AND num_pixels = same
pixel set), compute printed midline_length for K rotations x 2
directions of the shipped supersampled trace. If the golden value is in
the reachable set for ~all rows, our vertex geometry + downstream chain
are right and only the commons find_outer_points start/direction rule
is unknown; if golden is often unreachable, the geometry (or the
downstream) is wrong and sweeping start rules can never close the gap.

Usage: midline_rotation_probe.py [--variant super4] [--rot 48]
"""
import argparse
import glob
import math
import sys
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_golden():
    golden = {}
    for fn in glob.glob(
            '/root/reference/videos/compare_data_automatic/*.csv'):
        with open(fn) as f:
            hdr = f.readline().strip().split(',')
            bi = hdr.index('blobid')
            npx = hdr.index('num_pixels')
            ml = hdr.index('midline_length')
            for line in f:
                p = line.strip().split(',')
                if len(p) < 6:
                    continue
                try:
                    fr = int(p[0])
                    bd = float(p[bi])
                    npp = float(p[npx])
                    mll = float(p[ml])
                except ValueError:
                    continue
                if not all(map(math.isfinite, (bd, npp, mll))):
                    continue
                golden.setdefault(fr, {})[int(bd)] = (int(npp), mll)
    return golden


def main():
    import cv2

    from trex_tpu.config import Settings, load_settings_file
    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track import posture as P
    from trex_tpu.track.blob import TrackBlob, blob_id_from_lines

    ap = argparse.ArgumentParser()
    ap.add_argument('--variant', default='super4')
    ap.add_argument('--rot', type=int, default=48,
                    help='number of evenly spaced rotations to try')
    ap.add_argument('--frames', type=int, default=200)
    args = ap.parse_args()

    golden = load_golden()
    frames = [cv2.imread(
        f'/root/reference/videos/test_frames/frame_{i:03d}.jpg',
        cv2.IMREAD_GRAYSCALE) for i in range(args.frames)]
    H, W = frames[0].shape
    idx100 = np.round(np.linspace(0, 199, 100)).astype(int)
    ssum = np.zeros((H, W), np.uint64)
    for i in idx100:
        ssum += cv2.imread(
            f'/root/reference/videos/test_frames/frame_{i:03d}.jpg',
            cv2.IMREAD_GRAYSCALE)
    bg = np.clip(np.floor(ssum / 100 + 0.5), 0, 255).astype(np.uint8)

    s = Settings()
    load_settings_file(s, '/root/reference/videos/test.settings')

    def outline_pts(tb):
        dense, off = P.biggest_component(
            tb, int(s['track_posture_threshold']), bg, s, 0, 2)
        if dense is None or dense.sum() < 1:
            return None
        if args.variant == 'super4':
            pts = P.trace_boundary(
                np.kron(dense, np.ones((4, 4), np.uint8))) / 4.0
        elif args.variant == 'center':
            pts = P.trace_boundary(dense)
        else:
            raise ValueError(args.variant)
        return np.asarray(pts, np.float32)

    def printed_len(pts):
        rp = P.resample(pts, float(s['outline_resample']))
        mid = P.calculate_midline_from_outline(rp, s, None)
        if mid is None:
            return None
        return math.floor(mid.len + 0.5)

    n_rows = 0
    n_exact_shipped = 0
    n_reachable = 0
    n_unreachable = 0
    gaps = []          # golden - closest reachable (when unreachable)
    spreads = []       # spread of reachable printed values per blob
    hit_rot = Counter()  # which normalized rotation fraction hits golden
    for fr in range(args.frames):
        blobs = label_blobs(frames[fr], bg,
                            threshold=int(s['track_threshold']),
                            absolute=False)
        ours = {blob_id_from_lines(b.lines): b for b in blobs}
        for bd, (npp, gml) in golden.get(fr, {}).items():
            b = ours.get(bd)
            if b is None or b.num_pixels != npp:
                continue
            tb = TrackBlob(b.lines, b.pixels, stats=b.stats)
            pts = outline_pts(tb)
            if pts is None or len(pts) < 8:
                continue
            n_rows += 1
            base = printed_len(pts)
            if base == gml:
                n_exact_shipped += 1
            L = len(pts)
            vals = set()
            hit = None
            for rev in (False, True):
                seq = pts[::-1].copy() if rev else pts
                for k in range(args.rot):
                    r = (k * L) // args.rot
                    v = printed_len(np.roll(seq, -r, axis=0))
                    if v is not None:
                        vals.add(v)
                        if v == gml and hit is None:
                            hit = (rev, k / args.rot)
            if gml in vals:
                n_reachable += 1
                if hit:
                    hit_rot[(hit[0], round(hit[1], 2))] += 1
            else:
                n_unreachable += 1
                if vals:
                    gaps.append(gml - min(vals, key=lambda v: abs(v - gml)))
            if vals:
                spreads.append(max(vals) - min(vals))
        if fr % 50 == 49:
            print(f'  frame {fr + 1}: rows {n_rows} reachable '
                  f'{n_reachable} unreachable {n_unreachable}',
                  flush=True)

    print(f'variant={args.variant} rot={args.rot}')
    print(f'rows (blob-matched): {n_rows}')
    print(f'shipped start exact: {n_exact_shipped} '
          f'({n_exact_shipped / max(1, n_rows):.4f})')
    print(f'golden reachable by rotation: {n_reachable} '
          f'({n_reachable / max(1, n_rows):.4f})')
    print(f'unreachable: {n_unreachable}')
    if gaps:
        g = np.array(gaps, float)
        print(f'unreachable gap (golden-closest): mean {g.mean():+.2f} '
              f'p50 {np.median(g):+.1f} max|.| {np.abs(g).max():.0f}')
    if spreads:
        sp = np.array(spreads, float)
        print(f'reachable-set spread (printed px): mean {sp.mean():.2f} '
              f'p90 {np.percentile(sp, 90):.1f}')


if __name__ == '__main__':
    main()
