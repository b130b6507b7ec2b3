#!/usr/bin/env python3
"""Sweep outline-extraction variants for the posture chain against the
golden fixture (VERDICT round 2 'pick by fixture likelihood').

The observable: for rows where blobid+num_pixels match the golden CSVs
byte-exactly (same physical blob, same pixel set), the printed
midline_length should match too. Our round-2 chain used a 4x
supersampled Moore trace as a stand-in for the commons
pixel::find_outer_points (PixelTree.cpp, absent submodule); this tool
scores plausible exact geometries:

  super4   : 4x supersampled pixel-center Moore trace (round-2 baseline)
  corner   : exact crack polygon (pixel-square union boundary corners)
  edgemid  : midpoints of boundary edges (marching-squares style)
  center   : plain pixel-center Moore trace

Usage: midline_sweep.py  (expects the 8-guppy fixture convert in /tmp)
"""
import collections
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def crack_trace(mask: np.ndarray, emit: str = "corner") -> np.ndarray:
    """Trace the boundary of the union of fg pixel squares, clockwise in
    image coords (interior on the right). Corner (x,y) is the lattice
    point; pixel (r,c) spans x in [c,c+1], y in [r,r+1]. 8-connected
    foreground: at checkerboard corners keep the diagonal connected.
    emit='corner' yields lattice corners, 'edgemid' edge midpoints."""
    h, w = mask.shape
    fg = np.zeros((h + 2, w + 2), bool)
    fg[1:-1, 1:-1] = mask > 0
    rs, cs = np.nonzero(fg)
    if len(rs) == 0:
        return np.zeros((0, 2), np.float64)
    r0, c0 = rs[0], cs[0]      # topmost then leftmost fg pixel
    # start at its top-left corner heading east along the top edge
    start = (c0, r0)
    sx, sy = start
    # directions: 0=E 1=S 2=W 3=N ; moving from corner along an edge
    DX = [1, 0, -1, 0]
    DY = [0, 1, 0, -1]
    x, y, d = sx, sy, 0
    pts = []
    while True:
        if emit == "corner":
            pts.append((x, y))
        else:
            pts.append((x + DX[d] * 0.5, y + DY[d] * 0.5))
        x += DX[d]
        y += DY[d]
        # pixels around corner (x,y): NW=(y-1,x-1) NE=(y-1,x)
        # SW=(y,x-1) SE=(y,x)  (pixel indices into fg)
        nw = fg[y - 1, x - 1]
        ne = fg[y - 1, x]
        sw = fg[y, x - 1]
        se = fg[y, x]
        if d == 0:      # east: left is N, right is S
            if ne:
                d = 3
            elif se:
                d = 0
            else:
                d = 1
        elif d == 1:    # south
            if se:
                d = 0
            elif sw:
                d = 1
            else:
                d = 2
        elif d == 2:    # west
            if sw:
                d = 1
            elif nw:
                d = 2
            else:
                d = 3
        else:           # north
            if nw:
                d = 2
            elif ne:
                d = 3
            else:
                d = 0
        if (x, y) == (sx, sy) and d == 0:
            break
        if len(pts) > 8 * (h + 2) * (w + 2):
            break
    # remove the +1 padding offset; pixel (r,c) spans [c-? ...]: shift
    # so pixel centers sit at integer coordinates like the Moore trace
    out = np.array(pts, np.float64) - 1.0
    return out - 0.5


def collinear_merge(pts: np.ndarray) -> np.ndarray:
    if len(pts) < 3:
        return pts
    keep = []
    n = len(pts)
    for i in range(n):
        a, b, c = pts[i - 1], pts[i], pts[(i + 1) % n]
        if abs((b[0] - a[0]) * (c[1] - b[1])
               - (b[1] - a[1]) * (c[0] - b[0])) > 1e-12:
            keep.append(i)
    return pts[keep] if keep else pts


def main():
    import cv2

    from trex_tpu.config import Settings, load_settings_file
    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track import posture as P
    from trex_tpu.track.blob import TrackBlob, blob_id_from_lines

    import glob

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

    frames = [cv2.imread(
        f'/root/reference/videos/test_frames/frame_{i:03d}.jpg',
        cv2.IMREAD_GRAYSCALE) for i in range(200)]
    H, W = frames[0].shape
    idx100 = np.round(np.linspace(0, 199, 100)).astype(int)
    ssum = np.zeros((H, W), np.uint64)
    for i in idx100:
        ssum += frames[i]
    bg = np.clip(np.floor(ssum / 100 + 0.5), 0, 255).astype(np.uint8)

    s = Settings()
    load_settings_file(s, '/root/reference/videos/test.settings')

    P._force_python_chain = True

    def midline_len(blob, variant):
        dense, off = P.biggest_component(blob, 9, bg, s, 0, 2)
        if dense is None or dense.sum() < 1:
            return None
        if variant == 'super4':
            pts = P.trace_boundary(
                np.kron(dense, np.ones((4, 4), np.uint8))) / 4.0
        elif variant == 'center':
            pts = P.trace_boundary(dense)
        elif variant in ('corner', 'edgemid'):
            pts = crack_trace(dense, variant)
        elif variant == 'corner_merge':
            pts = collinear_merge(crack_trace(dense, 'corner'))
        else:
            raise ValueError(variant)
        if len(pts) < 3:
            return None
        pts = P.resample(np.asarray(pts, np.float32),
                         float(s['outline_resample']))
        mid = P.calculate_midline_from_outline(pts, s, None)
        return None if mid is None else mid.len

    variants = ['super4', 'corner', 'edgemid', 'center', 'corner_merge']
    score = {v: [0, 0] for v in variants}
    err = {v: [] for v in variants}
    for fr in range(200):
        blobs = label_blobs(frames[fr], bg, threshold=12, absolute=False)
        ours = {blob_id_from_lines(b.lines): b for b in blobs}
        for bd, (npp, gml) in golden.get(fr, {}).items():
            b = ours.get(bd)
            if b is None or b.num_pixels != npp:
                continue
            tb = TrackBlob(b.lines, b.pixels, stats=b.stats)
            for v in variants:
                ml = midline_len(tb, v)
                if ml is None:
                    continue
                printed = math.floor(ml + 0.5)
                score[v][1] += 1
                if printed == gml:
                    score[v][0] += 1
                else:
                    err[v].append(ml - gml)
    for v in variants:
        m, t = score[v]
        e = np.array(err[v]) if err[v] else np.array([0.0])
        print(f"{v}: exact {m}/{t} = {m/t:.4f}  mean_err {e.mean():+.3f} "
              f" p50|e| {np.percentile(np.abs(e), 50):.3f}")


if __name__ == '__main__':
    main()
