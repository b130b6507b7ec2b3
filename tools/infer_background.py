#!/usr/bin/env python3
"""Decisive strict-golden experiment: infer the reference background.

docs/PARITY.md pins the residual strict-golden divergence on a
+/-1-grey background difference (the authoritative `videos/test.pv`
average is stripped from the snapshot). This tool SOLVES for the
per-pixel background byte (bounded +/-2 grey around our computed
average) that best explains the golden per-blob num_pixels values,
then converts the fixture with the inferred background and measures
golden agreement + the strict word-diff. If the hypothesis is right,
agreement should rise sharply; if wrong, the optimizer cannot improve
it — either way the result is recorded (VERDICT r3 item 6; reference
harness rule: Tests/run_unix.bash:157-166).

Method
------
1. The golden rows are TRACK-THRESHOLD children (the tracker assigns
   pixel::threshold_blob components, prefilter.threshold_components):
   label each frame at track_threshold=12 directly — every
   12-component is a child of some 9-parent — and match golden rows
   by exact blobid, then by the decoded (y0, center-x) position.
2. Matched children give per-(frame, blob) num_pixels target deltas d
   (d = 0 rows included: correct blobs must stay correct).
3. Critical pixels: within 2 grey of the track-threshold decision at
   a matched child's rim (ON candidates img in {v-11, v-10} adjacent
   to the mask; OFF candidates img in {v-13, v-12} inside it).
4. Greedy coordinate descent over critical pixels: each pixel picks
   the byte in [v-2, v+2] minimizing the summed squared per-blob
   residuals it touches (d = 0 blobs included: correct blobs must
   stay correct). Two passes.
5. Convert the fixture with the inferred background (in-process CLI,
   generate_average patched) and report strict + ratchet agreement.

Usage: infer_background.py [--workdir DIR] [--passes 2] [--no-convert]
"""
import argparse
import csv
import glob
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

VIDEOS = Path("/root/reference/videos")
FRAMES = str(VIDEOS / "test_frames" / "frame_%03d.jpg")
DETECT_THR = 9
TRACK_THR = 12


def decode_bid(bid: int):
    """Inverse of track.blob.blob_id_from_lines packing."""
    return bid >> 19, (bid >> 6) & 0x1FFF, bid & 0x3F  # cx, y0, cnt6


def load_golden():
    """{frame: [(fish, blobid, num_pixels)]} from the golden CSVs."""
    per_frame = defaultdict(list)
    for f in sorted(glob.glob(
            str(VIDEOS / "compare_data_automatic" / "test_fish*.csv"))):
        fish = int(Path(f).stem.split("fish")[-1])
        for r in csv.DictReader(open(f)):
            bid = r.get("blobid")
            npx = r.get("num_pixels")
            if not bid or bid in ("inf", "nan") or npx in ("inf", "nan"):
                continue
            per_frame[int(float(r["frame"]))].append(
                (fish, int(float(bid)), int(float(npx))))
    return per_frame


def our_background():
    from trex_tpu.config import load_settings_file, \
        reset_global_settings
    from trex_tpu.io.video import VideoSource
    from trex_tpu.pipeline import generate_average

    s = reset_global_settings()
    load_settings_file(s, str(VIDEOS / "test.settings"))
    src = VideoSource(FRAMES)
    return generate_average(src, s), s, src


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/infer_bg")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--no-convert", action="store_true")
    a = ap.parse_args()
    workdir = Path(a.workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track.blob import blob_id_from_lines

    bg, s, src = our_background()
    golden = load_golden()
    H, W = bg.shape
    t0 = time.time()

    # per-blob records: (rid, d) and per-pixel candidate contributions
    # pixel key -> list of (rid, img_value) for ON candidates (rim) and
    # OFF candidates (interior)
    residual = []          # d per record (golden - ours), mutable
    pix_on = defaultdict(list)    # p -> [(rid, img)]
    pix_off = defaultdict(list)
    # a background pixel couples EVERY frame: any appearance in a
    # critical window that is NOT a blobid-safe end toggle (vertical
    # rim, first line, mid-line split, unmatched blob) poisons it —
    # changing it would alter some frame's blob STRUCTURE
    poisoned = set()
    n_matched = n_exact = n_allpass = 0

    for f in range(len(src)):
        img = src.get(f)
        if img.ndim == 3:
            import cv2

            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        # golden rows are track-threshold CHILDREN: label at the
        # track threshold directly (every 12-component lies inside a
        # 9-parent, so the component set equals the child set)
        blobs = label_blobs(img, bg, threshold=TRACK_THR)
        rows = golden.get(f, [])
        if not rows:
            continue
        by_bid = {}
        feats = []
        for b in blobs:
            bid = blob_id_from_lines(b.lines)
            by_bid[bid] = b
            feats.append((b, decode_bid(bid)))
            # poison every critical-window pixel of this blob that is
            # NOT a safe end toggle (first line, vertical rim,
            # mid-line interior); safe ends collected below survive
            y0b = int(b.lines[0, 0])
            mask = set()
            for y, x0, x1 in b.lines:
                for x in range(x0, x1 + 1):
                    mask.add((int(y), int(x)))
            safe = set()
            for y, x0, x1 in b.lines:
                if y == y0b:
                    continue
                safe.add((int(y), int(x0) - 1))
                safe.add((int(y), int(x1) + 1))
                if x1 > x0:
                    safe.add((int(y), int(x0)))
                    safe.add((int(y), int(x1)))
            for (y, x) in mask:
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        q = (y + dy, x + dx)
                        if q in safe or not (0 <= q[0] < H
                                             and 0 <= q[1] < W):
                            continue
                        v = int(bg[q])
                        iv = int(img[q])
                        if v - 13 <= iv <= v - 10:
                            poisoned.add(q)
        for fish, gbid, gnp in rows:
            b = by_bid.get(gbid)
            if b is not None:
                n_exact += 1
            else:
                gcx, gy0, gc6 = decode_bid(gbid)
                best, bestd = None, 1e9
                for bb, (cx, y0, c6) in feats:
                    d = abs(cx - gcx) + abs(y0 - gy0)
                    if d < bestd:
                        best, bestd = bb, d
                if best is None or bestd > 12:
                    continue
                b = best
            n_matched += 1
            d = gnp - b.num_pixels
            if abs(d) > 20:
                # structural divergence (mispairing / different merge
                # decision), not boundary-pixel noise: excluded so the
                # optimizer chases only the background hypothesis
                n_allpass += 1
                continue
            rid = len(residual)
            residual.append(d)
            # BLOBID-SAFE critical pixels only: horizontal line-end
            # extensions/shrinks on rows past the first line. These
            # change num_pixels by +/-1 without touching the blobid
            # packing (first-line center x, y0, line count) — the
            # first solve variant allowed arbitrary rim toggles and
            # fixed num_pixels (.879 -> .957) while BREAKING blobid
            # (.983 -> .943); structure-preserving moves keep both.
            y0b = int(b.lines[0, 0])
            for y, x0, x1 in b.lines:
                if y == y0b:
                    continue
                for q, shrinkable in (((int(y), int(x0) - 1), False),
                                      ((int(y), int(x1) + 1), False)):
                    if not (0 <= q[1] < W):
                        continue
                    v = int(bg[q])
                    iv = int(img[q])
                    if iv > 0 and v - 11 <= iv <= v - 10:
                        pix_on[q].append((rid, iv))
                if x1 > x0:  # end-pixel shrink keeps the line alive
                    for q in ((int(y), int(x0)), (int(y), int(x1))):
                        v = int(bg[q])
                        iv = int(img[q])
                        if v - 13 <= iv <= v - 12:
                            pix_off[q].append((rid, iv))

    for q in poisoned:
        pix_on.pop(q, None)
        pix_off.pop(q, None)
    residual = np.asarray(residual, np.int64)
    base_sq = float((residual ** 2).sum())
    print(f"[match] golden child rows matched {n_matched} (exact bid "
          f"{n_exact}); base sum d^2 = "
          f"{base_sq:.0f}; critical pixels on/off = "
          f"{len(pix_on)}/{len(pix_off)} ({time.time() - t0:.0f}s)")

    # greedy coordinate descent over critical pixels
    delta_bg = {}
    pixels = sorted(set(pix_on) | set(pix_off))
    for pass_i in range(a.passes):
        improved = 0
        for q in pixels:
            v = int(bg[q])
            cur = delta_bg.get(q, 0)
            best_b, best_gain = cur, 0.0
            for db in (-2, -1, 0, 1, 2):
                if db == cur:
                    continue
                gain = 0.0
                bb = v + db
                for rid, iv in pix_on.get(q, ()):
                    was = 1 if (v + cur) - iv >= TRACK_THR else 0
                    now = 1 if bb - iv >= TRACK_THR else 0
                    if was != now:
                        d = residual[rid]
                        gain += d * d - (d - (now - was)) ** 2
                for rid, iv in pix_off.get(q, ()):
                    was = 1 if (v + cur) - iv >= TRACK_THR else 0
                    now = 1 if bb - iv >= TRACK_THR else 0
                    if was != now:
                        d = residual[rid]
                        gain += d * d - (d - (now - was)) ** 2
                if gain > best_gain:
                    best_gain, best_b = gain, db
            if best_b != cur:
                improved += 1
                for rid, iv in pix_on.get(q, ()):
                    was = 1 if (v + cur) - iv >= TRACK_THR else 0
                    now = 1 if (v + best_b) - iv >= TRACK_THR else 0
                    residual[rid] -= (now - was)
                for rid, iv in pix_off.get(q, ()):
                    was = 1 if (v + cur) - iv >= TRACK_THR else 0
                    now = 1 if (v + best_b) - iv >= TRACK_THR else 0
                    residual[rid] -= (now - was)
                delta_bg[q] = best_b
        final_sq = float((residual ** 2).sum())
        print(f"[solve] pass {pass_i}: {improved} pixels changed, "
              f"sum d^2 {base_sq:.0f} -> {final_sq:.0f}")
        if not improved:
            break

    inferred = bg.copy()
    for q, db in delta_bg.items():
        inferred[q] = np.clip(int(bg[q]) + db, 0, 255)
    np.savez_compressed(workdir / "inferred_background.npz",
                        background=inferred, base=bg,
                        n_changed=len(delta_bg))
    print(f"[solve] {len(delta_bg)} background pixels changed "
          f"(+/-2 grey); residual sum d^2 "
          f"{base_sq:.0f} -> {float((residual ** 2).sum()):.0f}")
    if a.no_convert:
        return 0

    # convert with the inferred background and compare
    import trex_tpu.pipeline as pipeline
    from trex_tpu.cli.trex import main as cli_main
    from trex_tpu.config import reset_global_settings

    orig = pipeline.generate_average
    pipeline.generate_average = \
        lambda *args, **kw: inferred.copy()
    try:
        reset_global_settings()
        rc = cli_main([
            "-i", FRAMES, "-o", "test", "-d", str(workdir / "conv"),
            "-s", str(VIDEOS / "test.settings"), "-task", "convert",
            "-nowindow", "-auto_quit"])
    finally:
        pipeline.generate_average = orig
    if rc != 0:
        print("[convert] FAILED")
        return 1
    sys.path.insert(0, str(REPO / "tools"))
    from golden_compare import compare_folders

    from trex_tpu.utils.goldenbar import agreement_report

    ok, worst, unmatched = compare_folders(
        VIDEOS / "compare_data_automatic", workdir / "conv" / "data")
    rep = agreement_report(VIDEOS / "compare_data_automatic",
                           workdir / "conv" / "data")
    out = {"strict_pass": ok, "worst_word_diff": worst,
           "unmatched_files": len(unmatched),
           "agreement": {k: round(v, 4) for k, v in rep.items()
                         if isinstance(v, float)},
           "pixels_changed": len(delta_bg)}
    print("[result] " + json.dumps(out))
    (workdir / "result.json").write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
