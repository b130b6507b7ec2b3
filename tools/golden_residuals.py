#!/usr/bin/env python3
"""Per-column, per-frame residual histogram vs the reference golden CSVs.

The judge's diagnostic (VERDICT round 2): split every golden mismatch into
(a) print-boundary +-1 (a value that would round to the golden integer
under a <=0.5-ulp shift at the 0-decimal print boundary) and (b)
systematic error. Identity mapping golden<->produced is chosen by X
agreement (the strongest column).

Usage: golden_residuals.py <golden_dir> <produced_dir> [--col midline_length]
"""
import sys
from collections import Counter
from pathlib import Path

import numpy as np

COLS = ["SPEED#wcentroid (cm/s)", "X#wcentroid (cm)", "blobid",
        "midline_length", "num_pixels"]


def load(p: Path):
    rows = {}
    with open(p) as f:
        hdr = f.readline().strip().split(",")
        idx = {c: hdr.index(c) for c in COLS}
        for line in f:
            parts = line.strip().split(",")
            if not parts or parts == [""]:
                continue
            fr = int(parts[0])
            rows[fr] = {c: parts[idx[c]] for c in COLS}
    return rows


def match_identities(golden_files, produced_files):
    """Assign each golden file the produced file with most X matches."""
    g_data = {g: load(g) for g in golden_files}
    p_data = {p: load(p) for p in produced_files}
    score = np.zeros((len(golden_files), len(produced_files)))
    for i, g in enumerate(golden_files):
        for j, p in enumerate(produced_files):
            n = 0
            for fr, grow in g_data[g].items():
                prow = p_data[p].get(fr)
                if prow and prow["X#wcentroid (cm)"] == grow["X#wcentroid (cm)"]:
                    n += 1
            score[i, j] = n
    # greedy assignment (files are few)
    mapping = {}
    used = set()
    order = np.argsort(-score.max(axis=1))
    for i in order:
        j_best = None
        for j in np.argsort(-score[i]):
            if j not in used:
                j_best = j
                break
        used.add(j_best)
        mapping[golden_files[i]] = produced_files[j_best]
    return mapping, g_data, p_data


def main():
    golden_dir, produced_dir = Path(sys.argv[1]), Path(sys.argv[2])
    focus = None
    if "--col" in sys.argv:
        focus = sys.argv[sys.argv.index("--col") + 1]
    gf = sorted(golden_dir.glob("*.csv"))
    pf = sorted(produced_dir.glob("*.csv"))
    mapping, g_data, p_data = match_identities(gf, pf)

    col_stats = {c: Counter() for c in COLS}
    residuals = {c: [] for c in COLS}
    focus_rows = []
    for g, p in sorted(mapping.items()):
        grows, prows = g_data[g], p_data[p]
        for fr in sorted(grows):
            grow, prow = grows[fr], prows.get(fr)
            if prow is None:
                for c in COLS:
                    col_stats[c]["missing_row"] += 1
                continue
            for c in COLS:
                gv, pv = grow[c], prow[c]
                if gv == pv:
                    col_stats[c]["exact"] += 1
                    continue
                try:
                    gn, pn = float(gv), float(pv)
                except ValueError:
                    col_stats[c]["nonnumeric_diff"] += 1
                    continue
                if np.isnan(gn) and np.isnan(pn):
                    col_stats[c]["exact"] += 1
                    continue
                d = pn - gn
                residuals[c].append(d)
                if abs(d) <= 1.0:
                    col_stats[c]["off_by_1"] += 1
                else:
                    col_stats[c]["systematic"] += 1
                if focus and c == focus:
                    focus_rows.append((g.name, fr, gn, pn, d))
    total = sum(len(r) for r in g_data.values())
    print(f"rows total per column: {total}")
    print(f"identity mapping: " + ", ".join(
        f"{g.name}->{p.name}" for g, p in sorted(mapping.items())))
    for c in COLS:
        s = col_stats[c]
        n_exact = s["exact"]
        res = np.array(residuals[c]) if residuals[c] else np.array([0.0])
        print(f"\n{c}: exact {n_exact}/{total} = {n_exact/total:.3f}  "
              f"off_by_1 {s['off_by_1']}  systematic {s['systematic']}  "
              f"missing {s['missing_row']}")
        if residuals[c]:
            q = np.percentile(np.abs(res), [50, 90, 99, 100])
            print(f"  |residual| p50={q[0]:.3g} p90={q[1]:.3g} "
                  f"p99={q[2]:.3g} max={q[3]:.3g}  mean_signed={res.mean():.3g}")
            hist = Counter(np.round(res).astype(int))
            print("  signed-int histogram:", dict(sorted(hist.items())))
    if focus:
        print(f"\nfirst 40 {focus} mismatches (file, frame, golden, ours, diff):")
        for row in focus_rows[:40]:
            print("  ", row)


if __name__ == "__main__":
    main()
