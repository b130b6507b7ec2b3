#!/usr/bin/env python3
"""Golden-CSV comparison replicating the reference harness
(Application/Tests/run_unix.bash compare_csv_folder): every golden file
must exactly match SOME produced file (identity permutation allowed);
at most one unmatched golden is tolerated when its closest word-diff is
<= 12 lines.

Usage: golden_compare.py <golden_dir> <produced_dir> [--verbose]
Exit 0 = pass.
"""
import subprocess
import sys
from pathlib import Path


def word_diff_lines(a: Path, b: Path) -> int:
    out = subprocess.run(
        ["git", "--no-pager", "diff", "--word-diff", "--no-index",
         "--", str(a), str(b)],
        capture_output=True, text=True)
    return len(out.stdout.splitlines())


def compare_folders(golden_dir, produced_dir, verbose=False):
    golden = sorted(Path(golden_dir).glob("*.csv"))
    produced = sorted(Path(produced_dir).glob("*.csv"))
    if not golden:
        print(f"ERROR: no golden CSVs in {golden_dir}")
        return False, -1, []
    if not produced:
        print(f"ERROR: no produced CSVs in {produced_dir}")
        return False, -1, [(g, None, 10 ** 9) for g in golden]
    produced_content = {p: p.read_bytes() for p in produced}
    unmatched = []
    used = set()
    for g in golden:
        gb = g.read_bytes()
        hit = None
        for p, pb in produced_content.items():
            if p in used:
                continue
            if pb == gb:
                hit = p
                break
        if hit is not None:
            used.add(hit)
            if verbose:
                print(f"{g.name} == {hit.name}")
        else:
            closest, closest_p = None, None
            for p in produced:
                n = word_diff_lines(p, g)
                if closest is None or n < closest:
                    closest, closest_p = n, p
            unmatched.append((g, closest_p, closest))
            if verbose:
                print(f"{g.name}: NO exact match; closest "
                      f"{closest_p.name} ({closest} word-diff lines)")
    if not unmatched:
        return True, 0, []
    if len(unmatched) == 1 and unmatched[0][2] <= 12:
        return True, unmatched[0][2], unmatched
    return False, max(u[2] for u in unmatched), unmatched


if __name__ == "__main__":
    verbose = "--verbose" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ok, worst, unmatched = compare_folders(args[0], args[1], verbose)
    print(f"{'PASS' if ok else 'FAIL'}: {len(unmatched)} unmatched, "
          f"worst word-diff {worst}")
    sys.exit(0 if ok else 1)
