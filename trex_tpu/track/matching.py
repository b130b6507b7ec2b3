"""Fish <-> blob assignment: sparse probability graph + matchers.

Re-creates the reference's Match::PairedProbabilities +
Match::PairingGraph (tracking/PairingGraph.h:106-230, PairingGraph.cpp):

- `PairedProbabilities`: sparse bipartite edges fish -> (blob, p)
- matchers selected by `match_mode` (core/default_config.cpp:911):
  * hungarian  — optimal assignment (Kuhn–Munkres; PairingGraph.cpp:1017)
  * approximate — greedy: blobs in sorted order each take their best
    still-free fish (PairingGraph.cpp:1141-1193)
  * tree       — branch-and-bound maximizing sum of p over degree-sorted
    fish (PairingGraph.cpp:1196-1275)
  * automatic  — connected cliques solved optimally, greedy fallback on
    timeout (Tracker.cpp:1371-1755, 1805-1812)
  * benchmark  — run all and report agreement (PairingGraph.cpp:1277-1370)

All matchers operate per connected component ("clique") of the
fish/blob graph, mirroring the reference's decomposition that keeps
Hungarian instances small (Tracker.cpp:1361-1370).
"""
from __future__ import annotations

import time as _time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Hashable, Optional

import numpy as np
from scipy.optimize import linear_sum_assignment


class PairedProbabilities:
    """Sparse fish->blob probability edges."""

    def __init__(self):
        self._fish: list[Hashable] = []
        self._fish_index: dict[Hashable, int] = {}
        self._blobs: list[Hashable] = []
        self._blob_index: dict[Hashable, int] = {}
        self.edges: dict[int, list[tuple[int, float]]] = defaultdict(list)

    def add(self, fish: Hashable, blob: Hashable, p: float):
        fi = self._fish_index.setdefault(fish, len(self._fish))
        if fi == len(self._fish):
            self._fish.append(fish)
        bi = self._blob_index.setdefault(blob, len(self._blobs))
        if bi == len(self._blobs):
            self._blobs.append(blob)
        self.edges[fi].append((bi, float(p)))

    @property
    def n_fish(self):
        return len(self._fish)

    @property
    def n_blobs(self):
        return len(self._blobs)

    def fish(self, i):
        return self._fish[i]

    def blob(self, i):
        return self._blobs[i]

    def blob_edges(self) -> dict[int, list[tuple[int, float]]]:
        out = defaultdict(list)
        for fi, es in self.edges.items():
            for bi, p in es:
                out[bi].append((fi, p))
        return out

    def probability(self, fi: int, bi: int) -> float:
        for b, p in self.edges.get(fi, ()):
            if b == bi:
                return p
        return 0.0

    def max_prob(self) -> float:
        return max((p for es in self.edges.values() for _, p in es),
                   default=0.0)

    def cliques(self) -> list[tuple[list[int], list[int]]]:
        """Connected components of the bipartite graph:
        [(fish_indices, blob_indices), ...]. Fish with no edges form
        singleton cliques with no blobs."""
        # (a scipy.sparse csgraph variant measured ~2x slower than this
        # union-find at typical sizes of ~250 fish x 250 blobs)
        parent = list(range(self.n_fish + self.n_blobs))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        nf = self.n_fish
        for fi, es in self.edges.items():
            for bi, _ in es:
                union(fi, nf + bi)
        groups: dict[int, tuple[list, list]] = defaultdict(lambda: ([], []))
        for fi in range(nf):
            groups[find(fi)][0].append(fi)
        for bi in range(self.n_blobs):
            groups[find(nf + bi)][1].append(bi)
        return list(groups.values())

@dataclass
class MatchResult:
    pairings: dict[Hashable, Hashable] = field(default_factory=dict)  # blob->fish
    improvements_made: int = 0
    leafs_visited: int = 0
    objects_looked_at: int = 0
    mode: str = "automatic"

    def fish_of(self):
        return {f: b for b, f in self.pairings.items()}


def _greedy_on(paired: PairedProbabilities,
               fish_sub=None, blob_sub=None) -> dict[int, int]:
    """Greedy (approximate) matcher: iterate blobs in index order; each
    takes the highest-probability still-unused fish."""
    col = paired.blob_edges()
    used_fish = set()
    out = {}
    blob_ids = sorted(col.keys()) if blob_sub is None else sorted(
        b for b in col.keys() if b in blob_sub)
    allowed_fish = None if fish_sub is None else set(fish_sub)
    for bi in blob_ids:
        best_p, best_f = 0.0, None
        for fi, p in sorted(col[bi]):
            if fi in used_fish:
                continue
            if allowed_fish is not None and fi not in allowed_fish:
                continue
            if p > best_p:
                best_p, best_f = p, fi
        if best_f is not None:
            used_fish.add(best_f)
            out[bi] = best_f
    return out


def _hungarian_on(paired: PairedProbabilities, fish_idx: list[int],
                  blob_idx: list[int]) -> dict[int, int]:
    """Optimal assignment on one clique, maximizing the sum of p.

    The reference scales probabilities to integers for its Kuhn–Munkres
    implementation (PairingGraph.cpp:1017-1139); we match that by scaling
    to the same integer grid so ties break identically.
    """
    if not fish_idx or not blob_idx:
        return {}
    nf, nb = len(fish_idx), len(blob_idx)
    fish_pos = {f: i for i, f in enumerate(fish_idx)}
    blob_pos = {b: i for i, b in enumerate(blob_idx)}
    # integer-scaled probabilities (reference uses a fixed multiplier)
    scale = 10000000.0
    cost = np.zeros((nf, nb), np.int64)
    for fi in fish_idx:
        for bi, p in paired.edges.get(fi, ()):
            if bi in blob_pos:
                cost[fish_pos[fi], blob_pos[bi]] = int(p * scale)
    rows, cols = linear_sum_assignment(cost, maximize=True)
    out = {}
    for r, c in zip(rows, cols):
        if cost[r, c] > 0:
            out[blob_idx[c]] = fish_idx[r]
    return out


def _tree2_on(edges: dict, order: list) -> dict[int, int]:
    """Closed-form exact solver for two-fish cliques, replicating the
    tree search's leaf enumeration order (first maximum in row-major
    over [f1 options desc + unassigned] x [f2 options desc + skip])."""
    f1, f2 = order
    o1 = sorted(edges[f1], key=lambda e: -e[1]) + [(-1, 0.0)]
    o2 = sorted(edges[f2], key=lambda e: -e[1]) + [(-2, 0.0)]
    best = -1.0
    bi = bj = -1
    for b1, p1 in o1:
        for b2, p2 in o2:
            if b1 == b2:
                continue
            t = p1 + p2
            if t > best:
                best = t
                bi, bj = b1, b2
    out = {}
    if bi >= 0:
        out[bi] = f1
    if bj >= 0:
        out[bj] = f2
    return out


def _tree_on(paired: PairedProbabilities, fish_idx: list[int],
             blob_idx: list[int], time_budget: float = 0.5) -> Optional[dict[int, int]]:
    """Branch-and-bound over degree-sorted fish maximizing sum of p
    (PairingGraph.cpp:1196-1275). Returns None on timeout."""
    bset = set(blob_idx)
    edges = {fi: [(bi, p) for bi, p in paired.edges.get(fi, ())
                  if bi in bset] for fi in fish_idx}
    order = sorted(fish_idx, key=lambda fi: len(edges[fi]))
    if len(order) == 2:
        return _tree2_on(edges, order)
    # pre-sort each fish's options once (desc by p, stable)
    options_of = [sorted(edges[fi], key=lambda e: -e[1]) for fi in order]
    # upper bound per suffix: sum of each fish's best p
    best_p = [o[0][1] if o else 0.0 for o in options_of]
    suffix = np.concatenate([np.cumsum(best_p[::-1])[::-1], [0.0]])
    deadline = _time.perf_counter() + time_budget
    best = {"sum": -1.0, "assign": {}}
    used: dict[int, int] = {}
    nodes = [0]

    def rec(i: int, acc: float):
        nodes[0] += 1
        if nodes[0] % 256 == 0 and _time.perf_counter() > deadline:
            raise TimeoutError
        if acc + suffix[i] <= best["sum"]:
            return
        if i == len(order):
            if acc > best["sum"]:
                best["sum"] = acc
                best["assign"] = dict(used)
            return
        fi = order[i]
        for bi, p in options_of[i]:
            if bi in used:
                continue
            used[bi] = fi
            rec(i + 1, acc + p)
            del used[bi]
        rec(i + 1, acc)  # fish stays unassigned

    try:
        rec(0, 0.0)
    except TimeoutError:
        return None
    return {b: f for b, f in best["assign"].items()}


@dataclass
class BenchmarkStats:
    """Per-algorithm accumulation for match_mode=benchmark
    (PairingGraph.cpp `benchmarks` map :1277)."""
    time_acc: float = 0.0
    samples: int = 0


BENCHMARKS: dict[str, BenchmarkStats] = {}
_bench_counter = [0]


def benchmark_report() -> list[str]:
    """Per-algorithm mean wall time, the lines the reference prints
    every 100 benchmark frames (PairingGraph.cpp:1282-1288)."""
    return [
        f"{name}: {st.time_acc / max(1, st.samples) * 1000:.3f}ms "
        f"({st.samples} samples)"
        for name, st in sorted(BENCHMARKS.items())]


def reset_benchmarks():
    BENCHMARKS.clear()
    _bench_counter[0] = 0


def _match_benchmark(paired: PairedProbabilities, result: MatchResult,
                     time_budget: float) -> dict[int, int]:
    """benchmark mode (PairingGraph.cpp:1277-1370): run hungarian,
    tree and approximate on the full frame, accumulate per-algorithm
    wall time, print the periodic report, warn with per-fish diffs on
    disagreement; the hungarian assignment is the one returned."""
    runs: dict[str, dict[int, int]] = {}
    for name in ("hungarian", "tree", "approximate"):
        t0 = _time.perf_counter()
        runs[name] = _match_raw(paired, name, time_budget)
        st = BENCHMARKS.setdefault(name, BenchmarkStats())
        st.time_acc += _time.perf_counter() - t0
        st.samples += 1
    _bench_counter[0] += 1
    if _bench_counter[0] % 100 == 0:
        for line in benchmark_report():
            print(f"[match benchmark] {line}")
    # per-fish comparison: fish -> blob maps per algorithm
    by_fish = {name: {f: b for b, f in raw.items()}
               for name, raw in runs.items()}
    disagreements = []
    for fi in range(paired.n_fish):
        picks = {name: by_fish[name].get(fi) for name in by_fish}
        if len(set(picks.values())) > 1:
            disagreements.append((fi, picks))
    if disagreements:
        result.improvements_made = len(disagreements)
        probs = {fi: dict(paired.edges.get(fi, ()))
                 for fi, _ in disagreements}
        for fi, picks in disagreements:
            parts = []
            for name, bi in sorted(picks.items()):
                p = probs[fi].get(bi, 0.0) if bi is not None else 0.0
                blob = paired.blob(bi) if bi is not None else None
                parts.append(f"({name}) {blob} ({p:.4f})")
            print(f"[match benchmark] warning: individual "
                  f"{paired.fish(fi)}: " + " != ".join(parts))
    return runs["hungarian"]


def _match_raw(paired: PairedProbabilities, mode: str,
               time_budget: float) -> dict[int, int]:
    """Full-frame raw blob-index -> fish-index assignment for one
    concrete algorithm (per-clique decomposition like match())."""
    if mode == "approximate":
        return _greedy_on(paired)
    raw: dict[int, int] = {}
    for fish_idx, blob_idx in paired.cliques():
        if not blob_idx:
            continue
        if mode == "hungarian":
            sub = _hungarian_on(paired, fish_idx, blob_idx)
        else:  # tree
            sub = _tree_on(paired, fish_idx, blob_idx, time_budget)
            if sub is None:
                sub = _greedy_on(paired, fish_idx, set(blob_idx))
        raw.update(sub)
    return raw


def match(paired: PairedProbabilities, mode: str = "automatic",
          time_budget: float = 0.5) -> MatchResult:
    """Run the matcher selected by `mode` over per-clique subproblems."""
    result = MatchResult(mode=mode)
    raw: dict[int, int] = {}
    if mode == "approximate":
        raw = _greedy_on(paired)
    elif mode == "benchmark":
        raw = _match_benchmark(paired, result, time_budget)
    elif mode in ("hungarian", "tree", "automatic"):
        for fish_idx, blob_idx in paired.cliques():
            if not blob_idx:
                continue
            # trivial cliques (the common case for spread-out groups):
            # the optimum is the single best edge; replicates _tree_on's
            # ordering exactly (first maximum in stable desc sort)
            if mode in ("tree", "automatic"):
                if len(fish_idx) == 1:
                    fi = fish_idx[0]
                    bset = set(blob_idx)
                    best_b, best_p = None, -1.0
                    for bi, p in paired.edges.get(fi, ()):
                        if bi in bset and p > best_p:
                            best_b, best_p = bi, p
                    if best_b is not None:
                        raw[best_b] = fi
                    continue
                if len(blob_idx) == 1:
                    bi = blob_idx[0]
                    best_f, best_p = None, -1.0
                    for fi in fish_idx:
                        for b, p in paired.edges.get(fi, ()):
                            if b == bi and p > best_p:
                                best_f, best_p = fi, p
                    if best_f is not None:
                        raw[bi] = best_f
                    continue
            if mode == "hungarian":
                sub = _hungarian_on(paired, fish_idx, blob_idx)
            elif mode == "tree":
                sub = _tree_on(paired, fish_idx, blob_idx, time_budget)
                if sub is None:
                    sub = _greedy_on(paired, fish_idx, set(blob_idx))
            else:  # automatic: optimal per clique (small cliques via the
                # reference's tree search, larger ones via the equivalent
                # Hungarian optimum — Tracker.cpp:1805-1812 semantics)
                if len(fish_idx) <= 8:
                    sub = _tree_on(paired, fish_idx, blob_idx,
                                   min(time_budget, 0.05))
                    if sub is None:
                        sub = _hungarian_on(paired, fish_idx, blob_idx)
                else:
                    sub = _hungarian_on(paired, fish_idx, blob_idx)
            raw.update(sub)
    else:
        raise ValueError(f"unknown match_mode {mode!r}")
    for bi, fi in raw.items():
        result.pairings[paired.blob(bi)] = paired.fish(fi)
    return result
