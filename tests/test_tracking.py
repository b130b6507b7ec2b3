"""Tracking-core tests: motion model math, matching algorithms,
prefilter semantics (reference equations in Individual.cpp:2061-2237,
PairingGraph.cpp, Tracker.cpp:676-964)."""
import math

import numpy as np
import pytest

from trex_tpu.track import (
    Individual,
    PairedProbabilities,
    SizeFilters,
    TrackBlob,
    Tracker,
    match,
    prefilter,
)


def _settings():
    from trex_tpu.config import reset_global_settings

    s = reset_global_settings()
    s.set("frame_rate", 25)
    s.set("track_max_speed", 800)
    s.set("cm_per_pixel", 1.0)
    s.set("track_threshold", 12)
    s.set("track_threshold_is_absolute", False)
    s.set("track_background_subtraction", True)
    s.set("track_size_filter", [[10, 500]])
    s.set("track_max_individuals", 8)
    return s


def _blob_at(x, y, w=6, h=6, value=30):
    lines = np.array([[y + r, x, x + w - 1] for r in range(h)], np.int32)
    px = np.full(w * h, value, np.uint8)
    return TrackBlob(lines, px)


# ----------------------------------------------------------------- motion
def test_time_probability_formula():
    s = _settings()
    ind = Individual(0, s)
    # instant re-sighting, plenty of samples
    p = ind.time_probability(1 / 25, previous_frame=100,
                             recent_number_samples=10, start_frame=0)
    assert p == pytest.approx(1.0)
    # tdelta at the max reassign time drives p towards the floor 0.25
    p2 = ind.time_probability(s["track_max_reassign_time"] + 1 / 25,
                              previous_frame=100,
                              recent_number_samples=10, start_frame=0)
    assert p2 == pytest.approx(0.25)
    # few samples scale p down via (R-1)/F_min + p_min
    p3 = ind.time_probability(1 / 25, previous_frame=100,
                              recent_number_samples=1, start_frame=0)
    assert p3 == pytest.approx((0.0 + s["match_min_probability"]) * 0.75 + 0.25)


def test_position_probability_speed_term():
    s = _settings()
    ind = Individual(0, s)
    from trex_tpu.track.individual import IndividualCache

    cache = IndividualCache(estimated_px=(100.0, 100.0),
                            last_seen_px=(100.0, 100.0),
                            time_probability=1.0, local_tdelta=1 / 25,
                            valid_frame=False, individual_empty=False)
    # at the estimate: S = 1
    assert ind.position_probability(cache, (100, 100), (100, 100)) == 1.0
    # moving exactly D_max away in one frame: S = 1/(1+1)^2 = 0.25
    d = s["track_max_speed"] / 25  # px at cm_per_pixel=1
    p = ind.position_probability(cache, (100 + d, 100), (100 + d, 100))
    assert p == pytest.approx(0.25)


def test_individual_history_and_estimate():
    s = _settings()
    # default track_speed_decay=1.0 disables extrapolation; enable it
    s.set("track_speed_decay", 0.7)
    ind = Individual(0, s)
    times = {}
    for f in range(10):
        t = f / 25
        times[f] = t
        ind.add(f, t, _blob_at(100 + 10 * f, 50))
    cache = ind.cache_for_frame(10, 10 / 25, times, start_frame=0)
    assert not cache.individual_empty
    assert cache.previous_frame == 9
    # moving +10px/frame: the estimate extrapolates ahead of the last pos
    last_x = ind.basic[-1].centroid.x
    assert cache.estimated_px[0] > last_x
    assert cache.time_probability > 0.9


def test_tracklet_splits_on_gap():
    s = _settings()
    ind = Individual(0, s)
    ind.add(0, 0.0, _blob_at(10, 10))
    ind.add(1, 1 / 25, _blob_at(12, 10))
    ind.add(5, 5 / 25, _blob_at(30, 10))  # gap
    assert len(ind.tracklets) == 2
    assert ind.tracklets[0] == [0, 1]
    assert ind.tracklets[1] == [5, 5]


# ----------------------------------------------------------------- matching
def _paired(edges):
    p = PairedProbabilities()
    for fish, blob, prob in edges:
        p.add(fish, blob, prob)
    return p


def test_greedy_matches_best_available():
    p = _paired([("A", 0, 0.9), ("A", 1, 0.8), ("B", 0, 0.95)])
    res = match(p, mode="approximate")
    # blob 0 prefers B (0.95), blob 1 goes to A
    assert res.pairings == {0: "B", 1: "A"}


def test_hungarian_beats_greedy_on_swap_case():
    # greedy gives blob0->A (0.9), leaving blob1 with B at 0.1 (total 1.0)
    # optimal swaps: A->blob1 (0.8), B->blob0 (0.85): total 1.65
    p = _paired([("A", 0, 0.9), ("A", 1, 0.8),
                 ("B", 0, 0.85), ("B", 1, 0.1)])
    res_g = match(p, mode="approximate")
    res_h = match(p, mode="hungarian")
    res_t = match(p, mode="tree")
    res_a = match(p, mode="automatic")

    def total(res):
        lut = {("A", 0): 0.9, ("A", 1): 0.8, ("B", 0): 0.85, ("B", 1): 0.1}
        return sum(lut[(f, b)] for b, f in res.pairings.items())

    assert total(res_h) == pytest.approx(1.65)
    assert total(res_t) == pytest.approx(1.65)
    assert total(res_a) == pytest.approx(1.65)
    assert total(res_g) == pytest.approx(1.0)


def test_benchmark_mode_times_and_reports(capsys):
    """match_mode=benchmark accumulates per-algorithm wall time,
    prints the periodic report every 100 frames and warns with
    per-fish diffs on disagreement (PairingGraph.cpp:1277-1370)."""
    from trex_tpu.track.matching import (
        BENCHMARKS,
        benchmark_report,
        reset_benchmarks,
    )

    reset_benchmarks()
    # swap case: greedy disagrees with the optimal assignment
    p = _paired([("A", 0, 0.9), ("A", 1, 0.8),
                 ("B", 0, 0.85), ("B", 1, 0.1)])
    res = match(p, mode="benchmark")
    # returns the hungarian (optimal) assignment
    assert res.pairings == {1: "A", 0: "B"}
    # greedy differed on both fish -> both flagged
    assert res.improvements_made == 2
    out = capsys.readouterr().out
    assert "individual A" in out and "approximate" in out
    for name in ("hungarian", "tree", "approximate"):
        assert BENCHMARKS[name].samples == 1
        assert BENCHMARKS[name].time_acc >= 0
    lines = benchmark_report()
    assert len(lines) == 3 and all("ms (1 samples)" in l for l in lines)
    # periodic print fires on the 100th benchmark frame
    agree = _paired([("A", 0, 0.9)])
    for _ in range(98):
        match(agree, mode="benchmark")
    capsys.readouterr()
    match(agree, mode="benchmark")  # 100th call
    out = capsys.readouterr().out
    assert "hungarian:" in out and "100 samples" in out
    reset_benchmarks()


def test_matchers_agree_on_random_instances():
    rng = np.random.default_rng(0)
    for trial in range(20):
        nf, nb = rng.integers(1, 8), rng.integers(1, 8)
        p = PairedProbabilities()
        for f in range(nf):
            for b in range(nb):
                if rng.random() < 0.6:
                    p.add(f"f{f}", b, float(rng.random()))
        rh = match(p, mode="hungarian")
        rt = match(p, mode="tree")

        def total(res):
            return sum(
                p.probability(p._fish_index[f], p._blob_index[b])
                for b, f in res.pairings.items())

        assert total(rh) == pytest.approx(total(rt), abs=1e-9), trial


def test_cliques_decomposition():
    p = _paired([("A", 0, 0.5), ("B", 0, 0.4), ("C", 1, 0.9)])
    cliques = p.cliques()
    sizes = sorted((len(f), len(b)) for f, b in cliques)
    assert sizes == [(1, 1), (2, 1)]


# ----------------------------------------------------------------- prefilter
def test_size_filters():
    sf = SizeFilters([[10, 100], [200, 300]])
    assert sf.in_range_of_one(50)
    assert sf.in_range_of_one(250)
    assert not sf.in_range_of_one(150)
    assert sf.max_range == (200.0, 300.0)
    assert sf.close_to_minimum_of_one(5, 0.5)
    assert not sf.close_to_minimum_of_one(4, 0.5)


def test_prefilter_sorts_by_size(settings):
    s = _settings()
    bg = np.full((100, 100), 200, np.uint8)
    small = _blob_at(5, 5, w=2, h=2, value=150)     # 4 px -> noise
    good = _blob_at(20, 20, w=6, h=6, value=150)    # 36 px -> filtered
    big = _blob_at(50, 50, w=30, h=30, value=150)   # 900 px -> big
    res = prefilter(0, [small, good, big], bg, s)
    assert len(res.filtered) == 1
    assert res.filtered[0].num_pixels == 36
    assert len(res.big_blobs) == 1
    assert any(r.name == "OutsideRange" for _, r in res.filtered_out)


def test_prefilter_threshold_resplit(settings):
    """A detection blob containing two well-separated dark cores must be
    re-split by the track threshold."""
    s = _settings()
    bg = np.full((60, 60), 200, np.uint8)
    # one detection blob: two 5x5 cores at value 100, bridged by value 195
    # (bridge passes detect threshold but fails track threshold 12)
    lines, px = [], []
    for r in range(5):
        lines.append((10 + r, 10, 30))
        row = np.full(21, 196, np.uint8)
        row[:5] = 100
        row[-5:] = 100
        px.append(row)
    blob = TrackBlob(np.array(lines, np.int32), np.concatenate(px))
    res = prefilter(0, [blob], bg, s)
    assert len(res.filtered) == 2
    for b in res.filtered:
        assert b.num_pixels == 25
        assert b.split


# ----------------------------------------------------------------- tracker
def test_tracker_follows_two_fish():
    s = _settings()
    bg = np.full((200, 200), 200, np.uint8)
    tracker = Tracker(s, background=bg)
    for f in range(10):
        blobs = [_blob_at(10 + 5 * f, 20, value=100),
                 _blob_at(150 - 5 * f, 120, value=100)]
        pp = tracker.preprocess_frame(f, blobs, time=f / 25)
        tracker.add(pp)
    assert len(tracker.individuals) == 2
    for ind in tracker.individuals.values():
        assert len(ind.basic) == 10
        assert len(ind.tracklets) == 1
    # identities never swapped: x moves monotonically per fish
    xs0 = [b.centroid.x for b in tracker.individuals[0].basic]
    assert all(b > a for a, b in zip(xs0, xs0[1:]))


def test_tracker_respects_max_individuals():
    s = _settings()
    s.set("track_max_individuals", 2)
    bg = np.full((200, 200), 200, np.uint8)
    tracker = Tracker(s, background=bg)
    blobs = [_blob_at(10, 10, value=100), _blob_at(50, 50, value=100),
             _blob_at(100, 100, value=100), _blob_at(150, 150, value=100)]
    pp = tracker.preprocess_frame(0, blobs, time=0.0)
    tracker.add(pp)
    assert len(tracker.individuals) == 2


def test_long_gap_fish_gated_from_first_pass():
    """Individual.cpp:1753: position probability divides the distance
    from the estimate by the GLOBAL one-frame delta, so a fish unseen
    for many frames cannot grab a far blob through the first pass —
    and a recently-seen fish that merely lost the matching is NOT
    reactivation-eligible (only gap >= track_max_reassign_time is)."""
    s = _settings()
    s.set("track_max_individuals", 2)
    s.set("track_do_history_split", False)
    bg = np.full((400, 200), 200, np.uint8)
    tracker = Tracker(s, background=bg)

    # frame 0: two fish
    pp = tracker.preprocess_frame(
        0, [_blob_at(20, 20, value=100), _blob_at(20, 120, value=100)],
        time=0.0)
    tracker.add(pp)
    # fish B (y=120) disappears for 11 frames; fish A keeps moving
    for f in range(1, 12):
        pp = tracker.preprocess_frame(
            f, [_blob_at(20 + 2 * f, 20, value=100)], time=f / 25)
        tracker.add(pp)
    ids_a = [fid for fid, ind in tracker.individuals.items()
             if ind.has(11)]
    id_b = [fid for fid in tracker.individuals if fid not in ids_a][0]

    # frame 12 (gap = 0.44s < 0.5): B's old position reappears 60 px
    # away — speed = 60/0.04/800 = 1.9 -> p = tprob/(1+1.9)^2 < 0.1:
    # gated below match_min_probability; and B is still ACTIVE
    # (gap < t_max) so reactivation must NOT claim it either.
    pp = tracker.preprocess_frame(
        12, [_blob_at(20 + 24, 20, value=100),
             _blob_at(80, 120, value=100)], time=12 / 25)
    tracker.add(pp)
    assert not tracker.individuals[id_b].has(12), \
        "active-but-lost fish must not reactivate before t_max"

    # frame 14 (gap = 0.56s >= 0.5): B is now inactive -> the second
    # pass may claim the blob by pure distance.
    pp = tracker.preprocess_frame(
        13, [_blob_at(20 + 26, 20, value=100)], time=13 / 25)
    tracker.add(pp)
    pp = tracker.preprocess_frame(
        14, [_blob_at(20 + 28, 20, value=100),
             _blob_at(80, 120, value=100)], time=14 / 25)
    tracker.add(pp)
    assert tracker.individuals[id_b].has(14), \
        "inactive fish reactivates via the second pass"


def test_recent_samples_window_breaks_at_gap():
    """Individual.cpp:1802-1838: the recent-samples walk anchors at the
    current frame and stops at tracklet gaps wider than
    frame_rate*track_max_reassign_time, flooring tprob at 0.775 for a
    freshly-reactivated fish (4 samples -> factor 0.7)."""
    s = _settings()
    ind = Individual(0, s)
    blob = _blob_at(10, 10, value=100)
    times = {}
    # tracked 0..20, gap 21..32 (13 frames > 12.5), tracked 33..36
    for f in list(range(21)) + list(range(33, 37)):
        times[f] = f / 25
        ind.add(f, f / 25, blob)
    assert ind.recent_number_samples(37) == 4
    cache = ind.cache_for_frame(37, 37 / 25, times, start_frame=0)
    assert cache.time_probability == pytest.approx(0.7 * 0.75 + 0.25)


def test_track_trusted_probability_breaks_tracklets():
    """A first-pass match below track_trusted_probability starts a new
    tracklet (Reasons::ProbabilityTooSmall, Individual.cpp:1221);
    prob -1 (reactivation/creation) never breaks."""
    from trex_tpu.track.individual import Individual

    s = _settings()
    s.set("track_trusted_probability", 0.5)
    ind = Individual(0, s)
    for f in range(3):
        ind.add(f, f / 25, _blob_at(10 + f, 10), prob=0.9)
    assert len(ind.tracklets) == 1
    ind.add(3, 3 / 25, _blob_at(13, 10), prob=0.3)  # below trusted
    assert len(ind.tracklets) == 2
    ind.add(4, 4 / 25, _blob_at(14, 10), prob=-1.0)  # unknown: no break
    assert len(ind.tracklets) == 2
    assert ind.tracklets[-1] == [3, 4]


def test_huge_timestamp_breaks_tracklets():
    """tracklet_punish_timedelta x huge_timestamp_seconds
    (Individual.cpp:1223): consecutive frames whose time delta exceeds
    the huge threshold split the tracklet."""
    from trex_tpu.track.individual import Individual

    s = _settings()
    s.set("tracklet_punish_timedelta", True)
    s.set("huge_timestamp_seconds", 0.2)
    ind = Individual(0, s)
    ind.add(0, 0.0, _blob_at(10, 10), prob=0.9)
    ind.add(1, 0.04, _blob_at(11, 10), prob=0.9)
    assert len(ind.tracklets) == 1
    ind.add(2, 0.5, _blob_at(12, 10), prob=0.9)  # 0.46 s > 0.2 s
    assert len(ind.tracklets) == 2
