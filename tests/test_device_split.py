"""On-device HistorySplit (ops/device_split.py) vs the host engine:
the expectation kernel must reproduce engine._split_expectation, the
escalation executor must reproduce the native trex_split_execute, and
the fused scan with split_spec must keep DeviceTracker.track_frames
byte-equal to the host FastTracker on merge-heavy video WITHOUT host
assists (VERDICT r2 item 3: crowded frames stay on-chip)."""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from trex_tpu.config import reset_global_settings
from trex_tpu.ops.labeling import label_blobs_raw, split_execute
from trex_tpu.ops.device_split import (SplitSpec, expectation_counts,
                                       split_execute_device)


def _settings(n_fish, split=True, size_filter=(10, 90)):
    s = reset_global_settings()
    s.set("track_max_individuals", n_fish)
    s.set("track_max_speed", 300)
    s.set("cm_per_pixel", 1.0)
    s.set("frame_rate", 25)
    s.set("track_threshold", 20)
    s.set("track_threshold_is_absolute", False)
    s.set("track_background_subtraction", True)
    s.set("track_size_filter", [list(size_filter)])
    s.set("calculate_posture", False)
    s.set("match_mode", "approximate")
    s.set("track_do_history_split", split)
    return s


def _stamp(img, x, y, w=12, h=7, depth=110):
    """Graded blob (darker core) so threshold escalation separates
    overlapping pairs."""
    yy, xx = np.mgrid[0:h, 0:w]
    e = ((yy - h / 2) / (h / 2)) ** 2 + ((xx - w / 2) / (w / 2)) ** 2
    st = np.where(e <= 1.0, (depth * (1.0 - e * 0.75)).astype(int), 0)
    region = img[y:y + h, x:x + w]
    lim = (200 - st[:region.shape[0], :region.shape[1]]).astype(np.uint8)
    np.minimum(region, lim, out=region)


def _render(positions, size=256):
    img = np.full((size, size), 200, np.uint8)
    for p in positions:
        if p is not None:
            _stamp(img, int(p[0]), int(p[1]))
    return img


# ---------------------------------------------------------------------------
# kernel-level differentials
# ---------------------------------------------------------------------------

def test_expectation_counts_matches_host():
    """Device expectation == engine._split_expectation on random
    clustered scenes (marginal trials defer and are skipped)."""
    from trex_tpu.track.engine import FastTracker

    rng = np.random.default_rng(0)
    FCAP, BCAP, RCAP = 32, 64, 4096
    jexp = jax.jit(partial(expectation_counts, B=BCAP))
    checked = nonzero = 0
    for trial in range(40):
        n_fish = int(rng.integers(2, 16))
        bg = np.full((256, 256), 200, np.uint8)
        img = bg.copy()
        pos = []
        for i in range(n_fish):
            if pos and rng.random() < 0.5:
                bx, by = pos[rng.integers(len(pos))]
                x = int(np.clip(bx + rng.integers(-12, 13), 5, 230))
                y = int(np.clip(by + rng.integers(-8, 9), 5, 240))
            else:
                x = int(rng.integers(5, 230))
                y = int(rng.integers(5, 240))
            pos.append((x, y))
            img[y:y + 5, x:x + 9] = 90
        s = _settings(32, size_filter=(5, 400))
        eng = FastTracker(s, bg)
        raw = label_blobs_raw(img, bg, threshold=20, absolute=False,
                              track_threshold=20, track_absolute=False)
        table, _ = eng.build_candidates(
            raw["lines"], raw["pixels"], raw["line_start"],
            raw["pixel_start"], raw["stats"])
        B = table.n
        if B == 0 or B > BCAP:
            continue
        fish_pos = np.array(
            [(x + 4 + rng.normal(0, 4), y + 2 + rng.normal(0, 3))
             for (x, y) in pos])
        max_d = 300.0 / 25.0 * 0.5
        host = eng._split_expectation(table, fish_pos, max_d)
        assert host == eng._split_expectation_py(table, fish_pos, max_d)

        runs = []
        for r in range(B):
            L = np.asarray(table.objs[r].lines) \
                if table.objs[r] is not None \
                else table.lines[table.line_lo[r]:table.line_hi[r]]
            for (y, x0, x1) in L:
                runs.append((y, x0, x1, r))
        runs = np.asarray(runs, np.int32)
        if len(runs) > RCAP or len(fish_pos) > FCAP:
            continue
        F = len(fish_pos)
        fx = np.zeros(FCAP, np.float32)
        fy = np.zeros(FCAP, np.float32)
        fv = np.zeros(FCAP, bool)
        fx[:F], fy[:F], fv[:F] = fish_pos[:, 0], fish_pos[:, 1], True
        rp = np.zeros((RCAP, 4), np.int32)
        rp[:, 3] = BCAP
        rp[:len(runs)] = runs

        def pad(a):
            out = np.zeros(BCAP, np.float32)
            out[:B] = a
            return out

        bv = np.zeros(BCAP, bool)
        bv[:B] = True
        exp, marg = jexp(
            jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(fv),
            jnp.asarray(rp[:, 0]), jnp.asarray(rp[:, 1]),
            jnp.asarray(rp[:, 2]), jnp.asarray(rp[:, 3]),
            jnp.asarray(pad(table.bx0)), jnp.asarray(pad(table.by0)),
            jnp.asarray(pad(table.bx1)), jnp.asarray(pad(table.by1)),
            jnp.asarray(bv), jnp.float32(max_d))
        if bool(marg):
            continue
        dev = {int(b): int(v)
               for b, v in enumerate(np.asarray(exp)[:B]) if v}
        assert dev == host, (trial, host, dev)
        checked += 1
        nonzero += bool(host)
    assert checked >= 20 and nonzero >= 10


def test_split_execute_device_matches_native():
    """Device escalation executor == native trex_split_execute on
    random merged blobs (piece counts, sizes, bboxes, centroid sums)."""
    rng = np.random.default_rng(1)
    spec = SplitSpec(initial=21, absolute=False, cm_sqr=1.0,
                     max_shrink=0.02, shrink_limit=0.01,
                     ranges=((20.0, 800.0),),
                     crop_h=96, crop_w=96, max_runs=256, max_pieces=8)
    jdev = jax.jit(partial(split_execute_device, spec=spec))
    R_CAP = 512
    checked = succeeded = 0
    for trial in range(60):
        bg = np.full((160, 160), 200, np.uint8)
        img = bg.copy()
        for i in range(int(rng.integers(2, 5))):
            x = int(np.clip(70 + rng.integers(-14, 15), 10, 135))
            y = int(np.clip(70 + rng.integers(-10, 11), 10, 140))
            _stamp(img, x, y, w=int(rng.integers(9, 16)),
                   h=int(rng.integers(6, 11)),
                   depth=int(rng.integers(60, 140)))
        raw = label_blobs_raw(img, bg, threshold=20, absolute=False,
                              track_threshold=20, track_absolute=False)
        ls, ps = raw["line_start"], raw["pixel_start"]
        best, bestn = None, 0
        for b in range(len(ls) - 1):
            L = raw["lines"][ls[b]:ls[b + 1]]
            n = int(np.sum(L[:, 2] - L[:, 1] + 1))
            if n > bestn:
                bestn, best = n, b
        if best is None or bestn < 40:
            continue
        L = np.ascontiguousarray(raw["lines"][ls[best]:ls[best + 1]],
                                 np.int32)
        PX = np.ascontiguousarray(raw["pixels"][ps[best]:ps[best + 1]],
                                  np.uint8)
        if len(L) > R_CAP:
            continue
        expected = int(rng.integers(2, 4))
        host = split_execute(L, PX, bg, spec.initial, False, expected,
                             spec.cm_sqr, spec.max_shrink,
                             spec.shrink_limit, [[20.0, 800.0]])
        runs = np.zeros((R_CAP, 4), np.int32)
        runs[:, 3] = 1
        runs[:len(L), 0] = L[:, 0]
        runs[:len(L), 1] = L[:, 1]
        runs[:len(L), 2] = L[:, 2]
        runs[:len(L), 3] = 0
        rows, n_out, marg = jdev(
            jnp.asarray(img), jnp.asarray(bg), jnp.int32(0),
            jnp.int32(L[:, 1].min()), jnp.int32(L[:, 0].min()),
            jnp.asarray(runs[:, 0]), jnp.asarray(runs[:, 1]),
            jnp.asarray(runs[:, 2]), jnp.asarray(runs[:, 3]),
            jnp.int32(expected))
        if bool(marg):
            continue
        rows, n_out = np.asarray(rows), int(n_out)
        assert n_out == len(host), (trial, n_out, host[:, 0])
        if n_out:
            assert np.array_equal(rows[:n_out, 0], host[:, 0])
            assert np.array_equal(rows[:n_out, 1:5],
                                  host[:, 1:5].astype(np.float32))
            assert np.allclose(rows[:n_out, 5:], host[:, 5:],
                               rtol=1e-5, atol=1e-3)
            succeeded += 1
        checked += 1
    assert checked >= 25 and succeeded >= 5, (checked, succeeded)


# ---------------------------------------------------------------------------
# e2e: fused scan with on-device splits == host engine, zero assists
# ---------------------------------------------------------------------------

def _host_tracker(frames, bg, s):
    from trex_tpu.track.engine import FastTracker

    det = dict(threshold=int(s["detect_threshold"]),
               absolute=bool(s["detect_threshold_is_absolute"]),
               track_threshold=int(s["track_threshold"]),
               track_absolute=bool(s["track_threshold_is_absolute"]))
    tr = FastTracker(s, bg)
    for i, fr in enumerate(frames):
        tr.add_frame(i, i / 25.0, **label_blobs_raw(fr, bg, **det))
    return tr


def _crossing_frames(n_frames=60, graded=True):
    frames = []
    for f in range(n_frames):
        dx = abs(n_frames // 2 - f) - 10
        x0 = 118 - max(0, dx)
        x1 = 130 + max(0, dx)
        if graded:
            frames.append(_render([[x0, 100], [x1, 100]]))
        else:
            img = np.full((256, 256), 200, np.uint8)
            img[100:106, x0:x0 + 10] = 80
            img[100:106, x1:x1 + 10] = 80
            frames.append(img)
    return frames


def _compare_history(host, dev, n_frames):
    for f in range(n_frames):
        hh = host.history.get(f)
        hd = dev.history.get(f)
        hmap = {} if hh is None else {
            int(i): (float(x), float(y))
            for i, x, y in zip(hh["fish"], hh["x"], hh["y"])}
        dmap = {} if hd is None else {
            int(i): (float(x), float(y))
            for i, x, y in zip(hd["fish"], hd["x"], hd["y"])}
        for fid, (x, y) in hmap.items():
            assert fid in dmap, (f, fid, hmap, dmap)
            assert abs(dmap[fid][0] - x) < 1e-3, (f, fid, dmap[fid], x)
            assert abs(dmap[fid][1] - y) < 1e-3, (f, fid)


def test_fused_split_merge_heavy_no_assist():
    """Crossing graded fish: the merged blob splits ON DEVICE; the
    fused path must match the host engine with (near-)zero assists."""
    from trex_tpu.track.device_engine import DeviceTracker

    n = 2
    bg = np.full((256, 256), 200, np.uint8)
    frames = _crossing_frames(60, graded=True)
    s = _settings(n, split=True, size_filter=(10, 120))
    host = _host_tracker(frames, bg, s)
    s2 = _settings(n, split=True, size_filter=(10, 120))
    dev = DeviceTracker(s2, bg, chunk=16)
    dev.track_frames(np.stack(frames))
    # splits ran on device: assists only for genuinely marginal frames
    assert len(dev.assist_frames) <= 3, dev.assist_frames
    _compare_history(host, dev, len(frames))
    assert dev.n_fish == host.n_fish


def test_fused_split_uniform_drop_parity():
    """Uniform-intensity overlap: escalation cannot separate the
    merged blob; both engines must DROP it (split fails -> parent
    dropped, fish coast) without host assists."""
    from trex_tpu.track.device_engine import DeviceTracker

    n = 2
    bg = np.full((256, 256), 200, np.uint8)
    frames = _crossing_frames(50, graded=False)
    s = _settings(n, split=True, size_filter=(10, 90))
    host = _host_tracker(frames, bg, s)
    s2 = _settings(n, split=True, size_filter=(10, 90))
    dev = DeviceTracker(s2, bg, chunk=16)
    dev.track_frames(np.stack(frames))
    assert len(dev.assist_frames) <= 3, dev.assist_frames
    _compare_history(host, dev, len(frames))
