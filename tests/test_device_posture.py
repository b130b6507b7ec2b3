"""Device posture (ops/device_posture) vs the host chain.

The per-blob kernel must reproduce track/posture.calculate_posture
(the python/native chain re-creating Posture.cpp:305-410 +
Outline.cpp) to float tolerance, and the fused device engine with
calculate_posture=true must reproduce FastTracker's posture history
(same ok flags, midline lengths, angles) — including the
previous-midline-direction orientation fix that crosses frames."""
import numpy as np
import pytest

from trex_tpu.config import reset_global_settings


def _posture_settings(n=4):
    s = reset_global_settings()
    for k, v in [("track_max_individuals", n), ("track_max_speed", 300),
                 ("cm_per_pixel", 1.0), ("frame_rate", 25),
                 ("track_threshold", 20),
                 ("track_threshold_is_absolute", False),
                 ("track_background_subtraction", True),
                 ("track_size_filter", [[10, 200]]),
                 ("calculate_posture", True),
                 ("track_posture_threshold", 15),
                 ("outline_resample", 0.5),
                 ("match_mode", "automatic")]:
        s.set(k, v)
    return s


def _fish_frame(bg, cx, cy, angle, length, width, curve):
    img = bg.copy()
    SIZE = bg.shape[0]
    for t in np.linspace(-1, 1, 300):
        x = cx + t * length / 2 * np.cos(angle) \
            - (t ** 2 * curve) * np.sin(angle)
        y = cy + t * length / 2 * np.sin(angle) \
            + (t ** 2 * curve) * np.cos(angle)
        w = width * (1 - 0.7 * abs(t))
        for dy in range(-int(w / 2), int(w / 2) + 1):
            for dx in range(-int(w / 2), int(w / 2) + 1):
                if dx * dx + dy * dy <= (w / 2) ** 2:
                    yi, xi = int(y) + dy, int(x) + dx
                    if 0 <= yi < SIZE and 0 <= xi < SIZE:
                        img[yi, xi] = min(img[yi, xi],
                                          80 + int(40 * abs(t)))
    return img


def test_posture_kernel_matches_host_chain():
    """Per-blob kernel vs calculate_posture on random curved fish,
    with and without a movement direction."""
    import jax
    import jax.numpy as jnp

    from trex_tpu.ops.device_posture import (make_posture_batch,
                                             spec_from_settings)
    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track import posture as hp
    from trex_tpu.track.blob import TrackBlob

    s = _posture_settings()
    spec = spec_from_settings(s, crop_h=64, crop_w=64)
    fn = jax.jit(make_posture_batch(spec))
    rng = np.random.default_rng(1)
    bg = np.full((128, 128), 200, np.uint8)
    R = 256
    for trial in range(10):
        img = _fish_frame(bg, 64, 64, rng.uniform(0, 2 * np.pi),
                          rng.uniform(16, 34), rng.uniform(5, 9),
                          rng.uniform(0, 6))
        blobs = label_blobs(img, bg, threshold=20, absolute=False,
                            track_threshold=20, track_absolute=False)
        b = max(blobs, key=lambda bb: bb.num_pixels)
        mv = rng.normal(0, 1, 2) if trial % 2 else None
        host = hp.calculate_posture(
            TrackBlob(b.lines, b.pixels, stats=b.stats), s,
            background=bg, movement_direction=mv)
        lines = np.asarray(b.lines, np.int32)
        ry = np.full(R, -1, np.int32)
        rx0 = np.zeros(R, np.int32)
        rx1 = np.zeros(R, np.int32)
        rslot = np.full(R, 99, np.int32)
        nl = len(lines)
        ry[:nl] = lines[:, 0]
        rx0[:nl] = lines[:, 1]
        rx1[:nl] = lines[:, 2]
        rslot[:nl] = 0
        pm = np.zeros((1, 2), np.float32) if mv is None \
            else np.asarray([mv], np.float32)
        out = fn(jnp.asarray(img), jnp.asarray(bg),
                 jnp.asarray([0], np.int32),
                 jnp.asarray([int(lines[:, 1].min())], np.int32),
                 jnp.asarray([int(lines[:, 0].min())], np.int32),
                 jnp.asarray(ry), jnp.asarray(rx0), jnp.asarray(rx1),
                 jnp.asarray(rslot), jnp.asarray(pm),
                 jnp.asarray([True]))
        hok = host is not None and host.midline is not None
        assert bool(out["ok"][0]) == hok, trial
        if hok:
            assert abs(float(out["length"][0])
                       - host.midline.len) < 0.05, trial
            da = abs(float(out["angle"][0]) - host.midline.angle)
            assert min(da, 2 * np.pi - da) < 1e-3, trial


def _asym_frames(n, n_frames, seed=3):
    """Asymmetric moving fish (thick head) so the direction fix has
    something to orient."""
    rng = np.random.default_rng(seed)
    bg = np.full((256, 256), 200, np.uint8)
    pos = np.array([[40.0 + 50 * i, 60.0 + 40 * i] for i in range(n)])
    vel = rng.normal(0, 2.0, (n, 2))
    frames = []
    for _ in range(n_frames):
        img = bg.copy()
        for x, y in pos:
            xi, yi = int(x), int(y)
            img[yi:yi + 6, xi:xi + 14] = 90
            img[yi + 1:yi + 5, xi:xi + 8] = 70
        frames.append(img)
        pos = np.clip(pos + vel, 10, 230)
    return bg, frames


def _host_tracker(frames, bg, s):
    from trex_tpu.ops.labeling import label_blobs_raw
    from trex_tpu.track.engine import FastTracker

    det = dict(threshold=int(s["detect_threshold"]), absolute=False,
               track_threshold=int(s["track_threshold"]),
               track_absolute=False)
    tr = FastTracker(s, bg)
    for i, fr in enumerate(frames):
        tr.add_frame(i, i / 25.0, **label_blobs_raw(fr, bg, **det))
    return tr


def _compare_posture(host, dev, n_frames, tol_len=0.05, tol_ang=1e-3):
    for f in range(n_frames):
        hh = host.posture_history.get(f)
        hd = dev.posture_history.get(f)
        hm = {} if hh is None else {
            int(i): (bool(o), float(l), float(a)) for i, o, l, a in
            zip(hh["fish"], hh["ok"], hh["midline_length"],
                hh["angle"])}
        dm = {} if hd is None else {
            int(i): (bool(o), float(l), float(a)) for i, o, l, a in
            zip(hd["fish"], hd["ok"], hd["midline_length"],
                hd["angle"])}
        for fid, (o, l, a) in hm.items():
            assert fid in dm, (f, fid)
            do_, dl, da = dm[fid]
            assert do_ == o, (f, fid)
            if o:
                assert abs(dl - l) < tol_len, (f, fid, l, dl)
                dang = abs(da - a)
                assert min(dang, 2 * np.pi - dang) < tol_ang, \
                    (f, fid, a, da)


def test_device_engine_posture_fused():
    """track_frames with calculate_posture: the posture scan runs on
    device (zero assists) and matches FastTracker's posture history."""
    from trex_tpu.track.device_engine import DeviceTracker

    n = 4
    bg, frames = _asym_frames(n, 30)
    host = _host_tracker(frames, bg, _posture_settings(n))
    dev = DeviceTracker(_posture_settings(n), bg, chunk=8)
    dev.track_frames(np.stack(frames))
    assert not dev.assist_frames, dev.assist_frames
    assert len(dev.posture_history) == len(host.posture_history)
    _compare_posture(host, dev, len(frames))


def test_device_engine_posture_pv_path():
    """add_frame_blobs (pv re-track): posture runs host-side via the
    same native batch chain, walking the carry's direction section."""
    from trex_tpu.ops.labeling import label_blobs
    from trex_tpu.track.blob import TrackBlob
    from trex_tpu.track.device_engine import DeviceTracker

    n = 4
    bg, frames = _asym_frames(n, 30)
    s = _posture_settings(n)
    host = _host_tracker(frames, bg, s)
    det = dict(threshold=int(s["detect_threshold"]), absolute=False,
               track_threshold=20, track_absolute=False)
    dev = DeviceTracker(_posture_settings(n), bg, chunk=16)
    for i, fr in enumerate(frames):
        blobs = label_blobs(fr, bg, **det)
        dev.add_frame_blobs(i, i / 25.0,
                            [TrackBlob(b.lines, b.pixels,
                                       stats=b.stats) for b in blobs])
    dev.finalize()
    _compare_posture(host, dev, len(frames))


def test_positions_export_includes_posture(tmp_path):
    from trex_tpu.track.device_engine import (DeviceTracker,
                                              export_positions)

    n = 3
    bg, frames = _asym_frames(n, 12, seed=5)
    dev = DeviceTracker(_posture_settings(n), bg, chunk=8)
    dev.track_frames(np.stack(frames))
    out = tmp_path / "pos.npz"
    export_positions(dev, out)
    d = np.load(out)
    assert "midline_length" in d.files and "posture_ok" in d.files
    assert d["posture_ok"].any()
    assert (d["midline_length"][d["posture_ok"]] > 1.0).all()


def test_two_stage_posture_equals_fused():
    """fused_scan_packed(two_stage=True) compiles tracking and posture
    as separate device-resident programs; the packed result must be
    byte-identical to the single fused program (the split exists only
    to dodge the relay's composed-program while-loop pathology,
    ROUND3_NOTES.md)."""
    import numpy as np

    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.device_engine import DeviceTracker

    s = reset_global_settings()
    s.set("track_max_individuals", 6)
    s.set("track_max_speed", 300)
    s.set("cm_per_pixel", 1.0)
    s.set("frame_rate", 25)
    s.set("track_threshold", 20)
    s.set("track_background_subtraction", True)
    s.set("track_size_filter", [[10, 200]])
    s.set("calculate_posture", True)
    s.set("track_posture_threshold", 15)
    s.set("outline_resample", 0.5)
    s.set("match_mode", "approximate")
    s.set("track_do_history_split", False)
    rng = np.random.default_rng(3)
    size = 192
    bg = np.full((size, size), 200, np.uint8)
    pos = rng.uniform(20, size - 30, (6, 2))
    vel = rng.normal(0, 1.5, (6, 2))
    frames = []
    for _ in range(16):
        img = bg.copy()
        for (x, y) in pos:
            xi, yi = int(x), int(y)
            img[yi:yi + 6, xi:xi + 12] = 90
        frames.append(img)
        pos = np.clip(pos + vel, 10, size - 20)
    batch = np.stack(frames)
    one = DeviceTracker(s, bg, chunk=16).track_frames(batch)
    two = DeviceTracker(s, bg, chunk=16,
                        posture_two_stage=True).track_frames(batch)
    for f in range(16):
        h1 = one.posture_history.get(f)
        h2 = two.posture_history.get(f)
        assert (h1 is None) == (h2 is None), f
        if h1 is None:
            continue
        np.testing.assert_array_equal(h1["fish"], h2["fish"])
        np.testing.assert_array_equal(h1["ok"], h2["ok"])
        np.testing.assert_array_equal(h1["midline_length"],
                                      h2["midline_length"])
    assert one.history.keys() == two.history.keys()
    for f in one.history:
        np.testing.assert_array_equal(one.history[f]["fish"],
                                      two.history[f]["fish"])
        np.testing.assert_array_equal(one.history[f]["x"],
                                      two.history[f]["x"])
