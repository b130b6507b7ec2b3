"""Device run-based CC (ops/runcc.py) vs the native labeler, and the
native split_scan vs its numpy reference (track/splitting.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trex_tpu.config import reset_global_settings
from trex_tpu.ops.labeling import label_blobs, split_scan
from trex_tpu.ops.runcc import detect_batch_runs
from trex_tpu.track.splitting import split_scan_py


def _random_frames(rng, B, H, W, n_stamps=30):
    bg = np.full((H, W), 200, np.uint8)
    frames = np.full((B, H, W), 200, np.uint8)
    for b in range(B):
        for _ in range(n_stamps):
            y = rng.integers(0, H - 10)
            x = rng.integers(0, W - 14)
            frames[b, y:y + rng.integers(2, 9),
                   x:x + rng.integers(2, 13)] = rng.integers(60, 160)
    return bg, frames


@pytest.mark.parametrize("absolute", [False, True])
def test_detect_batch_runs_matches_native(absolute):
    rng = np.random.default_rng(7)
    bg, frames = _random_frames(rng, 4, 128, 160)
    out = jax.device_get(detect_batch_runs(
        jnp.asarray(frames), jnp.asarray(bg),
        detect_threshold=15, detect_absolute=absolute,
        track_threshold=20, track_absolute=absolute,
        max_runs=512, max_pixels=8192, max_blobs=128,
        max_child_runs=512, max_children=128))
    assert not np.asarray(out["overflow"]).any()
    for b in range(4):
        ref = label_blobs(frames[b], bg, threshold=15, absolute=absolute,
                          track_threshold=20, track_absolute=absolute)
        dev = out["det"]
        assert int(dev["n_blobs"][b]) == len(ref)
        for i, rb in enumerate(ref):
            x, y, w, h = rb.bounds()
            assert (int(dev["x0"][b, i]), int(dev["y0"][b, i]),
                    int(dev["x1"][b, i]), int(dev["y1"][b, i])) \
                == (x, y, x + w - 1, y + h - 1)
            assert float(dev["count"][b, i]) == rb.num_pixels
            assert float(dev["track_count"][b, i]) == rb.stats[1]
            assert abs(float(dev["sum_x"][b, i]) - rb.stats[2]) < 1e-3
            assert abs(float(dev["sum_y"][b, i]) - rb.stats[3]) < 1e-3
            assert int(dev["n_lines"][b, i]) == len(rb.lines)


def test_children_match_native_track_components():
    """Track-threshold children = native labeling at track threshold,
    with correct parent links."""
    rng = np.random.default_rng(11)
    bg, frames = _random_frames(rng, 2, 96, 128)
    out = jax.device_get(detect_batch_runs(
        jnp.asarray(frames), jnp.asarray(bg),
        detect_threshold=10, detect_absolute=False,
        track_threshold=60, track_absolute=False,
        max_runs=512, max_pixels=8192, max_blobs=128,
        max_child_runs=512, max_children=128))
    assert not np.asarray(out["overflow"]).any()
    for b in range(2):
        # native: components of the track mask (track test & detect mask)
        det = label_blobs(frames[b], bg, threshold=10, absolute=False)
        diff = bg.astype(int) - frames[b].astype(int)
        det_mask = np.zeros_like(bg, bool)
        for blob in det:
            for y, x0, x1 in blob.lines:
                det_mask[y, x0:x1 + 1] = True
        tr = np.where((diff >= 60) & det_mask, frames[b], 0)
        ref = label_blobs(tr.astype(np.uint8), None, threshold=0)
        ch = out["child"]
        assert int(ch["n_blobs"][b]) == len(ref)
        for i, rb in enumerate(ref):
            assert float(ch["count"][b, i]) == rb.num_pixels
            # parent slot: the detect blob containing the child
            p = int(ch["parent"][b, i])
            px0 = int(out["det"]["x0"][b, p])
            px1 = int(out["det"]["x1"][b, p])
            py0 = int(out["det"]["y0"][b, p])
            py1 = int(out["det"]["y1"][b, p])
            x, y, w, h = rb.bounds()
            assert px0 <= x and x + w - 1 <= px1
            assert py0 <= y and y + h - 1 <= py1


def test_runs_reconstruct_masks():
    rng = np.random.default_rng(3)
    bg, frames = _random_frames(rng, 2, 64, 96, n_stamps=12)
    out = jax.device_get(detect_batch_runs(
        jnp.asarray(frames), jnp.asarray(bg),
        detect_threshold=15, detect_absolute=False,
        max_runs=256, max_pixels=4096, max_blobs=64,
        max_child_runs=256, max_children=64))
    for b in range(2):
        mask = np.zeros((64, 96), bool)
        r = out["det_runs"]
        for y, x0, x1, slot in zip(r["y"][b], r["x0"][b], r["x1"][b],
                                   r["slot"][b]):
            if y >= 0:
                assert slot < 64
                mask[y, x0:x1 + 1] = True
        ref = (bg.astype(int) - frames[b].astype(int) >= 15) \
            & (frames[b] != 0)
        np.testing.assert_array_equal(mask, ref)


def test_overflow_flags():
    # a dense noise frame overflows the tiny caps and must say so
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    bg = np.full((64, 64), 200, np.uint8)
    out = jax.device_get(detect_batch_runs(
        jnp.asarray(frame[None]), jnp.asarray(bg),
        detect_threshold=5, detect_absolute=True,
        max_runs=16, max_pixels=64, max_blobs=8,
        max_child_runs=16, max_children=8))
    assert bool(np.asarray(out["overflow"])[0])


def test_sharded_detection_over_mesh():
    """Detection batch sharded over the 8-virtual-device mesh must
    equal the single-device result (SURVEY §5.8 DP-over-tiles)."""
    from trex_tpu.ops.runcc import detect_batch_runs_sharded
    from trex_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    rng = np.random.default_rng(2)
    bg, frames = _random_frames(rng, 8, 96, 128)
    kw = dict(detect_threshold=15, detect_absolute=False,
              track_threshold=20, track_absolute=False,
              max_runs=512, max_pixels=8192, max_blobs=128,
              max_child_runs=512, max_children=128)
    mesh = make_mesh(8, axis_names=("data",))
    sharded = detect_batch_runs_sharded(frames, bg, mesh, **kw)
    single = detect_batch_runs(jnp.asarray(frames), jnp.asarray(bg),
                               **kw)
    # outputs actually shard over the mesh
    shd = sharded["det"]["count"].sharding
    assert getattr(shd, "spec", None) is not None
    for key in ("count", "x0", "x1", "n_blobs"):
        np.testing.assert_array_equal(
            np.asarray(sharded["det"][key]),
            np.asarray(single["det"][key]))
    np.testing.assert_array_equal(
        np.asarray(sharded["child"]["count"]),
        np.asarray(single["child"]["count"]))


def test_native_split_scan_matches_python():
    rng = np.random.default_rng(42)
    s = reset_global_settings()
    s.set("track_threshold", 20)
    s.set("cm_per_pixel", 1.0)
    s.set("calculate_posture", False)
    mismatches = 0
    for trial in range(60):
        h, w = rng.integers(8, 48, 2)
        img = rng.integers(0, 255, (h, w)).astype(np.uint8)
        img[rng.random((h, w)) < 0.5] = 0
        bg = np.full((h, w), 200, np.uint8)
        expected = int(rng.integers(2, 5))
        absolute = bool(rng.integers(0, 2))
        initial = int(rng.integers(1, 40))
        for ranges in ([[20, 400]], [], [[5, 50], [100, 900]]):
            s.set("track_size_filter", ranges)
            a = split_scan(img, bg, initial, absolute, expected, 1.0,
                           float(s["blob_split_max_shrink"]),
                           float(s["blob_split_global_shrink_limit"]),
                           [tuple(r) for r in ranges])
            b = split_scan_py(img, bg, initial, absolute, expected, s)
            mismatches += a != b
    assert mismatches == 0


def test_segmenter_device_engine_matches_host(tmp_path):
    """detect_engine=device must produce the same pv objects and
    tracking as the host labeler (batch shards over the 8-virtual-
    device mesh; overflow frames fall back to the host path)."""
    import cv2

    from trex_tpu.pipeline import Segmenter

    rng = np.random.default_rng(2)
    frames = []
    for f in range(12):
        img = np.full((96, 128), 200, np.uint8)
        for i in range(3):
            x = 10 + 30 * i + f
            y = 20 + 20 * i
            img[y:y + 6, x:x + 10] = 80
        frames.append(img)
    src_dir = tmp_path / "frames"
    src_dir.mkdir()
    for i, fr in enumerate(frames):
        cv2.imwrite(str(src_dir / f"f_{i:03d}.png"), fr)

    outs = {}
    for engine in ("host", "device"):
        s = reset_global_settings()
        s.set("track_max_individuals", 3)
        s.set("track_threshold", 20)
        s.set("track_threshold_is_absolute", False)
        s.set("detect_threshold", 15)
        s.set("detect_threshold_is_absolute", False)
        s.set("track_size_filter", [[5, 400]])
        s.set("calculate_posture", False)
        s.set("frame_rate", 25)
        s.set("cm_per_pixel", 1.0)
        s.set("averaging_method", "max")
        s.set("detect_engine", engine)
        seg = Segmenter(s, str(src_dir / "f_%03d.png"),
                        tmp_path / f"{engine}.pv", track=True)
        tracker = seg.run()
        pos = {fid: [(b.frame, b.centroid.x, b.centroid.y)
                     for b in ind.basic]
               for fid, ind in tracker.individuals.items()}
        from trex_tpu.io.pv import PVFile

        payload = []
        with PVFile.open(tmp_path / f"{engine}.pv") as pv:
            for i in range(len(pv)):
                fr = pv.read_frame(i)
                payload.append([
                    (np.asarray(m).tobytes(), np.asarray(px).tobytes())
                    for m, px in zip(fr.masks, fr.pixels)])
        outs[engine] = (pos, payload)

    assert outs["host"][0] == outs["device"][0]
    assert outs["host"][1] == outs["device"][1]
