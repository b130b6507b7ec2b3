"""ML layer tests: uniqueness math, accumulation curriculum,
auto-correct, categorization (reference Accumulation.cpp:767-887,
Tracker.cpp:3026+, trex_learn_category.py)."""
import numpy as np
import pytest

from trex_tpu.ml import (
    VINetwork,
    assign_identities,
    calculate_uniqueness,
    good_uniqueness,
)
from trex_tpu.ml.auto_correct import TrackletPrediction


def test_good_uniqueness_thresholds():
    assert good_uniqueness(2) == pytest.approx(0.95)
    assert good_uniqueness(10) == pytest.approx(0.95)
    assert good_uniqueness(100) == pytest.approx(0.995)
    assert good_uniqueness(4) == pytest.approx(0.9)  # (4-0.5)/4 < 0.9 -> 0.9


def test_uniqueness_perfect_separation():
    # 2 frames x 3 ids, each sample confidently its own id
    preds = np.zeros((6, 3))
    for i in range(6):
        preds[i, i % 3] = 0.99
    mapping = {0: (0, 3), 1: (3, 6)}
    good, per_frame, mean_p, per_id = calculate_uniqueness(preds, mapping, 3)
    assert good == 1.0
    assert mean_p > 0.95
    assert all(v > 0.95 for v in per_frame.values())
    assert per_id.shape == (3,)


def test_uniqueness_catches_duplicates():
    # both samples in the frame predict the same id -> bad frame
    preds = np.array([[0.9, 0.05], [0.8, 0.1]])
    good, per_frame, mean_p, _ = calculate_uniqueness(preds, {0: (0, 2)}, 2)
    assert good == 0.0
    assert per_frame[0] < 0.6  # only 1 of 2 unique


def test_assign_identities_conflict_resolution():
    p_a = np.array([0.1, 0.9])
    p_b = np.array([0.2, 0.8])
    preds = [
        TrackletPrediction(fid=0, range=(0, 10), probs=p_a, samples=5),
        TrackletPrediction(fid=1, range=(5, 15), probs=p_b, samples=5),
        TrackletPrediction(fid=1, range=(20, 30), probs=np.array([0.7, 0.3]),
                           samples=5),
    ]
    c = assign_identities(preds, 2, min_probability=0.5)
    # tracklet A (conf 0.9) claims id 1; overlapping B is skipped
    assert (0, 10, 0) in c.ranges[1]
    assert all(r[0] != 5 for r in c.ranges.get(1, []) if r[2] == 1)
    assert (20, 30, 1) in c.ranges[0]
    assert c.skipped == 1


def _toy_tracker(n_fish=3, n_frames=30, size=120):
    """Tiny synthetic tracker with visually distinct individuals."""
    from trex_tpu.config import reset_global_settings
    from trex_tpu.track import TrackBlob, Tracker

    s = reset_global_settings()
    s.set("frame_rate", 25)
    s.set("track_max_speed", 200)
    s.set("cm_per_pixel", 1.0)
    s.set("track_threshold", 10)
    s.set("track_threshold_is_absolute", False)
    s.set("track_size_filter", [[5, 400]])
    s.set("track_max_individuals", n_fish)
    s.set("individual_image_size", [32, 32])
    s.set("individual_image_normalization", "none")
    s.set("calculate_posture", False)
    s.set("gpu_max_epochs", 10)
    s.set("gpu_min_iterations", 5)
    s.set("accumulation_max_tracklets", 3)
    s.set("accumulation_sufficient_uniqueness", 0.8)

    bg = np.full((size, size), 200, np.uint8)
    tracker = Tracker(s, background=bg)
    rng = np.random.default_rng(0)
    xs = [15 + i * 35 for i in range(n_fish)]
    for f in range(n_frames):
        blobs = []
        for i in range(n_fish):
            x = xs[i] + int(3 * np.sin(f / 4 + i))
            y = 30 + i * 25
            w, h = 6 + 3 * i, 9 - 2 * i  # distinct shapes per identity
            lines = np.array([[y + r, x, x + w - 1] for r in range(h)],
                             np.int32)
            val = 60 + 40 * i  # distinct darkness per identity
            px = np.full(w * h, val, np.uint8) + \
                rng.integers(0, 5, w * h).astype(np.uint8)
            blobs.append(TrackBlob(lines, px))
        pp = tracker.preprocess_frame(f, blobs, time=f / 25)
        tracker.add(pp)
    return tracker, s


def test_accumulation_end_to_end():
    from trex_tpu.ml import Accumulation

    tracker, s = _toy_tracker()
    acc = Accumulation(tracker, s)
    # 20 epochs: BN momentum now matches the torch reference (0.9 flax
    # = 0.1 torch), so eval-time running stats need a few more steps
    result = acc.start(max_epochs=20)
    assert result.steps, "no accumulation steps ran"
    assert result.final_uniqueness > 0.8
    assert result.success


def test_auto_correct_roundtrip():
    from trex_tpu.ml import Accumulation, check_tracklets_identities
    from trex_tpu.ml.vi_facade import VINetwork

    tracker, s = _toy_tracker()
    acc = Accumulation(tracker, s)
    acc.start(max_epochs=20)

    class _Net:
        num_classes = 3

        def probabilities(self, images):
            return acc.trainer.predict(images)

    matches, corrections = check_tracklets_identities(tracker, s, _Net())
    assert corrections.ranges
    # every identity should claim at least one range, consistent labels
    assert len(corrections.ranges) == 3
    assert matches  # frame -> {id: blob_id} map materialized


def test_categorizer():
    from trex_tpu.ml import Categorizer

    tracker, s = _toy_tracker()
    cat = Categorizer(s, ["dark", "light"])
    # label fish 0 (darkest) as dark, fish 2 as light
    cat.store.set_ranged_label(0, 0, 29, "dark")
    cat.store.set_ranged_label(2, 0, 29, "light")
    # the 30-frame toy ranges sit under the reference default min
    # training length (categories_train_min_tracklet_length = 50,
    # CategorizeDatastore.cpp:312): nothing to train on
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cat.train(tracker, max_epochs=20)
    s.set("categories_train_min_tracklet_length", 10)
    cat.train(tracker, max_epochs=20)
    applied = cat.apply(tracker, min_tracklet_length=1)
    assert applied
    labels = {r.fid: r.label for r in applied}
    assert labels[0] == 0
    assert labels[2] == 1
    assert cat.store.ranged_label(5, 0) == 0


def test_track_consistent_categories_vetoes_matching():
    """track_consistent_categories (Individual.cpp:2210-2218): a fish
    whose recent blobs carry category A cannot be matched to a blob the
    DataStore labels B — the pairing probability is zeroed before the
    matching pass."""
    from trex_tpu.ml.categorize import DataStore
    from trex_tpu.track import TrackBlob

    def one_more_frame(tracker, f, label_next=None, store=None):
        # a single blob where fish 0 is expected next
        lines = np.array([[30 + r, 15, 20] for r in range(9)], np.int32)
        px = np.full(6 * 9, 60, np.uint8)
        b = TrackBlob(lines, px)
        if label_next is not None:
            store.set_blob_label(f, b.blob_id, label_next)
        pp = tracker.preprocess_frame(f, [b], time=f / 25)
        tracker.add(pp)
        return tracker.individuals[0].has(f)

    # control: without the veto fish 0 picks the blob up
    tracker, s = _toy_tracker()
    assert one_more_frame(tracker, 30)

    tracker, s = _toy_tracker()
    store = DataStore(["a", "b"])
    store.index_individual(tracker.individuals[0], 0, 29, "a")
    tracker.category_store = store
    s.set("track_consistent_categories", True)
    # same blob, but labeled "b": fish 0 (recent majority "a") must not
    # take it
    assert not one_more_frame(tracker, 30, label_next="b", store=store)
    # sanity: an "a"-labeled blob still matches
    tracker2, s2 = _toy_tracker()
    store2 = DataStore(["a", "b"])
    store2.index_individual(tracker2.individuals[0], 0, 29, "a")
    tracker2.category_store = store2
    s2.set("track_consistent_categories", True)
    assert one_more_frame(tracker2, 30, label_next="a", store=store2)


def test_vi_network_facade(tmp_path):
    from trex_tpu.config import reset_global_settings
    from trex_tpu.ml import TrainingMode

    s = reset_global_settings()
    s.set("individual_image_size", [16, 16])
    s.set("gpu_max_epochs", 5)
    s.set("gpu_min_iterations", 2)
    net = VINetwork(s)
    rng = np.random.default_rng(0)
    images = np.zeros((60, 16, 16, 1), np.float32)
    labels = rng.integers(0, 2, 60)
    images[labels == 1, 4:12, 4:12] = 220
    net.train(images, labels, 2, TrainingMode.Restart,
              weights_file=tmp_path / "model.pt")
    probs = net.probabilities(images[:4])
    assert probs.shape == (4, 2)
    assert (tmp_path / "model_weights.npz").exists()
    net2 = VINetwork(s)
    net2.train(images, labels, 2, TrainingMode.LoadWeights,
               weights_file=tmp_path / "model.pt")
    np.testing.assert_allclose(net2.probabilities(images[:4]), probs,
                               atol=1e-5)


def test_vi_training_sharded_over_mesh():
    """VITrainer with a mesh: batches shard over 'data' across the 8
    virtual devices, params replicate, result matches the unsharded
    trainer closely (same data order; reduction order may differ)."""
    import jax
    import numpy as np
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from trex_tpu.models import VITrainer, build
    from trex_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    n, ncls = 128, 4
    images = rng.integers(0, 255, (n, 32, 32, 1)).astype(np.float32)
    labels = (np.arange(n) % ncls).astype(np.int32)

    mesh = make_mesh(8, axis_names=("data",))
    sharded = VITrainer(build("v118_3", ncls), ncls, (32, 32, 1),
                        mesh=mesh)
    plain = VITrainer(build("v118_3", ncls), ncls, (32, 32, 1))
    with mesh:
        r1 = sharded.train(images, labels, val_images=images,
                           val_labels=labels, max_epochs=2,
                           batch_size=64, min_iterations=1)
        probs_s = sharded.predict(images[:64], batch_size=64)
    r2 = plain.train(images, labels, val_images=images,
                     val_labels=labels, max_epochs=2,
                     batch_size=64, min_iterations=1)
    probs_p = plain.predict(images[:64], batch_size=64)
    assert probs_s.shape == probs_p.shape
    np.testing.assert_allclose(probs_s, probs_p, atol=5e-2)


def test_learn_static_entry(tmp_path):
    """learn_static: static-dataset training entry (legacy TF path)."""
    import numpy as np

    from trex_tpu.ml.learn_static import load_dataset, train_static

    rng = np.random.default_rng(0)
    # 3 distinguishable classes of 16x16 patterns
    images = np.zeros((90, 16, 16), np.uint8)
    labels = np.repeat(np.arange(3), 30).astype(np.int32)
    images[labels == 0, 2:6, :] = 220
    images[labels == 1, :, 2:6] = 220
    images[labels == 2, 8:14, 8:14] = 220
    images = np.clip(images.astype(int)
                     + rng.integers(0, 30, images.shape), 0, 255
                     ).astype(np.uint8)
    np.savez(tmp_path / "ds.npz", images=images, labels=labels)
    imgs, lbls = load_dataset(tmp_path / "ds.npz")
    trainer, result = train_static(
        imgs, lbls, version="v118_3", max_epochs=8, batch_size=32,
        output_prefix=str(tmp_path / "tagmodel"))
    assert (tmp_path / "tagmodel_weights.npz").exists()
    acc = trainer.per_class_accuracy(imgs, lbls)
    assert acc.mean() > 0.8


def test_cli_auto_categorize_flow():
    """auto_categorize (TrackingState.cpp:890): a tracker carrying a
    labeled DataStore gets trained + applied after tracking."""
    from trex_tpu.cli.trex import _auto_categorize
    from trex_tpu.ml.categorize import DataStore

    tracker, s = _toy_tracker()
    s["categories_ordered"] = ["dark", "light"]
    store = DataStore(["dark", "light"])
    store.set_ranged_label(0, 0, 29, "dark")
    store.set_ranged_label(2, 0, 29, "light")
    tracker.category_store = store

    _auto_categorize(tracker, s, state=None)
    out = tracker.category_store
    assert out.ranged_label(5, 0) == 0
    assert out.ranged_label(5, 2) == 1


def test_auto_tags_votes_and_assignment():
    from trex_tpu.ml.auto_tags import apply_tags, tag_tracklet_predictions

    tracker, s = _toy_tracker()
    # tag detections: tag (fid+1)%3 rides on fish fid's blob each frame
    tags = {}
    for fid, ind in tracker.individuals.items():
        tid = (fid + 1) % 3
        dets = {}
        for f in range(0, 30, 2):
            b = ind.basic_stuff(f)
            if b is not None:
                dets[f] = (int(b.blob.blob_id), 1.0)
        tags[tid] = dets
    preds = tag_tracklet_predictions(tracker, tags)
    assert preds
    for p in preds:
        assert p.probs.argmax() == (p.fid + 1) % 3

    matches, corrections = apply_tags(tracker, s, tags)
    # every fish claims its tag identity over its tracklets
    for tid, ranges in corrections.ranges.items():
        for (t0, t1, fid) in ranges:
            assert tid == (fid + 1) % 3
    assert matches


def test_auto_tags_roundtrip_through_results(tmp_path):
    from trex_tpu.export.results import load_results, save_results
    from trex_tpu.track import Tracker

    tracker, s = _toy_tracker()
    # pretend the Hungarian tag matcher assigned tag 2 to fish 0 at
    # frames 3/5 (tracker.add's tags_recognize path)
    tracker.tag_assignments = {3: {0: 2}, 5: {0: 2}}
    path = tmp_path / "toy.results"
    save_results(tracker, s, path)

    bg = np.full((120, 120), 200, np.uint8)
    t2 = Tracker(s, background=bg)
    load_results(t2, path)
    assert 2 in t2.loaded_tags
    b3 = tracker.individuals[0].basic_stuff(3)
    assert t2.loaded_tags[2][3] == (int(b3.blob.blob_id), 1.0)


def test_resort_ranges_coverage_driven():
    """Coverage-driven range ordering (Accumulation.cpp resort_ranges
    :1207-1292): lowest surrounding uniqueness first, trained-range
    overlaps last, far ties beat near ties."""
    from trex_tpu.ml.accumulation import resort_ranges

    trained = [(0, 99)]
    analysis = (0, 1000)
    # per-frame uniqueness: strong around frame 300, weak around 700
    unique_map = {f: 0.95 for f in range(250, 360)}
    unique_map.update({f: 0.20 for f in range(650, 760)})
    cands = [(280, 320), (680, 720), (40, 80)]
    out = resort_ranges(cands, trained, unique_map, analysis)
    # weakest-coverage candidate first; the overlap sorts last
    assert out[0] == (680, 720)
    assert out[-1] == (40, 80)
    # without trained ranges the order is untouched (initial range is
    # DatasetQuality's pick)
    assert resort_ranges(cands, [], unique_map, analysis) == cands
    # no uniqueness samples at all: every non-overlap ties at the top
    # bucket; far-from-trained wins the tie
    out2 = resort_ranges([(120, 160), (800, 840)], trained, {},
                         analysis)
    assert out2[0] == (800, 840)
