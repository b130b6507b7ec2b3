#!/usr/bin/env python3
"""VI accuracy on REAL appearance variation: track the 8-guppy fixture,
extract posture-normalized identity crops (ops/crops.py — the
TrainingData pipeline), expand to 100 pseudo-identities by giving each
a fixed photometric/geometric signature over the real crops, and
train/evaluate V118_3 with a frame-split.

The BASELINE target is identity accuracy within 0.5% of the reference;
the reference reports >99% at ~100 individuals (eLife 2021). This
measures our training pipeline on real fish appearance rather than
synthetic stamps (tools/bench_vi100.py).

Usage: python tools/bench_vi_fixture.py [n_ids] [epochs]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

FIXTURE = Path("/root/reference/videos")


def extract_fixture_crops():
    """Convert+track the fixture and return per-fish normalized crops."""
    import tempfile

    from trex_tpu.cli import trex as cli
    from trex_tpu.config import global_settings
    from trex_tpu.io.pv import PVFile
    from trex_tpu.ops.crops import crops_for_individual
    from trex_tpu.pipeline import Segmenter

    out = Path(tempfile.mkdtemp(prefix="vi_fixture_"))
    s = global_settings()
    from trex_tpu.config import load_settings_file

    load_settings_file(s, str(FIXTURE / "test.settings"))
    seg = Segmenter(s, str(FIXTURE / "test_frames" / "frame_%03d.jpg"),
                    out / "t.pv", track=True)
    tracker = seg.run()
    crops = {}
    for fid, ind in tracker.individuals.items():
        imgs, frames = crops_for_individual(ind, tracker, s)
        if len(imgs):
            crops[fid] = np.asarray(imgs)
    return crops


def pseudo_identities(crops: dict, n_ids: int, rng) -> tuple:
    """Expand F real fish into n_ids pseudo-identities: each pseudo-id
    is (real fish, fixed appearance transform) — real shape/texture
    variation plus a stable per-identity signature."""
    fids = sorted(crops)
    images, labels = [], []
    pid = 0
    # each pseudo-identity = (real fish, DISTINCT rot/flip combo) so
    # identities stay separable; n_ids caps at 8 combos per fish
    combos = [(rot, flip) for rot in range(4) for flip in (False, True)]
    per_fish = int(np.ceil(n_ids / len(fids)))
    if per_fish > len(combos):
        raise SystemExit(
            f"n_ids {n_ids} needs {per_fish} distinct variants per "
            f"fish but only {len(combos)} geometric combos exist "
            f"({len(fids) * len(combos)} identities max)")
    for fid in fids:
        base = crops[fid].astype(np.float32)
        for rot, flip in combos[:per_fish]:
            if pid >= n_ids:
                break
            x = np.rot90(base, rot, axes=(1, 2))
            if flip:
                x = x[:, :, ::-1]
            images.append(np.ascontiguousarray(x))
            labels.append(np.full(len(x), pid, np.int32))
            pid += 1
    return np.concatenate(images), np.concatenate(labels)


def main():
    n_ids = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    rng = np.random.default_rng(0)

    print("[1/3] extracting fixture crops...")
    crops = extract_fixture_crops()
    print(f"    {len(crops)} fish, "
          f"{sum(len(v) for v in crops.values())} crops")

    if n_ids <= len(crops):
        # pure real identities, no expansion
        fids = sorted(crops)[:n_ids]
        images = np.concatenate([crops[f] for f in fids]).astype(np.float32)
        labels = np.concatenate([
            np.full(len(crops[f]), i, np.int32)
            for i, f in enumerate(fids)])
    else:
        images, labels = pseudo_identities(crops, n_ids, rng)
    if images.ndim == 3:
        images = images[..., None]
    # frame split: every 5th crop per identity validates
    val_mask = np.zeros(len(images), bool)
    for pid in range(n_ids):
        idx = np.flatnonzero(labels == pid)
        val_mask[idx[::5]] = True
    tr_x, tr_y = images[~val_mask], labels[~val_mask]
    va_x, va_y = images[val_mask], labels[val_mask]
    print(f"[2/3] training V118_3 on {len(tr_x)} crops / "
          f"{n_ids} identities ({len(va_x)} validation)...")

    from trex_tpu.models import VITrainer, build

    model = build("v118_3", n_ids)
    trainer = VITrainer(model, n_ids, tr_x.shape[1:])
    t0 = time.perf_counter()
    res = trainer.train(tr_x, tr_y, val_images=va_x, val_labels=va_y,
                        max_epochs=epochs)
    dt = time.perf_counter() - t0
    for h in res.history[-4:]:
        print("   ", {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in h.items()})
    tr_acc = trainer.per_class_accuracy(tr_x[:2000], tr_y[:2000])
    print(f"    train-set accuracy (first 2000): {tr_acc.mean():.4f}")

    print("[3/3] evaluating...")
    acc = trainer.per_class_accuracy(va_x, va_y)
    print(f"VI fixture accuracy: mean {acc.mean():.4f} "
          f"worst-class {acc.min():.4f} over {n_ids} identities "
          f"({dt:.0f}s train)")


if __name__ == "__main__":
    main()
