#!/usr/bin/env python3
"""VI accuracy-parity oracle: the reference's torch training loop,
in-repo, run head-to-head against our flax VITrainer on identical
crops with identical budgets (VERDICT r2 item 4 / BASELINE's "within
0.5% of the reference" clause).

The torch side replicates the reference semantics exactly:
- V118_3 with Dropout2d(0.05)/Dropout(0.05) and NO input
  normalization (visual_identification_network_torch.py:6-28: the
  Normalize layer is a passthrough; the model consumes raw [0,255]),
- Adam lr=1e-4 (visual_recognition_torch.py:1421),
- CrossEntropy over logits, shuffled minibatches, NHWC->NCHW permute
  (PermuteAxesWrapper).

Run as a script for the full-budget measurement (multi-seed, printed
as JSON); the reduced-budget CI assertion lives in
tests/test_vi_oracle.py.
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_identity_dataset(n_ids=10, per_id=120, size=48, seed=0,
                          noise=18.0, max_angle=2 * np.pi):
    """Synthetic individual crops with real appearance structure:
    each identity is an elongated textured body; samples vary by
    rotation (up to +-max_angle/2, the VI pipeline's posture
    normalization bounds real pose variation similarly), translation
    and sensor noise (the VI problem shape: identity = texture,
    nuisance = pose)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    cx = cy = (size - 1) / 2.0
    images = np.zeros((n_ids * per_id, size, size, 1), np.float32)
    labels = np.repeat(np.arange(n_ids), per_id).astype(np.int32)
    for i in range(n_ids):
        tex = rng.uniform(60, 220, (6, 6))
        for j in range(per_id):
            ang = rng.uniform(-max_angle / 2, max_angle / 2)
            tx = rng.uniform(-3, 3)
            ty = rng.uniform(-3, 3)
            ca, sa = np.cos(ang), np.sin(ang)
            u = ca * (xx - cx - tx) + sa * (yy - cy - ty)
            v = -sa * (xx - cx - tx) + ca * (yy - cy - ty)
            body = ((u / (size * 0.38)) ** 2
                    + (v / (size * 0.16)) ** 2) <= 1.0
            tu = np.clip(((u / (size * 0.38)) + 1) * 3, 0,
                         5.999).astype(int)
            tv = np.clip(((v / (size * 0.16)) + 1) * 3, 0,
                         5.999).astype(int)
            img = np.where(body, tex[tv, tu], 0.0)
            img = img + rng.normal(0, noise, img.shape) * body
            images[i * per_id + j, :, :, 0] = np.clip(img, 0, 255)
    order = rng.permutation(len(images))
    return images[order], labels[order]


def split(images, labels, seed=0, frac=0.25):
    """Stratified split matching VITrainer's internal policy."""
    rng = np.random.default_rng(seed)
    val_idx, train_idx = [], []
    for c in np.unique(labels):
        rows = np.flatnonzero(labels == c)
        rows = rows[rng.permutation(len(rows))]
        k = max(1, len(rows) // int(1 / frac))
        val_idx.extend(rows[:k])
        train_idx.extend(rows[k:])
    val_idx = np.asarray(val_idx)
    train_idx = np.asarray(train_idx)
    return (images[train_idx], labels[train_idx],
            images[val_idx], labels[val_idx])


def build_torch_v118_3(size, n_classes, channels=1, seed=0):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)

    class V118_3(nn.Module):
        """visual_identification_network_torch.py:184-240 replica
        (incl. the Dropout2d(0.05) blocks the inference-import test's
        replica omits)."""

        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(channels, 16, 5, padding="same")
            self.bn1 = nn.BatchNorm2d(16)
            self.pool1 = nn.MaxPool2d(2)
            self.drop1 = nn.Dropout2d(0.05)
            self.conv2 = nn.Conv2d(16, 64, 5, padding="same")
            self.bn2 = nn.BatchNorm2d(64)
            self.pool2 = nn.MaxPool2d(2)
            self.drop2 = nn.Dropout2d(0.05)
            self.conv3 = nn.Conv2d(64, 128, 5, padding="same")
            self.bn3 = nn.BatchNorm2d(128)
            self.pool3 = nn.MaxPool2d(2)
            self.drop3 = nn.Dropout2d(0.05)
            self.fc1 = nn.Linear(128 * (size // 8) * (size // 8), 100)
            self.bn4 = nn.LayerNorm(100)
            self.drop4 = nn.Dropout(0.05)
            self.fc2 = nn.Linear(100, n_classes)

        def forward(self, x):
            r = torch.relu
            x = self.drop1(self.pool1(r(self.bn1(self.conv1(x)))))
            x = self.drop2(self.pool2(r(self.bn2(self.conv2(x)))))
            x = self.drop3(self.pool3(r(self.bn3(self.conv3(x)))))
            x = x.reshape(x.size(0), -1)
            x = self.drop4(r(self.bn4(self.fc1(x))))
            return self.fc2(x)

    return V118_3()


def train_torch_reference(tr_x, tr_y, va_x, va_y, n_classes,
                          epochs=10, batch_size=128, lr=1e-4,
                          seed=0):
    """The reference loop (visual_recognition_torch.py:1036-1285
    semantics on CPU: Adam lr=1e-4, CrossEntropy, shuffled epochs,
    raw [0,255] NHWC inputs permuted to NCHW)."""
    import torch

    model = build_torch_v118_3(tr_x.shape[1], n_classes,
                               tr_x.shape[3], seed)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    crit = torch.nn.CrossEntropyLoss()
    g = torch.Generator().manual_seed(seed + 1)
    X = torch.from_numpy(np.ascontiguousarray(
        tr_x.transpose(0, 3, 1, 2)))
    Y = torch.from_numpy(tr_y.astype(np.int64))
    n = len(X)
    for _ in range(epochs):
        model.train()
        order = torch.randperm(n, generator=g)
        for s0 in range(0, n, batch_size):
            idx = order[s0:s0 + batch_size]
            opt.zero_grad()
            out = model(X[idx])
            loss = crit(out, Y[idx])
            loss.backward()
            opt.step()
    model.eval()
    with torch.no_grad():
        XV = torch.from_numpy(np.ascontiguousarray(
            va_x.transpose(0, 3, 1, 2)))
        preds = []
        for s0 in range(0, len(XV), 256):
            preds.append(model(XV[s0:s0 + 256]).argmax(1).numpy())
    acc = float((np.concatenate(preds) == va_y).mean())
    return acc


def train_flax(tr_x, tr_y, va_x, va_y, n_classes, epochs=10,
               batch_size=128, seed=0):
    from trex_tpu.models import VITrainer, build

    size = tr_x.shape[1]
    model = build("v118_3", n_classes)
    trainer = VITrainer(model, n_classes,
                        (size, size, tr_x.shape[3]), seed=seed)
    trainer.train(tr_x, tr_y, val_images=va_x, val_labels=va_y,
                  max_epochs=epochs, batch_size=batch_size,
                  accuracy_stop_all=1.1, accuracy_stop_worst=1.1,
                  seed=seed)
    probs = trainer.predict(va_x)
    acc = float((np.argmax(probs, 1) == va_y).mean())
    return acc


def run(n_ids=10, per_id=200, size=32, epochs=30, batch_size=32,
        noise=8.0, max_angle=1.0, seeds=(0, 1, 2)):
    """Full-budget measurement: both loops at a converged operating
    point (posture-normalized pose variation), multi-seed mean."""
    images, labels = make_identity_dataset(
        n_ids, per_id, size, noise=noise, max_angle=max_angle)
    tr_x, tr_y, va_x, va_y = split(images, labels)
    torch_accs, flax_accs = [], []
    for seed in seeds:
        torch_accs.append(train_torch_reference(
            tr_x, tr_y, va_x, va_y, n_ids, epochs=epochs,
            batch_size=batch_size, seed=seed))
        flax_accs.append(train_flax(
            tr_x, tr_y, va_x, va_y, n_ids, epochs=epochs,
            batch_size=batch_size, seed=seed))
    return {
        "torch_reference_val_acc": float(np.mean(torch_accs)),
        "flax_val_acc": float(np.mean(flax_accs)),
        "delta": float(np.mean(flax_accs) - np.mean(torch_accs)),
        "torch_per_seed": torch_accs,
        "flax_per_seed": flax_accs,
        "n_val": int(len(va_y)),
        "budget": {"n_ids": n_ids, "per_id": per_id, "size": size,
                   "epochs": epochs, "batch": batch_size, "lr": 1e-4},
    }


if __name__ == "__main__":
    print(json.dumps(run(), indent=2))
