#!/usr/bin/env python3
"""100-individual visual-identification benchmark (BASELINE config 3).

The reference claims VI scales to 100 individuals (README.md:17). This
synthesizes a 100-identity crop set (per-identity texture + noise +
jitter, 0-255 gray like real normalized crops), trains the default
V118_3 network and reports per-class validation accuracy.

Measured on one TPU v5e chip (2026-08-16): early-stop at epoch 8,
106 s wall (warm compile cache), val mean/worst class accuracy
1.000/1.000.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from trex_tpu.models import VITrainer, build


def make_dataset(n_id=100, per=60, seed=0):
    rng = np.random.default_rng(seed)
    protos = rng.uniform(0.1, 0.9, (n_id, 10, 10)).astype(np.float32)
    X = np.zeros((n_id * per, 80, 80, 1), np.float32)
    Y = np.zeros(n_id * per, np.int32)
    for i in range(n_id):
        base = np.kron(protos[i], np.ones((8, 8), np.float32))
        for j in range(per):
            img = base + rng.normal(0, 0.12, (80, 80)).astype(np.float32)
            img = np.roll(img, tuple(rng.integers(-4, 5, 2)), (0, 1))
            X[i * per + j, :, :, 0] = np.clip(img, 0, 1) * 255.0
            Y[i * per + j] = i
    perm = rng.permutation(len(X))
    return X[perm], Y[perm]


def main():
    X, Y = make_dataset()
    cut = int(len(X) * 0.8)
    trainer = VITrainer(build("v118_3", 100), 100, (80, 80, 1))
    t0 = time.time()
    res = trainer.train(X[:cut], Y[:cut], X[cut:], Y[cut:], max_epochs=25)
    dt = time.time() - t0
    pca = trainer.per_class_accuracy(X[cut:], Y[cut:])
    print(f"epochs: {res.epochs} (early stop: {res.stopped_early})  "
          f"wall: {dt:.1f}s")
    print(f"val mean-class accuracy: {pca.mean():.4f}  "
          f"worst-class: {pca.min():.4f}")


if __name__ == "__main__":
    main()
