"""Identity-CNN training loop (JAX/optax, replaces the embedded
torch path of the reference: python/visual_recognition_torch.py).

Semantics mirrored from the reference:
- Adam with lr = gpu_learning_rate (1e-4), epochs <= gpu_max_epochs (150)
  (visual_recognition_torch.py train() :1036)
- ValidationCallback early stop: per-class validation accuracy computed
  each epoch; training stops once every class is above 0.97 or the worst
  class reaches 0.99 (visual_recognition_torch.py:355-689, :607)
- predict(): batched softmax probabilities (:984)
- checkpoints saved as <filename>_weights.npz (save_model_files :93)

TPU design: one jitted train step over sharded batches (state is NOT
donated: accumulation snapshots TrainState references for its
accept/reject rollback, which donation would invalidate);
the step runs identically on a Mesh via data-parallel sharding
(trex_tpu.parallel.mesh).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: core.FrozenDict = None
    dropout_rng: jax.Array = None


def create_train_state(model, rng, input_shape,
                       learning_rate: float = 1e-4) -> TrainState:
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init(p_rng, jnp.zeros(input_shape, jnp.float32),
                           train=False)
    tx = optax.adam(learning_rate)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        dropout_rng=d_rng,
        tx=tx,
    )


def softmax_cross_entropy(logits, labels, num_classes):
    onehot = jax.nn.one_hot(labels, num_classes)
    return optax.softmax_cross_entropy(logits, onehot).mean()


def focal_loss(logits, labels, num_classes, gamma: float = 2.0):
    """Focal loss option (visual_identification_network.py:15-110)."""
    onehot = jax.nn.one_hot(labels, num_classes)
    logp = jax.nn.log_softmax(logits)
    p = jnp.exp(logp)
    w = (1 - p) ** gamma
    return -(onehot * w * logp).sum(axis=-1).mean()


def make_train_step(num_classes: int, loss: str = "ce"):
    loss_fn = focal_loss if loss == "focal" else softmax_cross_entropy

    @jax.jit
    def train_step(state: TrainState, images, labels):
        rng = jax.random.fold_in(state.dropout_rng, state.step)

        def compute(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mutated = state.apply_fn(
                variables, images, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            return loss_fn(logits, labels, num_classes), (logits, mutated)

        (loss_val, (logits, mutated)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"])
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return state, loss_val, acc

    return train_step


def make_augment_step(height: int, width: int):
    """Training-batch augmentation (visual_recognition_torch.py:
    1301-1337): RandomAffine(+-5 deg, translate +-move_range) +
    brightness/contrast jitter (0.85-1.15), computed on device."""
    move_range = min(0.05, 2 / min(width, height))
    deg = 5.0

    @jax.jit
    def augment(rng, images):
        B, H, W, C = images.shape
        k = jax.random.split(rng, 5)
        ang = jax.random.uniform(k[0], (B,), minval=-deg, maxval=deg) \
            * (jnp.pi / 180.0)
        tx = jax.random.uniform(k[1], (B,), minval=-move_range,
                                maxval=move_range) * W
        ty = jax.random.uniform(k[2], (B,), minval=-move_range,
                                maxval=move_range) * H
        bright = jax.random.uniform(k[3], (B,), minval=0.85, maxval=1.15)
        contr = jax.random.uniform(k[4], (B,), minval=0.85, maxval=1.15)
        cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
        yy, xx = jnp.mgrid[0:H, 0:W]
        yy = yy.astype(jnp.float32) - cy
        xx = xx.astype(jnp.float32) - cx
        ca = jnp.cos(ang)[:, None, None]
        sa = jnp.sin(ang)[:, None, None]
        # inverse transform: rotate by -ang, shift by -t
        sx = ca * xx[None] + sa * yy[None] + cx - tx[:, None, None]
        sy = -sa * xx[None] + ca * yy[None] + cy - ty[:, None, None]

        def sample(img, syi, sxi):
            return jax.scipy.ndimage.map_coordinates(
                img, [syi, sxi], order=1, mode="constant", cval=0.0)

        out = jax.vmap(
            lambda img, syi, sxi: jnp.stack(
                [sample(img[..., c], syi, sxi) for c in range(C)], -1)
        )(images, sy, sx)
        out = out * bright[:, None, None, None]
        mean = out.mean(axis=(1, 2, 3), keepdims=True)
        out = (out - mean) * contr[:, None, None, None] + mean
        return jnp.clip(out, 0.0, 255.0)

    return augment


def make_eval_step():
    @jax.jit
    def eval_step(state: TrainState, images):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits = state.apply_fn(variables, images, train=False)
        return jax.nn.softmax(logits, axis=-1)

    return eval_step


@dataclass
class TrainResult:
    epochs: int = 0
    history: list = field(default_factory=list)
    per_class_accuracy: Optional[np.ndarray] = None
    best_worst_accuracy: float = 0.0
    stopped_early: bool = False
    uniqueness_history: list = field(default_factory=list)


class VITrainer:
    """Train/predict driver for the identity network."""

    def __init__(self, model, num_classes: int, image_shape,
                 learning_rate: float = 1e-4, loss: str = "ce",
                 seed: int = 0, mesh=None, data_axis: str = "data"):
        self.model = model
        self.num_classes = num_classes
        self.image_shape = tuple(image_shape)
        self.state = create_train_state(
            model, jax.random.PRNGKey(seed),
            (1, *self.image_shape), learning_rate)
        self._train_step = make_train_step(num_classes, loss)
        self._eval_step = make_eval_step()
        self._augment = make_augment_step(self.image_shape[0],
                                          self.image_shape[1])
        self._aug_rng = jax.random.PRNGKey(seed + 7)
        # optional multi-chip data parallelism: batches shard over the
        # mesh's data axis, parameters replicate, XLA inserts the
        # gradient psum (SURVEY §5.8 DP-over-crops)
        self.mesh = mesh
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P(data_axis))
            repl = NamedSharding(mesh, P())
            self.state = jax.device_put(self.state, repl)

    def _put_batch(self, *arrays):
        if self._data_sharding is None:
            return arrays
        return tuple(jax.device_put(a, self._data_sharding)
                     for a in arrays)

    # ------------------------------------------------------------------
    def train(self, images: np.ndarray, labels: np.ndarray,
              val_images: Optional[np.ndarray] = None,
              val_labels: Optional[np.ndarray] = None,
              max_epochs: int = 150, batch_size: int = 128,
              min_iterations: int = 100,
              accuracy_stop_all: float = 0.97,
              accuracy_stop_worst: float = 0.99,
              uniqueness_fn: Optional[Callable[[], float]] = None,
              callbacks: Optional[Callable[[int, dict], None]] = None,
              seed: int = 0, augment: bool = False) -> TrainResult:
        images = np.asarray(images, np.float32)
        labels = np.asarray(labels, np.int32)
        if images.size and float(images.max()) <= 1.5:
            import warnings
            warnings.warn(
                "VI networks expect 0-255 gray inputs (the model "
                "normalizes x/127.5-1); inputs look 0-1 scaled",
                stacklevel=2)
        n = len(images)
        if val_images is None:
            # stratified 25% split: every class keeps at least one
            # validation sample (a plain permutation can drop a rare
            # class from validation entirely, pinning its per-class
            # accuracy at 0 and blocking early stopping forever)
            rng = np.random.default_rng(seed)
            val_idx = []
            train_idx = []
            for c in np.unique(labels):
                rows = np.flatnonzero(labels == c)
                rows = rows[rng.permutation(len(rows))]
                k = max(1, len(rows) // 4) if len(rows) > 1 else 0
                val_idx.extend(rows[:k])
                train_idx.extend(rows[k:])
            val_idx = np.asarray(val_idx, np.int64)
            train_idx = np.asarray(train_idx, np.int64)
            if not len(val_idx):  # single tiny class: fall back
                cut = max(1, n // 4)
                order = rng.permutation(n)
                val_idx, train_idx = order[:cut], order[cut:]
            val_images, val_labels = images[val_idx], labels[val_idx]
            images, labels = images[train_idx], labels[train_idx]
            n = len(images)
        # keep the batch shape FIXED so the jitted train step compiles
        # exactly once across all accumulation steps (small datasets are
        # upsampled to a full batch instead of shrinking the shape)
        result = TrainResult()
        rng = np.random.default_rng(seed + 1)
        steps_done = 0
        steps_per_epoch = max(1, n // batch_size)
        worst_backlog: list = []
        patience = 5  # reference backlog length

        for epoch in range(max_epochs):
            order = rng.permutation(n)
            if n < batch_size:
                order = np.concatenate(
                    [order, rng.integers(0, n, batch_size - n)])
            losses, accs = [], []
            for step_i in range(steps_per_epoch):
                sidx = (step_i * batch_size) % max(1, n)
                idx = order[sidx : sidx + batch_size]
                if len(idx) < batch_size:
                    idx = np.concatenate(
                        [idx, order[: batch_size - len(idx)]])
                bi, bl = self._put_batch(jnp.asarray(images[idx]),
                                         jnp.asarray(labels[idx]))
                if augment:
                    self._aug_rng, k = jax.random.split(self._aug_rng)
                    bi = self._augment(k, bi)
                self.state, loss_v, acc = self._train_step(
                    self.state, bi, bl)
                losses.append(float(loss_v))
                accs.append(float(acc))
                steps_done += 1
            per_class = self.per_class_accuracy(val_images, val_labels,
                                                batch_size)
            worst = float(np.min(per_class)) if len(per_class) else 0.0
            entry = {
                "epoch": epoch,
                "loss": float(np.mean(losses)) if losses else 0.0,
                "acc": float(np.mean(accs)) if accs else 0.0,
                "val_worst": worst,
                "val_mean": float(np.mean(per_class)) if len(per_class) else 0.0,
            }
            if uniqueness_fn is not None:
                u = uniqueness_fn()
                entry["uniqueness"] = u
                result.uniqueness_history.append(u)
            result.history.append(entry)
            result.per_class_accuracy = per_class
            result.best_worst_accuracy = max(result.best_worst_accuracy,
                                             worst)
            result.epochs = epoch + 1
            if callbacks:
                callbacks(epoch, entry)
            worst_backlog.append(worst)
            # reference ValidationCallback (visual_recognition_torch.py
            # :607): stop when the WORST class accuracy stayed above
            # 0.97 for `patience` consecutive epochs, or instantly at
            # worst >= 0.99 (an instantaneous all-classes check stops
            # one lucky epoch too early)
            backlog = worst_backlog[-patience:]
            if steps_done >= min_iterations and (
                    (len(backlog) >= patience
                     and all(v > accuracy_stop_all for v in backlog))
                    or worst >= accuracy_stop_worst):
                result.stopped_early = True
                break
        return result

    # ------------------------------------------------------------------
    def predict(self, images: np.ndarray, batch_size: int = 512) -> np.ndarray:
        """Softmax probabilities (N, num_classes); pads the tail batch so
        every call hits the same compiled program."""
        images = np.asarray(images, np.float32)
        n = len(images)
        if n == 0:
            return np.zeros((0, self.num_classes), np.float32)
        out = np.empty((n, self.num_classes), np.float32)
        for s in range(0, n, batch_size):
            chunk = images[s : s + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)])
            (bi,) = self._put_batch(jnp.asarray(chunk))
            probs = np.asarray(self._eval_step(self.state, bi))
            out[s : s + len(images[s : s + batch_size])] = \
                probs[: len(images[s : s + batch_size])]
        return out

    def per_class_accuracy(self, images, labels, batch_size=512) -> np.ndarray:
        if images is None or len(images) == 0:
            return np.zeros(self.num_classes)
        probs = self.predict(images, batch_size)
        pred = probs.argmax(axis=-1)
        acc = np.zeros(self.num_classes)
        for c in range(self.num_classes):
            m = labels == c
            acc[c] = (pred[m] == c).mean() if m.sum() else 0.0
        return acc

    # ------------------------------------------------------------------
    def save_weights(self, path):
        """<filename>_weights.npz layout: flat param arrays + meta."""
        flat = jax.tree_util.tree_flatten_with_path(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats})[0]
        arrays = {}
        for path_keys, arr in flat:
            key = "/".join(str(getattr(k, "key", k)) for k in path_keys)
            arrays[key] = np.asarray(arr)
        arrays["__meta__"] = np.array([json.dumps({
            "num_classes": self.num_classes,
            "image_shape": self.image_shape,
        })])
        with open(path, "wb") as f:
            np.savez(f, **arrays)

    def load_weights(self, path):
        with np.load(path, allow_pickle=False) as data:
            tree = {"params": self.state.params,
                    "batch_stats": self.state.batch_stats}
            flat = jax.tree_util.tree_flatten_with_path(tree)
            new_leaves = []
            for path_keys, arr in flat[0]:
                key = "/".join(str(getattr(k, "key", k)) for k in path_keys)
                if key not in data:
                    raise KeyError(f"missing weight {key} in {path}")
                new_leaves.append(jnp.asarray(data[key]))
            tree = jax.tree_util.tree_unflatten(flat[1], new_leaves)
        self.state = self.state.replace(params=tree["params"],
                                        batch_stats=tree["batch_stats"])
