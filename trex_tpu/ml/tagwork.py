"""Physical-tag payload decoding (the `pretrained_tagwork` backend).

The reference (Application/pretrained_tagwork.py, 66 lines + the
RecTask backend in python/PythonBackendRegistry.cpp:18-49) loads a
user-supplied keras ``.h5`` model from `tags_model_path`, feeds it
inverted 32x32 tag crops (``255 - image``) and returns
``argmax(predict(images))`` as int64 tag ids.

This module re-creates that contract without TensorFlow:

- :func:`load_keras_sequential_h5` parses a legacy keras Sequential
  ``.h5`` file with h5py and builds a jitted JAX forward function.
  The supported layer set is exactly the reference's import list
  (pretrained_tagwork.py:3-5): Conv2D, Dense, MaxPooling2D,
  BatchNormalization, Flatten, Activation, Dropout, SpatialDropout2D,
  Cropping2D (+ InputLayer).
- :class:`Tagwork` mirrors the reference class: ``load`` + ``predict``
  with the 255-x inversion and argmax (pretrained_tagwork.py:29-37).
- :class:`TagDecoderNet` is a small flax CNN + :func:`train_tag_decoder`
  so a decoder can be trained in-framework on labelled tag crops; the
  result exports back to a reference-compatible ``.h5`` via
  :func:`save_keras_sequential_h5`.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np


# --------------------------------------------------------------------------
# keras .h5 (legacy Sequential) -> JAX forward
# --------------------------------------------------------------------------

_SUPPORTED = {
    "InputLayer", "Conv2D", "Dense", "MaxPooling2D", "BatchNormalization",
    "Flatten", "Activation", "Dropout", "SpatialDropout2D", "Cropping2D",
}


@dataclass
class _Layer:
    kind: str
    cfg: dict
    weights: list  # numpy arrays in keras order


def _layer_configs(model_config: dict) -> list[dict]:
    cfg = model_config
    if cfg.get("class_name") not in (None, "Sequential"):
        raise ValueError(
            f"only Sequential keras models are supported, "
            f"got {cfg.get('class_name')!r}")
    inner = cfg.get("config", cfg)
    layers = inner["layers"] if isinstance(inner, dict) else inner
    return layers


def _read_weights(h5, layer_name: str) -> list[np.ndarray]:
    mw = h5["model_weights"] if "model_weights" in h5 else h5
    if layer_name not in mw:
        return []
    grp = mw[layer_name]
    names = grp.attrs.get("weight_names", [])
    out = []
    for n in names:
        if isinstance(n, bytes):
            n = n.decode()
        out.append(np.array(grp[n]))
    return out


def _activation(name: Optional[str]):
    import jax.numpy as jnp

    if name in (None, "linear"):
        return lambda x: x
    if name == "relu":
        return lambda x: jnp.maximum(x, 0)
    if name == "softmax":
        import jax

        return lambda x: jax.nn.softmax(x, axis=-1)
    if name == "sigmoid":
        import jax

        return lambda x: jax.nn.sigmoid(x)
    if name == "tanh":
        return lambda x: jnp.tanh(x)
    raise ValueError(f"unsupported activation {name!r}")


def _build_forward(layers: list[_Layer]) -> Callable:
    """Compose the layer stack into one function (N, H, W, C) -> logits."""
    import jax.numpy as jnp
    from jax import lax

    steps = []
    for ly in layers:
        kind, cfg, w = ly.kind, ly.cfg, ly.weights
        if kind in ("InputLayer", "Dropout", "SpatialDropout2D"):
            continue
        if kind == "Conv2D":
            kernel = jnp.asarray(w[0])  # HWIO
            bias = jnp.asarray(w[1]) if cfg.get("use_bias", True) else None
            strides = tuple(cfg.get("strides", (1, 1)))
            padding = cfg.get("padding", "valid").upper()
            act = _activation(cfg.get("activation"))
            dil = tuple(cfg.get("dilation_rate", (1, 1)))
            if dil != (1, 1) or int(cfg.get("groups", 1)) != 1:
                # silently convolving with dilation 1 would produce
                # wrong predictions — reject like other unsupported
                # layer options
                raise ValueError(
                    f"unsupported Conv2D options: dilation_rate={dil}, "
                    f"groups={cfg.get('groups', 1)}")

            def conv(x, kernel=kernel, bias=bias, strides=strides,
                     padding=padding, act=act):
                y = lax.conv_general_dilated(
                    x, kernel, window_strides=strides, padding=padding,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if bias is not None:
                    y = y + bias
                return act(y)

            steps.append(conv)
        elif kind == "Dense":
            W = jnp.asarray(w[0])
            b = jnp.asarray(w[1]) if cfg.get("use_bias", True) else None
            act = _activation(cfg.get("activation"))

            def dense(x, W=W, b=b, act=act):
                y = x @ W
                if b is not None:
                    y = y + b
                return act(y)

            steps.append(dense)
        elif kind == "MaxPooling2D":
            pool = tuple(cfg.get("pool_size", (2, 2)))
            strides = tuple(cfg.get("strides") or pool)
            padding = cfg.get("padding", "valid").upper()

            def mpool(x, pool=pool, strides=strides, padding=padding):
                return lax.reduce_window(
                    x, -jnp.inf, lax.max,
                    (1, pool[0], pool[1], 1),
                    (1, strides[0], strides[1], 1), padding)

            steps.append(mpool)
        elif kind == "BatchNormalization":
            # keras order: gamma, beta, moving_mean, moving_variance
            # (scale/center flags drop gamma/beta from the list)
            i = 0
            gamma = beta = None
            if cfg.get("scale", True):
                gamma = jnp.asarray(w[i]); i += 1
            if cfg.get("center", True):
                beta = jnp.asarray(w[i]); i += 1
            mean = jnp.asarray(w[i]); var = jnp.asarray(w[i + 1])
            eps = float(cfg.get("epsilon", 1e-3))

            def bn(x, gamma=gamma, beta=beta, mean=mean, var=var, eps=eps):
                y = (x - mean) / jnp.sqrt(var + eps)
                if gamma is not None:
                    y = y * gamma
                if beta is not None:
                    y = y + beta
                return y

            steps.append(bn)
        elif kind == "Flatten":
            steps.append(lambda x: x.reshape(x.shape[0], -1))
        elif kind == "Activation":
            steps.append(_activation(cfg.get("activation")))
        elif kind == "Cropping2D":
            ((t, b), (l, r)) = cfg.get("cropping", ((0, 0), (0, 0)))

            def crop(x, t=t, b=b, l=l, r=r):
                return x[:, t:x.shape[1] - b or None,
                         l:x.shape[2] - r or None, :]

            steps.append(crop)
        else:
            raise ValueError(f"unsupported keras layer {kind!r}")

    def forward(x):
        for f in steps:
            x = f(x)
        return x

    return forward


class KerasSequential:
    """A keras Sequential .h5 model executed with JAX."""

    def __init__(self, layers: list[_Layer]):
        import jax

        self.layers = layers
        self._fwd = jax.jit(_build_forward(layers))

    def predict(self, images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, np.float32)
        if x.ndim == 3:
            x = x[..., None]
        return np.asarray(self._fwd(x))


def load_keras_sequential_h5(path) -> KerasSequential:
    import h5py

    with h5py.File(path, "r") as f:
        raw = f.attrs.get("model_config")
        if raw is None:
            raise ValueError(f"{path}: no model_config attribute "
                             "(not a keras .h5 model)")
        if isinstance(raw, bytes):
            raw = raw.decode()
        cfg = json.loads(raw)
        layers = []
        for lcfg in _layer_configs(cfg):
            kind = lcfg["class_name"]
            if kind not in _SUPPORTED:
                raise ValueError(f"unsupported keras layer {kind!r}")
            name = lcfg["config"].get("name", kind.lower())
            layers.append(_Layer(kind=kind, cfg=lcfg["config"],
                                 weights=_read_weights(f, name)))
    return KerasSequential(layers)


def save_keras_sequential_h5(path, layer_specs: list[tuple]) -> None:
    """Write a legacy keras Sequential .h5 that both
    :func:`load_keras_sequential_h5` and the reference's
    ``keras.models.load_model`` accept.

    layer_specs: list of (class_name, config_dict, [weight arrays]).
    """
    import h5py

    layers_json = []
    for kind, cfg, _w in layer_specs:
        layers_json.append({"class_name": kind, "config": cfg})
    model_config = {"class_name": "Sequential",
                    "config": {"name": "sequential", "layers": layers_json}}
    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps(model_config)
        mw = f.create_group("model_weights")
        names = []
        for kind, cfg, w in layer_specs:
            name = cfg.get("name", kind.lower())
            names.append(name.encode())
            grp = mw.create_group(name)
            wnames = []
            suffixes = _weight_suffixes(kind, cfg, len(w))
            for arr, suf in zip(w, suffixes):
                p = f"{name}/{suf}"
                wnames.append(p.encode())
                grp.create_dataset(p, data=np.asarray(arr))
            grp.attrs["weight_names"] = wnames
        mw.attrs["layer_names"] = names


def _weight_suffixes(kind: str, cfg: dict, n: int) -> list[str]:
    if kind in ("Conv2D", "Dense"):
        return ["kernel:0", "bias:0"][:n]
    if kind == "BatchNormalization":
        out = []
        if cfg.get("scale", True):
            out.append("gamma:0")
        if cfg.get("center", True):
            out.append("beta:0")
        out += ["moving_mean:0", "moving_variance:0"]
        return out[:n]
    return []


# --------------------------------------------------------------------------
# the reference protocol (pretrained_tagwork.Tagwork)
# --------------------------------------------------------------------------

class Tagwork:
    """pretrained_tagwork.py:17-37 — width/height, load(), predict()
    with the 255-x inversion and argmax over class logits."""

    def __init__(self, width: int, height: int, model_path):
        self.width = int(width)
        self.height = int(height)
        self.model_path = model_path
        self.model: Optional[KerasSequential] = None

    def load(self, path=None):
        self.model = load_keras_sequential_h5(path or self.model_path)

    def predict(self, images) -> np.ndarray:
        assert self.model is not None
        x = 255.0 - np.asarray(images, np.float64)
        y = np.argmax(self.model.predict(x), axis=-1)
        return y.astype(np.int64)


def tag_decoder_from_settings(settings) -> Optional[Callable]:
    """Build the per-image decode_fn for track/tags.py when
    `tags_model_path` points at a readable model; None otherwise
    (PythonBackendRegistry.cpp:26-33 raises instead — our tracker
    keeps running with undecoded tag ids, which the pluggable
    decode_fn interface already supports)."""
    import os

    path = settings["tags_model_path"]
    if not path or not os.path.exists(path):
        return None
    size = settings["tags_image_size"] or [32, 32]
    tw = Tagwork(int(size[0]), int(size[1]), path)
    tw.load()

    def decode(image: np.ndarray) -> tuple:
        import cv2

        img = np.asarray(image, np.uint8)
        if img.shape[:2] != (tw.height, tw.width):
            img = cv2.resize(img, (tw.width, tw.height),
                             interpolation=cv2.INTER_AREA)
        # (id, confidence): the max class probability rides along as
        # tag.p (reference tags::find(...).p, consumed by the qr_p
        # output field)
        out = np.asarray(tw.model.predict(
            255.0 - img[None].astype(np.float64))[0], np.float64)
        idx = int(np.argmax(out))
        # models may end in softmax (probabilities sum to 1) or a bare
        # Dense (logits): pass probabilities through, softmax logits —
        # either way p lands in [0, 1]
        if out.min() >= 0.0 and abs(out.sum() - 1.0) < 1e-3:
            p = float(out[idx])
        else:
            e = np.exp(out - out[idx])
            p = float(1.0 / np.sum(e)) if np.isfinite(e).all() else 1.0
        return idx, p

    return decode


# --------------------------------------------------------------------------
# in-framework decoder training (flax)
# --------------------------------------------------------------------------

class TagDecoderNet:
    """Small CNN for square tag crops: 3x(conv-relu-pool) + dense.

    Kept keras-exportable: the layer stack maps 1:1 onto the
    Sequential .h5 layout, so a trained decoder can be handed to the
    reference's pretrained_tagwork unchanged."""

    def __init__(self, n_classes: int, size: int = 32, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.size = size
        self.n_classes = n_classes

        def conv_init(k, cin, cout):
            fan_in = k * k * cin
            lim = np.sqrt(6.0 / fan_in)
            return (rng.uniform(-lim, lim, (k, k, cin, cout))
                    .astype(np.float32))

        s = size // 8
        self.params = {
            "c1": [conv_init(3, 1, 16), np.zeros(16, np.float32)],
            "c2": [conv_init(3, 16, 32), np.zeros(32, np.float32)],
            "c3": [conv_init(3, 32, 64), np.zeros(64, np.float32)],
            "d1": [
                (rng.uniform(-0.05, 0.05, (s * s * 64, n_classes))
                 .astype(np.float32)),
                np.zeros(n_classes, np.float32),
            ],
        }

    # ---- functional forward over a params pytree ----
    @staticmethod
    def apply(params, x):
        import jax
        import jax.numpy as jnp
        from jax import lax

        def block(x, kern, bias):
            y = lax.conv_general_dilated(
                x, kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
            y = jnp.maximum(y, 0)
            return lax.reduce_window(y, -jnp.inf, lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        x = block(x, params["c1"][0], params["c1"][1])
        x = block(x, params["c2"][0], params["c2"][1])
        x = block(x, params["c3"][0], params["c3"][1])
        x = x.reshape(x.shape[0], -1)
        return x @ params["d1"][0] + params["d1"][1]

    def layer_specs(self) -> list[tuple]:
        """Export as keras Sequential layer specs (save_keras_sequential_h5)."""
        p = self.params
        specs = []
        for i, key in enumerate(("c1", "c2", "c3")):
            specs.append(("Conv2D", {
                "name": f"conv2d_{i}", "activation": "relu",
                "padding": "same", "strides": [1, 1], "use_bias": True,
            }, [p[key][0], p[key][1]]))
            specs.append(("MaxPooling2D", {
                "name": f"max_pooling2d_{i}", "pool_size": [2, 2],
                "padding": "valid",
            }, []))
        specs.append(("Flatten", {"name": "flatten"}, []))
        specs.append(("Dense", {
            "name": "dense", "activation": "linear", "use_bias": True,
        }, [p["d1"][0], p["d1"][1]]))
        return specs


def train_tag_decoder(images: np.ndarray, labels: np.ndarray,
                      n_classes: int, epochs: int = 20,
                      batch_size: int = 128, lr: float = 1e-3,
                      seed: int = 0) -> TagDecoderNet:
    """Train TagDecoderNet on (N, H, W) uint8 crops with int labels.

    Input convention matches the reference protocol: raw (un-inverted)
    crops; the inversion happens at predict time inside Tagwork."""
    import jax
    import jax.numpy as jnp
    import optax

    net = TagDecoderNet(n_classes, size=images.shape[1], seed=seed)
    params = jax.tree_util.tree_map(jnp.asarray, net.params)
    x = (255.0 - np.asarray(images, np.float32))[..., None]
    y = np.asarray(labels, np.int32)
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, xb, yb):
        def loss_fn(p):
            logits = TagDecoderNet.apply(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    rng = np.random.default_rng(seed)
    n = len(x)
    for _ in range(epochs):
        order = rng.permutation(n)
        for s in range(0, n, batch_size):
            sel = order[s:s + batch_size]
            params, state, _ = step(params, state, x[sel], y[sel])
    net.params = jax.tree_util.tree_map(np.asarray, params)
    return net
