"""Tag payload decoding (ml/tagwork.py = the reference's
pretrained_tagwork.py + PythonBackendRegistry.cpp RecTask backend):
keras-Sequential .h5 parsing without TensorFlow, the 255-x/argmax
predict protocol, in-framework training, and the h5 export/import
round trip."""
import numpy as np
import pytest

from trex_tpu.ml.tagwork import (KerasSequential, TagDecoderNet, Tagwork,
                                 load_keras_sequential_h5,
                                 save_keras_sequential_h5,
                                 tag_decoder_from_settings,
                                 train_tag_decoder)


def _reference_forward(x, conv_k, conv_b, dense_w, dense_b):
    """Plain numpy forward for the tiny test net (conv-relu-pool-dense)."""
    n, h, w, _ = x.shape
    kh, kw, _, co = conv_k.shape
    out = np.zeros((n, h - kh + 1, w - kw + 1, co), np.float32)
    for i in range(out.shape[1]):
        for j in range(out.shape[2]):
            patch = x[:, i:i + kh, j:j + kw, :]
            out[:, i, j, :] = np.tensordot(
                patch, conv_k, axes=([1, 2, 3], [0, 1, 2])) + conv_b
    out = np.maximum(out, 0)
    p = out[:, : out.shape[1] // 2 * 2, : out.shape[2] // 2 * 2]
    p = p.reshape(n, p.shape[1] // 2, 2, p.shape[2] // 2, 2, co)
    p = p.max(axis=(2, 4))
    flat = p.reshape(n, -1)
    return flat @ dense_w + dense_b


def _write_test_h5(path, rng, size=8):
    conv_k = rng.normal(0, 0.5, (3, 3, 1, 4)).astype(np.float32)
    conv_b = rng.normal(0, 0.1, 4).astype(np.float32)
    s = (size - 2) // 2
    dense_w = rng.normal(0, 0.1, (s * s * 4, 5)).astype(np.float32)
    dense_b = rng.normal(0, 0.1, 5).astype(np.float32)
    save_keras_sequential_h5(path, [
        ("Conv2D", {"name": "conv2d", "activation": "relu",
                    "padding": "valid", "strides": [1, 1],
                    "use_bias": True}, [conv_k, conv_b]),
        ("MaxPooling2D", {"name": "max_pooling2d", "pool_size": [2, 2],
                          "padding": "valid"}, []),
        ("Flatten", {"name": "flatten"}, []),
        ("Dense", {"name": "dense", "activation": "linear",
                   "use_bias": True}, [dense_w, dense_b]),
    ])
    return conv_k, conv_b, dense_w, dense_b


def test_h5_roundtrip_matches_numpy_forward(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "m.h5"
    conv_k, conv_b, dense_w, dense_b = _write_test_h5(path, rng)
    model = load_keras_sequential_h5(path)
    assert isinstance(model, KerasSequential)
    x = rng.uniform(0, 255, (6, 8, 8, 1)).astype(np.float32)
    got = model.predict(x)
    want = _reference_forward(x, conv_k, conv_b, dense_w, dense_b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_tagwork_protocol_inverts_and_argmaxes(tmp_path):
    rng = np.random.default_rng(1)
    path = tmp_path / "m.h5"
    _write_test_h5(path, rng)
    tw = Tagwork(8, 8, path)
    tw.load()
    imgs = rng.uniform(0, 255, (4, 8, 8)).astype(np.uint8)
    ids = tw.predict(imgs)
    assert ids.dtype == np.int64 and ids.shape == (4,)
    # the model sees inverted images (pretrained_tagwork.py:31)
    want = np.argmax(tw.model.predict(
        (255.0 - imgs.astype(np.float64))[..., None]), axis=-1)
    assert (ids == want).all()


def test_unsupported_layer_rejected(tmp_path):
    import h5py
    import json

    path = tmp_path / "bad.h5"
    with h5py.File(path, "w") as f:
        f.attrs["model_config"] = json.dumps({
            "class_name": "Sequential",
            "config": {"layers": [{"class_name": "LSTM", "config": {}}]}})
        f.create_group("model_weights")
    with pytest.raises(ValueError, match="unsupported keras layer"):
        load_keras_sequential_h5(path)


def test_train_then_export_then_decode(tmp_path):
    # synthetic 4-class "tags": a bright quadrant encodes the id
    rng = np.random.default_rng(2)
    n_per, size = 50, 16
    imgs, labels = [], []
    for cls in range(4):
        for _ in range(n_per):
            img = rng.uniform(180, 255, (size, size))
            qy, qx = divmod(cls, 2)
            img[qy * 8:(qy + 1) * 8, qx * 8:(qx + 1) * 8] = \
                rng.uniform(0, 60, (8, 8))
            imgs.append(img)
            labels.append(cls)
    imgs = np.asarray(imgs, np.uint8)
    labels = np.asarray(labels)
    net = train_tag_decoder(imgs, labels, n_classes=4, epochs=12, seed=3)

    # export to a reference-compatible .h5 and decode through Tagwork
    path = tmp_path / "tags.h5"
    save_keras_sequential_h5(path, net.layer_specs())
    tw = Tagwork(size, size, path)
    tw.load()
    pred = tw.predict(imgs)
    acc = (pred == labels).mean()
    assert acc > 0.95, f"decoder accuracy {acc}"


def test_tag_decoder_from_settings_wires_into_tracker(tmp_path):
    from trex_tpu.config import reset_global_settings
    from trex_tpu.track.tracker import Tracker

    rng = np.random.default_rng(4)
    path = tmp_path / "m.h5"
    _write_test_h5(path, rng)
    s = reset_global_settings()
    s["tags_recognize"] = True
    s["tags_model_path"] = str(path)
    s["tags_image_size"] = [8, 8]
    decode = tag_decoder_from_settings(s)
    assert decode is not None
    # resizes arbitrary crops to the model size; ML decoders return
    # (id, confidence) — the confidence becomes tag.p / the qr_p field
    tid, p = decode(rng.uniform(0, 255, (20, 24)).astype(np.uint8))
    assert 0 <= tid < 5
    assert 0.0 <= p <= 1.0
    tracker = Tracker(s, background=np.zeros((32, 32), np.uint8))
    assert tracker.tag_decoder is not None

    # absent model path -> tracker still constructs, decoder is None
    s2 = reset_global_settings()
    s2["tags_recognize"] = True
    s2["tags_model_path"] = str(tmp_path / "missing.h5")
    tracker2 = Tracker(s2, background=np.zeros((32, 32), np.uint8))
    assert tracker2.tag_decoder is None
