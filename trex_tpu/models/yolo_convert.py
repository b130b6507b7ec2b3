"""Ultralytics `.pt` checkpoint -> flax YOLOv8 parameter conversion.

The reference loads ultralytics models through its embedded Python
(trex_yolo.py YOLOModel wrapping `.pt`); here the torch checkpoint's
state_dict converts to the flax module tree of models/yolo.py (same
architecture family). Loading uses a tolerant unpickler so the
`ultralytics` package itself is not required — only the tensors are
extracted.
"""
from __future__ import annotations

import io
import pickle
from pathlib import Path
from typing import Any

import numpy as np


class _Stub:
    """Placeholder for unpicklable classes; keeps attribute dict."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


def _tolerant_torch_load(path):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except (ModuleNotFoundError, AttributeError):
        pass

    class TolerantUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ModuleNotFoundError, AttributeError):
                return type(name, (_Stub,), {"__module__": module})

    import torch.serialization as ts

    with open(path, "rb") as f:
        # torch zipfile format: delegate to torch with a custom pickler
        return torch.load(
            f, map_location="cpu", weights_only=False,
            pickle_module=type("pm", (), {
                "Unpickler": TolerantUnpickler,
                "load": lambda *a, **k: TolerantUnpickler(*a, **k).load(),
            }),
        )


def extract_state_dict(ckpt: Any) -> dict[str, np.ndarray]:
    """Pull the flat name->tensor map out of an ultralytics checkpoint."""
    model = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = None
    if hasattr(model, "state_dict"):
        try:
            sd = model.state_dict()
        except Exception:
            sd = None
    if sd is None:
        # stub object: walk _modules/_parameters/_buffers dicts
        sd = {}

        def walk(obj, prefix=""):
            d = getattr(obj, "__dict__", {})
            for name, t in d.get("_parameters", {}).items():
                if t is not None:
                    sd[prefix + name] = t
            for name, t in d.get("_buffers", {}).items():
                if t is not None:
                    sd[prefix + name] = t
            for name, child in d.get("_modules", {}).items():
                if child is not None:
                    walk(child, prefix + name + ".")

        walk(model)
    out = {}
    for k, v in sd.items():
        arr = v.detach().float().numpy() if hasattr(v, "detach") else np.asarray(v)
        out[k] = arr
    return out


def _conv(sd, key):
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(sd[key], (2, 3, 1, 0))


def _bn(sd, prefix):
    return {
        "scale": sd[prefix + ".weight"],
        "bias": sd[prefix + ".bias"],
    }, {
        "mean": sd[prefix + ".running_mean"],
        "var": sd[prefix + ".running_var"],
    }


def _convbn(sd, prefix):
    """ultralytics Conv (conv+bn) -> our ConvBNSiLU params/stats."""
    p_bn, s_bn = _bn(sd, prefix + ".bn")
    return ({"conv": {"kernel": _conv(sd, prefix + ".conv.weight")},
             "bn": p_bn},
            {"bn": s_bn})


def _c2f(sd, prefix, n):
    params = {}
    stats = {}
    params["cv1"], stats["cv1"] = _convbn(sd, prefix + ".cv1")
    params["cv2"], stats["cv2"] = _convbn(sd, prefix + ".cv2")
    for i in range(n):
        b_p, b_s = {}, {}
        b_p["cv1"], b_s["cv1"] = _convbn(sd, f"{prefix}.m.{i}.cv1")
        b_p["cv2"], b_s["cv2"] = _convbn(sd, f"{prefix}.m.{i}.cv2")
        params[f"m{i}"] = b_p
        stats[f"m{i}"] = b_s
    return params, stats


def convert_state_dict(sd: dict[str, np.ndarray], scale: str,
                       task: str = "detect") -> dict:
    """Map ultralytics layer indices onto the flax module tree.

    ultralytics yolov8 layer order (model.N.):
      0 stem, 1 down1, 2 c2f1, 3 down2, 4 c2f2, 5 down3, 6 c2f3,
      7 down4, 8 c2f4, 9 sppf, 12 up_c2f1, 15 up_c2f2, 16 down_conv1,
      18 down_c2f1, 19 down_conv2, 21 down_c2f2, 22 head
    """
    from .yolo import SCALES

    depth, _, _ = SCALES[scale]

    def nd(n):
        return max(1, round(n * depth))

    pre = "model."
    params: dict = {"backbone": {}, "neck": {}, "detect": {}}
    stats: dict = {"backbone": {}, "neck": {}, "detect": {}}

    def put(tree_p, tree_s, name, pair):
        tree_p[name], tree_s[name] = pair

    b_p, b_s = params["backbone"], stats["backbone"]
    put(b_p, b_s, "stem", _convbn(sd, pre + "0"))
    put(b_p, b_s, "down1", _convbn(sd, pre + "1"))
    put(b_p, b_s, "c2f1", _c2f(sd, pre + "2", nd(3)))
    put(b_p, b_s, "down2", _convbn(sd, pre + "3"))
    put(b_p, b_s, "c2f2", _c2f(sd, pre + "4", nd(6)))
    put(b_p, b_s, "down3", _convbn(sd, pre + "5"))
    put(b_p, b_s, "c2f3", _c2f(sd, pre + "6", nd(6)))
    put(b_p, b_s, "down4", _convbn(sd, pre + "7"))
    put(b_p, b_s, "c2f4", _c2f(sd, pre + "8", nd(3)))
    sppf_p, sppf_s = {}, {}
    sppf_p["cv1"], sppf_s["cv1"] = _convbn(sd, pre + "9.cv1")
    sppf_p["cv2"], sppf_s["cv2"] = _convbn(sd, pre + "9.cv2")
    put(b_p, b_s, "sppf", (sppf_p, sppf_s))

    n_p, n_s = params["neck"], stats["neck"]
    put(n_p, n_s, "up_c2f1", _c2f(sd, pre + "12", nd(3)))
    put(n_p, n_s, "up_c2f2", _c2f(sd, pre + "15", nd(3)))
    put(n_p, n_s, "down_conv1", _convbn(sd, pre + "16"))
    put(n_p, n_s, "down_c2f1", _c2f(sd, pre + "18", nd(3)))
    put(n_p, n_s, "down_conv2", _convbn(sd, pre + "19"))
    put(n_p, n_s, "down_c2f2", _c2f(sd, pre + "21", nd(3)))

    d_p, d_s = params["detect"], stats["detect"]
    for i in range(3):
        for j in range(2):
            put(d_p, d_s, f"box{i}_{j}",
                _convbn(sd, pre + f"22.cv2.{i}.{j}"))
            put(d_p, d_s, f"cls{i}_{j}",
                _convbn(sd, pre + f"22.cv3.{i}.{j}"))
        d_p[f"box{i}_2"] = {
            "kernel": _conv(sd, pre + f"22.cv2.{i}.2.weight"),
            "bias": sd[pre + f"22.cv2.{i}.2.bias"],
        }
        d_p[f"cls{i}_2"] = {
            "kernel": _conv(sd, pre + f"22.cv3.{i}.2.weight"),
            "bias": sd[pre + f"22.cv3.{i}.2.bias"],
        }

    # task heads (ultralytics Segment/Pose/OBB share the cv4 layout;
    # flax places them at the model's top level)
    head_prefix = {"segment": "mask", "pose": "kpt", "obb": "ang"}
    if task in head_prefix and pre + "22.cv4.0.0.conv.weight" in sd:
        hp = head_prefix[task]
        for i in range(3):
            for j in range(2):
                put(params, stats, f"{hp}{i}_{j}",
                    _convbn(sd, pre + f"22.cv4.{i}.{j}"))
            params[f"{hp}{i}_2"] = {
                "kernel": _conv(sd, pre + f"22.cv4.{i}.2.weight"),
                "bias": sd[pre + f"22.cv4.{i}.2.bias"],
            }
    if task == "segment" and pre + "22.proto.cv1.conv.weight" in sd:
        for name in ("cv1", "cv2", "cv3"):
            put(params, stats, f"proto_{name}",
                _convbn(sd, pre + f"22.proto.{name}"))
        w = sd[pre + "22.proto.upsample.weight"]  # (in, out, kh, kw)
        # flax ConvTranspose mirrors the spatial taps relative to
        # torch's ConvTranspose2d: flip kh/kw when converting
        params["proto_up"] = {
            "kernel": np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy(),
            "bias": sd[pre + "22.proto.upsample.bias"],
        }
    return {"params": params, "batch_stats": stats}


def load_ultralytics_checkpoint(path) -> dict:
    """Load + convert; returns dict(params, batch_stats, num_classes,
    task, scale)."""
    path = Path(str(path))
    ckpt = _tolerant_torch_load(path)
    sd = extract_state_dict(ckpt)
    # infer num_classes from the cls head bias, scale from stem width
    ncls_key = "model.22.cv3.0.2.bias"
    num_classes = int(sd[ncls_key].shape[0]) if ncls_key in sd else 80
    stem = sd.get("model.0.conv.weight")
    width = stem.shape[0] / 64 if stem is not None else 0.25
    scale = min(SCALE_BY_WIDTH, key=lambda w: abs(w - width))
    task = "detect"
    kpt_out = None
    if any(k.startswith("model.22.cv4") for k in sd):
        if "model.22.proto.cv1.conv.weight" in sd:
            task = "segment"
        else:
            kpt_out = int(sd["model.22.cv4.0.2.bias"].shape[0])
            task = "obb" if kpt_out == 1 else "pose"
    converted = convert_state_dict(sd, SCALE_BY_WIDTH[scale], task)
    converted["num_classes"] = num_classes
    converted["task"] = task
    converted["scale"] = SCALE_BY_WIDTH[scale]
    if task == "pose" and kpt_out is not None:
        converted["kpt_dims"] = 3 if kpt_out % 3 == 0 else 2
        converted["num_keypoints"] = kpt_out // converted["kpt_dims"]
    return converted


SCALE_BY_WIDTH = {0.25: "n", 0.5: "s", 0.75: "m", 1.0: "l", 1.25: "x"}
