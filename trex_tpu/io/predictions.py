"""Per-object prediction records in .pv frames (blob::Prediction).

The reference stores, per object (>= V_10): class id, confidence, pose
keypoints; >= V_11/V_13 outline point strips (commons processing/
PVBlob.h — absent submodule). Byte layout here:

    u8 clid, u8 p (confidence * 255)
    u8 n_pose;  n_pose x (f32 x, f32 y)          # blob::Pose bones
    u8 n_outlines; per outline: u16 n, n x (f32 x, f32 y)

Round-trips through our writer/reader; reading reference-written
prediction blocks is a compatibility follow-up (the byte-exact layout of
commons' serializer is not recoverable from the snapshot).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Prediction:
    clid: int = 0
    p: float = 0.0  # 0..1
    pose: Optional[np.ndarray] = None  # (K, 2) float32
    outlines: list = field(default_factory=list)  # list of (N, 2) float32

    @property
    def valid(self) -> bool:
        return self.p > 0 or self.clid > 0


def pack_prediction(pred) -> bytes:
    if isinstance(pred, dict):
        pred = Prediction(clid=int(pred.get("clid", 0)),
                          p=float(pred.get("p", 0.0)),
                          pose=pred.get("keypoints"))
    parts = [struct.pack("<BB", pred.clid & 0xFF,
                         int(round(max(0.0, min(1.0, pred.p)) * 255)))]
    pose = pred.pose
    if pose is None:
        parts.append(b"\x00")
    else:
        pose = np.asarray(pose, np.float32)[:, :2]
        parts.append(struct.pack("<B", len(pose) & 0xFF))
        parts.append(pose.astype("<f4").tobytes())
    parts.append(struct.pack("<B", len(pred.outlines) & 0xFF))
    for ol in pred.outlines:
        ol = np.asarray(ol, np.float32)[:, :2]
        parts.append(struct.pack("<H", len(ol) & 0xFFFF))
        parts.append(ol.astype("<f4").tobytes())
    return b"".join(parts)


def unpack_prediction(data: bytes, pos: int, version: int) -> tuple:
    clid, p = struct.unpack_from("<BB", data, pos)
    pos += 2
    pred = Prediction(clid=clid, p=p / 255.0)
    n_pose = data[pos]
    pos += 1
    if n_pose:
        pred.pose = np.frombuffer(data, "<f4", n_pose * 2,
                                  pos).reshape(n_pose, 2).copy()
        pos += n_pose * 8
    n_out = data[pos]
    pos += 1
    for _ in range(n_out):
        (n,) = struct.unpack_from("<H", data, pos)
        pos += 2
        pred.outlines.append(
            np.frombuffer(data, "<f4", n * 2, pos).reshape(n, 2).copy())
        pos += n * 8
    return pred, pos
