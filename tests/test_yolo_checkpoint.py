"""End-to-end YOLO .pt conversion validation (VERDICT item: the
converter had never seen a real torch checkpoint).

Builds a real ultralytics-format YOLOv8n detect checkpoint with torch
(same module/key layout as ultralytics, random weights + non-trivial
batchnorm statistics), saves it with torch.save, converts it with
models/yolo_convert.load_ultralytics_checkpoint, and asserts the flax
forward equals the torch forward on a fixed input."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from trex_tpu.models.yolo import YOLOv8  # noqa: E402
from trex_tpu.models.yolo_convert import load_ultralytics_checkpoint  # noqa: E402


class TConv(tnn.Module):
    """ultralytics Conv: conv(no bias) + bn + SiLU."""

    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(c2)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(tnn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tnn.ModuleList(
            TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tnn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.m = tnn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.m(x)
        y2 = self.m(y1)
        return self.cv2(torch.cat([x, y1, y2, self.m(y2)], 1))


class TDetect(tnn.Module):
    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                           tnn.Conv2d(c2, 4 * reg_max, 1)) for c in ch)
        self.cv3 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3),
                           tnn.Conv2d(c3, nc, 1)) for c in ch)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f))
                for i, f in enumerate(feats)]


class TYolo8n(tnn.Module):
    """yolov8n detect with ultralytics layer indices (model.0..22)."""

    def __init__(self, nc):
        super().__init__()
        ch = [16, 32, 64, 128, 256]
        self.model = tnn.ModuleList([
            TConv(3, ch[0], 3, 2),        # 0 stem
            TConv(ch[0], ch[1], 3, 2),    # 1
            TC2f(ch[1], ch[1], 1, True),  # 2
            TConv(ch[1], ch[2], 3, 2),    # 3
            TC2f(ch[2], ch[2], 2, True),  # 4 -> p3
            TConv(ch[2], ch[3], 3, 2),    # 5
            TC2f(ch[3], ch[3], 2, True),  # 6 -> p4
            TConv(ch[3], ch[4], 3, 2),    # 7
            TC2f(ch[4], ch[4], 1, True),  # 8
            TSPPF(ch[4], ch[4]),          # 9 -> p5
            tnn.Identity(),               # 10 upsample
            tnn.Identity(),               # 11 concat
            TC2f(ch[4] + ch[3], ch[3], 1),  # 12
            tnn.Identity(),               # 13 upsample
            tnn.Identity(),               # 14 concat
            TC2f(ch[3] + ch[2], ch[2], 1),  # 15 -> n3
            TConv(ch[2], ch[2], 3, 2),    # 16
            tnn.Identity(),               # 17 concat
            TC2f(ch[2] + ch[3], ch[3], 1),  # 18 -> n4
            TConv(ch[3], ch[3], 3, 2),    # 19
            tnn.Identity(),               # 20 concat
            TC2f(ch[3] + ch[4], ch[4], 1),  # 21 -> n5
            TDetect(nc, [ch[2], ch[3], ch[4]]),  # 22
        ])

    def forward(self, x):
        m = self.model
        x = m[0](x)
        x = m[1](x)
        x = m[2](x)
        x = m[3](x)
        p3 = m[4](x)
        x = m[5](p3)
        p4 = m[6](x)
        x = m[7](p4)
        x = m[8](x)
        p5 = m[9](x)
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
        n4 = m[12](torch.cat([up(p5), p4], 1))
        n3 = m[15](torch.cat([up(n4), p3], 1))
        x = m[16](n3)
        n4b = m[18](torch.cat([x, n4], 1))
        x = m[19](n4b)
        n5 = m[21](torch.cat([x, p5], 1))
        return m[22]([n3, n4b, n5])


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, tnn.Conv2d):
            tnn.init.normal_(mod.weight, std=0.05, generator=g)
            if mod.bias is not None:
                tnn.init.normal_(mod.bias, std=0.05, generator=g)
        elif isinstance(mod, tnn.BatchNorm2d):
            tnn.init.uniform_(mod.weight, 0.5, 1.5, generator=g)
            tnn.init.normal_(mod.bias, std=0.1, generator=g)
            mod.running_mean.normal_(0, 0.2, generator=g)
            mod.running_var.uniform_(0.5, 2.0, generator=g)


def test_pt_conversion_matches_torch_forward(tmp_path):
    nc = 9
    tm = TYolo8n(nc)
    _randomize(tm)
    tm.eval()
    path = tmp_path / "yolov8n_test.pt"
    torch.save({"model": tm}, path)

    conv = load_ultralytics_checkpoint(path)
    assert conv["num_classes"] == nc
    assert conv["scale"] == "n"
    assert conv["task"] == "detect"

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (1, 64, 64, 3)).astype(np.uint8)
    with torch.no_grad():
        tout = tm(torch.from_numpy(
            img.transpose(0, 3, 1, 2).astype(np.float32) / 255.0))

    model = YOLOv8(num_classes=nc, scale="n", task="detect",
                   dtype=jnp.float32)
    out = model.apply({"params": conv["params"],
                       "batch_stats": conv["batch_stats"]},
                      jnp.asarray(img.astype(np.float32)))
    for lvl in range(3):
        tb = tout[lvl][0].numpy().transpose(0, 2, 3, 1)
        tc = tout[lvl][1].numpy().transpose(0, 2, 3, 1)
        fb = np.asarray(out["boxes"][lvl], np.float32)
        fc = np.asarray(out["classes"][lvl], np.float32)
        assert np.max(np.abs(fb - tb)) < 2e-3, \
            f"box level {lvl}: max diff {np.max(np.abs(fb - tb))}"
        assert np.max(np.abs(fc - tc)) < 2e-3, \
            f"cls level {lvl}: max diff {np.max(np.abs(fc - tc))}"


class TProto(tnn.Module):
    """ultralytics Proto: Conv3 -> ConvTranspose2x -> Conv3 -> Conv1."""

    def __init__(self, c1, c_, c2):
        super().__init__()
        self.cv1 = TConv(c1, c_, 3)
        self.upsample = tnn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, 3)
        self.cv3 = TConv(c_, c2, 1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegment(TDetect):
    def __init__(self, nc, ch, nm=32, npr=64):
        super().__init__(nc, ch)
        c4 = max(ch[0] // 4, nm)
        self.cv4 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c4, 3), TConv(c4, c4, 3),
                           tnn.Conv2d(c4, nm, 1)) for c in ch)
        self.proto = TProto(ch[0], npr, nm)

    def forward(self, feats):
        det = super().forward(feats)
        mc = [self.cv4[i](f) for i, f in enumerate(feats)]
        return det, mc, self.proto(feats[0])


def test_pt_segment_conversion_matches_torch_forward(tmp_path):
    """yolov8n-seg: cv4 mask coefficients + Proto (incl. the learned
    ConvTranspose upsample) convert 1:1 from a torch checkpoint."""
    nc = 5
    tm = TYolo8n(nc)
    tm.model[22] = TSegment(nc, [64, 128, 256])
    _randomize(tm)
    tm.eval()
    path = tmp_path / "yolov8n_seg_test.pt"
    torch.save({"model": tm}, path)

    conv = load_ultralytics_checkpoint(path)
    assert conv["task"] == "segment"

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (1, 64, 64, 3)).astype(np.uint8)
    with torch.no_grad():
        (det, mc, proto) = tm(torch.from_numpy(
            img.transpose(0, 3, 1, 2).astype(np.float32) / 255.0))

    model = YOLOv8(num_classes=nc, scale="n", task="segment",
                   dtype=jnp.float32)
    out = model.apply({"params": conv["params"],
                       "batch_stats": conv["batch_stats"]},
                      jnp.asarray(img.astype(np.float32)))
    for lvl in range(3):
        t = mc[lvl].numpy().transpose(0, 2, 3, 1)
        f = np.asarray(out["mask_coeffs"][lvl], np.float32)
        assert np.max(np.abs(f - t)) < 2e-3, lvl
    tp = proto.numpy().transpose(0, 2, 3, 1)
    fp = np.asarray(out["proto"], np.float32)
    assert fp.shape == tp.shape
    assert np.max(np.abs(fp - tp)) < 2e-3, np.max(np.abs(fp - tp))


class TPose(TDetect):
    def __init__(self, nc, ch, nk=51):
        super().__init__(nc, ch)
        c4 = max(ch[0] // 4, nk)
        self.cv4 = tnn.ModuleList(
            tnn.Sequential(TConv(c, c4, 3), TConv(c4, c4, 3),
                           tnn.Conv2d(c4, nk, 1)) for c in ch)

    def forward(self, feats):
        det = super().forward(feats)
        return det, [self.cv4[i](f) for i, f in enumerate(feats)]


def test_pt_pose_conversion_matches_torch_forward(tmp_path):
    nc = 2
    tm = TYolo8n(nc)
    tm.model[22] = TPose(nc, [64, 128, 256])
    _randomize(tm)
    tm.eval()
    path = tmp_path / "yolov8n_pose_test.pt"
    torch.save({"model": tm}, path)

    conv = load_ultralytics_checkpoint(path)
    assert conv["task"] == "pose"
    assert conv["num_keypoints"] == 17 and conv["kpt_dims"] == 3

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (1, 64, 64, 3)).astype(np.uint8)
    with torch.no_grad():
        (det, kp) = tm(torch.from_numpy(
            img.transpose(0, 3, 1, 2).astype(np.float32) / 255.0))

    model = YOLOv8(num_classes=nc, scale="n", task="pose",
                   dtype=jnp.float32)
    out = model.apply({"params": conv["params"],
                       "batch_stats": conv["batch_stats"]},
                      jnp.asarray(img.astype(np.float32)))
    for lvl in range(3):
        t = kp[lvl].numpy().transpose(0, 2, 3, 1)
        f = np.asarray(out["keypoints"][lvl], np.float32)
        assert np.max(np.abs(f - t)) < 2e-3, lvl
