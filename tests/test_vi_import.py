"""Reference VI `.pt` weight import: torch V118_3 -> flax V118_3 must
produce identical logits (the accuracy-parity prerequisite — a
reference-trained identity network must run unchanged)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from trex_tpu.models.vi_convert import load_torch_vi_weights  # noqa: E402
from trex_tpu.models.vi_network import build  # noqa: E402


class TorchV118_3(tnn.Module):
    """Replica of the reference's V118_3
    (visual_identification_network_torch.py:184-214)."""

    def __init__(self, w, h, num_classes, channels=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(channels, 16, 5, padding="same")
        self.bn1 = tnn.BatchNorm2d(16)
        self.pool1 = tnn.MaxPool2d(2)
        self.conv2 = tnn.Conv2d(16, 64, 5, padding="same")
        self.bn2 = tnn.BatchNorm2d(64)
        self.pool2 = tnn.MaxPool2d(2)
        self.conv3 = tnn.Conv2d(64, 128, 5, padding="same")
        self.bn3 = tnn.BatchNorm2d(128)
        self.pool3 = tnn.MaxPool2d(2)
        self.fc1 = tnn.Linear(128 * (w // 8) * (h // 8), 100)
        self.bn4 = tnn.LayerNorm(100)
        self.fc2 = tnn.Linear(100, num_classes)

    def forward(self, x):
        r = torch.relu
        x = self.pool1(r(self.bn1(self.conv1(x))))
        x = self.pool2(r(self.bn2(self.conv2(x))))
        x = self.pool3(r(self.bn3(self.conv3(x))))
        x = x.reshape(x.size(0), -1)
        x = r(self.bn4(self.fc1(x)))
        return self.fc2(x)


def _randomize(model, seed=1):
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, (tnn.Conv2d, tnn.Linear)):
            tnn.init.normal_(mod.weight, std=0.05, generator=g)
            tnn.init.normal_(mod.bias, std=0.05, generator=g)
        elif isinstance(mod, (tnn.BatchNorm2d, tnn.LayerNorm)):
            tnn.init.uniform_(mod.weight, 0.5, 1.5, generator=g)
            tnn.init.normal_(mod.bias, std=0.1, generator=g)
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2, generator=g)
                mod.running_var.uniform_(0.5, 2.0, generator=g)


@pytest.mark.parametrize("save_mode", ["state_dict", "module"])
def test_v118_3_import_matches_torch(tmp_path, save_mode):
    ncls = 13
    tm = TorchV118_3(80, 80, ncls)
    _randomize(tm)
    tm.eval()
    path = tmp_path / "video_weights.pt"
    torch.save(tm.state_dict() if save_mode == "state_dict" else tm,
               path)

    variables = load_torch_vi_weights(path, "v118_3", (80, 80))
    model = build("v118_3", ncls, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 80, 80, 1)).astype(np.float32)
    with torch.no_grad():
        tin = torch.from_numpy(
            imgs.transpose(0, 3, 1, 2) / 127.5 - 1.0).float()
        tout = tm(tin).numpy()
    fout = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(imgs), train=False), np.float32)
    assert np.max(np.abs(fout - tout)) < 2e-3, \
        f"max logit diff {np.max(np.abs(fout - tout))}"
    # predictions identical
    assert (fout.argmax(-1) == tout.argmax(-1)).all()
