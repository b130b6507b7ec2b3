"""VI zoo backbones (models/backbones.py + vi_network registry).

The reference serves these via torchvision/keras
(visual_identification_network_torch.py:389-560); here they are native
flax. Param counts are pinned to the canonical architectures as a
structural fingerprint.
"""
import jax
import numpy as np
import pytest

from trex_tpu.models import build
from trex_tpu.models.vi_network import UNIMPLEMENTED_VERSIONS


def _n_params(model, shape=(1, 80, 80, 1)):
    # eval_shape traces without compiling or allocating — param
    # counting stays cheap even for the 88M-param ConvNeXt
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           np.zeros(shape, np.float32), train=False))
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(variables["params"]))


def test_zoo_forward_small():
    x = np.random.default_rng(0).integers(
        0, 255, (2, 80, 80, 1)).astype(np.float32)
    for name in ("v110", "v100", "efficientnet_b0"):
        m = build(name, 5)
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(variables, x, train=False)
        assert out.shape == (2, 5), name
        assert np.isfinite(np.asarray(out, np.float32)).all(), name


def test_zoo_param_counts():
    # canonical sizes (head at 7 classes); a wrong block table or a
    # missing SE/expansion would shift these by >1%
    expected = {
        "resnet_18": 11.17e6,
        "efficientnet_b0": 4.02e6,
        "mobilenet_v3_small": 1.52e6,
        "mobilenet_v3_large": 4.21e6,
    }
    for name, want in expected.items():
        n = _n_params(build(name, 7))
        assert abs(n - want) / want < 0.01, (name, n)


def test_zoo_param_counts_large():
    # GAP heads make the param count input-size independent; init on a
    # small grid to keep this cheap
    expected = {
        "xception": 20.82e6,
        "inception_v3": 21.80e6,
        "convnext_base": 87.57e6,
    }
    for name, want in expected.items():
        n = _n_params(build(name, 7), shape=(1, 48, 48, 1))
        assert abs(n - want) / want < 0.01, (name, n)


def test_nasnetmobile_matches_keras_oracle():
    # backbone param count pinned to keras.applications.NASNetMobile
    # (weights=None, include_top=False, 80x80x1): 4,232,402 trainable
    # params — an exact structural fingerprint of NASNet-A (4 @ 1056)
    n = _n_params(build("nasnetmobile", 7))
    head = 1056 * 7 + 7
    assert n - head == 4_232_402, n


def test_version_name_normalization():
    # torch-era enum names, keras-era names and internal names all
    # resolve to the same classes (default_config.cpp:144-161)
    assert type(build("efficientnet_b0", 3)) is \
        type(build("efficientnetb0", 3))
    assert type(build("v118_3", 3)) is type(build("v118", 3))
    assert type(build("current", 3)) is type(build("v119", 3))
    assert type(build("resnet_50_v2", 3)) is type(build("resnet50v2", 3))


def test_zoo_complete_and_unknown_raises():
    # every reference zoo entry now has a native implementation
    assert UNIMPLEMENTED_VERSIONS == ()
    with pytest.raises(ValueError):
        build("definitely_not_a_network", 3)
