"""Device connected-components (JAX/Pallas) vs scipy ground truth."""
import numpy as np
import pytest
from scipy import ndimage

from trex_tpu.ops.cc_device import component_stats, label_components


def _assert_partition_equal(mask, labels):
    ref, n = ndimage.label(mask > 0, structure=np.ones((3, 3), int))
    labels = np.asarray(labels)
    assert (labels >= 0).sum() == (ref > 0).sum()
    # same partition: bijection between label sets
    mapping = {}
    for ours, theirs in zip(labels[labels >= 0].tolist(),
                            ref[ref > 0].tolist()):
        if ours in mapping:
            assert mapping[ours] == theirs
        else:
            mapping[ours] = theirs
    assert len(set(mapping.values())) == len(mapping) == n


def test_simple_components():
    mask = np.zeros((16, 16), np.uint8)
    mask[2:5, 2:6] = 1
    mask[8:12, 10:14] = 1
    mask[14, 0] = 1
    labels = label_components(mask)
    _assert_partition_equal(mask, labels)
    # canonical label = first pixel linear index
    assert np.asarray(labels)[2, 2] == 2 * 16 + 2


def test_s_shape_and_diagonals():
    mask = np.zeros((20, 20), np.uint8)
    mask[2, 2:15] = 1
    mask[2:10, 14] = 1
    mask[9, 4:15] = 1
    mask[10, 3] = 1  # diagonal touch
    labels = label_components(mask)
    _assert_partition_equal(mask, labels)


def test_random_masks():
    rng = np.random.default_rng(3)
    for density in (0.2, 0.5):
        mask = (rng.random((48, 64)) < density).astype(np.uint8)
        labels = label_components(mask)
        _assert_partition_equal(mask, labels)


def test_component_stats():
    mask = np.zeros((16, 16), np.uint8)
    mask[2:4, 2:4] = 1   # 4 px at (2.5, 2.5)
    mask[10:12, 8:12] = 1  # 8 px
    img = np.full((16, 16), 7, np.float32)
    labels = label_components(mask)
    stats = component_stats(labels, img, max_blobs=8)
    ids = np.asarray(stats["ids"])
    count = np.asarray(stats["count"])
    live = ids >= 0
    assert live.sum() == 2
    counts = sorted(count[live].tolist())
    assert counts == [4.0, 8.0]
    i4 = np.flatnonzero(live & (count == 4))[0]
    cx = stats["sum_x"][i4] / 4
    cy = stats["sum_y"][i4] / 4
    assert (float(cx), float(cy)) == (2.5, 2.5)
    assert float(stats["sum_value"][i4]) == 28.0


def test_pallas_kernel_interpret_mode():
    import jax
    from jax.experimental import pallas as pl
    from trex_tpu.ops.cc_device import _neighbor_min_kernel
    import jax.numpy as jnp

    x = jnp.arange(64, dtype=jnp.int32).reshape(8, 8)
    out = pl.pallas_call(
        _neighbor_min_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.int32),
        interpret=True,
    )(x)
    # interior pixel: min of 8 neighbors of value grid = up-left neighbor
    assert out[3, 3] == x[2, 2]
