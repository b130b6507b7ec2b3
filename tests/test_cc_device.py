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


def test_vmem_striped_labeler_matches_reference():
    """label_components_vmem (VMEM stripe relaxation, interpret mode)
    must produce bit-identical labels to label_components: random
    densities, stripe-crossing S-shapes, non-128 widths, batches."""
    import jax.numpy as jnp

    from trex_tpu.ops.cc_device import label_components_vmem

    rng = np.random.default_rng(0)

    def check(mask, stripe_h=None):
        lab = np.asarray(label_components_vmem(
            jnp.asarray(mask[None]), stripe_h=stripe_h,
            interpret=True))[0]
        ref = np.asarray(label_components(jnp.asarray(mask)))
        np.testing.assert_array_equal(lab, ref)
        _assert_partition_equal(mask, lab)

    for H, W, sh in [(16, 16, None), (48, 64, 8), (40, 200, 16),
                     (33, 130, 8)]:
        for density in (0.1, 0.35, 0.6):
            check((rng.random((H, W)) < density).astype(np.uint8), sh)
    # S-shape spanning many stripes: exercises the outer halo loop
    m = np.zeros((64, 96), np.uint8)
    m[2, 2:90] = 1
    m[2:50, 89] = 1
    m[49, 4:90] = 1
    m[50:60, 4] = 1
    check(m, 8)
    # batch: the grid (not vmap) carries the batch dimension
    mb = (rng.random((3, 32, 96)) < 0.4).astype(np.uint8)
    lab = np.asarray(label_components_vmem(jnp.asarray(mb),
                                           stripe_h=8, interpret=True))
    for b in range(3):
        ref = np.asarray(label_components(jnp.asarray(mb[b])))
        np.testing.assert_array_equal(lab[b], ref)


def test_detect_batch_pallas_path():
    """detect_batch(use_pallas=True) (striped VMEM labeler) matches the
    XLA path end-to-end."""
    import jax.numpy as jnp

    from trex_tpu.ops.device_pipeline import detect_batch

    rng = np.random.default_rng(7)
    bg = np.full((64, 96), 200, np.uint8)
    frames = np.full((2, 64, 96), 200, np.uint8)
    for b in range(2):
        for _ in range(5):
            y, x = rng.integers(5, 55), rng.integers(5, 85)
            frames[b, y:y + 5, x:x + 8] = 90
    a = detect_batch(jnp.asarray(frames), jnp.asarray(bg),
                     threshold=20, track_threshold=40,
                     absolute=False, max_blobs=64, use_pallas=True)
    b_ = detect_batch(jnp.asarray(frames), jnp.asarray(bg),
                      threshold=20, track_threshold=40,
                      absolute=False, max_blobs=64, use_pallas=False)
    for k in ("cx", "cy", "count", "track_count"):
        np.testing.assert_array_equal(
            np.where(np.asarray(a["valid"]), np.asarray(a[k]), 0),
            np.where(np.asarray(b_["valid"]), np.asarray(b_[k]), 0))


def test_detect_batch_matches_native():
    """Device detect_batch vs the native host labeler on random frames."""
    import numpy as np
    import jax.numpy as jnp

    from trex_tpu.ops.device_pipeline import detect_batch
    from trex_tpu.ops.labeling import label_blobs

    rng = np.random.default_rng(3)
    bg = np.full((64, 96), 200, np.uint8)
    frames = np.full((3, 64, 96), 200, np.uint8)
    for b in range(3):
        for _ in range(6):
            y, x = rng.integers(5, 55), rng.integers(5, 85)
            frames[b, y:y + 5, x:x + 8] = 90
    out = detect_batch(jnp.asarray(frames), jnp.asarray(bg),
                       threshold=20, track_threshold=40,
                       absolute=False, max_blobs=64)
    for b in range(3):
        blobs = label_blobs(frames[b], bg, threshold=20, absolute=False,
                            track_threshold=40, track_absolute=False)
        host = sorted(bl.num_pixels for bl in blobs)
        dev_counts = np.asarray(out["count"][b])
        dev = sorted(int(c) for c in dev_counts[np.asarray(out["valid"][b])])
        assert dev == host
        # recount parity (fused second threshold)
        host_rc = sorted(int(bl.stats[1]) for bl in blobs)
        dev_rc = sorted(int(c) for c in
                        np.asarray(out["track_count"][b])[
                            np.asarray(out["valid"][b])])
        assert dev_rc == host_rc
        # centroid parity for the largest blob
        big = max(blobs, key=lambda bl: bl.num_pixels)
        hx, hy = big.center()
        i = int(np.nanargmax(np.where(np.asarray(out["valid"][b]),
                                      dev_counts, -1)))
        assert abs(float(out["cx"][b][i]) - hx) < 1e-3
        assert abs(float(out["cy"][b][i]) - hy) < 1e-3
