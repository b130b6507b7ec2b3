"""YOLO backend tests: model shapes, decode math, mask processing,
blob conversion (reference trex_yolo.py / YOLO.cpp semantics)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from trex_tpu.detect.yolo import (
    Detections,
    boxes_to_blobs,
    masks_to_blobs,
    process_mask,
    scale_boxes_back,
)
from trex_tpu.models.yolo import (
    YOLOv8,
    decode_predictions,
    dfl_decode,
    dist2bbox,
    make_anchors,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = YOLOv8(num_classes=3, scale="n", task="detect")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    return model, variables


def test_model_output_shapes(tiny_model):
    model, variables = tiny_model
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out["shapes"] == ((8, 8), (4, 4), (2, 2))
    assert out["boxes"][0].shape == (2, 8, 8, 64)  # 4*reg_max
    assert out["classes"][0].shape == (2, 8, 8, 3)
    dec = decode_predictions(out, 3)
    n = 8 * 8 + 4 * 4 + 2 * 2
    assert dec["boxes"].shape == (2, n, 4)
    assert dec["conf"].shape == (2, n)


def test_segment_head_shapes():
    model = YOLOv8(num_classes=2, scale="n", task="segment")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["proto"].shape == (1, 16, 16, 32)
    dec = decode_predictions(out, 2)
    assert dec["mask_coeffs"].shape[-1] == 32


def test_pose_head_shapes():
    model = YOLOv8(num_classes=1, scale="n", task="pose", num_keypoints=5)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    dec = decode_predictions(out, 1)
    assert dec["keypoints"].shape[2:] == (5, 3)


def test_dfl_decode_expectation():
    # one-hot logits at bin 7 -> distance 7
    logits = np.full((1, 4 * 16), -1e9, np.float32)
    for d in range(4):
        logits[0, d * 16 + 7] = 1e9
    out = np.asarray(dfl_decode(jnp.asarray(logits)))
    np.testing.assert_allclose(out[0], [7, 7, 7, 7], atol=1e-4)


def test_anchors_and_dist2bbox():
    anchors, strides = make_anchors([(2, 2)], strides=(8,))
    assert anchors.shape == (4, 2)
    np.testing.assert_allclose(np.asarray(anchors[0]), [0.5, 0.5])
    ltrb = jnp.asarray([[1.0, 1.0, 2.0, 2.0]] * 4)
    boxes = np.asarray(dist2bbox(ltrb, anchors, strides))
    # first anchor (0.5, 0.5) stride 8: box = (-4, -4, 20, 20)
    np.testing.assert_allclose(boxes[0], [-4, -4, 20, 20])


def test_scale_boxes_back_letterbox():
    # 100x200 image letterboxed into 640x640: gain 3.2, pad y = 160
    boxes = np.array([[0.0, 160.0, 640.0, 480.0]])
    out = scale_boxes_back(boxes, (640, 640), (100, 200))
    np.testing.assert_allclose(out[0], [0, 0, 200, 100], atol=1.0)


def test_process_mask_crops_to_box():
    mh = mw = 8
    proto = np.zeros((mh, mw, 2), np.float32)
    proto[:, :, 0] = 10.0  # coefficient 1 on channel 0 -> all sigmoid(10)
    coeffs = np.array([[1.0, 0.0]])
    boxes = np.array([[8.0, 8.0, 24.0, 24.0]])  # in 32x32 input coords
    masks = process_mask(proto, coeffs, boxes, (32, 32))
    assert masks.shape == (1, 8, 8)
    assert masks[0, 3, 3]  # inside box
    assert not masks[0, 0, 0]  # cropped away


def test_boxes_to_blobs(settings):
    img = np.full((50, 60), 100, np.uint8)
    det = Detections(boxes=np.array([[10.0, 10.0, 20.0, 18.0]]),
                     conf=np.array([0.9]), clid=np.array([2]))
    blobs = boxes_to_blobs(det, img, settings)
    assert len(blobs) == 1
    b = blobs[0]
    # xyxy [10,20) x [10,18): 10 columns x 8 rows (exclusive edges)
    assert b.bounds == (10, 10, 10, 8)
    assert b.prediction["clid"] == 2
    assert (b.pixels == 100).all()


def test_masks_to_blobs(settings):
    img = np.full((20, 20), 50, np.uint8)
    mask = np.zeros((20, 20), bool)
    mask[5:10, 5:15] = True
    det = Detections(boxes=np.array([[5.0, 5.0, 15.0, 10.0]]),
                     conf=np.array([0.8]), clid=np.array([0]))
    blobs = masks_to_blobs(det, img, mask[None], settings)
    assert len(blobs) == 1
    assert blobs[0].num_pixels == 50
    assert blobs[0].flags & 0x4  # instance segmentation flag


def test_detection_registry(settings):
    from trex_tpu.detect.base import create_detection

    settings.set("detect_type", "none")
    backend = create_detection(settings)
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blobs = backend.apply(0, img)
    assert len(blobs) == 1
    assert blobs[0].num_pixels == 12

    settings.set("detect_type", "background_subtraction")
    backend = create_detection(settings, background=np.full((3, 4), 10,
                                                            np.uint8))
    assert backend.apply(0, img) is not None


def test_unpad_masks_letterbox_geometry():
    """A proto-grid mask on a letterboxed non-square frame must map to
    the right video rows after unpadding (regression: masks resized
    straight from the padded square were shifted by the pad)."""
    from trex_tpu.detect.yolo import letterbox_params, unpad_masks

    h, w = 360, 640  # non-square video
    inp = 640
    gain, pad = letterbox_params((h, w), (inp, inp))
    assert pad[1] > 0  # top/bottom letterbox bands
    mh = mw = 160  # proto grid (inp/4)
    # content occupies input rows pad[1] .. pad[1]+h*gain; paint a mask
    # band at the video's vertical middle
    masks = np.zeros((1, mh, mw), bool)
    sy = mh / inp
    mid_in = pad[1] + (h / 2) * gain
    r = int(mid_in * sy)
    masks[0, r - 2:r + 2, :] = True
    out = unpad_masks(masks, pad, gain, (h, w), inp)
    import cv2

    m = cv2.resize(out[0].astype(np.uint8), (w, h),
                   interpolation=cv2.INTER_NEAREST)
    rows = np.nonzero(m.any(axis=1))[0]
    assert rows.size
    center = rows.mean()
    assert abs(center - h / 2) < 12, center  # lands mid-frame, not shifted


# ------------------------------------------------------------------ OBB
def test_obb_head_decode_shapes():
    """task=obb: decode emits (B, N, 5) rboxes whose axis-aligned hulls
    replace 'boxes' (ultralytics dist2rbox semantics)."""
    model = YOLOv8(num_classes=2, scale="n", task="obb")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    dec = decode_predictions(out, 2)
    n = 8 * 8 + 4 * 4 + 2 * 2
    assert dec["obb"].shape == (1, n, 5)
    assert np.all(np.abs(np.asarray(dec["obb"][..., 4])) <= np.pi)
    # hull containment: every rotated corner inside its aligned box
    from trex_tpu.detect.yolo import obb_corners

    obb = np.asarray(dec["obb"][0])
    boxes = np.asarray(dec["boxes"][0])
    cs = obb_corners(obb)
    assert np.all(cs[..., 0] >= boxes[:, None, 0] - 1e-3)
    assert np.all(cs[..., 0] <= boxes[:, None, 2] + 1e-3)
    assert np.all(cs[..., 1] >= boxes[:, None, 1] - 1e-3)
    assert np.all(cs[..., 1] <= boxes[:, None, 3] + 1e-3)


def test_obbs_to_blobs_axis_aligned_matches_box_fill():
    """angle=0 OBB rasterizes to the inner-pixel rectangle (the
    ceil/floor scanline convention of YOLO.cpp:840)."""
    from trex_tpu.detect.yolo import obbs_to_blobs
    from trex_tpu.config import reset_global_settings

    s = reset_global_settings()
    img = np.arange(40 * 40, dtype=np.int64).astype(np.uint8)
    img = img.reshape(40, 40)
    obb = np.array([[20.0, 15.0, 10.0, 6.0, 0.0]])
    det = Detections(np.array([[15, 12, 25, 18.0]]), np.array([0.9]),
                     np.array([1]), obb=obb)
    blobs = obbs_to_blobs(det, img, s)
    assert len(blobs) == 1
    b = blobs[0]
    ys = sorted(set(int(l[0]) for l in b.lines))
    assert ys == list(range(12, 19))
    for y, x0, x1 in b.lines:
        assert (x0, x1) == (15, 25)
    assert b.prediction["clid"] == 1


def test_obbs_to_blobs_rotated_square_is_diamond():
    """A 45-degree square becomes a diamond: widest line at the center
    row, 1-2 px at the tips."""
    from trex_tpu.detect.yolo import obbs_to_blobs
    from trex_tpu.config import reset_global_settings

    s = reset_global_settings()
    img = np.full((60, 60), 7, np.uint8)
    side = 14.0
    obb = np.array([[30.0, 30.0, side, side, np.pi / 4]])
    det = Detections(np.array([[20, 20, 40, 40.0]]), np.array([0.8]),
                     np.array([0]), obb=obb)
    blobs = obbs_to_blobs(det, img, s)
    assert len(blobs) == 1
    widths = {int(l[0]): int(l[2]) - int(l[1]) + 1 for l in blobs[0].lines}
    half_diag = side / np.sqrt(2)  # ~9.9
    # widest at the center row
    assert max(widths, key=widths.get) == 30
    assert abs(widths[30] - 2 * half_diag) <= 2
    # monotone shrink toward the tips
    rows = sorted(widths)
    for a, b in zip(rows, rows[1:]):
        if b <= 30:
            assert widths[b] >= widths[a]
        if a >= 30:
            assert widths[b] <= widths[a]
    # containment: all pixels inside the rotated square (+1px edge slack)
    for y, x0, x1 in blobs[0].lines:
        for x in (x0, x1):
            dx, dy = x - 30.0, y - 30.0
            u = abs(dx * np.cos(np.pi / 4) + dy * np.sin(np.pi / 4))
            v = abs(-dx * np.sin(np.pi / 4) + dy * np.cos(np.pi / 4))
            assert u <= side / 2 + 1.0 and v <= side / 2 + 1.0


def test_points_to_blobs_radius_map():
    """detect_point_radii: class-keyed radii map (YOLO.cpp:754 circle
    fill; trex_yolo.py:328 row construction, default radius 20)."""
    from trex_tpu.detect.yolo import attach_points, points_to_blobs
    from trex_tpu.config import reset_global_settings

    s = reset_global_settings()
    s.set("detect_point_radii", {0: 3.0, 1: 6.0})
    img = np.full((80, 80), 9, np.uint8)
    det = Detections(
        np.array([[20, 20, 20, 20], [50, 50, 50, 50.0]]),
        np.array([0.9, 0.8]), np.array([0, 1]))
    attach_points(det, s)
    np.testing.assert_allclose(det.radii, [3.0, 6.0])
    blobs = points_to_blobs(det, img, s)
    assert len(blobs) == 2
    h0 = len({int(l[0]) for l in blobs[0].lines})
    h1 = len({int(l[0]) for l in blobs[1].lines})
    assert h1 > h0  # bigger radius -> taller circle
    # circle geometry: widest at the center, >= 3px even at the tips
    w1 = {int(l[0]): int(l[2]) - int(l[1]) + 1 for l in blobs[1].lines}
    assert max(w1, key=w1.get) in (50, 51)
    assert max(w1.values()) >= 11 and min(w1.values()) >= 3
    # unmapped class falls back to radius 20
    det2 = Detections(np.array([[40, 40, 40, 40.0]]), np.array([0.5]),
                      np.array([7]))
    attach_points(det2, s)
    assert det2.radii[0] == 20.0


def test_obb_detector_end_to_end(settings):
    """Synthetic OBB flow: flax obb model -> detector -> merged blobs
    with rotated masks (VERDICT r4 item 5)."""
    from trex_tpu.detect.base import create_detection
    from trex_tpu.detect.yolo import YOLODetector

    settings.set("detect_type", "yolo")
    settings.set("detect_conf_threshold", 0.0)
    det = YOLODetector(settings, scale="n", task="obb", num_classes=2,
                       input_size=64)
    img = np.random.default_rng(0).integers(
        0, 255, (48, 64), np.uint8)
    d = det.detect(img)
    assert d.obb is not None and d.obb.shape[1] == 5
    from trex_tpu.detect.yolo import obbs_to_blobs

    blobs = obbs_to_blobs(d, img, settings)
    assert isinstance(blobs, list)
    for b in blobs:
        assert b.prediction["clid"] in (0, 1)
