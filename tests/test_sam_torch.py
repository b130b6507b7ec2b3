"""SAM numerical validation (VERDICT r2 item 6): the flax SAM +
convert_sam_checkpoint must reproduce the official torch compute
graph end-to-end. tests/sam_torch_ref.py is an in-tree port of the
official segment-anything modules with official state-dict naming;
random weights saved from it convert through the real converter and
the flax forward must match the torch forward through the mask
decoder. A second test trains a tiny flax SAM on synthetic prompted
shapes to show the architecture actually segments."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _tiny_pair(seed=0):
    from sam_torch_ref import Sam, randomize

    from trex_tpu.models.sam import SAM, convert_sam_checkpoint

    tmodel = Sam(img_size=128, dim=64, depth=2, heads=2,
                 global_idx=(1,))
    randomize(tmodel, seed)
    sd = tmodel.state_dict()
    variables = convert_sam_checkpoint(sd)
    fmodel = SAM(img_size=128, encoder_dim=64, encoder_depth=2,
                 encoder_heads=2, global_idx=(1,), dtype=jnp.float32)
    return tmodel, fmodel, variables


def test_flax_forward_matches_torch_reference():
    # this jax build's DEFAULT f32 matmul precision truncates inputs
    # (~1e-2 relative): pin full precision for the numerical oracle
    with jax.default_matmul_precision("float32"):
        _run_point_prompt_case()


def _run_point_prompt_case():
    tmodel, fmodel, variables = _tiny_pair()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 128, 128, 3)).astype(np.float32)
    pts = np.array([[[40.0, 60.0], [90.0, 30.0]]], np.float32)
    lbl = np.array([[1, 0]], np.int32)

    tmodel.eval()
    with torch.no_grad():
        t_masks, t_iou = tmodel(torch.from_numpy(img),
                                torch.from_numpy(pts),
                                torch.from_numpy(lbl))
    t_masks = t_masks.numpy()
    t_iou = t_iou.numpy()

    f_masks, f_iou = fmodel.apply(variables, jnp.asarray(img),
                                  jnp.asarray(pts), jnp.asarray(lbl))
    f_masks = np.asarray(f_masks)
    f_iou = np.asarray(f_iou)

    assert t_masks.std() > 1e-3, "degenerate torch output"
    assert f_masks.shape == t_masks.shape
    scale = max(1.0, float(np.abs(t_masks).max()))
    dm = np.abs(f_masks - t_masks).max() / scale
    di = np.abs(f_iou - t_iou).max() / max(1.0,
                                           float(np.abs(t_iou).max()))
    assert dm <= 1e-2, f"mask mismatch {dm}"
    assert di <= 1e-2, f"iou mismatch {di}"


def test_flax_box_prompt_matches_torch_reference():
    with jax.default_matmul_precision("float32"):
        _run_box_prompt_case()


def _run_box_prompt_case():
    tmodel, fmodel, variables = _tiny_pair(seed=3)
    from trex_tpu.models.sam import box_to_prompt

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, 128, 128, 3)).astype(np.float32)
    pts, lbl = box_to_prompt((20.0, 30.0, 90.0, 100.0))

    tmodel.eval()
    with torch.no_grad():
        t_masks, _ = tmodel(torch.from_numpy(img),
                            torch.from_numpy(pts),
                            torch.from_numpy(lbl.astype(np.int64)))
    f_masks, _ = fmodel.apply(variables, jnp.asarray(img),
                              jnp.asarray(pts), jnp.asarray(lbl))
    t_masks = t_masks.numpy()
    f_masks = np.asarray(f_masks)
    scale = max(1.0, float(np.abs(t_masks).max()))
    assert np.abs(f_masks - t_masks).max() / scale <= 1e-2


def test_tiny_sam_learns_to_segment():
    """End-to-end capability: a tiny flax SAM trained on synthetic
    prompted discs reaches decent IoU (the reference's SAM3 path
    segments real video via the same promptable architecture,
    trex_sam3_interface.py:26-60)."""
    import optax

    from trex_tpu.models.sam import SAM

    size = 64
    model = SAM(img_size=size, encoder_dim=32, encoder_depth=2,
                encoder_heads=2, global_idx=(1,), dtype=jnp.float32)

    rng = np.random.default_rng(0)

    def sample(n):
        imgs = np.zeros((n, size, size, 3), np.float32)
        masks = np.zeros((n, size // 4, size // 4), np.float32)
        pts = np.zeros((n, 1, 2), np.float32)
        for i in range(n):
            cx, cy = rng.integers(16, 48, 2)
            r = rng.integers(6, 12)
            yy, xx = np.mgrid[0:size, 0:size]
            disc = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
            imgs[i, disc] = [200, 100, 60]
            imgs[i] += rng.normal(0, 8, imgs[i].shape)
            m4 = disc[::4, ::4]
            masks[i] = m4
            pts[i, 0] = (cx, cy)
        return (jnp.asarray(np.clip(imgs, 0, 255)),
                jnp.asarray(masks), jnp.asarray(pts),
                jnp.ones((n, 1), jnp.int32))

    imgs, gt, pts, lbl = sample(8)
    variables = model.init(jax.random.PRNGKey(0), imgs[:1], pts[:1],
                           lbl[:1])
    tx = optax.adam(3e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, imgs, gt, pts, lbl):
        def loss_fn(p):
            masks, iou = model.apply({"params": p}, imgs, pts, lbl)
            m = masks[:, 0]  # single-mask token
            bce = optax.sigmoid_binary_cross_entropy(m, gt).mean()
            return bce, m

        (loss, m), grads = jax.value_and_grad(loss_fn,
                                              has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, m

    params = variables["params"]
    for it in range(120):
        imgs, gt, pts, lbl = sample(8)
        params, opt_state, loss, m = step(params, opt_state, imgs, gt,
                                          pts, lbl)
    # evaluate IoU on fresh samples
    imgs, gt, pts, lbl = sample(16)
    masks, _ = model.apply({"params": params}, imgs, pts, lbl)
    pred = np.asarray(masks[:, 0]) > 0
    gtb = np.asarray(gt) > 0.5
    inter = (pred & gtb).sum()
    union = (pred | gtb).sum()
    iou = inter / max(1, union)
    assert iou > 0.6, f"tiny SAM failed to learn segmentation: {iou}"


def test_sam3_text_prompt_drives_segmentation():
    """SAM3 concept/text prompting end-to-end (VERDICT r3 item 8,
    trex_sam3_interface.py:26-60 + SAM3PromptState.cpp): a tiny
    with_text SAM trained on synthetic circle+square scenes segments
    the shape NAMED by the text prompt, and detect_sam3_prompt text
    entries ('{0:circle}') drive SamSegmenter.segment through the
    prompt-state machinery."""
    import optax

    from trex_tpu.models.sam import SAM, tokenize_text

    size = 64
    model = SAM(img_size=size, encoder_dim=32, encoder_depth=2,
                encoder_heads=2, global_idx=(1,), dtype=jnp.float32,
                with_text=True)
    rng = np.random.default_rng(1)
    names = ["circle", "square"]

    def scene():
        img = np.zeros((size, size, 3), np.float32)
        yy, xx = np.mgrid[0:size, 0:size]
        cx, cy = rng.integers(12, 26, 2)
        r = int(rng.integers(6, 9))
        disc = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
        img[disc] = [200, 80, 60]
        sx, sy = rng.integers(36, 50, 2)
        h = int(rng.integers(5, 8))
        sq = (np.abs(xx - sx) <= h) & (np.abs(yy - sy) <= h)
        img[sq] = [60, 90, 210]
        img += rng.normal(0, 6, img.shape)
        return np.clip(img, 0, 255), disc, sq

    def sample(n):
        imgs = np.zeros((n, size, size, 3), np.float32)
        gts = np.zeros((n, size // 4, size // 4), np.float32)
        ids = np.zeros((n, 32), np.int32)
        for i in range(n):
            img, disc, sq = scene()
            which = int(rng.integers(0, 2))
            imgs[i] = img
            gts[i] = (disc if which == 0 else sq)[::4, ::4]
            ids[i] = tokenize_text(names[which])
        return (jnp.asarray(imgs), jnp.asarray(gts),
                jnp.asarray(ids))

    imgs, gt, tids = sample(8)
    emb0 = jnp.zeros((1, size // 16, size // 16, 256), jnp.float32)
    v1 = model.init(jax.random.PRNGKey(0), imgs[:1],
                    jnp.zeros((1, 1, 2), jnp.float32),
                    jnp.ones((1, 1), jnp.int32))
    v2 = model.init(jax.random.PRNGKey(1), emb0, tids[:1],
                    method="decode_text")
    params = dict(v1["params"])
    for k, v in v2["params"].items():
        params.setdefault(k, v)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, imgs, gt, tids):
        def loss_fn(p):
            emb = model.apply({"params": p}, imgs, method="encode")
            masks, _ = model.apply({"params": p}, emb, tids,
                                   method="decode_text")
            m = masks[:, 0]
            return optax.sigmoid_binary_cross_entropy(m, gt).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(400):
        imgs, gt, tids = sample(8)
        params, opt_state, loss = step(params, opt_state, imgs, gt,
                                       tids)
    # fresh-scene IoU, text selects the right shape
    imgs, gt, tids = sample(16)
    emb = model.apply({"params": params}, imgs, method="encode")
    masks, _ = model.apply({"params": params}, emb, tids,
                           method="decode_text")
    pred = np.asarray(masks[:, 0]) > 0
    gtb = np.asarray(gt) > 0.5
    iou = (pred & gtb).sum() / max(1, (pred | gtb).sum())
    assert iou > 0.5, f"text-prompted SAM failed to learn: {iou}"

    # detect_sam3_prompt surface: text entries reach the model
    from trex_tpu.detect.sam3 import Sam3Prompts, SamSegmenter

    seg = SamSegmenter(model, {"params": params})
    assert seg._decode_text is not None
    img, disc, sq = scene()
    prompts = Sam3Prompts.from_setting("{0:circle}")
    objs = prompts.materialize(0)
    assert objs and objs[0].positive_prompts[0].text == "circle"
    out = seg.segment(img.astype(np.uint8), objs)
    assert out, "text prompt produced no mask"
    mask = next(iter(out.values()))
    on_disc = (mask & disc).sum() / max(1, disc.sum())
    on_square = (mask & sq).sum() / max(1, sq.sum())
    assert on_disc > 0.5 and on_disc > 2 * on_square, \
        (on_disc, on_square)
