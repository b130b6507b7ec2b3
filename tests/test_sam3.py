"""SAM3 prompt-state tests (mirror of the reference's
test_sam3promptpayload / test_sam3interactivesession coverage)."""
import numpy as np
import pytest

from trex_tpu.detect.sam3 import (
    Sam3InteractiveSession,
    Sam3Prompt,
    Sam3Prompts,
    SessionState,
)


def test_prompt_json_roundtrip():
    prompts = Sam3Prompts()
    prompts.add(0, Sam3Prompt(text="a guppy"), box=(10, 10, 50, 50))
    prompts.add(5, Sam3Prompt(box=(1, 2, 3, 4), positive=False))
    restored = Sam3Prompts.from_json(prompts.to_json())
    assert sorted(restored.by_frame) == [0, 5]
    obj = restored.by_frame[0][0]
    assert obj.seed_box == (10, 10, 50, 50)
    assert obj.positive_prompts[0].text == "a guppy"
    neg = restored.by_frame[5][0]
    assert neg.negative_prompts[0].box == (1, 2, 3, 4)
    assert not neg.negative_prompts[0].positive


def test_materialize_latest_seed_wins():
    prompts = Sam3Prompts()
    a = prompts.add(0, Sam3Prompt(text="x"))
    b = prompts.add(10, Sam3Prompt(text="y"))
    assert [o.id for o in prompts.materialize(5)] == [a.id]
    assert {o.id for o in prompts.materialize(15)} == {a.id, b.id}
    assert prompts.materialize(20)
    assert len(prompts.flatten(15)) == 2


def test_erase_object():
    prompts = Sam3Prompts()
    a = prompts.add(0, Sam3Prompt(text="x"))
    assert prompts.erase_object(a.id)
    assert not prompts.erase_object(a.id)
    assert prompts.materialize(5) == []


def test_session_state_machine():
    session = Sam3InteractiveSession()
    assert session.state == SessionState.Idle
    with pytest.raises(RuntimeError):
        session.propagate([0], lambda f: np.zeros((4, 4)))
    session.add_prompt(0, Sam3Prompt(text="fish"))
    assert session.state == SessionState.Prompted
    # no model attached -> clean error state
    with pytest.raises(RuntimeError, match="no SAM3 model"):
        session.propagate([0], lambda f: np.zeros((4, 4)))
    assert session.state == SessionState.Error
    session.reset()

    calls = []

    def fake_segment(image, prompts):
        calls.append(len(prompts))
        return np.ones_like(image, bool)

    session = Sam3InteractiveSession(segment_fn=fake_segment)
    session.add_prompt(0, Sam3Prompt(text="fish"))
    session.propagate([0, 1], lambda f: np.zeros((4, 4)))
    assert session.state == SessionState.Ready
    assert 0 in session.masks and 1 in session.masks
    assert calls == [1, 1]


def test_sam_segmenter_end_to_end():
    """The real SAM model path: a tiny randomly-initialized model runs
    the full session -> segment -> blobs pipeline and produces masks of
    the right shape (weights convert via convert_sam_checkpoint when a
    real checkpoint is available)."""
    import numpy as np

    from trex_tpu.detect.sam3 import (
        Sam3InteractiveSession, Sam3Prompt, SamSegmenter,
        blobs_from_masks)

    seg = SamSegmenter.small_random(img_size=64)
    session = Sam3InteractiveSession(
        segment_fn=lambda img, prompts: seg.segment(img, prompts))
    session.add_prompt(0, Sam3Prompt(box=(10, 10, 40, 40)),
                       box=(10, 10, 40, 40))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 56), np.uint8)
    session.propagate([0, 1], lambda f: img)
    assert session.state.value == "ready"
    assert 0 in session.masks and 1 in session.masks
    masks = session.masks[0]
    assert set(masks) == {1} or len(masks) >= 1
    mask = next(iter(masks.values()))
    assert mask.shape == img.shape and mask.dtype == bool
    blobs = blobs_from_masks(masks, img)
    for b in blobs:
        assert b.num_pixels > 0


def test_sam_checkpoint_conversion_roundtrip(tmp_path):
    """convert_sam_checkpoint maps a (tiny, correctly-named) official
    state dict onto the flax tree and the model runs with it."""
    torch = __import__("pytest").importorskip("torch")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from trex_tpu.models.sam import SAM, convert_sam_checkpoint

    model = SAM(img_size=64, encoder_dim=32, encoder_depth=2,
                encoder_heads=2, global_idx=(1,), dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pts = jnp.zeros((1, 2, 2), jnp.float32)
    lbl = jnp.zeros((1, 2), jnp.int32)
    ref = model.init(jax.random.PRNGKey(0), img, pts, lbl)

    # build a torch-style state dict with official SAM key names whose
    # shapes mirror the flax tree, then convert and compare structure
    g = torch.Generator().manual_seed(0)

    def t(shape):
        return torch.randn(*shape, generator=g)

    sd = {}
    p = ref["params"]["image_encoder"]
    sd["image_encoder.patch_embed.proj.weight"] = t(
        np.transpose(p["patch_embed"]["kernel"], (3, 2, 0, 1)).shape)
    sd["image_encoder.patch_embed.proj.bias"] = t(
        p["patch_embed"]["bias"].shape)
    sd["image_encoder.pos_embed"] = t(p["pos_embed"].shape)
    for i in range(2):
        b = p[f"block{i}"]
        pre = f"image_encoder.blocks.{i}"
        for nm in ("norm1", "norm2"):
            sd[f"{pre}.{nm}.weight"] = t(b[nm]["scale"].shape)
            sd[f"{pre}.{nm}.bias"] = t(b[nm]["bias"].shape)
        sd[f"{pre}.attn.qkv.weight"] = t(b["attn"]["qkv"]["kernel"].T.shape)
        sd[f"{pre}.attn.qkv.bias"] = t(b["attn"]["qkv"]["bias"].shape)
        sd[f"{pre}.attn.proj.weight"] = t(b["attn"]["proj"]["kernel"].T.shape)
        sd[f"{pre}.attn.proj.bias"] = t(b["attn"]["proj"]["bias"].shape)
        sd[f"{pre}.attn.rel_pos_h"] = t(b["attn"]["rel_pos_h"].shape)
        sd[f"{pre}.attn.rel_pos_w"] = t(b["attn"]["rel_pos_w"].shape)
        for lin in ("lin1", "lin2"):
            sd[f"{pre}.mlp.{lin}.weight"] = t(b["mlp"][lin]["kernel"].T.shape)
            sd[f"{pre}.mlp.{lin}.bias"] = t(b["mlp"][lin]["bias"].shape)
    sd["image_encoder.neck.0.weight"] = t(
        np.transpose(p["neck0"]["kernel"], (3, 2, 0, 1)).shape)
    sd["image_encoder.neck.2.weight"] = t(
        np.transpose(p["neck2"]["kernel"], (3, 2, 0, 1)).shape)
    for nm, key in (("neck1", "image_encoder.neck.1"),
                    ("neck3", "image_encoder.neck.3")):
        sd[key + ".weight"] = t(p[nm]["scale"].shape)
        sd[key + ".bias"] = t(p[nm]["bias"].shape)

    pe = ref["params"]["prompt_encoder"]
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        t(pe["pe_gaussian"].shape)
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = t(
            (1, pe["point_embeddings"].shape[1]))
    sd["prompt_encoder.not_a_point_embed.weight"] = t(
        pe["not_a_point"].shape)
    sd["prompt_encoder.no_mask_embed.weight"] = t(
        pe["no_mask_embed"].shape)

    md = ref["params"]["mask_decoder"]
    sd["mask_decoder.iou_token.weight"] = t(md["iou_token"].shape)
    sd["mask_decoder.mask_tokens.weight"] = t(md["mask_tokens"].shape)
    tw = {"self_attn": "self_attn",
          "cross_attn_t2i": "cross_attn_token_to_image",
          "cross_attn_i2t": "cross_attn_image_to_token"}
    for i in range(2):
        blk = md[f"block{i}"]
        pre = f"mask_decoder.transformer.layers.{i}"
        for ours, theirs in tw.items():
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{pre}.{theirs}.{proj}.weight"] = t(
                    blk[ours][proj]["kernel"].T.shape)
                sd[f"{pre}.{theirs}.{proj}.bias"] = t(
                    blk[ours][proj]["bias"].shape)
        for nm in ("norm1", "norm2", "norm3", "norm4"):
            sd[f"{pre}.{nm}.weight"] = t(blk[nm]["scale"].shape)
            sd[f"{pre}.{nm}.bias"] = t(blk[nm]["bias"].shape)
        for lin in ("lin1", "lin2"):
            sd[f"{pre}.mlp.{lin}.weight"] = t(
                blk["mlp"][lin]["kernel"].T.shape)
            sd[f"{pre}.mlp.{lin}.bias"] = t(blk["mlp"][lin]["bias"].shape)
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        sd[f"mask_decoder.transformer.final_attn_token_to_image.{proj}"
           f".weight"] = t(md["final_attn"][proj]["kernel"].T.shape)
        sd[f"mask_decoder.transformer.final_attn_token_to_image.{proj}"
           f".bias"] = t(md["final_attn"][proj]["bias"].shape)
    sd["mask_decoder.transformer.norm_final_attn.weight"] = t(
        md["final_norm"]["scale"].shape)
    sd["mask_decoder.transformer.norm_final_attn.bias"] = t(
        md["final_norm"]["bias"].shape)
    # torch ConvTranspose2d weight is (in, out, kH, kW)
    sd["mask_decoder.output_upscaling.0.weight"] = t(
        np.transpose(md["upscale0"]["kernel"], (2, 3, 0, 1)).shape)
    sd["mask_decoder.output_upscaling.0.bias"] = t(
        md["upscale0"]["bias"].shape)
    sd["mask_decoder.output_upscaling.1.weight"] = t(
        md["upscale_norm"]["scale"].shape)
    sd["mask_decoder.output_upscaling.1.bias"] = t(
        md["upscale_norm"]["bias"].shape)
    sd["mask_decoder.output_upscaling.3.weight"] = t(
        np.transpose(md["upscale1"]["kernel"], (2, 3, 0, 1)).shape)
    sd["mask_decoder.output_upscaling.3.bias"] = t(
        md["upscale1"]["bias"].shape)
    for ti in range(4):
        for li in range(3):
            sd[f"mask_decoder.output_hypernetworks_mlps.{ti}.layers.{li}"
               f".weight"] = t(md[f"hyper{ti}_{li}"]["kernel"].T.shape)
            sd[f"mask_decoder.output_hypernetworks_mlps.{ti}.layers.{li}"
               f".bias"] = t(md[f"hyper{ti}_{li}"]["bias"].shape)
    for li in range(3):
        sd[f"mask_decoder.iou_prediction_head.layers.{li}.weight"] = t(
            md[f"iou{li}"]["kernel"].T.shape)
        sd[f"mask_decoder.iou_prediction_head.layers.{li}.bias"] = t(
            md[f"iou{li}"]["bias"].shape)

    conv = convert_sam_checkpoint(sd)
    # same tree structure + shapes as a fresh init
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref["params"])
    conv_shapes = jax.tree_util.tree_map(lambda x: tuple(np.asarray(x).shape),
                                         conv["params"])
    assert ref_shapes == conv_shapes
    out, iou = model.apply(conv, img, pts, lbl)
    assert out.shape[0] == 1 and iou.shape[-1] == 4


# -- prompt payload string format (test_sam3promptpayload.cpp) -----------

def test_prompt_payload_from_str_vectors():
    from trex_tpu.detect.sam3 import Sam3PromptPayload as P

    p = P.from_str("fish")
    assert p.type == "text" and p.has_value() and p.text() == "fish"
    assert p.to_str() == "fish" and p.to_json() == "fish"

    assert P.from_str('"fish"').text() == "fish"
    assert P.from_str("  'fish'  ").text() == "fish"

    p = P.from_str("[[1,2],[3,4]]")
    assert p.type == "points" and len(p.points()) == 2
    assert p.points()[0] == [1, 2] and p.points()[1] == [3, 4]
    assert p.to_str() == "[[1,2],[3,4]]"
    assert p.to_json() == [[1, 2], [3, 4]]

    p = P.from_str("[[10,20,30,40],[50,60,70,80]]")
    assert p.type == "boxes" and len(p.boxes()) == 2
    assert p.to_str() == "[[10,20,30,40],[50,60,70,80]]"

    p = P.from_str("  [[1,2],[3,4]]  ")
    assert p.type == "points" and p.to_str() == "[[1,2],[3,4]]"

    import pytest

    for empty in ("  ", "[]"):
        p = P.from_str(empty)
        assert not p.has_value() and p.type == "none"
        with pytest.raises(Exception):
            p.to_str()
        with pytest.raises(Exception):
            p.to_json()

    with pytest.raises(Exception):
        P.from_str("[[1,2],[3,4,5,6]]")


def test_prompt_list_vectors():
    from trex_tpu.detect.sam3 import Sam3PromptList as L
    from trex_tpu.detect.sam3 import Sam3PromptPayload as P

    lst = L.from_str(
        "['hi i bims',[[25,666],[1234,4567]],"
        "[[0,0,200,200],[200,200,210,230]]]")
    assert len(lst) == 3
    assert lst[0] == P("hi i bims")
    assert lst[1] == P([[25, 666], [1234, 4567]])
    assert lst[2] == P([[0, 0, 200, 200], [200, 200, 210, 230]])

    single = L([P("fish")])
    assert single.to_str() == "fish"
    assert single.to_json() == ["fish"]

    multi = L([P("fish"), P([[1, 2]])])
    assert multi.to_str() == "[fish,[[1,2]]]"
    assert multi.to_json() == ["fish", [[1, 2]]]


def test_prompt_map_vectors():
    from trex_tpu.detect.sam3 import (Sam3PromptList, Sam3PromptPayload,
                                      parse_prompt_map,
                                      prompt_map_to_json,
                                      prompt_map_to_str)

    pmap = parse_prompt_map("fish")
    assert list(pmap) == [None]
    assert prompt_map_to_str(pmap) == "fish"
    assert prompt_map_to_json(pmap) == {"null": ["fish"]}

    pmap = {0: Sam3PromptList([Sam3PromptPayload("fish")])}
    assert prompt_map_to_str(pmap) == "{0:fish}"
    assert prompt_map_to_json(pmap) == {"0": ["fish"]}

    want = {0: Sam3PromptList([Sam3PromptPayload("fish")])}
    for text in ("{0:fish}", "{0:'fish'}", "{0:[fish]}", "{0:['fish']}"):
        assert parse_prompt_map(text) == want, text

    multi = parse_prompt_map("{0:[fish,human]}")
    assert multi == {0: Sam3PromptList(
        [Sam3PromptPayload("fish"), Sam3PromptPayload("human")])}

    mixed = parse_prompt_map("{null:human,0:fish,1:[[10,12]]}")
    assert mixed[None] == Sam3PromptList([Sam3PromptPayload("human")])
    assert mixed[0] == Sam3PromptList([Sam3PromptPayload("fish")])
    assert mixed[1] == Sam3PromptList([Sam3PromptPayload([[10, 12]])])

    assert prompt_map_to_str({}) == "{}"
    assert prompt_map_to_json({}) == {}


def test_prompt_materialize_legacy_multibox():
    """MaterializeLegacyMultiBoxPromptsAsSeparateObjects
    (test_sam3promptpayload.cpp:228-252)."""
    from trex_tpu.detect.sam3 import (Sam3PromptList, Sam3PromptPayload,
                                      flatten_prompt_state,
                                      materialize_prompt_state)

    pmap = {
        None: Sam3PromptList([Sam3PromptPayload("fish")]),
        3: Sam3PromptList([Sam3PromptPayload(
            [[0, 0, 10, 10], [20, 20, 10, 10], [40, 40, 10, 10]])]),
    }
    shared, objects = materialize_prompt_state(3, pmap)
    assert len(shared) == 1 and shared[0].text() == "fish"
    assert len(objects) == 3
    flat = flatten_prompt_state((shared, objects))
    assert len(flat) == 4
    assert flat[0].text() == "fish"
    for p in flat[1:]:
        assert p.type == "boxes" and len(p.boxes()) == 1


def test_prompts_from_setting_reference_format():
    from trex_tpu.detect.sam3 import Sam3Prompts

    r = Sam3Prompts.from_setting("{0:fish,3:[[0,0,10,10],[20,20,10,10]]}")
    objs0 = r.materialize(0)
    assert len(objs0) == 1  # the text prompt
    objs3 = r.materialize(3)
    assert len(objs3) == 3  # text + one object per box
    boxes = [o.seed_box for o in objs3 if o.seed_box]
    assert sorted(boxes) == [(0, 0, 10, 10), (20, 20, 10, 10)]


# -- anchor/replay scheduler (test_sam3interactivesession.cpp) -----------

class _FakeBackend:
    def __init__(self):
        self.calls = []

    def reset(self, frame):
        self.calls.append(f"reset:{frame}")

    def predict(self, frame, n_new):
        self.calls.append(f"predict:{frame}:{n_new}")
        return f"mask{frame}"

    def replay_begin(self, start, end, count):
        self.calls.append(f"replay_begin:{start}:{end}:{count}")

    def replay_step(self, n):
        self.calls.append(f"replay_step:{n}")

    def replay_finish(self):
        self.calls.append("replay_finish")


def _make_session():
    from trex_tpu.detect.sam3 import Sam3ReplaySession

    backend = _FakeBackend()
    loaded = []
    session = Sam3ReplaySession(backend, loaded.append)
    return session, backend, loaded


def test_session_same_frame_rerun_uses_snapshot_anchor():
    session, backend, loaded = _make_session()
    first = session.process_frame(0)
    assert session.commit_frame(first)
    backend.calls.clear(); loaded.clear()

    rerun = session.process_frame(0, attempt=1)
    assert rerun.frame_index == 0
    assert backend.calls == ["reset:0", "predict:0:0"]
    assert loaded == []


def test_session_next_frame_uses_live_runtime():
    session, backend, loaded = _make_session()
    assert session.commit_frame(session.process_frame(0))
    backend.calls.clear(); loaded.clear()

    second = session.process_frame(1)
    assert second.frame_index == 1
    assert backend.calls == ["predict:1:0"]
    assert loaded == []


def test_session_forward_jump_replays_from_live_runtime():
    from trex_tpu.detect.sam3 import parse_prompt_map

    session, backend, loaded = _make_session()
    session.set_prompts(parse_prompt_map(
        "{0:[[0.1,0.1,0.2,0.2],[0.5,0.5,0.2,0.2]]}"))
    assert session.commit_frame(session.process_frame(0))
    backend.calls.clear(); loaded.clear()

    jumped = session.process_frame(3)
    assert jumped.frame_index == 3
    assert backend.calls == [
        "replay_begin:1:3:3",
        "predict:1:0", "replay_step:1",
        "predict:2:0", "replay_step:1",
        "predict:3:0", "replay_step:1",
        "replay_finish"]
    assert loaded == [1, 2]


def test_session_prompt_frame_becomes_replay_anchor():
    from trex_tpu.detect.sam3 import parse_prompt_map

    session, backend, loaded = _make_session()
    session.set_prompts(parse_prompt_map("{3:[[0.1,0.1,0.3,0.3]]}"))
    for f in range(4):
        assert session.commit_frame(session.process_frame(f))
    backend.calls.clear(); loaded.clear()

    replayed = session.process_frame(5)
    assert replayed.frame_index == 5
    assert backend.calls == [
        "replay_begin:4:5:2",
        "predict:4:0", "replay_step:1",
        "predict:5:0", "replay_step:1",
        "replay_finish"]
    assert loaded == [4]


def test_session_invalidate_from_drops_anchors_and_forces_replay():
    session, backend, loaded = _make_session()
    for f in range(3):
        assert session.commit_frame(session.process_frame(f))
    session.invalidate_from(1)
    backend.calls.clear(); loaded.clear()

    replayed = session.process_frame(2)
    assert replayed.frame_index == 2
    assert backend.calls == [
        "reset:0",
        "replay_begin:0:2:3",
        "predict:0:0", "replay_step:1",
        "predict:1:0", "replay_step:1",
        "predict:2:0", "replay_step:1",
        "replay_finish"]
    assert loaded == [0, 1]


def test_session_invalidated_inflight_frame_cannot_commit():
    session, backend, loaded = _make_session()
    assert session.commit_frame(session.process_frame(0))

    second = session.process_frame(1)
    session.invalidate_from(1)
    assert not session.commit_frame(second)

    backend.calls.clear(); loaded.clear()
    third = session.process_frame(2)
    assert third.frame_index == 2
    assert backend.calls == [
        "reset:0",
        "replay_begin:0:2:3",
        "predict:0:0", "replay_step:1",
        "predict:1:0", "replay_step:1",
        "predict:2:0", "replay_step:1",
        "replay_finish"]
    assert loaded == [0, 1]
