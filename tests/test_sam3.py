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
