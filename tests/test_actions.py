"""Action-grammar parsing tests (ref run.py:267-290 semantics)."""

import pytest

from deepv_tpu.actions import (action_vocabulary, parse_action_prompt,
                               prepare_motion_prompts)


def test_simple_actions():
    out = parse_action_prompt("(FN)")
    assert out == ["empty", "Move forward. The perspective hasn't changed."]


def test_modifier_actions():
    out = parse_action_prompt("(fRL)(rLN)")
    assert out[1] == "Move to the front right. Rotate the perspective counterclockwise."
    assert out[2] == "Move to the rear left. The perspective hasn't changed."


def test_rotation_only_with_stay():
    out = parse_action_prompt("(SR)(SL)")
    assert out[1] == "Stay where you are. Rotate the perspective clockwise."
    assert out[2] == "Stay where you are. Rotate the perspective counterclockwise."


@pytest.mark.parametrize("bad", ["FN", "(fN)", "(FNX)", "(F)", "", "(FN)(", "(xYZ)"])
def test_invalid_prompts_rejected(bad):
    with pytest.raises(ValueError):
        parse_action_prompt(bad)


def test_vocabulary_is_closed_28():
    vocab = action_vocabulary()
    assert len(vocab) == 28
    assert len(set(vocab)) == 28
    # every parseable action maps into the vocabulary
    out = parse_action_prompt("(FN)(fLR)(BL)(SR)")
    assert set(out) <= set(vocab)


def test_text_prompts_replicated():
    out = prepare_motion_prompts("text", "a cat walks", repeat_text=10)
    assert out == ["a cat walks"] * 10
