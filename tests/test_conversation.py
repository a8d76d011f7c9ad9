"""Conversation template exactness (vicuna v1 / llava_v1) and prompt-string
parity with the reference dataset prompts."""

import numpy as np

from anyref_tpu.config import IGNORE_INDEX, SpecialTokens
from anyref_tpu.tokenizer import (AnyRefTokenizer, audio_ref_question,
                                  build_conversation, img_ref_question,
                                  region_caption_question, seg_answer,
                                  seg_question, tokenize_conversation,
                                  tokenize_prompt, wrap_image_token)

TK = SpecialTokens()


def test_conversation_string():
    conv = build_conversation("<image>\nCan you segment a cat in this image?",
                              "cat[SEG].")
    assert conv == (
        "A chat between a curious human and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the human's questions. "
        "USER: <image>\nCan you segment a cat in this image? "
        "ASSISTANT: cat[SEG].</s>")
    prompt = build_conversation("<image>\nq?", None)
    assert prompt.endswith("USER: <image>\nq? ASSISTANT:")


def test_image_wrap():
    assert wrap_image_token("x <image> y") == "x <im_start><image><im_end> y"


def test_reference_prompt_strings():
    # byte-for-byte the reference's dataset prompt templates
    assert seg_question("a cat") == \
        "<image>\nCan you segment a cat in this image?"          # refer_seg.py:403
    assert seg_answer("cat") == "cat[SEG]."                       # :405
    assert seg_answer("cat", itisseg=True) == "it is [SEG]."      # :407
    assert img_ref_question() == (
        "<image>\nCan you segment object with the following reference "
        "<img_ref_start><img_ref><img_ref><img_ref><img_ref><img_ref_end>"
        " in this image?")                                        # coco_instance.py:836-845
    assert audio_ref_question() == (
        "<image>\nCan you segment object with the following audio "
        "<audio_ref_start><audio_ref><audio_ref><audio_ref><audio_ref_end>"
        " in this image?")                                        # avsbench.py:255-266
    assert region_caption_question() == (
        "<image>\nCan you provide a description of the region "
        "<img_ref_start><img_ref><img_ref><img_ref><img_ref><img_ref_end>"
        " in this image?")                                        # refer_seg_invert.py:403


def test_prompt_is_prefix_of_conversation():
    """The generation prompt's tokens must be an exact prefix of the training
    conversation's tokens (so eval prompts and train inputs agree)."""
    tok = AnyRefTokenizer()
    q, a = seg_question("the red cat"), seg_answer("the red cat")
    tc = tokenize_conversation(tok, q, a)
    prompt = tokenize_prompt(tok, q)
    np.testing.assert_array_equal(tc.input_ids[: len(prompt)], prompt)
    assert tc.prompt_len == len(prompt)
    # exactly one <image>, inside the masked span
    img_pos = np.nonzero(tc.input_ids == TK.image)[0]
    assert len(img_pos) == 1 and img_pos[0] < tc.prompt_len
    assert (tc.labels[: tc.prompt_len] == IGNORE_INDEX).all()
    assert (tc.labels[tc.prompt_len:] == tc.input_ids[tc.prompt_len:]).all()


def test_multimodal_placeholder_counts():
    tok = AnyRefTokenizer()
    ids = tokenize_prompt(tok, img_ref_question())
    assert (ids == TK.img_ref).sum() == 4
    ids = tokenize_prompt(tok, audio_ref_question())
    assert (ids == TK.audio_ref).sum() == 3
