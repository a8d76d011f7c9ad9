"""Real-BPE tokenizer parity (VERDICT r1 item 3).

No LLaMA tokenizer ships in this environment, so the fixture TRAINS a real
SentencePiece-style BPE (Metaspace pre-tokenizer = "▁" word prefixes, the
exact mechanism behind LLaMA's leading-space merges; punctuation isolated so
":" is a standalone token like LLaMA's 29901) and wires it through
``AnyRefTokenizer.from_pretrained``. Against it we assert:

  * labels from ``tokenize_conversation`` are byte-identical to an ORACLE
    implementing the reference collator's separator-split masking arithmetic
    (/root/reference/utils/coco_instance.py:169-222: round split on "</s>",
    ``instruction_len = len(ids(parts[0])) - 2`` trailing-space adjustment);
  * the prompt built by ``build_conversation(q, None)`` equals the
    reference's left_pad truncation at the SECOND ":" token
    (coco_instance.py:121-126);
  * round-trip decode.

Cases cover leading-space merges at the answer boundary, <im_start> wrap,
img/audio ref prompts, and "it is [SEG]." answers.
"""

import os

import numpy as np
import pytest

from anyref_tpu.config import IGNORE_INDEX
from anyref_tpu.tokenizer import (AnyRefTokenizer, audio_ref_question,
                                  build_conversation, img_ref_question,
                                  seg_answer, seg_question,
                                  tokenize_conversation, tokenize_prompt,
                                  wrap_image_token)

CORPUS = [
    ("A chat between a curious human and an artificial intelligence "
     "assistant. The assistant gives helpful, detailed, and polite answers "
     "to the human's questions."),
    "USER: Can you segment the red cat in this image? ASSISTANT: cat.",
    "USER: Can you segment object with the following reference in this "
    "image? ASSISTANT: it is a dog.",
    "Can you provide a description of the region in this image?",
    "the quick brown fox jumps over the lazy dog",
    "a small bird sitting on a branch near the window",
    "segment the person wearing a blue jacket on the left side",
    "an orange bus parked next to the tall building",
    "it is the zebra behind the fence. the elephant walks away.",
    "audio of a cat meowing and a dog barking loudly",
]


@pytest.fixture(scope="module")
def bpe_tokenizer(tmp_path_factory):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, \
        trainers

    tk = Tokenizer(models.BPE(unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Metaspace(replacement="▁",
                                 prepend_scheme="always"),
        pre_tokenizers.Punctuation(behavior="isolated"),
    ])
    tk.decoder = decoders.Metaspace(replacement="▁",
                                    prepend_scheme="always")
    trainer = trainers.BpeTrainer(
        vocab_size=700, special_tokens=["<unk>", "<s>", "</s>"],
        min_frequency=1)
    tk.train_from_iterator(CORPUS * 4, trainer)
    d = tmp_path_factory.mktemp("bpe_tok")
    tk.save(os.path.join(str(d), "tokenizer.json"))
    return AnyRefTokenizer.from_pretrained(str(d))


def _colon_id(tok: AnyRefTokenizer) -> int:
    ids = tok.encode("USER:", add_bos=False)
    return ids[-1]


# --- oracle: the reference collator's masking (coco_instance.py:169-222) ---
def reference_labels(conv: str, tok: AnyRefTokenizer) -> np.ndarray:
    ids = np.asarray(tok.encode(conv), np.int32)
    target = ids.copy()
    sep = " ASSISTANT: "
    rounds = conv.split("</s>")
    cur = 1
    target[:cur] = IGNORE_INDEX
    for rou in rounds:
        if rou == "":
            break
        parts = rou.split(sep)
        assert len(parts) == 2, rou
        part0 = parts[0] + sep
        round_len = len(tok.encode(rou))          # includes BOS (ref HF call)
        instruction_len = len(tok.encode(part0)) - 2
        target[cur:cur + instruction_len] = IGNORE_INDEX
        cur += round_len
    target[cur:] = IGNORE_INDEX
    return target


CASES = [
    (seg_question("the red cat"), seg_answer("cat")),
    (seg_question("a small bird sitting on a branch"),
     seg_answer("bird", itisseg=True)),
    (seg_question("the person wearing a blue jacket"),
     seg_answer("person")),
    (img_ref_question(), seg_answer("dog")),
    (audio_ref_question(), "it is [SEG]."),
    (seg_question("an orange bus"), "the orange bus[SEG]."),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_labels_match_reference_masking(bpe_tokenizer, case):
    q, a = CASES[case]
    tc = tokenize_conversation(bpe_tokenizer, q, a)
    conv = wrap_image_token(build_conversation(q, a))
    want = reference_labels(conv, bpe_tokenizer)
    assert tc.input_ids.shape == want.shape
    np.testing.assert_array_equal(tc.labels, want)
    # the supervised span is exactly the answer + </s>
    sup = tc.input_ids[tc.labels != IGNORE_INDEX]
    text = bpe_tokenizer.decode(sup.tolist(), skip_special=False)
    assert "[SEG]" in text or "SEG" in a or "[SEG]" not in a


@pytest.mark.parametrize("case", range(len(CASES)))
def test_prompt_equals_second_colon_truncation(bpe_tokenizer, case):
    """build_conversation(q, None) must reproduce the reference's left_pad
    truncation: full-conversation ids cut after the 2nd ":" token
    (coco_instance.py:121-126)."""
    q, a = CASES[case]
    conv_ids = np.asarray(bpe_tokenizer.encode(
        wrap_image_token(build_conversation(q, a))), np.int32)
    colon = _colon_id(bpe_tokenizer)
    cpos = np.where(conv_ids == colon)[0]
    assert len(cpos) >= 2, "conversation must contain USER:/ASSISTANT: colons"
    want = conv_ids[:cpos[1] + 1]
    got = tokenize_prompt(bpe_tokenizer, q)
    np.testing.assert_array_equal(got, want)


def test_roundtrip_decode(bpe_tokenizer):
    s = "Can you segment the red cat in this image?"
    ids = bpe_tokenizer.encode(s, add_bos=False)
    assert bpe_tokenizer.decode(ids) == s


def test_specials_geometry(bpe_tokenizer):
    """Special-token ids use the fixed layout regardless of base vocab."""
    ids = bpe_tokenizer.encode(wrap_image_token("<image>\nhello [SEG]"),
                               add_bos=False)
    tk = bpe_tokenizer.tokens
    assert ids[0] == tk.im_start and ids[1] == tk.image and ids[2] == tk.im_end
    assert tk.seg in ids
