"""SentencePiece-only checkpoint-dir loading path (the LLaVA-Lightning
layout the reference ships: `tokenizer.model` + config JSONs, no fast
`tokenizer.json` — reference train.py:58-62).

`tests/fixtures/sp_tokenizer/` vendors a tiny valid SentencePiece unigram
ModelProto (built offline with protoc from the public
sentencepiece_model.proto schema: <unk>/<s>/</s> + "▁the ▁red ▁cat ..."
word pieces + a-z character pieces). The load test is gated on the
`sentencepiece` package; the error branches run everywhere.
"""

import importlib.util
import os

import pytest

from anyref_tpu.tokenizer import AnyRefTokenizer

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sp_tokenizer")
HAS_SP = importlib.util.find_spec("sentencepiece") is not None


def test_missing_both_files_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="tokenizer.json or "
                                                "tokenizer.model"):
        AnyRefTokenizer.from_pretrained(str(tmp_path))


@pytest.mark.skipif(HAS_SP, reason="sentencepiece installed: the "
                    "missing-package branch is unreachable")
def test_sp_only_dir_without_sentencepiece_explains_fix():
    """With only tokenizer.model present and sentencepiece absent, the
    loader must fail actionably (name the missing package and the
    pre-convert workaround), not with a raw AutoTokenizer traceback."""
    with pytest.raises(RuntimeError) as ei:
        AnyRefTokenizer.from_pretrained(FIXTURE)
    msg = str(ei.value)
    assert "sentencepiece" in msg
    assert "tokenizer.json" in msg          # mentions the pre-convert path


@pytest.mark.skipif(not HAS_SP, reason="sentencepiece not installed")
def test_sp_only_dir_loads_and_roundtrips():
    tok = AnyRefTokenizer.from_pretrained(FIXTURE)
    ids = tok.encode("the red cat")
    assert ids, "encode returned nothing"
    assert all(isinstance(i, int) for i in ids)
    # specials use the framework's fixed layout regardless of base vocab
    seg = tok.encode("[SEG]")
    assert tok.tokens.seg in seg


def test_fixture_is_valid_modelproto_wire_format():
    """Sanity-check the vendored binary parses as protobuf wire format with
    the ModelProto field layout (repeated pieces=1, trainer_spec=2,
    normalizer_spec=3), so fixture rot is caught even without
    sentencepiece installed."""
    data = open(os.path.join(FIXTURE, "tokenizer.model"), "rb").read()

    def read_varint(buf, pos):
        out = shift = 0
        while True:
            b = buf[pos]
            pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out, pos
            shift += 7

    pos = 0
    fields = []
    while pos < len(data):
        key, pos = read_varint(data, pos)
        field, wire = key >> 3, key & 7
        fields.append(field)
        if wire == 2:                       # length-delimited
            ln, pos = read_varint(data, pos)
            pos += ln
        elif wire == 0:
            _, pos = read_varint(data, pos)
        elif wire == 5:
            pos += 4
        else:
            raise AssertionError(f"unexpected wire type {wire}")
    assert pos == len(data)
    pieces = fields.count(1)
    assert pieces >= 30                     # specials + words + chars
    assert 2 in fields                      # trainer_spec present
    assert 3 in fields                      # normalizer_spec present
