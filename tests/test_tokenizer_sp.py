"""SentencePiece-only checkpoint-dir loading (the LLaVA-Lightning layout
the reference ships: `tokenizer.model` + config JSONs, no fast
`tokenizer.json` — reference train.py:58-62).

`tests/fixtures/sp_tokenizer/` vendors a tiny valid SentencePiece unigram
ModelProto (built offline with protoc from the public
sentencepiece_model.proto schema: <unk>/<s>/</s> + "▁the ▁red ▁cat ..."
word pieces + a-z character pieces). Loading goes through the native
pure-Python implementation (anyref_tpu/sp.py) — no `sentencepiece`
package needed — so every test here runs everywhere; when the package IS
installed, the cross-validation tests additionally pin id-exact parity.
"""

import importlib.util
import os
import struct

import pytest

from anyref_tpu.sp import SentencePieceModel
from anyref_tpu.tokenizer import AnyRefTokenizer

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sp_tokenizer")
HAS_SP = importlib.util.find_spec("sentencepiece") is not None


def test_missing_both_files_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="tokenizer.json or "
                                                "tokenizer.model"):
        AnyRefTokenizer.from_pretrained(str(tmp_path))


def test_sp_only_dir_loads_natively_and_roundtrips():
    """tokenizer.model loads with zero extra deps (VERDICT r3 #6) and
    encode/decode roundtrips through the wrapper."""
    tok = AnyRefTokenizer.from_pretrained(FIXTURE)
    ids = tok.encode("the red cat", add_bos=False)
    assert ids, "encode returned nothing"
    assert all(isinstance(i, int) for i in ids)
    assert tok.decode(ids, skip_special=True).strip() == "the red cat"
    # specials use the framework's fixed layout regardless of base vocab
    seg = tok.encode("[SEG]")
    assert tok.tokens.seg in seg


def test_unigram_viterbi_prefers_word_pieces():
    """Viterbi must pick the high-score word pieces over per-char
    segmentation (the fixture carries both)."""
    sp = SentencePieceModel.from_file(os.path.join(FIXTURE,
                                                   "tokenizer.model"))
    ids = sp.encode("the red cat")
    pieces = [sp.pieces[i][0] for i in ids]
    assert pieces == ["▁the", "▁red", "▁cat"], pieces


@pytest.mark.skipif(not HAS_SP, reason="sentencepiece not installed")
def test_native_matches_sentencepiece_package():
    import sentencepiece as spm
    ref = spm.SentencePieceProcessor(
        model_file=os.path.join(FIXTURE, "tokenizer.model"))
    sp = SentencePieceModel.from_file(os.path.join(FIXTURE,
                                                   "tokenizer.model"))
    for text in ("the red cat", "a cat sat", "red red red",
                 "unseenword cat"):
        assert sp.encode(text) == ref.encode(text), text


# ---------------------------------------------------------------------------
# Hand-built BPE ModelProto (LLaMA's tokenizer.model is SentencePiece BPE
# with byte_fallback) — wire-format serialized in-test.
# ---------------------------------------------------------------------------
def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint(num << 3 | wire) + payload


def _piece(text: str, score: float, typ: int = 1) -> bytes:
    body = _field(1, 2, _varint(len(text.encode())) + text.encode())
    body += _field(2, 5, struct.pack("<f", score))
    if typ != 1:
        body += _field(3, 0, _varint(typ))
    return _field(1, 2, _varint(len(body)) + body)


def _bpe_model() -> bytes:
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("<0x71>", 0.0, 6),                       # byte piece for 'q'
              ("▁the", -1.0, 1), ("▁cat", -2.0, 1),
              ("th", -3.0, 1), ("the", -4.0, 1),
              ("ca", -6.0, 1), ("cat", -7.0, 1),
              ("▁", -10.0, 1), ("t", -11.0, 1), ("h", -12.0, 1),
              ("e", -13.0, 1), ("c", -14.0, 1), ("a", -15.0, 1)]
    blob = b"".join(_piece(*p) for p in pieces)
    trainer = (_field(3, 0, _varint(2))          # model_type = BPE
               + _field(35, 0, _varint(1))       # byte_fallback
               + _field(40, 0, _varint(0)))      # unk_id
    blob += _field(2, 2, _varint(len(trainer)) + trainer)
    norm = (_field(3, 0, _varint(1))             # add_dummy_prefix
            + _field(4, 0, _varint(0))           # remove_extra_whitespaces
            + _field(5, 0, _varint(1)))          # escape_whitespaces
    blob += _field(3, 2, _varint(len(norm)) + norm)
    return blob


def test_bpe_merge_order_and_roundtrip(tmp_path):
    """BPE encode follows best-score adjacent merges: 'the cat' resolves
    through th -> the -> ▁the and ca -> cat -> ▁cat (hand-traceable on the
    fixture scores), and decode inverts it."""
    sp = SentencePieceModel.from_bytes(_bpe_model())
    assert sp.model_type == 2 and sp.byte_fallback
    ids = sp.encode("the cat")
    assert [sp.pieces[i][0] for i in ids] == ["▁the", "▁cat"]
    assert sp.decode(ids) == "the cat"


def test_bpe_byte_fallback():
    """OOV 'q' becomes its UTF-8 byte piece <0x71>, and decode reassembles
    it (LLaMA byte_fallback semantics)."""
    sp = SentencePieceModel.from_bytes(_bpe_model())
    ids = sp.encode("the q cat")
    pieces = [sp.pieces[i][0] for i in ids]
    assert pieces == ["▁the", "▁", "<0x71>", "▁cat"], pieces
    assert sp.decode(ids) == "the q cat"


@pytest.mark.skipif(not HAS_SP, reason="sentencepiece not installed")
def test_bpe_matches_sentencepiece_package(tmp_path):
    import sentencepiece as spm
    path = tmp_path / "bpe.model"
    path.write_bytes(_bpe_model())
    ref = spm.SentencePieceProcessor(model_file=str(path))
    sp = SentencePieceModel.from_bytes(_bpe_model())
    for text in ("the cat", "the q cat", "cat cat the", "tea"):
        assert sp.encode(text) == ref.encode(text), text


def test_decode_skips_out_of_vocab_ids():
    """Generate can emit ids past the SP vocab (model head wider than the
    tokenizer, framework specials): decode must skip them, not crash."""
    sp = SentencePieceModel.from_bytes(_bpe_model())
    ids = sp.encode("the cat")
    assert sp.decode(ids + [10_000, -3]) == "the cat"


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
