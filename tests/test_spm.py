"""Native sentencepiece reader/encoder (data/spm.py) vs hand-computed
oracles, round-tripping a checked-in binary fixture."""

import os
import struct

import pytest

from unilm_tpu.data.spm import (NORMAL, UNKNOWN, CONTROL, BYTE,
                                SentencePieceModel, build_model_proto)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_unigram.model")

PIECES = [
    ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
    ("▁", -3.0, NORMAL), ("▁hello", -1.0, NORMAL),
    ("▁world", -1.5, NORMAL), ("hello", -2.0, NORMAL),
    ("wor", -2.2, NORMAL), ("ld", -2.4, NORMAL),
    ("h", -5.0, NORMAL), ("e", -5.0, NORMAL), ("l", -5.0, NORMAL),
    ("o", -5.0, NORMAL), ("w", -5.0, NORMAL), ("r", -5.0, NORMAL),
    ("d", -5.0, NORMAL), ("▁h", -2.6, NORMAL),
]


@pytest.fixture(scope="module")
def model_file(tmp_path_factory):
    if os.path.exists(FIXTURE):
        return FIXTURE
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "wb") as f:
        f.write(build_model_proto(PIECES))
    return FIXTURE


def test_roundtrip_model_file(model_file):
    m = SentencePieceModel.from_file(model_file)
    assert m.vocab_size == len(PIECES)
    assert m.model_type == 1 and m.unk_id == 0 and m.pad_id == -1
    assert m.piece_to_id("▁hello") == 4
    assert m.id_to_piece(5) == "▁world"


def test_unigram_viterbi_exact(model_file):
    m = SentencePieceModel.from_file(model_file)
    # best segmentation: _hello (-1.0) + _world (-1.5) = -2.5
    assert m.encode_pieces("hello world") == ["▁hello", "▁world"]
    assert m.encode("hello world") == [4, 5]
    # 'held' forces char/short pieces: _h(-2.6)+e(-5)+ld(-2.4) = -10.0
    # vs _h+e+l+d = -2.6-15 = -17.6 -> Viterbi must pick ld
    assert m.encode_pieces("held") == ["▁h", "e", "ld"]
    # whitespace collapsing + dummy prefix
    assert m.encode("  hello   world  ") == [4, 5]


def test_unknown_char_maps_to_unk(model_file):
    m = SentencePieceModel.from_file(model_file)
    ids = m.encode("hello Z")
    assert ids[0] == 4 and m.unk_id in ids  # Z not covered, no byte pieces


def test_decode_inverts(model_file):
    m = SentencePieceModel.from_file(model_file)
    assert m.decode(m.encode("hello world")) == "hello world"
    assert m.decode([1, 4, 5, 2]) == "hello world"  # control ids dropped


def test_bpe_mode_merge_order():
    pieces = [
        ("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
        ("a", -10.0, NORMAL), ("b", -10.0, NORMAL), ("c", -10.0, NORMAL),
        ("ab", -1.0, NORMAL), ("bc", -2.0, NORMAL), ("abc", -0.5, NORMAL),
        ("▁", -3.0, NORMAL), ("▁a", -1.2, NORMAL),
    ]
    m = SentencePieceModel.from_bytes(
        build_model_proto(pieces, model_type=2, add_dummy_prefix=False))
    # greedy: merge ab (-1.0) before bc (-2.0), then abc (-0.5)
    assert m.encode_pieces("abc") == ["abc"]
    assert m.encode_pieces("abcbc") == ["abc", "bc"]


def test_byte_fallback():
    pieces = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
              ("</s>", 0.0, CONTROL)]
    pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    pieces += [("▁hi", -1.0, NORMAL), ("▁", -2.0, NORMAL)]
    m = SentencePieceModel.from_bytes(
        build_model_proto(pieces, byte_fallback=True))
    ids = m.encode("hi é")  # é -> bytes C3 A9
    assert ids[0] == m.piece_to_id("▁hi")
    assert m.pieces[ids[-2]][0] == "<0xC3>" and m.pieces[ids[-1]][0] == "<0xA9>"
    assert m.decode(ids) == "hi é"


def test_negative_pad_id_signed_varint():
    data = build_model_proto(PIECES, pad_id=-1)
    m = SentencePieceModel.from_bytes(data)
    assert m.pad_id == -1
