"""Native byte-level BPE vs the HF `tokenizers` implementation on an
offline-trained vocabulary (same files -> same ids)."""

import pytest

tokenizers = pytest.importorskip("tokenizers")

SAMPLES = [
    "The quick brown fox jumps over the lazy dog.",
    "TOTAL: $12.50 (incl. VAT)",
    "naive cafe",
    "hello   world\nnew line",
    "don't you've we'll they'd I'm",
    "mixed123numbers and CamelCase tokens!!!",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe")
    corpus = d / "corpus.txt"
    corpus.write_text("\n".join(SAMPLES * 30) + "\nsome more filler text\n")
    tok = tokenizers.ByteLevelBPETokenizer()
    tok.train([str(corpus)], vocab_size=600, min_frequency=1,
              special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"])
    tok.save_model(str(d))
    return d, tok


def test_matches_hf_tokenizers(trained):
    from unilm_tpu.data.bpe import ByteLevelBPE

    d, hf = trained
    ours = ByteLevelBPE.from_pretrained_dir(str(d))
    for text in SAMPLES + ["unseen zebra querying", " leading space"]:
        got = ours.encode(text)
        want = hf.encode(text).ids
        assert got == want, (text, got, want)
        assert ours.decode(got) == text


def test_roberta_wrapper(trained):
    from unilm_tpu.data.bpe import ByteLevelBPE, RobertaTokenizer

    d, hf = trained
    tok = RobertaTokenizer(ByteLevelBPE.from_pretrained_dir(str(d)))
    assert (tok.bos, tok.pad, tok.eos, tok.unk) == (0, 1, 2, 3)
    ids = tok.encode("hello world")
    assert ids[0] == tok.bos and ids[-1] == tok.eos
    assert tok.decode(ids) == "hello world"

    # FUNSD-style word alignment
    ids, wids = tok.encode_words(["TOTAL:", "$12.50"])
    assert wids[0] == -1 and wids[-1] == -1
    assert set(wids[1:-1]) == {0, 1}
    # subwords of word 0 are contiguous and precede word 1's
    first = [i for i, w in enumerate(wids) if w == 0]
    second = [i for i, w in enumerate(wids) if w == 1]
    assert max(first) < min(second)
