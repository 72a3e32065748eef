"""Native C++ ops + scoring tests (vs pure-python oracles)."""

import numpy as np
import pytest

from unilm_tpu import native
from unilm_tpu.scoring import BleuScorer, accuracy_topk, cer, entity_f1, wer


def test_native_builds():
    assert native.get_lib() is not None, "g++ build of unilm_native.so failed"


def py_edit(a, b):
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[la][lb]


def test_edit_distance_matches_oracle():
    rng = np.random.RandomState(0)
    for _ in range(20):
        a = rng.randint(0, 5, rng.randint(0, 12)).tolist()
        b = rng.randint(0, 5, rng.randint(0, 12)).tolist()
        assert native.edit_distance(a, b) == py_edit(a, b)


def test_edit_distance_batch():
    seqs_a = [[1, 2, 3], [], [4, 5]]
    seqs_b = [[1, 3], [7], [4, 5]]
    out = native.edit_distance_batch(seqs_a, seqs_b)
    assert out.tolist() == [1, 1, 0]


def test_cer_wer():
    assert cer(["abc"], ["abc"]) == 0.0
    assert np.isclose(cer(["abcd"], ["abxd"]), 0.25)
    assert np.isclose(wer(["the cat sat"], ["the dog sat"]), 1 / 3)


def test_bleu_perfect_and_partial():
    s = BleuScorer()
    s.add_string("the cat sat on the mat", "the cat sat on the mat")
    assert np.isclose(s.score(), 100.0, atol=1e-6)
    s2 = BleuScorer()
    s2.add_string("the cat sat on the mat", "the cat sat on the hat")
    assert 0 < s2.score() < 100


def test_bleu_matches_sacre_style_known_value():
    # hand-computable: ref "a b c d", hyp "a b c d" -> 100
    # hyp "a b x d": 1grams 3/4, 2grams 1/3, 3grams 0 -> score 0
    s = BleuScorer()
    s.add_string("a b c d", "a b x d")
    assert s.score() == 0.0  # zero 3-gram matches


def test_batch_by_size():
    lengths = np.array([3, 3, 4, 8, 2, 2, 2])
    batches = native.batch_by_size(lengths, max_tokens=8)
    # padded cost per batch <= 8
    for b in batches:
        assert lengths[b].max() * len(b) <= 8
    flat = np.concatenate(batches)
    assert sorted(flat.tolist()) == list(range(7))


def test_balanced_assignment():
    rng = np.random.RandomState(0)
    n, k = 16, 4
    scores = rng.rand(n, k).astype(np.float32)
    out = native.balanced_assignment(scores)
    counts = np.bincount(out, minlength=k)
    assert (counts == n // k).all()
    # quality: better than random assignment on average
    got = scores[np.arange(n), out].sum()
    rand = scores[np.arange(n), rng.randint(0, k, n)].sum()
    assert got > rand


def test_entity_f1():
    true = [["B-PER", "I-PER", "O", "B-LOC"]]
    pred = [["B-PER", "I-PER", "O", "B-ORG"]]
    m = entity_f1(true, pred)
    assert np.isclose(m["precision"], 0.5)
    assert np.isclose(m["recall"], 0.5)
    pred2 = [["B-PER", "I-PER", "O", "B-LOC"]]
    assert entity_f1(true, pred2)["f1"] == 1.0


def test_accuracy_topk():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.array([1, 2])
    acc = accuracy_topk(logits, labels, topk=(1, 2))
    assert acc["acc1"] == 50.0
    assert acc["acc2"] == 50.0
    acc3 = accuracy_topk(logits, labels, topk=(3,))
    assert acc3["acc3"] == 100.0


def test_grounding_recall():
    from unilm_tpu.scoring import box_iou, grounding_recall

    assert box_iou((0, 0, 1, 1), (0, 0, 1, 1)) == 1.0
    assert box_iou((0, 0, 1, 1), (2, 2, 3, 3)) == 0.0
    preds = [[(0, 0, 1, 1)], [(0, 0, 0.1, 0.1)]]
    refs = [(0, 0, 1, 1), (0.5, 0.5, 1, 1)]
    assert grounding_recall(preds, refs) == 0.5


def test_ocr_augment():
    from PIL import Image

    from unilm_tpu.data.ocr_aug import OCRAugment

    img = Image.fromarray(np.uint8(np.random.RandomState(0).rand(40, 120, 3) * 255))
    aug = OCRAugment(n_ops=3, seed=7)
    out = aug(img)
    assert out.size == img.size
    # deterministic under the same seed
    out2 = OCRAugment(n_ops=3, seed=7)(img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_token_block_slices_modes():
    import numpy as np

    from unilm_tpu import native

    sizes = np.array([5, 3, 7, 1, 4, 6], np.int64)  # sep_len=1 doc boundary
    # none: fixed blocks over the 26-token stream
    s = native.token_block_slices(sizes, "none", block_size=8)
    assert s.tolist() == [[0, 8], [8, 16], [16, 24], [24, 26]]
    # complete: whole sentences up to block_size (7+1 fits the 2nd block)
    s = native.token_block_slices(sizes, "complete", block_size=8)
    assert s.tolist() == [[0, 8], [8, 16], [16, 20], [20, 26]]
    # eos: one block per sentence
    s = native.token_block_slices(sizes, "eos", block_size=8)
    assert s.tolist() == [[0, 5], [5, 8], [8, 15], [15, 16], [16, 20], [20, 26]]
    # complete_doc: size==sep_len ends a document (and is skipped)
    s = native.token_block_slices(sizes, "complete_doc", block_size=100,
                                  document_sep_len=1)
    assert s.tolist() == [[0, 15], [16, 26]]

    # native path must agree with the numpy fallback on random inputs
    rng = np.random.RandomState(0)
    for mode in (None, "complete", "complete_doc", "eos"):
        sz = rng.randint(1, 9, 50).astype(np.int64)
        a = native.token_block_slices(sz, mode, block_size=16)
        lib, native._lib = native._lib, None  # force fallback
        try:
            b = native.token_block_slices(sz, mode, block_size=16)
        finally:
            native._lib = lib
        np.testing.assert_array_equal(a, b)


def test_block_to_dataset_index():
    import numpy as np

    from unilm_tpu import native

    sizes = np.array([5, 3, 7], np.int64)
    slices = np.array([[0, 5], [3, 9], [5, 15], [14, 15]], np.int64)
    out = native.block_to_dataset_index(sizes, slices)
    assert out.tolist() == [
        [0, 0, 0],   # whole first sentence
        [0, 3, 2],   # starts inside sent 0; token 8 is sent 2's first
        [1, 0, 2],   # sent 1 through sent 2
        [2, 6, 2],   # last token of sent 2
    ]
    lib, native._lib = native._lib, None
    try:
        fb = native.block_to_dataset_index(sizes, slices)
    finally:
        native._lib = lib
    np.testing.assert_array_equal(out, fb)
