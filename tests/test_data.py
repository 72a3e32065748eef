"""Data layer tests: checkpoint/restore equivalence of every iterator
(the infinibatch test pattern: setstate(getstate()) reproduces the stream,
kosmos-2/infinibatch/test/test_iterators.py), masking, patches, dictionary."""

import numpy as np
import pytest

from unilm_tpu.data import iterators as it
from unilm_tpu.data.dictionary import Dictionary, add_location_symbols
from unilm_tpu.data.masking import MaskingGenerator


def checkpoint_equivalence(make_pipeline, n_take: int = 60):
    """Consume k items, checkpoint, compare resumed tail vs original tail,
    for every k in range."""
    ref_it = make_pipeline()
    ref = [next(ref_it) for _ in range(n_take)]

    for k in range(0, n_take, 7):
        pipe = make_pipeline()
        for _ in range(k):
            next(pipe)
        state = pipe.getstate()
        # resume on a FRESH pipeline
        pipe2 = make_pipeline()
        pipe2.setstate(state)
        tail = [next(pipe2) for _ in range(n_take - k)]
        assert tail == ref[k:], f"divergence after checkpoint at k={k}"


def test_native_iterator():
    checkpoint_equivalence(lambda: it.NativeCheckpointableIterator(list(range(100))), 50)


def test_infinite_permutation():
    checkpoint_equivalence(
        lambda: it.InfinitePermutationSourceIterator(list(range(17)), seed=3), 60
    )


def test_infinite_permutation_sharding():
    full = it.InfinitePermutationSourceIterator(list(range(8)), seed=1, shuffle=False)
    seq = [next(full) for _ in range(16)]
    shard0 = it.InfinitePermutationSourceIterator(
        list(range(8)), seed=1, shuffle=False, num_instances=2, instance_rank=0
    )
    shard1 = it.InfinitePermutationSourceIterator(
        list(range(8)), seed=1, shuffle=False, num_instances=2, instance_rank=1
    )
    s0 = [next(shard0) for _ in range(8)]
    s1 = [next(shard1) for _ in range(8)]
    assert s0 == seq[0:16:2]
    assert s1 == seq[1:16:2]


def test_chunked_source():
    parts = []
    for r in range(3):
        src = it.ChunkedSourceIterator(list(range(10)), num_instances=3, instance_rank=r)
        parts.extend(list(src))
    assert sorted(parts) == list(range(10))


def test_map_select_many():
    def make():
        src = it.InfinitePermutationSourceIterator(list(range(10)), seed=0)
        sm = it.SelectManyIterator(src, lambda x: [x, x * 10, x * 100])
        return it.MapIterator(sm, lambda x: x + 1)

    checkpoint_equivalence(make, 60)


def test_buffered_shuffle():
    def make():
        src = it.InfinitePermutationSourceIterator(list(range(25)), seed=5)
        return it.BufferedShuffleIterator(src, buffer_size=7, seed=9)

    checkpoint_equivalence(make, 60)


def test_bucketed_batching_tokens():
    def make():
        src = it.InfinitePermutationSourceIterator(
            [{"len": (i % 13) + 1, "id": i} for i in range(40)], seed=2
        )
        return it.BucketedReadaheadBatchIterator(
            src, read_ahead=16, key=lambda x: x["len"], batch_size_tokens=32, seed=4
        )

    checkpoint_equivalence(make, 40)
    # token budget respected: padded size = max_len * batch_items <= 32
    b = make()
    for _ in range(20):
        batch = next(b)
        max_len = max(x["len"] for x in batch)
        assert max_len * len(batch) <= 32 or len(batch) == 1


def test_fixed_batch():
    src = it.NativeCheckpointableIterator(list(range(10)))
    fb = it.FixedBatchIterator(src, 4)
    batches = list(fb)
    assert batches == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]


def test_prefetch_checkpointing():
    def make():
        src = it.InfinitePermutationSourceIterator(list(range(30)), seed=7)
        return it.PrefetchIterator(src, buffer_size=4)

    ref_it = make()
    ref = [next(ref_it) for _ in range(40)]
    ref_it.close()

    pipe = make()
    for _ in range(13):
        next(pipe)
    state = pipe.getstate()
    pipe.close()
    pipe2 = make()
    pipe2.setstate(state)
    tail = [next(pipe2) for _ in range(27)]
    pipe2.close()
    assert tail == ref[13:]


def test_masking_generator():
    rng = np.random.default_rng(0)
    gen = MaskingGenerator((14, 14), num_masking_patches=75, rng=rng)
    mask = gen()
    assert mask.shape == (14, 14)
    assert mask.sum() <= 75 + gen.max_num_patches
    assert mask.sum() >= 40  # block sampling reaches near target
    assert set(np.unique(mask)) <= {0, 1}


def test_pix2struct_patches():
    from unilm_tpu.data.transforms import pix2struct_patches

    img = np.random.RandomState(0).rand(100, 160, 3).astype(np.float32)
    out = pix2struct_patches(img, max_patches=64, patch_size=16)
    assert out.shape == (64, 2 + 768)
    n_valid = int((np.abs(out).sum(-1) > 0).sum())
    rows = out[:n_valid, 0]
    cols = out[:n_valid, 1]
    assert rows.min() == 1 and cols.min() == 1
    assert int(rows.max()) * int(cols.max()) <= 64
    # aspect preserved-ish: wider than tall
    assert cols.max() > rows.max()


def test_eval_transform():
    from PIL import Image

    from unilm_tpu.data.transforms import eval_transform

    img = Image.fromarray(np.uint8(np.random.RandomState(0).rand(300, 400, 3) * 255))
    out = eval_transform(img, input_size=224)
    assert out.shape == (224, 224, 3)
    assert -4 < out.mean() < 4


def test_mixup():
    import jax

    from unilm_tpu.data.transforms import mixup_cutmix

    images = np.random.RandomState(0).rand(4, 8, 8, 3).astype(np.float32)
    labels = np.array([0, 1, 2, 3])
    mixed, soft = mixup_cutmix(
        jax.random.PRNGKey(0), images, labels, num_classes=5
    )
    assert mixed.shape == images.shape
    assert soft.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(soft).sum(-1), 1.0, atol=1e-5)


def test_dictionary_roundtrip(tmp_path):
    d = Dictionary()
    ids = d.encode_line("hello world hello", add_if_not_exist=True)
    assert len(d) == 4 + 2
    assert d.string(ids) == "hello world hello"
    d.save(str(tmp_path / "dict.txt"))
    d2 = Dictionary.load(str(tmp_path / "dict.txt"))
    assert d2.index("hello") == d.index("hello")
    assert d2.string(ids) == "hello world hello"


def test_location_symbols():
    d = Dictionary()
    add_location_symbols(d, quantized_size=4)
    assert "<patch_index_0015>" in d
    assert "<grounding>" in d
    assert d.index("<patch_index_0000>") > 0


def test_state_survives_json_roundtrip():
    """Regression: checkpoint data_state goes through JSON (extra.json);
    rng state tuples come back as lists and must still restore."""
    import json

    src = it.InfinitePermutationSourceIterator(list(range(20)), seed=3)
    bs = it.BufferedShuffleIterator(src, buffer_size=5, seed=1)
    for _ in range(12):
        next(bs)
    state = json.loads(json.dumps(bs.getstate()))
    ref = [next(bs) for _ in range(15)]

    src2 = it.InfinitePermutationSourceIterator(list(range(20)), seed=3)
    bs2 = it.BufferedShuffleIterator(src2, buffer_size=5, seed=1)
    bs2.setstate(state)
    assert [next(bs2) for _ in range(15)] == ref


def test_grounding_roundtrip():
    from unilm_tpu.data.grounding import (
        box_to_patch_indices,
        box_tokens,
        parse_grounded_text,
        patch_indices_to_box,
    )

    box = (0.1, 0.2, 0.6, 0.9)
    ul, lr = box_to_patch_indices(box, 32)
    back = patch_indices_to_box(ul, lr, 32)
    # roundtrip within one grid cell (1/32)
    for a, b in zip(box, back):
        assert abs(a - b) <= 1 / 32 + 1e-6

    text = ("<grounding>An image of <phrase>a snowman</phrase><object>"
            "<patch_index_0044><patch_index_0863></object> warming himself")
    clean, ents = parse_grounded_text(text, 32)
    assert "a snowman" in clean and "<object>" not in clean
    assert len(ents) == 1
    phrase, boxes = ents[0]
    assert phrase == "a snowman"
    assert len(boxes) == 1
    x0, y0, x1, y1 = boxes[0]
    assert 0 <= x0 < x1 <= 1 and 0 <= y0 < y1 <= 1


def test_mmap_indexed_dataset(tmp_path):
    from unilm_tpu.data.indexed_dataset import (
        MMapIndexedDataset,
        build_indexed_dataset,
    )

    seqs = [np.arange(n, dtype=np.int32) + n for n in (3, 7, 1, 12)]
    prefix = str(tmp_path / "corpus")
    ds = build_indexed_dataset(prefix, seqs)
    assert len(ds) == 4
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(ds[i], s)
    ds2 = MMapIndexedDataset(prefix)
    np.testing.assert_array_equal(ds2[3], seqs[3])


def test_token_block_iterator_checkpointable():
    from unilm_tpu.data.indexed_dataset import TokenBlockIterator

    docs = [[i] * (i % 5 + 1) for i in range(30)]
    def make():
        src = it.InfinitePermutationSourceIterator(docs, seed=1)
        return TokenBlockIterator(src, block_size=7, eod=99)

    ref_it = make()
    ref = [next(ref_it).tolist() for _ in range(20)]
    pipe = make()
    for _ in range(8):
        next(pipe)
    state = pipe.getstate()
    pipe2 = make()
    pipe2.setstate(state)
    tail = [next(pipe2).tolist() for _ in range(12)]
    assert tail == ref[8:]
    assert all(len(b) == 7 for b in ref)


def test_epoch_batch_iterator_resume():
    data = [[i] * (i % 7 + 1) for i in range(23)]
    def make():
        return it.EpochBatchIterator(data, key=len, max_tokens=16, seed=3)

    ref = make()
    seq = []
    for _ in range(2):
        for b in ref.next_epoch_itr():
            seq.append([x[0] for x in b])

    # consume 5 batches, snapshot, resume in a fresh iterator
    a = make()
    gen = a.next_epoch_itr()
    head = [[x[0] for x in next(gen)] for _ in range(5)]
    state = a.state_dict()
    b = make()
    b.load_state_dict(state)
    tail = []
    for _ in range(2):
        for bb in b.next_epoch_itr():
            tail.append([x[0] for x in bb])
    assert head + tail == seq


def test_document_dataset_builders(tmp_path):
    """FUNSD/CORD/XFUND loaders on synthetic files in the public layouts."""
    import json as _json

    from PIL import Image

    from unilm_tpu.data.document_datasets import load_cord, load_funsd, load_xfund

    # --- FUNSD layout ---
    (tmp_path / "funsd" / "annotations").mkdir(parents=True)
    (tmp_path / "funsd" / "images").mkdir(parents=True)
    Image.new("RGB", (200, 100)).save(tmp_path / "funsd" / "images" / "a.png")
    ann = {"form": [{"label": "question", "words": [
        {"text": "Name:", "box": [10, 10, 60, 30]}]},
        {"label": "answer", "words": [
            {"text": "Bob", "box": [70, 10, 110, 30]},
            {"text": "Smith", "box": [115, 10, 160, 30]}]}]}
    (tmp_path / "funsd" / "annotations" / "a.json").write_text(_json.dumps(ann))
    ex = load_funsd(str(tmp_path / "funsd"))[0]
    assert ex["words"] == ["Name:", "Bob", "Smith"]
    assert ex["labels"] == ["B-QUESTION", "B-ANSWER", "I-ANSWER"]
    assert all(0 <= c <= 1000 for b in ex["bboxes"] for c in b)
    # segment-level: Bob and Smith share a box
    assert ex["bboxes"][1] == ex["bboxes"][2]

    # --- CORD layout ---
    (tmp_path / "cord" / "json").mkdir(parents=True)
    (tmp_path / "cord" / "image").mkdir(parents=True)
    Image.new("RGB", (200, 100)).save(tmp_path / "cord" / "image" / "r.png")
    cord = {"meta": {"image_size": {"width": 200, "height": 100}},
            "valid_line": [{"category": "menu.nm", "words": [
                {"text": "Latte", "quad": {"x1": 5, "y1": 5, "x3": 50, "y3": 20}}]}]}
    (tmp_path / "cord" / "json" / "r.json").write_text(_json.dumps(cord))
    ex = load_cord(str(tmp_path / "cord"))[0]
    assert ex["words"] == ["Latte"]
    assert ex["labels"] == ["B-MENU.NM"]

    # --- XFUND layout ---
    Image.new("RGB", (300, 200)).save(tmp_path / "x.jpg")
    xf = {"documents": [{"img": {"fname": "x.jpg", "width": 300, "height": 200},
                         "document": [{"box": [10, 10, 100, 40],
                                       "label": "header",
                                       "words": [{"text": "发票", "box": [10, 10, 50, 40]}]}]}]}
    (tmp_path / "xf.json").write_text(_json.dumps(xf))
    ex = load_xfund(str(tmp_path / "xf.json"), str(tmp_path))[0]
    assert ex["labels"] == ["B-HEADER"]
