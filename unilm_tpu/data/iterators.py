"""Checkpointable streaming iterator algebra (infinibatch equivalent).

Re-designed from kosmos-2/infinibatch/infinibatch/iterators.py:244-700:
every iterator implements getstate()/setstate(state) such that
setstate(getstate()) reproduces the exact remaining stream — this is what
makes *data position* part of the training checkpoint (SURVEY.md §5).
Invariant tested the same way the reference tests it
(infinibatch/test/test_iterators.py): checkpoint at every position and
verify the resumed tail equals the original tail.
"""

from __future__ import annotations

import random
from typing import Any, Callable, List, Optional, Sequence




def _rng_state(s):
    """Accept JSON round-tripped rng states (lists -> the tuple form that
    random.Random.setstate requires). Checkpoints store data state as JSON
    (runtime/checkpoint.py), so states must survive list/tuple conversion."""
    if isinstance(s, (list, tuple)) and len(s) == 3:
        return (s[0], tuple(s[1]), s[2])
    return s


class CheckpointableIterator:
    """Protocol: __iter__/__next__ + getstate/setstate."""

    def __iter__(self):
        return self

    def __next__(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def getstate(self) -> Any:
        raise NotImplementedError

    def setstate(self, state: Any) -> None:
        raise NotImplementedError

    def close(self):
        pass


class NativeCheckpointableIterator(CheckpointableIterator):
    """Wraps a finite re-iterable collection; state = #items consumed."""

    def __init__(self, iterable: Sequence):
        self._iterable = iterable
        self.setstate(None)

    def getstate(self):
        return {"num_items_yielded": self._n}

    def setstate(self, state):
        self._n = state["num_items_yielded"] if state else 0
        self._iterator = iter(self._iterable)
        for _ in range(self._n):
            next(self._iterator)

    def __next__(self):
        item = next(self._iterator)
        self._n += 1
        return item


class InfinitePermutationSourceIterator(CheckpointableIterator):
    """Infinite stream of reshuffled permutations of a source list, with
    shard slicing (infinibatch iterators.py:379-440). State = rng state at
    the start of the current permutation + index within it."""

    def __init__(
        self,
        source_items: Sequence,
        seed: int = 0,
        shuffle: bool = True,
        num_instances: int = 1,
        instance_rank: int = 0,
    ):
        if not source_items:
            raise ValueError("source_items must not be empty")
        self._items = list(source_items)
        self._seed = seed
        self._shuffle = shuffle
        self._num_instances = num_instances
        self._rank = instance_rank
        self.setstate(None)

    def getstate(self):
        return {"random_state": self._base_state, "index": self._index}

    def setstate(self, state):
        self._random = random.Random(self._seed)
        if state and state["random_state"] is not None:
            self._random.setstate(_rng_state(state["random_state"]))
        self._base_state = self._random.getstate()
        self._index = state["index"] if state else self._rank
        self._perm = list(self._items)
        if self._shuffle:
            self._random.shuffle(self._perm)

    def __next__(self):
        n = len(self._items)
        while self._index >= n:
            self._index -= n
            self._base_state = self._random.getstate()
            # shuffle a FRESH copy so setstate(base_state) regenerates the
            # identical permutation
            self._perm = list(self._items)
            if self._shuffle:
                self._random.shuffle(self._perm)
        item = self._perm[self._index]
        self._index += self._num_instances
        return item


def _split_evenly(n: int, k: int) -> List[int]:
    base, rem = divmod(n, k)
    return [base + (1 if i < rem else 0) for i in range(k)]


class ChunkedSourceIterator(CheckpointableIterator):
    """One pass over items, sharded contiguously across instances
    (infinibatch ChunkedSourceIterator :354)."""

    def __init__(self, source_items: Sequence, num_instances: int = 1, instance_rank: int = 0):
        chunks = _split_evenly(len(source_items), num_instances)
        start = sum(chunks[:instance_rank])
        self._items = list(source_items[start : start + chunks[instance_rank]])
        self.setstate(None)

    def getstate(self):
        return {"pos": self._pos}

    def setstate(self, state):
        self._pos = state["pos"] if state else 0

    def __next__(self):
        if self._pos >= len(self._items):
            raise StopIteration
        item = self._items[self._pos]
        self._pos += 1
        return item


class MapIterator(CheckpointableIterator):
    def __init__(self, source: CheckpointableIterator, transform: Callable):
        self._source = source
        self._fn = transform

    def getstate(self):
        return self._source.getstate()

    def setstate(self, state):
        self._source.setstate(state)

    def __next__(self):
        return self._fn(next(self._source))


class SelectManyIterator(CheckpointableIterator):
    """flat_map with exact resume (infinibatch SelectManyIterator): state =
    (source state before the current expansion, items yielded from it)."""

    def __init__(self, source: CheckpointableIterator, collection_selector=None):
        self._source = source
        self._fn = collection_selector or (lambda x: x)
        self.setstate(None)

    def getstate(self):
        if self._pos >= len(self._buffer):
            return {"source_state": self._source.getstate(), "yielded": 0}
        return {"source_state": self._buffer_src_state, "yielded": self._pos}

    def setstate(self, state):
        if state:
            self._source.setstate(state["source_state"])
        self._buffer: List = []
        self._pos = 0
        self._buffer_src_state = self._source.getstate()
        if state and state["yielded"]:
            self._advance_buffer()
            self._pos = state["yielded"]

    def _advance_buffer(self):
        self._buffer_src_state = self._source.getstate()
        self._buffer = list(self._fn(next(self._source)))
        self._pos = 0

    def __next__(self):
        while self._pos >= len(self._buffer):
            self._advance_buffer()
        item = self._buffer[self._pos]
        self._pos += 1
        return item


class ZipIterator(CheckpointableIterator):
    def __init__(self, *sources: CheckpointableIterator):
        self._sources = sources

    def getstate(self):
        return [s.getstate() for s in self._sources]

    def setstate(self, state):
        if state is None:
            state = [None] * len(self._sources)
        for s, st in zip(self._sources, state):
            s.setstate(st)

    def __next__(self):
        return tuple(next(s) for s in self._sources)


class BufferedShuffleIterator(CheckpointableIterator):
    """Buffered shuffle (infinibatch :550). The buffer is part of the
    checkpoint, exactly like the reference."""

    def __init__(self, source: CheckpointableIterator, buffer_size: int, seed: int = 0):
        self._source = source
        self._size = buffer_size
        self._seed = seed
        self.setstate(None)

    def getstate(self):
        return {
            "source_state": self._source.getstate(),
            "buffer": list(self._buffer),
            "random_state": self._random.getstate(),
        }

    def setstate(self, state):
        if state:
            self._source.setstate(state["source_state"])
            self._buffer = list(state["buffer"])
            self._random = random.Random(self._seed)
            self._random.setstate(_rng_state(state["random_state"]))
        else:
            self._buffer = []
            self._random = random.Random(self._seed)
        self._exhausted = False

    def __next__(self):
        while not self._exhausted and len(self._buffer) < self._size:
            try:
                self._buffer.append(next(self._source))
            except StopIteration:
                self._exhausted = True
        if not self._buffer:
            raise StopIteration
        idx = self._random.randrange(len(self._buffer))
        item = self._buffer[idx]
        self._buffer[idx] = self._buffer[-1]
        self._buffer.pop()
        return item


class FixedBatchIterator(CheckpointableIterator):
    def __init__(self, source: CheckpointableIterator, batch_size: int, drop_last: bool = False):
        self._source = source
        self._bs = batch_size
        self._drop_last = drop_last

    def getstate(self):
        return self._source.getstate()

    def setstate(self, state):
        self._source.setstate(state)

    def __next__(self):
        batch = []
        try:
            for _ in range(self._bs):
                batch.append(next(self._source))
        except StopIteration:
            if not batch or self._drop_last:
                raise
        return batch


class BucketedReadaheadBatchIterator(CheckpointableIterator):
    """Token-based dynamic batching with a sorted read-ahead window
    (infinibatch :640; kosmos LMLoader._batchify, lm_loader.py:116).

    State = (source/rng state before the current window, #batches consumed
    from it); resume refills and re-shuffles the window deterministically."""

    def __init__(
        self,
        source: CheckpointableIterator,
        read_ahead: int,
        key: Callable[[Any], int],
        batch_size_tokens: Optional[int] = None,
        batch_size: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
    ):
        assert (batch_size_tokens is None) != (batch_size is None)
        self._source = source
        self._read_ahead = read_ahead
        self._key = key
        self._bst = batch_size_tokens
        self._bs = batch_size
        self._shuffle = shuffle
        self._seed = seed
        self.setstate(None)

    def getstate(self):
        return {
            "source_state": self._window_src_state,
            "random_state": self._window_rng_state,
            "batches_consumed": self._consumed,
        }

    def setstate(self, state):
        self._random = random.Random(self._seed)
        if state:
            if state["random_state"] is not None:
                self._random.setstate(_rng_state(state["random_state"]))
            self._source.setstate(state["source_state"])
        self._window_src_state = self._source.getstate()
        self._window_rng_state = self._random.getstate()
        self._batches: List = []
        self._consumed = 0
        if state and state["batches_consumed"]:
            self._fill_window()
            self._consumed = state["batches_consumed"]

    def _fill_window(self):
        self._window_src_state = self._source.getstate()
        self._window_rng_state = self._random.getstate()
        items = []
        try:
            for _ in range(self._read_ahead):
                items.append(next(self._source))
        except StopIteration:
            pass
        if not items:
            raise StopIteration
        items.sort(key=self._key, reverse=True)
        batches: List[List] = []
        if self._bs is not None:
            for i in range(0, len(items), self._bs):
                batches.append(items[i : i + self._bs])
        else:
            cur: List = []
            cur_max = 0
            for it in items:
                k = self._key(it)
                new_max = max(cur_max, k)
                if cur and new_max * (len(cur) + 1) > self._bst:
                    batches.append(cur)
                    cur, cur_max = [], 0
                    new_max = k
                cur.append(it)
                cur_max = new_max
            if cur:
                batches.append(cur)
        if self._shuffle:
            self._random.shuffle(batches)
        self._batches = batches
        self._consumed = 0

    def __next__(self):
        if self._consumed >= len(self._batches):
            self._fill_window()
        batch = self._batches[self._consumed]
        self._consumed += 1
        return batch


class PrefetchIterator(CheckpointableIterator):
    """Background-thread prefetch. Each queued item carries the source state
    *after* producing it, so getstate() reflects the consumer position, not
    the producer's read-ahead (the infinibatch approach)."""

    def __init__(self, source: CheckpointableIterator, buffer_size: int = 16):
        import queue
        import threading

        self._queue_mod = queue
        self._threading = threading
        self._source = source
        self._buffer_size = buffer_size
        self._thread = None
        self._last_state = source.getstate()
        self._restart()

    def _restart(self):
        self._stop_thread()
        self._queue = self._queue_mod.Queue(maxsize=self._buffer_size)
        self._stop = self._threading.Event()

        def worker():
            try:
                while not self._stop.is_set():
                    try:
                        item = next(self._source)
                    except StopIteration:
                        self._queue.put(("stop", None))
                        return
                    self._queue.put(("item", (item, self._source.getstate())))
            except Exception as e:  # pragma: no cover
                self._queue.put(("error", e))

        self._thread = self._threading.Thread(target=worker, daemon=True)
        self._started = False

    def _stop_thread(self):
        if self._thread is not None and self._thread.is_alive():
            self._stop.set()
            try:
                while True:
                    self._queue.get_nowait()
            except self._queue_mod.Empty:
                pass
            self._thread.join(timeout=2.0)
        self._thread = None

    def getstate(self):
        return self._last_state

    def setstate(self, state):
        self._stop_thread()
        self._source.setstate(state)
        self._last_state = state
        self._restart()

    def __next__(self):
        if not self._started:
            self._thread.start()
            self._started = True
        kind, payload = self._queue.get()
        if kind == "stop":
            raise StopIteration
        if kind == "error":
            raise payload
        item, state = payload
        self._last_state = state
        return item

    def close(self):
        self._stop_thread()


class EpochBatchIterator:
    """Resumable epoch-based batching over a map-style dataset (fairseq
    EpochBatchIterator/CountingIterator equivalent): deterministic per-epoch
    shuffle, batch_by_size bucketing via the native op, and
    state_dict/load_state_dict carrying (epoch, batches consumed)."""

    def __init__(self, dataset, key, max_tokens=0, max_sentences=0, seed=1,
                 shuffle=True):
        self._dataset = dataset
        self._key = key
        self._max_tokens = max_tokens
        self._max_sentences = max_sentences
        self._seed = seed
        self._shuffle = shuffle
        self.epoch = 1
        self._consumed = 0

    def _batches_for_epoch(self, epoch):
        import numpy as np

        from unilm_tpu import native

        n = len(self._dataset)
        order = np.arange(n)
        if self._shuffle:
            np.random.RandomState(self._seed + epoch).shuffle(order)
        lengths = np.asarray([self._key(self._dataset[int(i)]) for i in order])
        # sort within the shuffled order for tight padding, fairseq-style
        srt = np.argsort(lengths, kind="stable")
        order = order[srt]
        batches = native.batch_by_size(
            lengths[srt], max_tokens=self._max_tokens,
            max_sentences=self._max_sentences,
        )
        out = [order[b] for b in batches]
        if self._shuffle:
            np.random.RandomState(self._seed + epoch + 57).shuffle(out)
        return out

    def next_epoch_itr(self):
        batches = self._batches_for_epoch(self.epoch)
        start = self._consumed
        def gen():
            for i in range(start, len(batches)):
                self._consumed = i + 1
                yield [self._dataset[int(j)] for j in batches[i]]
            self.epoch += 1
            self._consumed = 0
        return gen()

    def state_dict(self):
        return {"epoch": self.epoch, "consumed": self._consumed}

    def load_state_dict(self, state):
        self.epoch = state["epoch"]
        self._consumed = state["consumed"]
