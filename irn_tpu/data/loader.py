"""Batch loading with background prefetch (replaces torch DataLoader +
``split_dataset`` fan-out, misc/torchutils.py:66-68).

TPU-first: batches are collated to fixed-shape stacked NumPy arrays ready
for a single host->device transfer; a thread pool overlaps JPEG decode and
augmentation with device compute; sharding across hosts/processes is a
strided ``shard()`` of the index space (the reference's strided Subset
split)."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def shard_indices(n: int, shard: int, num_shards: int) -> np.ndarray:
    """Strided shard of range(n) (torchutils.split_dataset semantics)."""
    return np.arange(shard, n, num_shards)


def collate(samples: Sequence[Dict]) -> Dict:
    """Stack same-shaped arrays; keep lists for strings/ragged entries."""
    out: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray) and all(
            isinstance(v, np.ndarray) and v.shape == first.shape for v in vals
        ):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = vals
    return out


class BatchLoader:
    """Iterate a dataset in shuffled fixed-size batches with prefetch.

    Args:
      dataset: indexable with __len__/__getitem__ returning sample dicts.
      batch_size: samples per batch.
      shuffle: reshuffle indices each epoch (seeded, reproducible).
      drop_last: drop the trailing partial batch (the reference's training
        loaders use drop_last=True).
      num_workers: decode/augment threads.
      prefetch: max batches in flight.
      indices: optional explicit index subset (e.g. a host shard).
      local_rows: optional (lo, hi) — decode only these rows of every
        (globally shuffled) batch. Multi-host data parallelism: each
        process forms the SAME global batch stream (seeded shuffle) and
        loads only its contiguous row range of each batch
        (parallel/mesh.local_batch_slice); shard_batch then assembles the
        global array. Requires drop_last (a ragged tail batch has no
        well-defined row range).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        indices: Optional[np.ndarray] = None,
        local_rows: Optional[tuple] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.indices = (
            np.asarray(indices) if indices is not None else np.arange(len(dataset))
        )
        if local_rows is not None:
            lo, hi = local_rows
            if not (0 <= lo < hi <= batch_size):
                raise ValueError(f"local_rows {local_rows} outside batch "
                                 f"[0, {batch_size})")
            if (lo, hi) != (0, batch_size) and not drop_last:
                raise ValueError(
                    "local_rows requires drop_last=True (a ragged tail "
                    "batch has no well-defined per-process row range)"
                )
        self.local_rows = local_rows
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the next iteration's (shuffle, augmentation) RNG stream.

        The train stages call this with the true epoch number each epoch
        so a mid-training resume continues the stream where it left off
        instead of replaying epoch 0's order/draws (and so the one-batch
        BN-calibration draw doesn't shift every later epoch's stream)."""
        self._epoch = int(epoch)

    def _epoch_indices(self) -> np.ndarray:
        idx = self.indices.copy()
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict]:
        idx = self._epoch_indices()
        if hasattr(self.dataset, "set_epoch"):
            # Per-sample RNGs derive from (seed, epoch, idx): reproducible
            # for any num_workers, fresh draws each epoch.
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        n_batches = len(idx) // self.batch_size if self.drop_last else -(
            -len(idx) // self.batch_size
        )
        batches: List[np.ndarray] = [
            idx[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        if self.local_rows is not None:
            # slice AFTER forming global batches so every process sees the
            # same global shuffle stream and decodes disjoint rows of it
            lo, hi = self.local_rows
            batches = [b[lo:hi] for b in batches]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_interruptible(item) -> bool:
            # q.put must not block forever: an abandoned iterator (e.g. a
            # single next() for BN calibration) sets `stop` from the
            # consumer's finally, and a producer parked in a blocking put
            # would leak the thread + pool + queued batches for the
            # process lifetime
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(
                            pool.map(self.dataset.__getitem__, b)
                        )
                        if not put_interruptible(collate(samples)):
                            return
                sentinel = None
            except BaseException as exc:  # forward, don't hang the consumer
                sentinel = exc
            put_interruptible(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    # a worker failure (corrupt image, IO error) must fail
                    # the training loop, not silently block it forever
                    raise item
                yield item
        finally:
            stop.set()
