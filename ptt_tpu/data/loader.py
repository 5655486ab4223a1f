"""Batch loader: shuffling, collation, and threaded prefetch.

Replaces the reference's torch DataLoader + DistributedSampler stack
(ptt/datasets/__init__.py:18-72) with a host-side pipeline that yields fixed-shape
numpy batches ready for device upload.  Item construction is numpy-heavy and releases
the GIL, so a small thread pool both parallelizes preprocessing and overlaps it with
device compute (double-buffered prefetch).

Multi-host data parallelism: pass ``num_shards``/``shard_id`` (process count/index);
each process loads only its shard of every global batch — the pjit train step then
assembles the global array from per-host shards.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(items):
    """Stack a list of dict items into a dict of (B, ...) arrays."""
    out = {}
    for key in items[0]:
        out[key] = np.stack([it[key] for it in items], axis=0)
    return out


def identity_collate(items):
    """Test-time collate: a batch is a list of whole tracklets (reference
    test_tracking.py:122)."""
    return items


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        collate_fn=None,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Epoch-seeded shuffling (reference DistributedSampler.set_epoch pattern,
        ptt/datasets/__init__.py:35-39)."""
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_order(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch]))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        return order

    def _batches_of_indices(self):
        order = self._index_order()
        n = len(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            batch_idx = order[start : start + self.batch_size]
            if self.num_shards > 1:
                batch_idx = batch_idx[self.shard_id :: self.num_shards]
            if len(batch_idx):
                yield batch_idx

    def __iter__(self):
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def produce():
            try:
                for batch_idx in self._batches_of_indices():
                    items = list(pool.map(self.dataset.__getitem__, batch_idx))
                    out_q.put(self.collate_fn(items))
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(e)
                return
            finally:
                out_q.put(SENTINEL)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                # interpreter teardown: stdlib module globals may already be None
                # when an abandoned generator is finalized
                pass


def build_dataloader(
    dataset_cfg,
    class_names,
    batch_size,
    root_path=None,
    workers=4,
    logger=None,
    training=True,
    seed=0,
    num_shards=1,
    shard_id=0,
):
    """Reference build_dataloader (ptt/datasets/__init__.py:42-72): dataset from the
    registry + the right loader flavor for train (shuffled, stacked batches) vs test
    (sequential, identity collate of whole tracklets)."""
    from . import ALL_DATASETS

    dataset = ALL_DATASETS[dataset_cfg["DATASET"]](
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        training=training,
        root_path=root_path,
        logger=logger,
        seed=seed,
    )
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=training,
        drop_last=training,
        collate_fn=default_collate if training else identity_collate,
        seed=seed,
        num_workers=workers,
        num_shards=num_shards,
        shard_id=shard_id,
    )
    return dataset, loader
