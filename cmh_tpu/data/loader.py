"""Batched host→device data loading with background prefetch.

TPU-native replacement for the reference's torch DataLoader stack
(/root/reference/runners/base.py:162-228): batches are assembled on the host
by a worker thread, padded to a fixed batch size (static shapes keep the XLA
compile cache warm — the reference instead ships a ragged final batch), and
queued ahead of consumption so host preprocessing overlaps device compute.
Each batch is a dict of numpy arrays plus a ``valid`` mask marking padding.

Data-parallel sharding (the reference's DistributedSampler,
runners/base.py:172-197) is handled differently on TPU: the loader always
yields the *global* batch and jit's input shardings split it over the mesh
batch axis — no per-replica python processes.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class HostDataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_to_batch: bool = True,
        prefetch: int = 2,
        seed: Optional[int] = None,
        num_workers: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_to_batch = pad_to_batch
        self.prefetch = prefetch
        # >0: decode items with a thread pool (PIL/numpy release the GIL for
        # the heavy parts; the reference's DataLoader num_workers analogue)
        self.num_workers = num_workers
        self._pool = None
        self._rng = np.random.RandomState(seed) if seed is not None else np.random
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            return self._rng.permutation(n)
        return np.arange(n)

    def _make_batch(self, idx: np.ndarray, size: Optional[int] = None) -> Dict[str, np.ndarray]:
        size = len(idx) if size is None else size
        if self.num_workers > 0:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            items = list(self._pool.map(
                lambda i: self.dataset[int(i)], idx.tolist()
            ))
        else:
            items = [self.dataset[int(i)] for i in idx]
        images, captions, kpms, labels, indices = zip(*items)
        batch = {
            "image": np.stack(images).astype(np.float32),
            "text": np.stack(captions).astype(np.int32),
            "key_padding_mask": np.stack(kpms),
            "label": np.stack(labels).astype(np.float32),
            "index": np.asarray(indices, dtype=np.int32),
        }
        batch["valid"] = (np.arange(len(batch["index"])) < size)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        self._epoch += 1
        n = len(indices)
        steps = []
        for start in range(0, n, self.batch_size):
            chunk = indices[start : start + self.batch_size]
            size = len(chunk)
            if size < self.batch_size:
                if self.drop_last:
                    continue
                if self.pad_to_batch:
                    # pad the ragged final batch with samples wrapped from
                    # the start of this epoch's order — distinct from the
                    # tail chunk whenever the dataset has ≥ batch_size
                    # items (np.resize cycles, so datasets SMALLER than a
                    # batch necessarily repeat items); padding is excluded
                    # from losses by the ``valid`` mask either way (the
                    # reference instead ships a ragged batch; static
                    # shapes keep the XLA compile cache warm)
                    pad = np.resize(indices, self.batch_size - size)
                    chunk = np.concatenate([chunk, pad])
            steps.append((chunk, size))

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []
        stop = threading.Event()

        def put(item) -> bool:
            # abandoned iterators (e.g. `next(iter(loader))` shape probes)
            # must not leave this thread blocked on a full queue forever,
            # pinning ~prefetch batches of memory per construction
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for chunk, size in steps:
                    if not put(self._make_batch(chunk, size)):
                        return
            except Exception as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # runs on GeneratorExit too (consumer dropped the iterator)
            stop.set()
