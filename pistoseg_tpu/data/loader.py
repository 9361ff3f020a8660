"""Parallel host input pipeline feeding static-shape device batches.

Replaces ``torch.utils.data.DataLoader(num_workers=8)`` (SURVEY.md §2.4):
a thread-pool prefetching loader (PNG decode releases the GIL in PIL/zlib)
that collates samples into fixed-shape numpy batches.  The final ragged
batch is padded and flagged with a ``valid`` mask instead of being dropped
or recompiled — static shapes are what keep XLA from recompile storms.

Determinism: shuffle order is a pure function of (seed, epoch); worker
count affects throughput only, never order or augmentation (augs are
device-side, keyed).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(samples: Sequence[Dict], pad_to: Optional[int] = None) -> Dict:
    """Stack same-keyed arrays; strings become lists; pad batch dim."""
    batch: Dict = {}
    n = len(samples)
    total = pad_to or n
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str) or not np.asarray(vals[0]).shape and isinstance(vals[0], (str, bytes)):
            batch[key] = list(vals) + [vals[-1]] * (total - n)
        elif isinstance(vals[0], (float, int)) or np.isscalar(vals[0]):
            arr = np.asarray(vals)
            if total > n:
                arr = np.concatenate([arr, np.repeat(arr[-1:], total - n, 0)])
            batch[key] = arr
        else:
            arr = np.stack(vals)
            if total > n:
                arr = np.concatenate([arr, np.repeat(arr[-1:], total - n, 0)])
            batch[key] = arr
    batch["valid"] = np.arange(total) < n
    return batch


class ShardBatchLoader:
    """Batch iterator over a :class:`~pistoseg_tpu.data.shardio.ShardPairDataset`.

    Bypasses per-item ``__getitem__``: whole shuffled batches come out of
    the native pthread gather as contiguous arrays.  Same determinism
    contract as :class:`BatchLoader` (order = f(seed, epoch)).
    """

    def __init__(self, shard_ds, batch_size: int, shuffle: bool = True,
                 seed: int = 42, drop_last: bool = False):
        self.ds = shard_ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int = 0):
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start : start + bs]
            if len(idx) < bs:
                if self.drop_last:
                    break
                pad = np.concatenate([idx, np.repeat(idx[-1:], bs - len(idx))])
                batch = self.ds.gather_batch(pad)
                batch["valid"] = np.arange(bs) < len(idx)
            else:
                batch = self.ds.gather_batch(idx)
                batch["valid"] = np.ones(bs, bool)
            yield batch

    def __iter__(self):
        return self.epoch(0)


class BatchLoader:
    """Iterable over collated batches with thread-parallel sample loading."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 42,
        num_workers: int = 8,
        drop_last: bool = False,
        pad_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.pad_last = pad_last

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int = 0) -> Iterator[Dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        bs = self.batch_size
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # prefetch two batches ahead
            pending: List = []
            starts = list(range(0, n, bs))
            if self.drop_last:
                starts = [s for s in starts if s + bs <= n]

            def submit(start):
                idxs = order[start : start + bs]
                return [pool.submit(self.dataset.__getitem__, int(i)) for i in idxs]

            ahead = 2
            for k, start in enumerate(starts):
                pending.append(submit(start))
                if len(pending) > ahead or k == len(starts) - 1:
                    futs = pending.pop(0)
                    samples = [f.result() for f in futs]
                    yield collate(
                        samples,
                        pad_to=bs if (self.pad_last and len(samples) < bs) else None,
                    )
            while pending:
                futs = pending.pop(0)
                samples = [f.result() for f in futs]
                yield collate(
                    samples,
                    pad_to=bs if (self.pad_last and len(samples) < bs) else None,
                )

    def __iter__(self):
        return self.epoch(0)
