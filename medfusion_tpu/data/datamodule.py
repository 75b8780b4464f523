"""Data module: batched numpy iteration with weighted/random sampling.

Parity with the reference ``SimpleDataModule``
(``/root/reference/medical_diffusion/data/datamodules/datamodule_simple.py:10-68``):
seeded generator; train iterator with WeightedRandomSampler-with-replacement
semantics when weights are given, else shuffled without replacement;
``drop_last=True`` for train; plain sequential val/test loaders.

Instead of torch DataLoader worker processes, items are decoded on a thread
pool (PIL decode releases the GIL) and stacked into channels-last numpy
batches; feed to ``jax.device_put`` or ``parallel.shard_batch``. Epochs are
reproducible: epoch e uses fold_in(seed, e).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np


def _stack(items: List[Dict]) -> Dict[str, np.ndarray]:
    batch: Dict[str, np.ndarray] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], str):
            batch[key] = np.asarray(vals)
        else:
            batch[key] = np.stack([np.asarray(v) for v in vals])
    return batch


class SimpleDataModule:
    def __init__(
        self,
        ds_train,
        ds_val=None,
        ds_test=None,
        batch_size: int = 1,
        num_workers: int = 8,
        seed: int = 0,
        weights: Optional[List[float]] = None,
    ):
        self.ds_train = ds_train
        self.ds_val = ds_val
        self.ds_test = ds_test
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.weights = weights

    # ------------------------------------------------------------------

    def _iter(self, ds, order: np.ndarray, drop_last: bool) -> Iterator[Dict]:
        bs = self.batch_size
        n_batches = len(order) // bs if drop_last else -(-len(order) // bs)
        if self.num_workers > 1:
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    idx = order[b * bs : (b + 1) * bs]
                    yield _stack(list(pool.map(ds.__getitem__, idx)))
        else:
            for b in range(n_batches):
                idx = order[b * bs : (b + 1) * bs]
                yield _stack([ds[i] for i in idx])

    def train_dataloader(self, epoch: int = 0) -> Iterator[Dict]:
        rng = np.random.default_rng((self.seed, epoch))
        n = len(self.ds_train)
        if self.weights is not None:
            p = np.asarray(self.weights, np.float64)
            p = p / p.sum()
            order = rng.choice(n, size=n, replace=True, p=p)
        else:
            order = rng.permutation(n)
        return self._iter(self.ds_train, order, drop_last=True)

    def val_dataloader(self) -> Iterator[Dict]:
        assert self.ds_val is not None, "A validation set was not initialized."
        return self._iter(self.ds_val, np.arange(len(self.ds_val)), drop_last=False)

    def test_dataloader(self) -> Iterator[Dict]:
        assert self.ds_test is not None, "A test set was not initialized."
        return self._iter(self.ds_test, np.arange(len(self.ds_test)), drop_last=False)
