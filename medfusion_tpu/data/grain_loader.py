"""Grain-backed input pipeline (production alternative to SimpleDataModule).

The reference leans on torch DataLoader worker processes
(``datamodule_simple.py:17``); the TPU-native production equivalent is
`grain <https://github.com/google/grain>`_: deterministic, checkpointable
multi-process loading with per-JAX-process sharding built in (multi-host pods
get their data shard automatically via ``ShardByJaxProcess``).

Any dataset from :mod:`medfusion_tpu.data` (``__len__`` + ``__getitem__``)
works as a grain random-access source.
"""

from __future__ import annotations

from typing import Optional


def _make_drop_keys(keys=("uid",)):
    """MapTransform removing non-batchable fields (string uids) before Batch."""
    import grain.python as pg

    class _DropKeys(pg.MapTransform):
        def map(self, item):
            return {k: v for k, v in item.items() if k not in keys}

    return _DropKeys()


def make_grain_loader(
    dataset,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    drop_remainder: bool = True,
):
    """Returns an iterable of dict batches (numpy, channels-last)."""
    import grain.python as pg

    sampler = pg.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=pg.ShardByJaxProcess(drop_remainder=True),
    )
    operations = [
        _make_drop_keys(),
        pg.Batch(batch_size=batch_size, drop_remainder=drop_remainder),
    ]
    return pg.DataLoader(
        data_source=dataset,
        sampler=sampler,
        operations=operations,
        worker_count=worker_count,
    )
