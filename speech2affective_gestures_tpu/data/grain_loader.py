"""grain-based input pipeline (multi-process, checkpointable).

An alternative to the in-HBM `DeviceDataset` gather for corpora that exceed
host/device memory: a `grain.DataLoader` over the packed arrays with
shuffle-sampler, per-sample decode (int16 audio -> float, f16 MFCC -> f32),
batching, per-batch adversarial speaker sampling (the reference's
yield_batch semantics, processor_v2.py:624-636), multiprocess prefetch, and
`jax.process_index()`-aware sharding for multi-host training.

grain iterators are checkpointable (PyGrainCheckpointHandler), giving
mid-epoch data-pipeline resume — a capability the reference lacks entirely.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import grain.python as gp

from .ted_db import (
    PackedDataset, decode_rows, sample_adversarial_speakers, speaker_id_pool,
)


class PackedDataSource(gp.RandomAccessDataSource):
    """Random access over a PackedDataset's rows."""

    def __init__(self, ds: PackedDataset):
        self._ds = ds

    def __len__(self) -> int:
        return self._ds.n_samples

    def __getitem__(self, idx: int) -> dict:
        row = decode_rows(self._ds, idx)
        row["own_vid"] = np.int32(self._ds.vid_indices[idx])
        return row

    def __repr__(self) -> str:
        # grain validates repr(data_source) when restoring iterator state;
        # identify the source by content geometry, not object identity
        return (f"PackedDataSource(n={self._ds.n_samples}, "
                f"vec={tuple(self._ds.vec_seq.shape)}, "
                f"mfcc={tuple(self._ds.mfcc_features.shape)})")


@dataclasses.dataclass
class AdversarialSpeakers(gp.RandomMapTransform):
    """Replace each batch's own speaker ids with random *different* speakers
    (reference yield_batch, processor_v2.py:624-636)."""

    all_speaker_ids: np.ndarray

    def random_map(self, batch: dict, rng: np.random.Generator) -> dict:
        own = batch.pop("own_vid")
        batch["vid_indices"] = sample_adversarial_speakers(
            self.all_speaker_ids, own, rng, len(own)
        ).astype(np.int32)
        return batch


def make_data_loader(
    dataset: PackedDataset,
    batch_size: int,
    seed: int = 1234,
    num_epochs: int | None = 1,
    worker_count: int = 0,
    shard_by_process: bool = False,
) -> gp.DataLoader:
    """Batched, shuffled grain loader over a packed split."""
    shard_options = (
        gp.ShardByJaxProcess(drop_remainder=True) if shard_by_process
        else gp.NoSharding()
    )
    sampler = gp.IndexSampler(
        num_records=dataset.n_samples,
        shard_options=shard_options,
        shuffle=True,
        num_epochs=num_epochs,
        seed=seed,
    )
    speaker_ids = speaker_id_pool(dataset)
    if speaker_ids is None:
        speaker_ids = np.arange(1)
    operations = [
        gp.Batch(batch_size=batch_size, drop_remainder=True),
        AdversarialSpeakers(speaker_ids),
    ]
    return gp.DataLoader(
        data_source=PackedDataSource(dataset),
        sampler=sampler,
        operations=operations,
        worker_count=worker_count,
    )
