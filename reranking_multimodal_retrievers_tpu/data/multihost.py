"""Multi-host (DCN) input pipeline.

The one legitimate multi-host concern in the rebuild (SURVEY.md §2.10/§7):
on a multi-host TPU slice each *process* sees only its local devices, so the
input pipeline must (a) give every process a disjoint shard of the dataset
and (b) assemble per-process host batches into one *global* jax.Array whose
shards live on the right devices. The reference's analogue is
DDP-rank-sharded torch DataLoaders (`submit_train_jobs.py:78` launches one
rank per GPU); here data parallelism spans hosts over DCN and chips over ICI
inside one SPMD program.

Usage:
    loader = MultiHostDataLoader(dataset, batch_size=global_bs, mesh=mesh)
    for global_batch in loader:          # dict of jax.Array (global)
        state, metrics = train_step(state, global_batch)

Implementation notes:
- sharding is by round-robin row index (process i takes rows i, i+P, ...),
  deterministic across processes given the same seed/epoch — every process
  must call ``set_epoch`` identically;
- array assembly uses ``jax.make_array_from_process_local_data`` so only the
  local shard is ever materialized per host (no cross-host gather of data on
  the host network);
- non-array batch entries (question ids, strings) stay process-local.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from .loaders import DataLoader


class ProcessShardDataset:
    """View of a map-style dataset holding every ``process_count``-th row
    starting at ``process_index`` (round-robin keeps shard sizes within 1)."""

    def __init__(self, dataset, process_index: int, process_count: int):
        assert 0 <= process_index < process_count
        self.dataset = dataset
        self.process_index = process_index
        self.process_count = process_count
        n = len(dataset)
        self._indices = list(range(process_index, n, process_count))
        # equalize shard length across processes so every host runs the same
        # number of steps (SPMD requires lockstep): pad short shards by wrap.
        # A shard can be EMPTY (n < process_count, e.g. 2 rows on a 4-process
        # slice) — wrap-doubling an empty list is still empty, which would
        # leave this host yielding 0 batches while others yield 1 and the
        # pjit step deadlocks; fall back to global round-robin rows so every
        # host serves exactly _common_len rows
        self._common_len = max(n // process_count, 1) if n else 0
        if n:
            if not self._indices:
                self._indices = [process_index % n]
            while len(self._indices) < self._common_len:
                self._indices = self._indices * 2
            self._indices = self._indices[: self._common_len]
        # expose the underlying collate_fn if any
        self.collate_fn = getattr(dataset, "collate_fn", None)

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, i):
        return self.dataset[self._indices[int(i)]]


class MultiHostDataLoader:
    """Per-process loader + global-array assembly over a mesh.

    ``batch_size`` is the GLOBAL batch size; each process loads
    ``batch_size // process_count`` rows per step. Yields dicts whose numpy
    values have been turned into global ``jax.Array``s sharded over the
    mesh's data axis; non-array values are kept process-local as lists.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        mesh,
        shuffle: bool = True,
        seed: int = 0,
        collate_fn=None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        import jax

        self.mesh = mesh
        pi = jax.process_index() if process_index is None else process_index
        pc = jax.process_count() if process_count is None else process_count
        assert batch_size % pc == 0, (batch_size, pc)
        self.local_batch = batch_size // pc
        shard = ProcessShardDataset(dataset, pi, pc)
        self.local_loader = DataLoader(
            shard,
            batch_size=self.local_batch,
            shuffle=shuffle,
            drop_last=True,
            seed=seed,
            collate_fn=collate_fn,
        )

    def __len__(self):
        return len(self.local_loader)

    def set_epoch(self, epoch: int):
        self.local_loader.set_epoch(epoch)

    def _globalize(self, batch: dict) -> dict:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1:
                spec = [None] * v.ndim
                spec[0] = DATA_AXIS
                sharding = NamedSharding(self.mesh, P(*spec))
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            else:
                out[k] = v
        return out

    def __iter__(self) -> Iterator[dict]:
        for batch in self.local_loader:
            batch.pop("_real_count", None)
            yield self._globalize(batch)
