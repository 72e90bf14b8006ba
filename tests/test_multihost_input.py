"""Multi-host input pipeline: per-process sharding determinism and global
jax.Array assembly over the virtual 8-device mesh (single-process here; the
cross-process contract is the deterministic round-robin index split)."""

import numpy as np

import jax

from reranking_multimodal_retrievers_tpu.data.multihost import (
    MultiHostDataLoader,
    ProcessShardDataset,
)
from reranking_multimodal_retrievers_tpu.parallel import make_mesh
from reranking_multimodal_retrievers_tpu.parallel.mesh import DATA_AXIS


class _Rows:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "qid": f"q{i}"}


def test_process_shards_are_disjoint_and_lockstep():
    ds = _Rows(22)
    shards = [ProcessShardDataset(ds, i, 4) for i in range(4)]
    # lockstep: every process sees the same number of rows
    lengths = {len(s) for s in shards}
    assert lengths == {22 // 4}
    seen = []
    for s in shards:
        seen.extend(int(s[i]["x"][0]) for i in range(len(s)))
    assert len(seen) == len(set(seen))  # disjoint across processes


def test_make_mesh_rejects_overask():
    import pytest
    import jax

    n = len(jax.devices())
    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_data=n + 1)
    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_data=n, n_model=2)


def test_global_batch_assembly_over_mesh():
    mesh = make_mesh()
    ds = _Rows(64)
    loader = MultiHostDataLoader(
        ds, batch_size=16, mesh=mesh, shuffle=True, seed=0,
        process_index=0, process_count=1,
    )
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    # arrays became global jax.Arrays sharded over the data axis
    assert isinstance(b["x"], jax.Array)
    assert b["x"].shape == (16, 3)
    spec = b["x"].sharding.spec
    assert spec[0] == DATA_AXIS
    # strings stay process-local
    assert isinstance(b["qid"], list) and len(b["qid"]) == 16
    # deterministic epoch shuffling: same epoch → same order
    loader.set_epoch(0)
    again = next(iter(loader))
    np.testing.assert_array_equal(np.asarray(b["x"]), np.asarray(again["x"]))


def test_global_batch_feeds_train_step():
    """A global batch from the loader drives the SPMD train step directly."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    ds = _Rows(32)
    loader = MultiHostDataLoader(
        ds, batch_size=8, mesh=mesh, process_index=0, process_count=1,
    )
    batch = next(iter(loader))

    @jax.jit
    def mean_x(x):
        return jnp.mean(x)

    v = float(mean_x(batch["x"]))
    assert np.isfinite(v)


def test_empty_shard_hosts_still_serve_rows():
    """n < process_count used to leave some hosts with ZERO batches while
    others had one — SPMD deadlock; every host must serve _common_len rows."""
    ds = _Rows(2)  # 2 rows, 4 processes
    lens = []
    for rank in range(4):
        shard = ProcessShardDataset(ds, rank, 4)
        lens.append(len(shard))
        assert len(shard) == 1
        _ = shard[0]  # must be a real row, not an IndexError
    assert len(set(lens)) == 1
