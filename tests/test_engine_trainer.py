"""Engine triples trainer + Examples container (`third_party/ColBERT/colbert/training/training.py:23-158`, `colbert/data/examples.py:10-81`)."""

import json

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.engine.data import (
    Collection, Examples, Queries,
)
from reranking_multimodal_retrievers_tpu.engine.trainer import (
    LazyBatcher, TriplesTrainerConfig, train,
)


def _fixtures(tmp_path, with_scores):
    queries = Queries({i: f"question {i}" for i in range(8)})
    collection = Collection(data=[f"passage text {i}" for i in range(16)])
    rng = np.random.default_rng(0)
    rows = []
    for qid in range(8):
        pos = int(rng.integers(0, 16))
        neg = int(rng.integers(0, 16))
        if with_scores:
            rows.append([qid, [pos, 9.0], [neg, 1.0]])
        else:
            rows.append([qid, pos, neg])
    path = tmp_path / "triples.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return queries, collection, str(path)


def test_examples_roundtrip_and_shard(tmp_path):
    q, c, path = _fixtures(tmp_path, with_scores=False)
    ex = Examples(path=path, nway=2)
    assert len(ex) == 8 and len(ex.data[0]) == 3
    out = ex.save(str(tmp_path / "resaved.jsonl"))
    again = Examples.cast(out, nway=2)
    assert again.tolist() == ex.tolist()
    s0 = ex.tolist(shard=0, nshards=2)
    s1 = ex.tolist(shard=1, nshards=2)
    assert len(s0) == len(s1) == 4
    assert sorted(map(json.dumps, s0 + s1)) == sorted(map(json.dumps, ex.tolist()))


def test_lazy_batcher_shapes(tmp_path):
    q, c, path = _fixtures(tmp_path, with_scores=True)
    batches = list(LazyBatcher(path, q, c, bsize=4, nway=2))
    assert len(batches) == 2
    q_texts, p_texts, target = batches[0]
    assert len(q_texts) == 4 and len(p_texts) == 8
    assert target.shape == (4, 2) and target[0, 0] == 9.0


@pytest.mark.parametrize("with_scores", [False, True])
def test_triples_train_loss_finite_and_params_move(tmp_path, with_scores):
    """CE over nway (bare pids) and KL-distillation ([pid, score]) paths
    (`training.py:109-119`) both step without NaN and update params."""
    import jax

    q, c, path = _fixtures(tmp_path, with_scores=with_scores)
    cfg = TriplesTrainerConfig(bsize=4, nway=2, maxsteps=4, warmup=1,
                               lr=1e-3, query_maxlen=8, doc_maxlen=12,
                               use_ib_negatives=not with_scores)
    # params must actually MOVE from a 0-step baseline (catches a no-op
    # schedule / disconnected loss / dropped optimizer update)
    cfg0 = TriplesTrainerConfig(bsize=4, nway=2, maxsteps=0, warmup=1,
                                lr=1e-3, query_maxlen=8, doc_maxlen=12,
                                use_ib_negatives=not with_scores)
    params0, _ = train(cfg0, path, q, c)
    params, ema = train(cfg, path, q, c)
    assert np.isfinite(ema)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    leaves0 = jax.tree_util.tree_leaves(params0)
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(leaves, leaves0))
    assert moved > 0, "4 train steps left every parameter unchanged"


def test_triples_train_checkpoints(tmp_path):
    q, c, path = _fixtures(tmp_path, with_scores=False)
    cfg = TriplesTrainerConfig(bsize=4, nway=2, maxsteps=2, warmup=1,
                               lr=1e-3, query_maxlen=8, doc_maxlen=12,
                               checkpoint_dir=str(tmp_path / "ck"),
                               save_every=1)
    train(cfg, path, q, c)
    import os
    assert os.listdir(str(tmp_path / "ck"))
