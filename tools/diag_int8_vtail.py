"""Diagnose the stage-C int8/compressed index collapse on the vtail task.

Builds the SAME executor as `--mode test` for configs/synth_flmr_vtail.json,
restores the trained checkpoint, builds the fp index ONCE, then compares
exact vs QuantizedTokenIndex vs CompressedSearcher rankings for the first
few test batches, reporting per-query score margins.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RMRT_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from reranking_multimodal_retrievers_tpu.utils.config_system import load_config
from reranking_multimodal_retrievers_tpu import executors  # noqa: F401
from reranking_multimodal_retrievers_tpu.data import ops  # noqa: F401
from reranking_multimodal_retrievers_tpu.executors.experiment import Experiment


def main():
    cfg = load_config("configs/synth_flmr_vtail.json")
    cfg.meta.experiment_name = "diag_int8"
    cfg.set_path("mode", "test")
    exp = Experiment(cfg)
    ex = exp.executor
    ckpt = "experiments/synth_flmr_vtail/version_0/ckpts/step_248"
    ex.load_checkpoint(ckpt)
    ex._ensure_eval_fns()
    params = ex.current_params()

    index = ex.build_index()
    print("index:", index.num_docs, "docs, L_d", index.doc_maxlen,
          "dim", index.dim, "dtype", index.embeddings.dtype)

    from reranking_multimodal_retrievers_tpu.engine.search import Searcher
    from reranking_multimodal_retrievers_tpu.engine.index import (
        QuantizedTokenIndex,
    )

    k = 100
    s_fp = Searcher(index, k=k)
    qidx = QuantizedTokenIndex.from_token_index(index)
    s_q = Searcher(qidx, k=k)

    loaders = ex.eval_dataloaders("test")
    name, loader = next(iter(loaders.items()))
    agree5 = agree100 = n = 0
    hits_fp = hits_q = 0
    for bi, batch in enumerate(loader):
        if bi >= 5:
            break
        Q, _ = ex._query_fn_text(
            params, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]))
        ids_fp, sc_fp = s_fp.search(Q)
        ids_q, sc_q = s_q.search(Q)
        real = batch.get("_real_count", len(ids_fp))
        for qi in range(real):
            pos = set(batch["pos_item_ids"][qi]) if "pos_item_ids" in batch \
                else {batch["passage_id"][qi]}
            n += 1
            agree5 += len(set(ids_fp[qi][:5]) & set(ids_q[qi][:5])) / 5.0
            agree100 += len(set(ids_fp[qi]) & set(ids_q[qi])) / float(k)
            hits_fp += bool(pos & set(ids_fp[qi][:5]))
            hits_q += bool(pos & set(ids_q[qi][:5]))
            if qi == 0 and bi < 2:
                print(f"q{bi}.0 fp top5 scores {np.asarray(sc_fp)[qi][:5]}")
                print(f"      q  top5 scores {np.asarray(sc_q)[qi][:5]}")
                print(f"      fp ids {ids_fp[qi][:5]}")
                print(f"      q  ids {ids_q[qi][:5]}")
                print(f"      pos {sorted(pos)[:3]}")
    print(f"n={n} overlap@5={agree5/n:.3f} overlap@100={agree100/n:.3f} "
          f"R@5 fp={hits_fp/n:.3f} int8={hits_q/n:.3f}")


if __name__ == "__main__":
    main()
