"""FLMR retriever executor: contrastive training + index-and-search eval.

Parity with `src/executors/FLMR_base_executor.py:77-1183`, re-architected
for TPU:

- training: one pjit'd step per batch (CE + in-batch-negative loss; the
  reference backprops the ib loss, `:461-464`);
- eval: queries are encoded in jitted batches; the corpus is encoded into an
  HBM-resident :class:`TokenIndex` and searched with exact MaxSim — replacing
  the reference's rank-0 temp-checkpoint + ColBERT ``Launcher`` + PLAID path
  (`:662-801`, its exhaustive branch `:918-991` is the semantic target);
- results: per-question ``top_ranking_passages`` + metrics + prediction dumps.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ..engine import TokenIndex, Searcher
from ..models import FLMRConfig, FLMRModelForRetrieval
from ..models.bert import BertConfig
from ..models.vit import CLIPVisionConfig
from ..training import TrainState, make_train_step
from ..utils.config_system import ConfigDict
from ..utils.registries import register_executor
from .base import BaseExecutor

logger = logging.getLogger(__name__)


def flmr_config_from(model_config: ConfigDict, query_tokenizer=None,
                     context_tokenizer=None) -> FLMRConfig:
    """Build an FLMRConfig from experiment config + tokenizer-derived statics
    (reference `FLMR_base_executor.py:146-189` + `modeling_flmr.py:701-718`)."""
    from ..models.tokenization import punctuation_skiplist_ids, instruction_token_id

    fc = dict(model_config.get("flmr", {}))
    text_cfg = BertConfig(**fc.pop("text_config", {}))
    vision_cfg = CLIPVisionConfig(**fc.pop("vision_config", {}))
    extra = {}
    if context_tokenizer is not None and fc.get("mask_punctuation", True):
        extra["punctuation_token_ids"] = punctuation_skiplist_ids(
            getattr(context_tokenizer, "tok", context_tokenizer)
        )
    instr_tok = fc.pop("mask_instruction_token", None)
    if instr_tok and query_tokenizer is not None:
        extra["mask_instruction"] = True
        extra["instruction_token_id"] = instruction_token_id(
            getattr(query_tokenizer, "tok", query_tokenizer), instr_tok
        )
    return FLMRConfig(text_config=text_cfg, vision_config=vision_cfg, **fc, **extra)


@register_executor
class FLMRExecutor(BaseExecutor):
    def frozen_patterns(self):
        """The reference freezes BOTH FLMR vision encoders unconditionally
        (`FLMR_base_executor.py:185-189`), regardless of which other module
        flags are set."""
        patterns = list(super().frozen_patterns())
        if "vision_encoder" not in patterns:
            patterns.append("vision_encoder")
        return patterns

    # ------------------------------------------------------------ model
    def _init_model(self):
        import jax

        mc = self.config.get_path("model_config", ConfigDict())
        self.flmr_config = flmr_config_from(
            mc,
            query_tokenizer=self.tokenizers.get("tokenizer"),
            context_tokenizer=self.tokenizers.get("decoder_tokenizer"),
        )
        self.model = FLMRModelForRetrieval(self.flmr_config)
        self.num_negative_samples = mc.get("num_negative_samples", 1)

        batch = self._dummy_batch()
        variables = self.model.init(
            jax.random.PRNGKey(self.config.get_path("meta.seed", 42) or 42), **batch,
            num_negative_examples=self.num_negative_samples,
        )
        self.params = variables["params"]

        ckpt_dir = mc.get("checkpoint_dir")
        if ckpt_dir and os.path.isdir(ckpt_dir):
            from ..models.hf_bridge import load_torch_checkpoint_dir, flmr_params

            logger.info("bridging torch checkpoint from %s", ckpt_dir)
            sd = load_torch_checkpoint_dir(ckpt_dir)
            self.params = flmr_params(sd, self.flmr_config)

        self._setup_corpus()
        self._train_state = None
        self._query_fn = None
        self._doc_fn = None

    def _dummy_batch(self):
        import jax.numpy as jnp

        qlen = self.config.get_path("model_config.query_maxlen", 32)
        dlen = self.config.get_path("model_config.doc_maxlen", 64)
        nway = self.num_negative_samples + 1
        batch = dict(
            query_input_ids=jnp.ones((2, qlen), jnp.int32),
            query_attention_mask=jnp.ones((2, qlen), jnp.int32),
            context_input_ids=jnp.ones((2 * nway, dlen), jnp.int32),
            context_attention_mask=jnp.ones((2 * nway, dlen), jnp.int32),
        )
        if self.flmr_config.use_vision_encoder:
            img = self.flmr_config.vision_config.image_size
            batch["query_pixel_values"] = jnp.zeros(
                (2, 3, img, img), jnp.float32)
        return batch

    def _setup_corpus(self):
        """Build id2doc from the pipeline's passage tables (reference
        ``setup`` `:194-302`), plus per-source sub-corpora when
        ``validation_indexing_source`` is set (`:230-255`: multi-task M2KR
        validation retrieves each query against ITS dataset's passage pool,
        not the merged corpus)."""
        self.id2doc: Dict[str, str] = {}
        self.id2source: Dict[str, str] = {}
        passages = self.prepared_data.get("passages")
        if passages and "id2doc" in passages:
            self.id2doc = dict(passages["id2doc"])
            self.id2source = dict(passages.get("id2source") or {})
        else:
            for mode, loaders in self.data_loaders.items():
                for loader in loaders.values():
                    ds = getattr(loader, "dataset", None)
                    if ds is not None and getattr(ds, "passages", None):
                        self.id2doc.update(ds.passages["id2doc"])
                        self.id2source.update(
                            ds.passages.get("id2source") or {})
        if self.use_dummy_data and len(self.id2doc) > 200:
            # sanity-time corpus reduction (reference `:674-687`)
            self.id2doc = dict(list(self.id2doc.items())[:100])
        self.source_id2doc: Dict[str, Dict[str, str]] = {}
        sources = self.config.get_path(
            "model_config.validation_indexing_source", None)
        if sources:
            for name in sources:
                self.source_id2doc[name] = {}
            for pid, content in self.id2doc.items():
                src = self.id2source.get(pid)
                if src in self.source_id2doc:
                    self.source_id2doc[src][pid] = content

    # ------------------------------------------------------------ train
    def prepare_training(self, total_steps: int):
        import jax.numpy as jnp

        tx, _ = self.build_optimizer(self.params, total_steps)
        self._tx = tx
        state = TrainState.create(self.params, tx)
        packed = getattr(self, "_restored_opt_state", None)
        if packed:
            from ..training.checkpointing import unpack_opt_state

            state = state.replace(
                opt_state=unpack_opt_state(state.opt_state, packed)
            )
            step = getattr(self, "_restored_step", None)
            if step is not None:
                state = state.replace(step=jnp.asarray(step, jnp.int32))
            self._restored_opt_state = None
        if self.mesh is not None:
            from ..parallel import replicate

            state = replicate(self.mesh, state)
        self._train_state = state
        loss_key = self.config.get_path("train.loss_key", "ib_loss")
        self._step_fn = make_train_step(
            lambda p, **kw: self.model.apply({"params": p}, **kw),
            tx,
            mesh=self.mesh,
            loss_key=loss_key,
            num_negative_examples=self.num_negative_samples,
        )

    def training_step(self, batch) -> Dict[str, float]:
        import jax.numpy as jnp

        model_batch = dict(
            query_input_ids=jnp.asarray(batch["input_ids"]),
            query_attention_mask=jnp.asarray(batch["attention_mask"]),
            context_input_ids=jnp.asarray(batch["decoder_input_ids"]),
            context_attention_mask=jnp.asarray(batch["decoder_attention_mask"]),
        )
        if "pixel_values" in batch:
            model_batch["query_pixel_values"] = jnp.asarray(batch["pixel_values"])
        if "image_features" in batch:
            model_batch["query_image_features"] = jnp.asarray(batch["image_features"])
        if self.mesh is not None:
            from ..parallel import shard_batch

            model_batch = shard_batch(self.mesh, model_batch)
        self._train_state, metrics = self._step_fn(self._train_state, model_batch)
        return {k: float(np.asarray(v)) for k, v in metrics.items()}

    def state_to_save(self):
        from ..training.checkpointing import pack_opt_state

        if self._train_state is None:
            return {"params": self.params}
        return {
            "params": self._train_state.params,
            "step": np.asarray(self._train_state.step),
            "opt_state": pack_opt_state(self._train_state.opt_state),
        }

    def load_checkpoint(self, path: str):
        from ..training.checkpointing import CheckpointManager

        restored = CheckpointManager.restore(path)
        if "params" in restored:
            self.params = restored["params"]
        else:
            self.params = restored
        # optimizer state + step are rebuilt against tx.init in
        # prepare_training (reference restores optimizer state on resume,
        # `FLMR_base_executor.py:354-359`)
        self._restored_opt_state = restored.get("opt_state") if isinstance(restored, dict) else None
        self._restored_step = restored.get("step") if isinstance(restored, dict) else None
        if self._restored_step is not None:
            self.global_step = int(np.asarray(self._restored_step))

    # ------------------------------------------------------------- eval
    def _ensure_eval_fns(self):
        import jax

        if self._query_fn is None:
            @jax.jit
            def query_fn(params, input_ids, attention_mask, pixel_values):
                out = self.model.apply(
                    {"params": params}, input_ids, attention_mask,
                    pixel_values=pixel_values,
                    method=FLMRModelForRetrieval.query,
                )
                return out.late_interaction_output, out.query_mask

            @jax.jit
            def query_fn_text(params, input_ids, attention_mask):
                out = self.model.apply(
                    {"params": params}, input_ids, attention_mask,
                    method=FLMRModelForRetrieval.query,
                    concat_output_from_vision_encoder=False,
                )
                return out.late_interaction_output, out.query_mask

            @jax.jit
            def doc_fn(params, input_ids, attention_mask):
                out = self.model.apply(
                    {"params": params}, input_ids, attention_mask,
                    method=FLMRModelForRetrieval.doc,
                )
                return out.late_interaction_output, out.context_mask

            @jax.jit
            def doc_fn_mm(params, input_ids, attention_mask, image_features):
                # 'multimodal_docs' (reference `FLMR_base_executor.py:
                # 703-715` + `modeling_flmr.py:1535-1543`): vision tokens
                # prepended to the doc representation
                out = self.model.apply(
                    {"params": params}, input_ids, attention_mask,
                    image_features=image_features,
                    concat_output_from_vision_encoder=True,
                    method=FLMRModelForRetrieval.doc,
                )
                return out.late_interaction_output, out.context_mask

            self._query_fn = query_fn
            self._query_fn_text = query_fn_text
            self._doc_fn = doc_fn
            self._doc_fn_mm = doc_fn_mm

    def current_params(self):
        if self._train_state is not None:
            return self._train_state.params
        # Checkpoint-restored params are host (numpy) arrays; handing them to
        # a jitted eval fn re-uploads the WHOLE tree through the device link
        # on every call — at BERT-base scale through the TPU tunnel that is
        # ~1.5 GB per index chunk, which turned the fullsize corpus encode
        # into a multi-hour stall with unbounded client buffering. Pin the
        # tree on device once; subsequent calls pass device handles.
        import jax

        leaves = jax.tree_util.tree_leaves(self.params)
        if leaves and not isinstance(leaves[0], jax.Array):
            self.params = jax.device_put(self.params)
        return self.params

    def build_index(self, id2doc=None) -> TokenIndex:
        """Encode the corpus into a TokenIndex (the reference's
        ``prepare_item_embeddings`` + ColBERT indexing collapsed into one
        sharded encode, `:662-801`). ``id2doc`` overrides the corpus (the
        per-source validation sub-corpora)."""
        import jax.numpy as jnp

        self._ensure_eval_fns()
        params = self.current_params()
        ct = self.tokenizers["decoder_tokenizer"]
        id2doc = id2doc if id2doc is not None else self.id2doc
        doc_ids = list(id2doc.keys())
        contents = [id2doc[d] for d in doc_ids]
        bs = self.config.get_path("test.index_batch_size", 16)
        dlen = self.config.get_path("model_config.doc_maxlen", 64)
        # 'multimodal_docs' (reference `:703-715`): per-doc precomputed image
        # features join the encode. They arrive via the passages dict
        # (`_passages_from` picks up a passage-table 'image_features' column)
        # or directly under prepared_data.
        multimodal = (
            "multimodal_docs" in (
                self.config.get_path("model_config.modules", []) or [])
            or self.config.get_path("model_config.multimodal_docs", False)
        )
        passages = self.prepared_data.get("passages") or {}
        id2feat = (
            passages.get("id2doc_image_features")
            or self.prepared_data.get("id2doc_image_features")
            or {}
        )
        multimodal = multimodal and bool(id2feat)
        zero_feat = (
            np.zeros_like(np.asarray(next(iter(id2feat.values())), np.float32))
            if id2feat else None
        )
        embs, masks = [], []
        for i in range(0, len(contents), bs):
            chunk = contents[i : i + bs]
            cids = doc_ids[i : i + bs]
            real = len(chunk)
            if real < bs:
                chunk = chunk + [chunk[-1]] * (bs - real)
                cids = cids + [cids[-1]] * (bs - real)
            enc = ct(chunk, max_length=dlen)
            if multimodal:
                feats = np.stack([
                    np.asarray(id2feat.get(d, zero_feat), np.float32)
                    for d in cids
                ])
                e, m = self._doc_fn_mm(
                    params, jnp.asarray(enc["input_ids"]),
                    jnp.asarray(enc["attention_mask"]), jnp.asarray(feats),
                )
            else:
                e, m = self._doc_fn(
                    params, jnp.asarray(enc["input_ids"]),
                    jnp.asarray(enc["attention_mask"]),
                )
            embs.append(np.asarray(e, np.float16)[:real])
            masks.append(np.asarray(m)[:real])
        return TokenIndex.from_arrays(
            np.concatenate(embs), np.concatenate(masks), doc_ids, mesh=self.mesh
        )

    class _CompressedAdapter:
        """CompressedSearcher → Searcher interface: int indices to doc ids."""

        def __init__(self, inner, doc_ids):
            self.inner = inner
            self.doc_ids = doc_ids

        def search(self, Q, remove_zero_rows: bool = False):
            vals, idx = self.inner.search(Q)
            ids = [[self.doc_ids[j] for j in row if j < len(self.doc_ids)]
                   for row in idx]
            return ids, vals

    def evaluate(self, mode: str = "test") -> ConfigDict:
        import jax.numpy as jnp

        self._ensure_eval_fns()
        params = self.current_params()
        Ks = self.config.get_path("model_config.Ks", [5, 10, 20, 50, 100])
        limit = self.config.get_path(f"{mode}.trainer_paras.limit_{'val' if mode=='valid' else 'test'}_batches")

        modules = self.config.get_path("model_config.modules", []) or []
        index = self.build_index()
        k = min(max(Ks), max(index.num_docs, 1))
        # search-path selection mirrors the reference's flag vocabulary
        # (`FLMR_base_executor.py:722-732`): 'exhaustive_search_in_testing'
        # forces exact scoring (our DEFAULT — SURVEY §7 treats the exhaustive
        # branch as ground truth); 'use_compressed_search' opts into the
        # PLAID-role two-stage path for corpora that outgrow fp16 HBM
        if ("use_compressed_search" in modules
                and "exhaustive_search_in_testing" not in modules):
            from ..engine.codec import compress
            from ..engine.plaid import CompressedSearcher

            cidx = compress(
                np.asarray(index.embeddings, np.float32),
                np.asarray(index.mask), index.doc_ids,
                num_centroids=int(self.config.get_path(
                    "model_config.num_centroids", 256)),
            )
            searcher = self._CompressedAdapter(
                CompressedSearcher(cidx, k=k), index.doc_ids)
        elif "use_int8_index" in modules:
            # W8A8 exact retrieval: same exhaustive scan over a per-doc-scaled
            # int8 index (half the HBM, double-rate int8 MXU; `engine/index.py
            # QuantizedTokenIndex`). Rank-faithfulness is pinned by
            # tests/test_quantized_index.py.
            from ..engine.index import QuantizedTokenIndex

            searcher = Searcher(QuantizedTokenIndex.from_token_index(index),
                                k=k)
        else:
            searcher = Searcher(index, k=k)

        # per-source validation sub-indexes (reference `:230-255`): each
        # query retrieves against its own dataset's passage pool
        source_searchers = {}
        if mode == "valid" and self.source_id2doc:
            for src, sub in self.source_id2doc.items():
                if sub:
                    sidx = self.build_index(id2doc=sub)
                    if "use_int8_index" in modules:
                        from ..engine.index import QuantizedTokenIndex

                        sidx = QuantizedTokenIndex.from_token_index(sidx)
                    source_searchers[src] = Searcher(
                        sidx, k=min(max(Ks), max(sidx.num_docs, 1)))

        batch_results: List[dict] = []
        for name, loader in self.eval_dataloaders(mode).items():
            for bi, batch in enumerate(loader):
                if limit and bi >= limit:
                    break
                if "pixel_values" in batch:
                    Q, _ = self._query_fn(
                        params,
                        jnp.asarray(batch["input_ids"]),
                        jnp.asarray(batch["attention_mask"]),
                        jnp.asarray(batch["pixel_values"]),
                    )
                else:
                    Q, _ = self._query_fn_text(
                        params,
                        jnp.asarray(batch["input_ids"]),
                        jnp.asarray(batch["attention_mask"]),
                    )
                ids, scores = searcher.search(Q)
                if source_searchers and "source_name" in batch:
                    # overwrite rows whose source has a dedicated sub-index.
                    # Each group is PADDED to the full batch size (repeat row
                    # 0) so the jitted sub-searcher sees one static Q shape —
                    # variable-length slices would recompile the full corpus
                    # scan per distinct group size
                    B_full = Q.shape[0]
                    by_src = {}
                    for qi, src in enumerate(batch["source_name"]):
                        if src in source_searchers:
                            by_src.setdefault(src, []).append(qi)
                    ids, scores = list(ids), np.array(scores)  # writable copy
                    for src, rows in by_src.items():
                        padded = rows + [rows[0]] * (B_full - len(rows))
                        s_ids, s_scores = source_searchers[src].search(
                            Q[jnp.asarray(padded)])
                        for out_i, qi in enumerate(rows):
                            ids[qi] = s_ids[out_i]
                            k_src = min(scores.shape[1],
                                        np.asarray(s_scores).shape[1])
                            scores[qi, :k_src] = np.asarray(
                                s_scores)[out_i, :k_src]
                real = batch.get("_real_count", len(ids))
                for qi in range(real):
                    entry = {
                        "question_id": batch["question_ids"][qi],
                        "question": batch["questions"][qi],
                        "top_ranking_passages": [
                            {
                                "passage_id": pid,
                                "content": self.id2doc[pid],
                                "score": float(scores[qi][rank]),
                            }
                            for rank, pid in enumerate(ids[qi])
                        ],
                    }
                    if "answers" in batch:
                        entry["answers"] = batch["answers"][qi]
                        entry["gold_answer"] = batch["gold_answer"][qi]
                    if "pos_item_ids" in batch:
                        entry["pos_item_ids"] = batch["pos_item_ids"][qi]
                    batch_results.append(entry)

        data_dict = {"batch_retrieval_result": batch_results, "Ks": Ks}
        log_dict = self.compute_metrics(data_dict)
        log_dict["batch_retrieval_result"] = batch_results
        return log_dict

    def save_hf_model(self, out_dir: str):
        """Export params for downstream use (reference ``save_HF_model``,
        `:1170-1183`) — orbax tree + config json."""
        import json as _json
        import orbax.checkpoint as ocp
        import jax

        os.makedirs(out_dir, exist_ok=True)
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(os.path.join(out_dir, "params")),
            jax.tree_util.tree_map(lambda x: np.asarray(x), self.current_params()),
        )
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            _json.dump(dataclasses.asdict(self.flmr_config), f, default=str)
