"""Reranker executor: train + rerank-eval over static retrieval results.

Parity with `src/executors/Reranker_base_executor.py:80-1201`:

- ``init_retrieve``: static retrieval results (question_id → top passages)
  loaded from json/pkl (`:244-271`); in dummy mode synthesized from the
  corpus (positives + random distractors);
- train-time doc selection: ground-truth positive + sampled retrieved
  negatives (``negative_sample_model_inputs``, `:486-530`) or random
  retrieved docs with binary labels (``sample_model_inputs``, `:532-566`),
  gated by the ``model_config.modules`` flags
  (``train_with_retrieved_docs`` / ``neg_sample_retrieved`` /
  ``interaction_reranker`` / ``preflmr_attention_fusion`` / ``text_only``);
- test: per query, rerank the static top-``docs_to_rerank`` docs with ONE
  batched jit forward (the [Q·K, L] program — the throughput north star),
  sort by logit, keep the raw (retriever-ordered) list for the side-by-side
  rerank-vs-raw metrics (`:651-1030`).
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import random
from typing import Dict, List

import numpy as np

from ..models.rerankers import (
    FullContextRerankModel,
    RerankConfig,
    InteractionRerankModel,
    InteractionRerankConfig,
    DecoderRerankModel,
    DecoderHeadRerankModel,
    DecoderRerankConfig,
)
from ..models.bert import BertConfig
from ..models.tokenization import prepare_full_context_inputs, remove_instruction_prefix
from ..utils.config_system import ConfigDict
from ..utils.registries import register_executor
from .base import BaseExecutor
from .flmr_executor import flmr_config_from

logger = logging.getLogger(__name__)


def warm_start_from_retriever(params, retriever_params):
    """Copy shared FLMR-backbone subtrees from a trained retriever checkpoint
    into a freshly-initialized reranker param tree.

    The reference never trains a monoPreFLMR reranker from scratch: its
    ``RerankModel`` splices the encoders of a PRETRAINED PreFLMR
    (`Reranker_base_executor.py:185-242`, ModelVersion =
    "LinWeizheDragon/PreFLMR_ViT-B"; `rerank_model.py:88-101`) and only the
    cross-encoder head + input mapping start fresh. The module names are
    shared by construction (``context_text_encoder``,
    ``context_vision_encoder``, ``context_vision_projection``,
    ``transformer_mapping_*`` — `models/flmr.py:166-200` ↔
    `models/rerankers/rerank_model.py:92-113`), so warm-starting is a
    top-level key copy. Keys present in both trees must match exactly in
    structure and leaf shapes (loud failure beats silently keeping random
    weights); keys only in the reranker (cross-encoder head, input mapping)
    keep their fresh init.

    Returns (merged_params, restored_key_names).
    """
    import jax

    merged = dict(params)
    restored = []
    for key in params:
        if key not in retriever_params:
            continue
        sub, rsub = params[key], retriever_params[key]
        want = jax.tree_util.tree_structure(sub)
        got = jax.tree_util.tree_structure(rsub)
        if want != got:
            raise ValueError(
                f"reranker backbone warm-start: submodule {key!r} tree "
                "structure differs between the reranker's flmr config and "
                "the retriever checkpoint")
        shapes_ok = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape, sub, rsub))
        if not shapes_ok:
            raise ValueError(
                f"reranker backbone warm-start: submodule {key!r} leaf "
                "shapes differ between the reranker's flmr config and the "
                "retriever checkpoint")
        # Cast restored leaves to the init leaf's dtype so a checkpoint saved
        # in another precision (e.g. bf16) can't splice mixed-precision
        # subtrees into the fp32-initialized reranker params (ADVICE r3).
        merged[key] = jax.tree_util.tree_map(
            lambda a, b: b.astype(a.dtype) if b.dtype != a.dtype else b,
            sub, rsub)
        restored.append(key)
    return merged, restored


@register_executor
class RerankerExecutor(BaseExecutor):
    # ------------------------------------------------------------ model
    def _init_model(self):
        import jax

        mc = self.config.get_path("model_config", ConfigDict())
        self.modules = list(mc.get("modules", []))
        self.Ks = mc.get("Ks", [5, 10, 20, 50, 100])
        self.docs_to_rerank = mc.get("docs_to_rerank", max(self.Ks))
        self.num_negative_samples = mc.get("num_negative_samples", 4)
        self.fusion_multiplier = mc.get("fusion_multiplier", 1.0)
        self._rng = random.Random(self.config.get_path("meta.seed", 42) or 42)

        ce_cfg = BertConfig(**mc.get("cross_encoder", {"num_hidden_layers": 1}))
        loss_fn = mc.get("loss_fn", "BCE")
        pos_weight = mc.get("pos_weight")
        if "weighted_regression" in self.modules and pos_weight is None:
            # reference `Reranker_base_executor.py:196-199`: weight the BCE
            # positive class by the group size (1 pos : N negs); an explicit
            # pos_weight in the config wins over the flag's derived value
            pos_weight = float(self.num_negative_samples + 1)

        if "interaction_reranker" in self.modules:
            self.reranker_family = "interaction"
            # fusion×MORES is supported here (the reference's MORESSym raises
            # NotImplementedError at runtime, `mores_model.py:74-75`, even
            # though `interaction_rerank_model.py:131-156` builds the bias):
            # the fusion block decomposes onto MORES's factored attention —
            # see ``MORESSym`` in `models/rerankers/interaction.py`.
            self.reranker_config = InteractionRerankConfig(
                cross_encoder=ce_cfg,
                interaction_type=mc.get("interaction_type", "CrossEncoder"),
                loss_fn=loss_fn,
                pos_weight=pos_weight,
                late_interaction_dim=mc.get("late_interaction_dim", 128),
            )
            self.reranker = InteractionRerankModel(self.reranker_config)
        elif "decoder_reranker" in self.modules:
            self.reranker_family = "decoder"
            dec_kwargs = dict(mc.get("decoder", {}))
            backbone = dec_kwargs.pop("backbone", "native")
            if backbone in ("blip2", "blip2_opt"):
                # the reference's actual backbones: BLIP-2 (vision + Q-Former
                # + LoRA'd LM), `decoder_rerank_model.py:89-120` — Flan-T5
                # (`monoBLIP2-T5_*.jsonnet`) or the best-scoring OPT
                # (`monoBLIP2-Opt_pointwise.jsonnet:115`, R@5 0.40)
                from ..models.blip2 import (
                    Blip2Config, Blip2VisionConfig, Blip2QFormerConfig,
                )
                from ..models.opt import OPTConfig
                from ..models.t5 import T5Config
                from ..models.rerankers import (
                    Blip2DecoderRerankModel, Blip2DecoderHeadRerankModel,
                    Blip2RerankConfig,
                )

                text_cls = OPTConfig if backbone == "blip2_opt" else T5Config
                blip2_cfg = Blip2Config(
                    vision_config=Blip2VisionConfig(
                        **dec_kwargs.pop("vision_config", {})
                    ),
                    qformer_config=Blip2QFormerConfig(
                        **dec_kwargs.pop("qformer_config", {})
                    ),
                    text_config=text_cls(**dec_kwargs.pop("text_config", {})),
                    num_query_tokens=dec_kwargs.pop("num_query_tokens", 32),
                )
                self.reranker_config = Blip2RerankConfig(
                    blip2=blip2_cfg, loss_fn=loss_fn, pos_weight=pos_weight,
                    **dec_kwargs,
                )
                # `decoder_head` selects Model B (`DecoderHeadRerankModel`,
                # the reference's *_pointwise configs); the default Model A
                # yes/no scoring is the *_textgen mode
                # (`monoBLIP2-Opt_textgen.jsonnet:112-118`, loss_fn=seq2seq)
                blip2_cls = (
                    Blip2DecoderHeadRerankModel
                    if mc.get("decoder_head", False)
                    else Blip2DecoderRerankModel
                )
                self.reranker = blip2_cls(self.reranker_config)
            else:
                self.reranker_config = DecoderRerankConfig(
                    text_config=BertConfig(**dec_kwargs.pop("text_config", {})),
                    loss_fn=loss_fn, pos_weight=pos_weight, **dec_kwargs,
                )
                cls = (
                    DecoderHeadRerankModel
                    if mc.get("decoder_head", False)
                    else DecoderRerankModel
                )
                self.reranker = cls(self.reranker_config)
            ckpt_dir = mc.get("decoder_checkpoint_dir")
            if (ckpt_dir and os.path.isdir(ckpt_dir)
                    and backbone in ("blip2", "blip2_opt")):
                from ..models.hf_bridge import (
                    load_torch_checkpoint_dir, blip2_params,
                )

                logger.info("bridging BLIP-2 checkpoint from %s", ckpt_dir)
                self._bridged_decoder_params = {
                    "model": blip2_params(
                        load_torch_checkpoint_dir(ckpt_dir),
                        self.reranker_config.blip2,
                    )
                }
            else:
                self._bridged_decoder_params = None
        else:
            # encoder family: joint-retokenization FullContext when flagged,
            # otherwise the spliced-query RerankModel — the reference's
            # module→class mapping (`Reranker_base_executor.py:151-183`)
            flmr_cfg = flmr_config_from(
                mc,
                query_tokenizer=self.tokenizers.get("tokenizer"),
                context_tokenizer=self.tokenizers.get("decoder_tokenizer"),
            )
            self.reranker_config = RerankConfig(
                flmr=flmr_cfg,
                cross_encoder=ce_cfg,
                loss_fn=loss_fn,
                pos_weight=pos_weight,
                max_query_length=mc.get("max_query_length", 32),
                max_decoder_source_length=mc.get("max_decoder_source_length", 512),
            )
            if "full_context_reranker" in self.modules:
                self.reranker_family = "full_context"
                self.reranker = FullContextRerankModel(self.reranker_config)
            else:
                from ..models.rerankers import RerankModel

                self.reranker_family = "spliced"
                self.reranker = RerankModel(self.reranker_config)

        # frozen retriever for interaction / attention-fusion modules
        self.retriever = None
        if self.reranker_family == "interaction" or "preflmr_attention_fusion" in self.modules:
            from ..models import FLMRModelForRetrieval

            # model_config.retriever_flmr (optional) lets the FROZEN
            # retriever differ from the reranker's own FLMR — the reference
            # always pairs its rerankers with the same pretrained PreFLMR
            # regardless of reranker architecture
            # (`Reranker_base_executor.py:210-241`), e.g. a vision-enabled
            # reranker biased by a text-only retriever's scores
            r_mc = mc
            if mc.get("retriever_flmr"):
                r_mc = ConfigDict(dict(mc, flmr=mc["retriever_flmr"]))
            self.retriever_config = flmr_config_from(
                r_mc,
                query_tokenizer=self.tokenizers.get("tokenizer"),
                context_tokenizer=self.tokenizers.get("decoder_tokenizer"),
            )
            self.retriever = FLMRModelForRetrieval(self.retriever_config)

        self._setup_corpus()
        self.init_retrieve()
        self.params = self._init_params()
        self._train_state = None
        self._rerank_fn = None

    def _setup_corpus(self):
        self.id2doc: Dict[str, str] = {}
        passages = self.prepared_data.get("passages")
        if passages and "id2doc" in passages:
            self.id2doc = dict(passages["id2doc"])
        else:
            for loaders in self.data_loaders.values():
                for loader in loaders.values():
                    ds = getattr(loader, "dataset", None)
                    if ds is not None and getattr(ds, "passages", None):
                        self.id2doc.update(ds.passages["id2doc"])

    def _init_params(self):
        import jax

        key = jax.random.PRNGKey(self.config.get_path("meta.seed", 42) or 42)
        batch = self._example_inputs(batch_size=1, nway=2)
        variables = self.reranker.init(key, **batch, num_negative_examples=1)
        params = variables["params"]
        if getattr(self, "_bridged_decoder_params", None):
            # merge INTO the initialized tree: the bridge carries only the
            # backbone ({"model": ...}); decoder_head rerankers also own
            # classifier1/classifier2, which must keep their fresh init
            params = {**params, **self._bridged_decoder_params}
            self._bridged_decoder_params = None
        bpath = self.config.get_path("model_config.reranker_backbone_path",
                                     None)
        if bpath:
            # warm-start the spliced FLMR encoders from a trained retriever
            # checkpoint — the reference's standing recipe (its rerankers
            # always reuse a pretrained PreFLMR's encoders; only the
            # cross-encoder head trains from scratch)
            from ..training.checkpointing import CheckpointManager

            restored_ckpt = CheckpointManager.restore(bpath)
            rparams = restored_ckpt.get("params", restored_ckpt)
            params, restored = warm_start_from_retriever(params, rparams)
            if not restored:
                raise ValueError(
                    f"reranker_backbone_path {bpath}: no shared FLMR "
                    "submodules found to warm-start")
            # re-pin on device: the merged subtrees are host arrays from the
            # checkpoint and would otherwise re-upload on every train step
            import jax as _jax

            params = _jax.device_put(params)
            logger.info("warm-started reranker backbone from %s: %s",
                        bpath, restored)
        self._retriever_params = None
        if self.retriever is not None:
            img = self.retriever_config.vision_config.image_size
            import jax.numpy as jnp

            rb = dict(
                query_input_ids=jnp.ones((1, 8), jnp.int32),
                query_attention_mask=jnp.ones((1, 8), jnp.int32),
                query_pixel_values=(
                    jnp.zeros((1, 3, img, img), jnp.float32)
                    if self.retriever_config.use_vision_encoder else None
                ),
                context_input_ids=jnp.ones((2, 8), jnp.int32),
                context_attention_mask=jnp.ones((2, 8), jnp.int32),
            )
            self._retriever_params = self.retriever.init(key, **rb)["params"]
            rpath = self.config.get_path("model_config.retriever_model_path", None)
            if rpath:
                # the reference loads a PRETRAINED frozen retriever
                # (`Reranker_base_executor.py:210-241`, ModelVersion =
                # "LinWeizheDragon/PreFLMR_ViT-B"); here the equivalent is a
                # trained FLMRExecutor orbax checkpoint ({"params": <FLMR
                # tree>}). Restoring into the freshly-initialized tree keeps
                # the structure check: a mismatched retriever config fails
                # loudly instead of silently scoring with random weights.
                from ..training.checkpointing import CheckpointManager

                restored = CheckpointManager.restore(rpath)
                rparams = restored.get("params", restored)
                import jax as _jax

                got = _jax.tree_util.tree_structure(rparams)
                want = _jax.tree_util.tree_structure(self._retriever_params)
                if got != want:
                    raise ValueError(
                        f"retriever_model_path {rpath}: checkpoint param tree "
                        "does not match model_config.flmr (frozen retriever)")
                # device_put once — the frozen retriever runs inside every
                # train/eval step, and a host-resident tree would re-upload
                # per call (see FLMRExecutor.current_params)
                self._retriever_params = _jax.device_put(rparams)
                logger.info("loaded frozen retriever from %s", rpath)
        return params

    def _example_inputs(self, batch_size: int, nway: int):
        import jax.numpy as jnp

        if self.reranker_family == "interaction":
            dim = self.reranker_config.late_interaction_dim
            return dict(
                query_late_interaction=jnp.zeros((batch_size, 8, dim), jnp.float32),
                context_late_interaction=jnp.zeros((batch_size * nway, 12, dim), jnp.float32),
                query_mask=jnp.ones((batch_size, 8), jnp.int32),
                context_mask=jnp.ones((batch_size * nway, 12), jnp.int32),
            )
        if self.reranker_family == "decoder":
            vc = (
                self.reranker_config.blip2.vision_config
                if hasattr(self.reranker_config, "blip2")
                else self.reranker_config.vision_config
            )
            return dict(
                input_ids=jnp.ones((batch_size * nway, 16), jnp.int32),
                attention_mask=jnp.ones((batch_size * nway, 16), jnp.int32),
                pixel_values=jnp.zeros(
                    (batch_size, 3, vc.image_size, vc.image_size), jnp.float32,
                ),
            )
        img = self.reranker_config.flmr.vision_config.image_size
        L = self.reranker_config.max_decoder_source_length
        if self.reranker_family == "spliced":
            qlen = self.config.get_path("model_config.max_query_length", 32)
            dlen = self.config.get_path("model_config.doc_maxlen", 64)
            return dict(
                query_input_ids=jnp.ones((batch_size, qlen), jnp.int32),
                query_attention_mask=jnp.ones((batch_size, qlen), jnp.int32),
                query_pixel_values=(
                    None if "text_only" in self.modules
                    else jnp.zeros((batch_size, 3, img, img), jnp.float32)
                ),
                context_input_ids=jnp.ones((batch_size * nway, dlen), jnp.int32),
                context_attention_mask=jnp.ones((batch_size * nway, dlen), jnp.int32),
            )
        return dict(
            input_ids=jnp.ones((batch_size * nway, L), jnp.int32),
            attention_mask=jnp.ones((batch_size * nway, L), jnp.int32),
            token_type_ids=jnp.zeros((batch_size * nway, L), jnp.int32),
            query_pixel_values=(
                None if "text_only" in self.modules
                else jnp.zeros((batch_size, 3, img, img), jnp.float32)
            ),
        )

    # -------------------------------------------------- static retrieval
    def init_retrieve(self):
        """Reference `:244-271`."""
        path = self.config.get_path("model_config.retrieve_result_path")
        self.questionId2topPassages: Dict[str, List[dict]] = {}
        # transparent .gz fallback: large static-retrieval dumps are
        # committed gzipped (git-friendly) while configs keep pointing at
        # the plain path — a fresh checkout works without a manual gunzip
        if path and not os.path.exists(path) and os.path.exists(path + ".gz"):
            path = path + ".gz"
        if path and os.path.exists(path):
            if path.endswith(".json.gz"):
                import gzip
                with gzip.open(path, "rt") as f:
                    loaded = json.load(f)
            elif path.endswith(".json"):
                with open(path) as f:
                    loaded = json.load(f)
            else:
                with open(path, "rb") as f:
                    loaded = pickle.load(f)
            # accepted shapes: {qid: [{passage_id, score}...]}, the
            # prediction-dump format from FLMRExecutor.logging_results, or a
            # reference-produced dump ({"output": [...]}, the layout
            # `src/tools/reduce_retrieval_result_file_size.py` pickles)
            if "predictions" in loaded or "output" in loaded:
                # branch on key presence, not truthiness: a framework dump
                # with an empty predictions list is valid and must not fall
                # through to a KeyError on "output"
                entries = (loaded["predictions"] if "predictions" in loaded
                           else loaded["output"])
                for entry in entries:
                    self.questionId2topPassages[str(entry["question_id"])] = entry[
                        "top_ranking_passages"
                    ]
            else:
                self.questionId2topPassages = {str(k): v for k, v in loaded.items()}
        elif self.use_dummy_data:
            self._synthesize_static_retrieval()
        else:
            logger.warning("no static retrieval results configured")

    def _synthesize_static_retrieval(self):
        all_ids = list(self.id2doc.keys())
        for loaders in self.data_loaders.values():
            for loader in loaders.values():
                ds = getattr(loader, "dataset", None)
                table = getattr(ds, "dataset", None)
                if table is None:
                    continue
                for row in table:
                    qid = str(row["question_id"])
                    if qid in self.questionId2topPassages:
                        continue
                    pos = list(row.get("pos_item_ids", []))
                    pos_set = set(pos)
                    # only docs_to_rerank docs survive the slice — stop the
                    # corpus scan there instead of materializing all of it
                    pool = list(pos)
                    for p in all_ids:
                        if len(pool) >= self.docs_to_rerank:
                            break
                        if p not in pos_set:
                            pool.append(p)
                    pool = pool[: self.docs_to_rerank]
                    self._rng.shuffle(pool)
                    self.questionId2topPassages[qid] = [
                        {"passage_id": p, "content": self.id2doc[p], "score": 1.0}
                        for p in pool
                    ]

    def static_retrieve(self, question_id) -> List[dict]:
        """Reference `:1032-1054`; lists shorter than K pad by replication
        (reference `FLMR_base_executor.py:1006-1015`). Entries from reduced
        static files (`tools/reduce_retrieval_file.py` strips ``content``,
        mirroring `src/tools/reduce_retrieval_result_file_size.py`) get their
        content re-resolved from the passage corpus, as the reference does
        via its own ``passage_id2doc`` lookup."""
        docs = self.questionId2topPassages.get(str(question_id), [])
        resolved = []
        for d in docs[: self.docs_to_rerank]:
            if "content" in d:
                resolved.append(d)
                continue
            # reference dumps may carry int passage ids while the corpus is
            # keyed by str (or vice versa) — normalize instead of silently
            # handing the reranker an empty passage
            pid = d["passage_id"]
            content = self.id2doc.get(pid)
            if content is None:
                content = self.id2doc.get(str(pid))
            if content is None:
                logger.warning(
                    "static-retrieval passage id %r absent from corpus; "
                    "reranking it as empty text", pid)
                content = ""
            resolved.append({**d, "content": content})
        docs = resolved
        while docs and len(docs) < self.docs_to_rerank:
            docs = docs + docs[: self.docs_to_rerank - len(docs)]
        return docs

    # ------------------------------------------------------------ train
    def prepare_training(self, total_steps: int):
        import jax
        import optax

        tx, _ = self.build_optimizer(self.params, total_steps)
        self._tx = tx
        self._opt_state = tx.init(self.params)
        packed = getattr(self, "_restored_opt_state", None)
        if packed:
            from ..training.checkpointing import unpack_opt_state

            self._opt_state = unpack_opt_state(self._opt_state, packed)
            self._restored_opt_state = None
        nway = self.num_negative_samples + 1

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                out = self.reranker.apply(
                    {"params": p}, **batch,
                    num_negative_examples=self.num_negative_samples,
                )
                return out.loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

    def _select_training_docs(self, qid, pos_ids):
        """negative_sample vs sample modes (reference `:486-566`)."""
        retrieved = [d["passage_id"] for d in self.static_retrieve(qid)]
        if not retrieved:
            retrieved = list(self.id2doc.keys())[: self.docs_to_rerank]
        if "neg_sample_retrieved" in self.modules or "train_with_retrieved_docs" not in self.modules:
            # 1 positive + N negatives, both RANDOMLY sampled from the
            # retrieved list (reference `negative_sample_model_inputs`,
            # `Reranker_base_executor.py:486-531`: `local_random.sample`).
            # Sampling matters: with a deterministic top-N slice the model
            # only ever sees the same num_negative_samples docs per query and
            # the remaining retrieved candidates are out-of-distribution at
            # eval time — rerank then *degrades* the raw order.
            pos_set = set(pos_ids)
            retrieved_pos = [p for p in retrieved if p in pos_set]
            if retrieved_pos:
                pos = self._rng.choice(retrieved_pos)
            elif pos_ids:
                pos = self._rng.choice(pos_ids)
            else:
                pos = retrieved[0]
            negs = [p for p in retrieved if p not in pos_set]
            if len(negs) < self.num_negative_samples:
                # top up from the corpus, stopping once we have enough —
                # never materialize an 80k-element list per training sample
                for p in self.id2doc:
                    if len(negs) >= self.num_negative_samples:
                        break
                    if p not in pos_set:
                        negs.append(p)
            elif len(negs) > self.num_negative_samples:
                negs = self._rng.sample(negs, self.num_negative_samples)
            selected = [pos] + negs[: self.num_negative_samples]
            labels = [1] + [0] * self.num_negative_samples
        else:
            # random N+1 retrieved docs with binary labels (`:532-566`)
            selected = self._rng.sample(retrieved, min(len(retrieved), self.num_negative_samples + 1))
            while len(selected) < self.num_negative_samples + 1:
                selected.append(selected[-1])
            labels = [1 if p in set(pos_ids) else 0 for p in selected]
        return selected, labels

    def training_step(self, batch) -> Dict[str, float]:
        import jax.numpy as jnp

        nway = self.num_negative_samples + 1
        doc_ids, labels = [], []
        for qi, qid in enumerate(batch["question_ids"]):
            pos = (batch.get("pos_item_ids") or
                   [[]] * len(batch["question_ids"]))[qi]
            sel, lab = self._select_training_docs(qid, [p for p in pos if p])
            doc_ids.extend(sel)
            labels.extend(lab)
        contents = [self.id2doc.get(d, "") for d in doc_ids]
        queries = [remove_instruction_prefix(q) for q in batch["questions"]]

        model_batch = self._build_rerank_inputs(batch, queries, contents, nway)
        if "train_with_retrieved_docs" in self.modules and "neg_sample_retrieved" not in self.modules:
            model_batch["labels"] = jnp.asarray(labels, jnp.float32)
        self.params, self._opt_state, loss = self._step(
            self.params, self._opt_state, model_batch
        )
        return {"loss": float(np.asarray(loss))}

    def _build_rerank_inputs(self, batch, queries, contents, nway):
        import jax.numpy as jnp

        if self.reranker_family == "interaction":
            model_batch = self._interaction_inputs(batch, contents, nway)
            self._maybe_attach_fusion(model_batch, batch, contents, nway)
            return model_batch
        if self.reranker_family == "spliced":
            # raw query tokens + separately tokenized contexts; the model
            # splices them (reference `rerank_model.py:204-224`)
            ct = self.tokenizers["decoder_tokenizer"]
            dlen = self.config.get_path("model_config.doc_maxlen", 64)
            enc_d = ct(contents, max_length=dlen)
            model_batch = dict(
                query_input_ids=jnp.asarray(batch["input_ids"]),
                query_attention_mask=jnp.asarray(batch["attention_mask"]),
                query_pixel_values=(
                    None
                    if "text_only" in self.modules or "pixel_values" not in batch
                    else jnp.asarray(batch["pixel_values"])
                ),
                context_input_ids=jnp.asarray(enc_d["input_ids"]),
                context_attention_mask=jnp.asarray(enc_d["attention_mask"]),
            )
            self._maybe_attach_fusion(model_batch, batch, contents, nway)
            return model_batch
        if self.reranker_family == "decoder":
            from ..models.rerankers.decoder import prepare_decoder_rerank_inputs

            tok = getattr(self.tokenizers.get("decoder_tokenizer"), "tok", None)
            cfg = self.reranker_config
            enc = prepare_decoder_rerank_inputs(
                queries, contents, tok,
                max_query_length=self.config.get_path("model_config.max_query_length", 32),
                max_context_length=self.config.get_path("model_config.max_context_length", 64),
                max_decoder_source_length=self.config.get_path(
                    "model_config.max_decoder_source_length", 128
                ),
                docs_per_query=nway,
            )
            out = {
                "input_ids": jnp.asarray(enc["input_ids"]),
                "attention_mask": jnp.asarray(enc["attention_mask"]),
                "pixel_values": (
                    jnp.asarray(batch["pixel_values"])
                    if "pixel_values" in batch else None
                ),
            }
            return out
        # full-context
        cfg = self.reranker_config
        tok = getattr(self.tokenizers.get("tokenizer"), "tok", None) or getattr(
            self.tokenizers.get("decoder_tokenizer"), "tok", None
        )
        enc = prepare_full_context_inputs(
            queries, contents, tok,
            max_query_length=cfg.max_query_length,
            max_context_length=cfg.max_context_length,
            max_decoder_source_length=cfg.max_decoder_source_length,
            docs_per_query=nway,
        )
        out = {
            "input_ids": jnp.asarray(enc["input_ids"]),
            "attention_mask": jnp.asarray(enc["attention_mask"]),
            "token_type_ids": jnp.asarray(enc["token_type_ids"]),
            "query_pixel_values": (
                None if "text_only" in self.modules or "pixel_values" not in batch
                else jnp.asarray(batch["pixel_values"])
            ),
        }
        return out

    def _maybe_attach_fusion(self, model_batch, batch, contents, nway):
        """PreFLMR attention fusion: the frozen retriever's masked token-score
        matrix becomes an additive attention bias in the cross-encoder
        (reference `Reranker_base_executor.py:590-592` →
        `rerank_model.py:276-319`)."""
        if "preflmr_attention_fusion" not in self.modules:
            return
        import jax.numpy as jnp

        assert self.retriever is not None
        ct = self.tokenizers["decoder_tokenizer"]
        dlen = self.config.get_path("model_config.doc_maxlen", 64)
        if "context_input_ids" in model_batch:
            ctx_ids = model_batch["context_input_ids"]
            ctx_mask = model_batch["context_attention_mask"]
        else:
            enc_d = ct(contents, max_length=dlen)
            ctx_ids = jnp.asarray(enc_d["input_ids"])
            ctx_mask = jnp.asarray(enc_d["attention_mask"])
        out = self.retriever.apply(
            {"params": self._retriever_params},
            query_input_ids=jnp.asarray(batch["input_ids"]),
            query_attention_mask=jnp.asarray(batch["attention_mask"]),
            # text_only suppresses vision end-to-end: the frozen retriever's
            # token-score matrix must carry the same query rows as the
            # text-only reranker it biases
            query_pixel_values=(
                jnp.asarray(batch["pixel_values"])
                if "pixel_values" in batch
                and "text_only" not in self.modules
                and self.retriever_config.use_vision_encoder else None
            ),
            context_input_ids=ctx_ids,
            context_attention_mask=ctx_mask,
            num_negative_examples=nway - 1,
            use_in_batch_negatives=False,
        )
        model_batch["preflmr_scores"] = out.scores_raw
        model_batch["fusion_multiplier"] = self.fusion_multiplier

    def _interaction_inputs(self, batch, contents, nway):
        """Run the frozen retriever to produce late-interaction features
        (reference `:579-587`)."""
        import jax
        import jax.numpy as jnp

        assert self.retriever is not None
        ct = self.tokenizers["decoder_tokenizer"]
        dlen = self.config.get_path("model_config.doc_maxlen", 64)
        enc_d = ct(contents, max_length=dlen)
        qout = self.retriever.apply(
            {"params": self._retriever_params},
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            pixel_values=(
                jnp.asarray(batch["pixel_values"])
                if "pixel_values" in batch
                and "text_only" not in self.modules
                and self.retriever_config.use_vision_encoder else None
            ),
            method=type(self.retriever).query,
        )
        dout = self.retriever.apply(
            {"params": self._retriever_params},
            jnp.asarray(enc_d["input_ids"]),
            jnp.asarray(enc_d["attention_mask"]),
            method=type(self.retriever).doc,
        )
        return dict(
            query_late_interaction=qout.late_interaction_output,
            context_late_interaction=dout.late_interaction_output,
            query_mask=qout.query_mask,
            context_mask=dout.context_mask.astype(jnp.int32),
        )

    def state_to_save(self):
        from ..training.checkpointing import pack_opt_state

        state = {"params": self.params, "step": np.asarray(self.global_step)}
        if getattr(self, "_opt_state", None) is not None:
            state["opt_state"] = pack_opt_state(self._opt_state)
        return state

    def load_checkpoint(self, path: str):
        from ..training.checkpointing import CheckpointManager

        restored = CheckpointManager.restore(path)
        # device_put once: restored host arrays fed straight to the jitted
        # eval fns would re-upload the whole param tree per batch (see
        # FLMRExecutor.current_params — at full model scale this stalls the
        # rerank eval loop behind ~GBs of repeated device-link transfers)
        import jax

        self.params = jax.device_put(restored.get("params", restored))
        # optimizer state is rebuilt against tx.init in prepare_training —
        # stash the packed leaves until then
        self._restored_opt_state = restored.get("opt_state") if isinstance(restored, dict) else None
        step = restored.get("step") if isinstance(restored, dict) else None
        if step is not None:
            self.global_step = int(np.asarray(step))

    # ------------------------------------------------------------- eval
    def _fast_validate(self, limit) -> ConfigDict:
        """Loss-only validation — the reference's ``fast_evaluate_outputs``
        path (`Reranker_base_executor.py:641-645`). Doc selection mirrors
        training (static retrieval; the ``test_with_retrieved_docs`` flag
        adds sampled-doc labels exactly like ``train_with_retrieved_docs``,
        reference `:730-751`)."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_val_loss_fn", None) is None:

            @jax.jit
            def _loss(params, model_batch):
                out = self.reranker.apply(
                    {"params": params}, **model_batch,
                    num_negative_examples=self.num_negative_samples,
                )
                return out.loss

            self._val_loss_fn = _loss

        nway = self.num_negative_samples + 1
        loss_sum, weight_sum = 0.0, 0.0
        for name, loader in self.eval_dataloaders("valid").items():
            for bi, batch in enumerate(loader):
                if limit and bi >= limit:
                    break
                # drop padding-duplicated tail rows BEFORE building model
                # inputs: a batch-mean loss over padded rows over-weights
                # the duplicated samples no matter how the mean is
                # re-weighted afterwards (one extra compile for the tail
                # shape, once per loader)
                real = batch.get("_real_count", len(batch["question_ids"]))
                nb = len(batch["question_ids"])
                if real < nb:
                    batch = {
                        k: (v[:real] if hasattr(v, "__len__")
                            and len(v) == nb else v)
                        for k, v in batch.items()
                    }
                doc_ids, labels = [], []
                for qi, qid in enumerate(batch["question_ids"]):
                    pos = (batch.get("pos_item_ids") or
                           [[]] * len(batch["question_ids"]))[qi]
                    sel, lab = self._select_training_docs(
                        qid, [p for p in pos if p])
                    doc_ids.extend(sel)
                    labels.extend(lab)
                contents = [self.id2doc.get(d, "") for d in doc_ids]
                queries = [remove_instruction_prefix(q)
                           for q in batch["questions"]]
                model_batch = self._build_rerank_inputs(
                    batch, queries, contents, nway)
                if ("test_with_retrieved_docs" in self.modules
                        or ("train_with_retrieved_docs" in self.modules
                            and "neg_sample_retrieved" not in self.modules)):
                    model_batch["labels"] = jnp.asarray(labels, jnp.float32)
                loss = float(np.asarray(
                    self._val_loss_fn(self.params, model_batch)))
                # the batch now holds real rows only, so the per-batch mean
                # is unbiased; weight by its row count
                loss_sum += loss * real
                weight_sum += real
        out = ConfigDict(metrics={}, artifacts={})
        out.metrics["loss"] = loss_sum / weight_sum if weight_sum else 0.0
        return out

    def evaluate(self, mode: str = "test") -> ConfigDict:
        import jax
        import jax.numpy as jnp

        limit = self.config.get_path(
            f"{mode}.trainer_paras.limit_{'val' if mode=='valid' else 'test'}_batches"
        )
        if mode == "valid" and "full_validation" not in self.modules:
            # reference default (`Reranker_base_executor.py:641-645`):
            # validation computes loss only; the full rerank runs only when
            # the 'full_validation' module flag is set
            return self._fast_validate(limit)
        K = self.docs_to_rerank
        batch_results: List[dict] = []

        # the [B·K, L] joint forward that replaces the reference's per-query
        # loop (`Reranker_base_executor.py:785-935`): chunked so HBM holds one
        # chunk's activations, sharded over the mesh's data axis when present
        # (the reference instead *halves* batches on OOM, `:838-919`, and
        # leaves other GPUs idle)
        chunk_size = self.config.get_path("model_config.eval_chunk_size", 64)
        if "split_testing_batch" in self.modules:
            # reference `:838-919` halves OOM-ing test batches at runtime;
            # here the static equivalent is a half-size scan chunk (applies
            # to the chunked full_context program — the other families run
            # one [B·K] forward with no chunk knob)
            chunk_size = max(1, chunk_size // 2)
        if self.reranker_family == "full_context":
            # rebuild when the chunk geometry changed (e.g. a prior
            # validation built the fn before split_testing_batch applied)
            if self._rerank_fn is None or getattr(
                    self, "_rerank_chunk", None) != chunk_size:
                from ..engine import make_chunked_rerank_fn

                self._rerank_fn = make_chunked_rerank_fn(
                    self.reranker, nway=K, chunk_size=chunk_size, mesh=self.mesh
                )
                self._rerank_chunk = chunk_size
            chunked = self._rerank_fn

            def fwd(params, model_batch):
                return chunked(
                    params,
                    model_batch["input_ids"],
                    model_batch["attention_mask"],
                    model_batch["token_type_ids"],
                    model_batch.get("query_pixel_values"),
                )
        else:
            if self._rerank_fn is None:
                @jax.jit
                def plain_fwd(params, model_batch):
                    out = self.reranker.apply(
                        {"params": params}, **model_batch,
                        num_negative_examples=K - 1,
                    )
                    return out.logits

                self._rerank_fn = plain_fwd
            fwd = self._rerank_fn

        for name, loader in self.eval_dataloaders(mode).items():
            for bi, batch in enumerate(loader):
                if limit and bi >= limit:
                    break
                n_rows = len(batch["question_ids"])
                real = batch.get("_real_count", n_rows)
                # queries with no static retrieval results keep a placeholder
                # doc list and are *marked*, not dropped — dropping silently
                # overstates coverage in the metrics
                per_q_docs = []
                for qi in range(n_rows):
                    docs = self.static_retrieve(batch["question_ids"][qi])
                    per_q_docs.append(docs)
                fallback = [
                    {"passage_id": p, "content": self.id2doc[p], "score": 0.0}
                    for p in list(self.id2doc.keys())[:K]
                ]
                contents, queries = [], []
                for qi in range(n_rows):
                    docs = per_q_docs[qi] or fallback
                    per_q_docs[qi] = docs
                    contents.extend(d["content"] for d in docs)
                    queries.append(remove_instruction_prefix(batch["questions"][qi]))
                model_batch = self._build_rerank_inputs(batch, queries, contents, K)
                logits = np.asarray(fwd(self.params, model_batch)).reshape(n_rows, K)
                for qi in range(real):
                    docs = per_q_docs[qi]
                    missing_static = not self.questionId2topPassages.get(
                        str(batch["question_ids"][qi])
                    )
                    row = logits[qi]
                    order = np.argsort(-row)
                    entry = {
                        "question_id": batch["question_ids"][qi],
                        "question": batch["questions"][qi],
                        "top_ranking_passages": [
                            {
                                "passage_id": docs[j]["passage_id"],
                                "content": docs[j]["content"],
                                "score": float(row[j]),
                            }
                            for j in order
                        ],
                        "raw_top_ranking_passages": [
                            {"passage_id": d["passage_id"], "content": d["content"],
                             "score": float(d.get("score", 0.0))}
                            for d in docs
                        ],
                    }
                    if missing_static:
                        entry["static_retrieval_missing"] = True
                    if "answers" in batch:
                        entry["answers"] = batch["answers"][qi]
                        entry["gold_answer"] = batch["gold_answer"][qi]
                    if "pos_item_ids" in batch:
                        entry["pos_item_ids"] = batch["pos_item_ids"][qi]
                    batch_results.append(entry)

        data_dict = {"batch_retrieval_result": batch_results, "Ks": self.Ks}
        log_dict = self.compute_metrics(data_dict)
        log_dict["batch_retrieval_result"] = batch_results
        return log_dict
