"""Distillation score preparation (reference
`src/data_ops/distillation_data_ops.py:51-432`): attach teacher retrieval
scores per (question, document) for student training."""

from __future__ import annotations

import json
import os
import pickle

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform


@register_transform_functor
class PrepareDistillationScores(HFDatasetTransform):
    """Attach teacher retrieval scores per (question, negatives) group.

    Two modes mirroring the reference (`distillation_data_ops.py:51-432`):
    - **precomputed**: load a {question_id: [{passage_id, score}...]} json/pkl
      (the role of the reference's ElasticSearch cache);
    - **live teacher**: run the framework's FLMR teacher (bridged checkpoint
      dir or an explicit config) over 1 positive + ``num_negatives`` sampled
      negatives per question and record the MaxSim scores — the reference's
      GPU scoring loop (`:230-390`) as one jitted TPU batch program.
    """

    def setup(self, teacher_scores_path=None, docs_per_query: int = 10,
              model_checkpoint_dir=None, flmr_config=None,
              num_negatives: int = 4, splits_to_process=("train",),
              query_maxlen: int = 32, doc_maxlen: int = 64, seed: int = 42,
              **kwargs):
        self.teacher_scores_path = teacher_scores_path
        self.docs_per_query = docs_per_query
        self.model_checkpoint_dir = model_checkpoint_dir
        self.flmr_config = flmr_config
        self.num_negatives = num_negatives
        self.splits_to_process = list(splits_to_process)
        self.query_maxlen = query_maxlen
        self.doc_maxlen = doc_maxlen
        self.seed = seed
        return self

    def _call(self, data):
        if self.teacher_scores_path and os.path.exists(self.teacher_scores_path):
            return self._attach_precomputed(data)
        if self.flmr_config or self.model_checkpoint_dir:
            return self._score_live(data)
        return data

    def _attach_precomputed(self, data):
        if self.teacher_scores_path.endswith(".json"):
            with open(self.teacher_scores_path) as f:
                scores = json.load(f)
        else:
            with open(self.teacher_scores_path, "rb") as f:
                scores = pickle.load(f)

        def attach(example):
            entry = scores.get(str(example["question_id"]), [])
            example["teacher_doc_ids"] = [e["passage_id"] for e in entry][: self.docs_per_query]
            example["teacher_scores"] = [e.get("score", 0.0) for e in entry][: self.docs_per_query]
            return example

        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            data[split] = data[split].map(attach, load_from_cache_file=False)
        return data

    def _score_live(self, data):
        import random

        import jax
        import jax.numpy as jnp
        import numpy as np

        from ...models import FLMRModelForRetrieval
        from ...models.flmr import FLMRConfig
        from ...models.bert import BertConfig
        from ...models.vit import CLIPVisionConfig
        from ...models.tokenization import tiny_bert_tokenizer, FLMRQueryTokenizer, FLMRContextTokenizer
        from ...ops.maxsim import colbert_score

        fc = dict(self.flmr_config or {})
        cfg = FLMRConfig(
            text_config=BertConfig(**fc.pop("text_config", {})),
            vision_config=CLIPVisionConfig(**fc.pop("vision_config", {})),
            **fc,
        )
        model = FLMRModelForRetrieval(cfg)
        rng = random.Random(self.seed)

        # tokenizers: framework FLMR tokenizers over the standard vocab (the
        # reference loads them from the checkpoint's subfolders)
        from transformers import BertTokenizerFast

        try:
            # local cache only — zero-egress environments must fail fast
            base_tok = BertTokenizerFast.from_pretrained(
                "bert-base-uncased", local_files_only=True
            )
        except Exception:  # offline: build a throwaway vocab
            import tempfile

            base_tok = tiny_bert_tokenizer(tempfile.mkdtemp())
        qt = FLMRQueryTokenizer(base_tok, query_maxlen=self.query_maxlen)
        ct = FLMRContextTokenizer(base_tok, doc_maxlen=self.doc_maxlen)

        nway = self.num_negatives + 1

        def init_params(first_q, first_d):
            variables = model.init(
                jax.random.PRNGKey(self.seed),
                query_input_ids=first_q["input_ids"],
                query_attention_mask=first_q["attention_mask"],
                context_input_ids=first_d["input_ids"],
                context_attention_mask=first_d["attention_mask"],
                num_negative_examples=self.num_negatives,
            )
            params = variables["params"]
            if self.model_checkpoint_dir and os.path.isdir(self.model_checkpoint_dir):
                from ...models.hf_bridge import load_torch_checkpoint_dir, flmr_params

                params = flmr_params(
                    load_torch_checkpoint_dir(self.model_checkpoint_dir), cfg
                )
            return params

        params = None

        @jax.jit
        def score_batch(p, q_ids, q_mask, d_ids, d_mask):
            out = model.apply(
                {"params": p},
                query_input_ids=q_ids, query_attention_mask=q_mask,
                context_input_ids=d_ids, context_attention_mask=d_mask,
                num_negative_examples=self.num_negatives,
                use_in_batch_negatives=False,
            )
            return out.scores  # [B, nway]

        for split in self.splits_to_process:
            if split not in data:
                continue
            passages = data.get(f"{split}_passages")
            id2doc = (
                dict(zip(passages["passage_id"], passages["passage_content"]))
                if passages is not None else {}
            )
            all_ids = list(id2doc.keys())

            def score_rows(batch):
                B = len(batch["question_id"])
                neg_ids, contents = [], []
                for i in range(B):
                    pos = (batch.get("pos_item_ids", [[None]] * B)[i] or [None])[0]
                    pos_content = id2doc.get(pos, "")
                    negs = []
                    # sample with replacement among non-positive ids; when
                    # the corpus has no other passage, repeat the positive
                    # rather than spinning forever / shrinking the nway the
                    # scorer was compiled for
                    pool = [p for p in all_ids if p != pos] or all_ids
                    while len(negs) < self.num_negatives and pool:
                        negs.append(rng.choice(pool))
                    neg_ids.append(negs)
                    contents.append([pos_content] + [id2doc[n] for n in negs])
                q_enc = qt(list(batch["question"]))
                d_enc = ct([c for row in contents for c in row])
                nonlocal params
                if params is None:
                    params = init_params(
                        {k: jnp.asarray(v) for k, v in q_enc.items()},
                        {k: jnp.asarray(v) for k, v in d_enc.items()},
                    )
                scores = np.asarray(score_batch(
                    params,
                    jnp.asarray(q_enc["input_ids"]), jnp.asarray(q_enc["attention_mask"]),
                    jnp.asarray(d_enc["input_ids"]), jnp.asarray(d_enc["attention_mask"]),
                ))
                batch["neg_item_ids"] = neg_ids
                batch["scores"] = scores.tolist()
                return batch

            data[split] = data[split].map(
                score_rows, batched=True, batch_size=8, load_from_cache_file=False
            )
        return data
