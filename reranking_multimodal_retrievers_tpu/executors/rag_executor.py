"""RAG answer-generation executor.

The reference ships ``RagBlipExecutor`` (`src/executors/RAG_BLIP_executor.py:71`)
whose model import is broken (`src/models/rag/` does not exist — SURVEY.md
§2.6 documents it as capability, not working code). Here the capability is
provided *working*: retrieve top-k docs (static results or a live index),
generate an answer per doc with the native :class:`VisionSeq2SeqLM`
(greedy decode), and score answers with the VQA metrics.
"""

from __future__ import annotations

import logging
from typing import Dict, List

import numpy as np

from ..models.rerankers.decoder import DecoderRerankConfig, VisionSeq2SeqLM
from ..models.bert import BertConfig
from ..utils.config_system import ConfigDict
from ..utils.registries import register_executor
from .reranker_executor import RerankerExecutor

logger = logging.getLogger(__name__)


@register_executor
class RagExecutor(RerankerExecutor):
    """Inherits static retrieval + corpus plumbing from RerankerExecutor and
    replaces scoring with per-document answer generation
    (reference ``_generative_step``, `RAG_BLIP_executor.py:520-648`)."""

    def _init_model(self):
        import jax

        mc = self.config.get_path("model_config", ConfigDict())
        self.modules = list(mc.get("modules", []))
        self.Ks = mc.get("Ks", [5])
        self.docs_to_rerank = mc.get("docs_to_rerank", 5)
        self.num_negative_samples = mc.get("num_negative_samples", 1)
        self.max_answer_length = mc.get("max_answer_length", 10)
        dec_kwargs = dict(mc.get("decoder", {}))
        self.generator_config = DecoderRerankConfig(
            text_config=BertConfig(**dec_kwargs.pop("text_config", {})),
            **dec_kwargs,
        )
        self.generator = VisionSeq2SeqLM(self.generator_config)
        self._setup_corpus()
        self.init_retrieve()
        import jax.numpy as jnp
        import random as _random

        self._rng = _random.Random(42)
        self.params = self.generator.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 8), jnp.int32),
            jnp.ones((1, 8), jnp.int32),
            jnp.ones((1, 1), jnp.int32),
        )["params"]
        self._train_state = None

    def generate(self, input_ids, attention_mask, pixel_values=None) -> np.ndarray:
        """Greedy decode under ``lax.scan`` (static length — XLA-friendly)."""
        import jax
        import jax.numpy as jnp

        cfg = self.generator_config

        @jax.jit
        def _gen(params, ids, mask, pix):
            enc_states, enc_mask = self.generator.apply(
                {"params": params}, ids, mask, pix,
                method=VisionSeq2SeqLM.encode,
            )
            B = ids.shape[0]
            start = jnp.full((B, 1), cfg.decoder_start_token_id, jnp.int32)

            def step(tokens, _):
                logits, _h = self.generator.apply(
                    {"params": params}, tokens, enc_states, enc_mask,
                    method=VisionSeq2SeqLM.decode,
                )
                nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
                tokens = jnp.concatenate([tokens[:, 1:], nxt[:, None]], axis=1)
                return tokens, nxt

            # fixed-width rolling window keeps shapes static
            init = jnp.pad(start, ((0, 0), (self.max_answer_length - 1, 0)))
            _, outs = jax.lax.scan(step, init, None, length=self.max_answer_length)
            return jnp.swapaxes(outs, 0, 1)  # [B, L]

        return np.asarray(_gen(self.params, input_ids, attention_mask, pixel_values))

    def training_step(self, batch) -> Dict[str, float]:
        raise NotImplementedError(
            "RAG training requires the generator checkpoint bridge; use the "
            "reranker/retriever executors for training in this round"
        )

    def evaluate(self, mode: str = "test") -> ConfigDict:
        import jax.numpy as jnp

        tok = getattr(self.tokenizers.get("decoder_tokenizer"), "tok", None)
        limit = self.config.get_path(
            f"{mode}.trainer_paras.limit_{'val' if mode=='valid' else 'test'}_batches"
        )
        results: List[dict] = []
        for name, loader in self.eval_dataloaders(mode).items():
            for bi, batch in enumerate(loader):
                if limit and bi >= limit:
                    break
                real = batch.get("_real_count", len(batch["question_ids"]))
                for qi in range(real):
                    qid = batch["question_ids"][qi]
                    docs = self.static_retrieve(qid)[: self.docs_to_rerank]
                    prompts = [
                        f"question: {batch['questions'][qi]} context: {d['content']}"
                        for d in docs
                    ] or [f"question: {batch['questions'][qi]}"]
                    enc = tok(prompts, padding="max_length", truncation=True,
                              max_length=64, return_tensors="np")
                    out_tokens = self.generate(
                        jnp.asarray(enc["input_ids"], jnp.int32),
                        jnp.asarray(enc["attention_mask"], jnp.int32),
                    )
                    answers = [tok.decode(t, skip_special_tokens=True) for t in out_tokens]
                    results.append({
                        "question_id": qid,
                        "prediction": answers[0] if answers else "",
                        "per_doc_predictions": answers,
                        "answers": batch.get("answers", [[]])[qi],
                    })
        data_dict = {
            "predictions": [r["prediction"] for r in results],
            "answers": [r["answers"] for r in results],
            "batch_retrieval_result": results,
            "Ks": self.Ks,
        }
        log_dict = self.compute_metrics(data_dict)
        log_dict["batch_retrieval_result"] = results
        return log_dict
