"""RAG answer-generation executor.

The reference ships ``RagBlipExecutor`` (`src/executors/RAG_BLIP_executor.py:71`)
whose model import is broken (`src/models/rag/` does not exist — SURVEY.md
§2.6 documents it as capability, not working code). Here the capability is
provided *working*:

- **Training** (reference `training_step`, `RAG_BLIP_executor.py:391-460`):
  the RAG-sequence marginal likelihood. Each question retrieves K docs with
  scores; the generator computes a teacher-forced answer log-likelihood per
  doc and the loss marginalizes over the docs weighted by the retrieval
  prior: ``−log Σ_k p(doc_k|q) · p(answer|q, doc_k)``. One jitted
  ``[B·K, L]`` forward — no per-doc Python loop on device.
- **Generation** (reference ``_generative_step``, `RAG_BLIP_executor.py:
  520-648`): greedy decode per retrieved doc; the returned prediction is the
  generation for the best-scoring doc and the per-doc generations plus the
  doc scores are logged (the reference's ``generation_outputs_for_docs`` /
  ``loss_with_doc_scores``).
- **Backbones**: the compact native :class:`VisionSeq2SeqLM`, or
  ``backbone: "blip2"`` for the real BLIP-2 (ViT → Q-Former → Flan-T5)
  generator with optional HF-checkpoint bridging — the model family the
  reference's executor name promises.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List

import numpy as np

from ..models.rerankers.decoder import DecoderRerankConfig, VisionSeq2SeqLM
from ..models.bert import BertConfig
from ..utils.config_system import ConfigDict
from ..utils.registries import register_executor
from .reranker_executor import RerankerExecutor

logger = logging.getLogger(__name__)


def greedy_decode_with_nll(decode_logits, enc_states, enc_mask,
                           start_id: int, pad_id: int, max_len: int):
    """Greedy decode + teacher-forced NLL of the generated tokens, sharing
    one encoder pass. Pure (jit-safe); ``decode_logits(tokens) -> [B, L, V]``.

    Uses a LEFT-aligned fixed-length buffer: logits at position t depend
    only on positions <= t under the causal bias, so the pad filler past
    the frontier is never attended, and positions line up exactly with the
    teacher-forced re-scoring pass (a right-aligned rolling window would
    attend unmasked left-fill and score under a different alignment).
    Returns ``(labels [B, L], losses [B])``."""
    import jax
    import jax.numpy as jnp

    B, L = enc_states.shape[0], max_len
    start = jnp.full((B, 1), start_id, jnp.int32)
    init = jnp.concatenate(
        [start, jnp.full((B, L - 1), pad_id, jnp.int32)], axis=1)

    def step(tokens, t):
        logits = decode_logits(tokens)
        nxt = jnp.argmax(logits[:, t, :], axis=-1).astype(jnp.int32)
        # write g_t at t+1 (the last step's token is emitted via ys only;
        # clamp keeps the write in bounds, `where` makes it a no-op there)
        pos = jnp.minimum(t + 1, L - 1)
        cur = jax.lax.dynamic_slice_in_dim(tokens, pos, 1, 1)[:, 0]
        upd = jnp.where(t + 1 < L, nxt, cur)
        tokens = jax.lax.dynamic_update_slice(tokens, upd[:, None], (0, pos))
        return tokens, nxt

    _, outs = jax.lax.scan(step, init, jnp.arange(L))
    labels = jnp.swapaxes(outs, 0, 1)  # [B, L]
    # teacher-forced NLL of the generated tokens on the SAME encoder states
    # and the SAME [start, g_0..g_{L-2}] layout
    dec_in = jnp.concatenate([start, labels[:, :-1]], axis=1)
    logits = decode_logits(dec_in)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    label_mask = (labels != pad_id).astype(jnp.float32)
    denom = jnp.maximum(label_mask.sum(-1), 1.0)
    losses = -(tok_ll * label_mask).sum(-1) / denom
    return labels, losses


@register_executor
class RagExecutor(RerankerExecutor):
    """Inherits static retrieval + corpus plumbing from RerankerExecutor and
    replaces scoring with per-document answer generation
    (reference ``_generative_step``, `RAG_BLIP_executor.py:520-648`)."""

    def _init_model(self):
        import jax
        import jax.numpy as jnp

        mc = self.config.get_path("model_config", ConfigDict())
        self.modules = list(mc.get("modules", []))
        self.Ks = mc.get("Ks", [5])
        self.docs_to_rerank = mc.get("docs_to_rerank", 5)
        self.num_negative_samples = mc.get("num_negative_samples", 1)
        self.max_answer_length = mc.get("max_answer_length", 10)
        self.max_source_length = mc.get("max_source_length", 64)
        # docs marginalized over per training question (RAG-sequence K)
        self.rag_num_docs = mc.get("rag_num_docs", min(self.docs_to_rerank, 4))
        dec_kwargs = dict(mc.get("decoder", {}))
        self.backbone = dec_kwargs.pop("backbone", "native")
        if self.backbone == "blip2":
            from ..models.blip2 import (
                Blip2Config, Blip2ForConditionalGeneration, Blip2QFormerConfig,
                Blip2VisionConfig,
            )
            from ..models.t5 import T5Config

            self.generator_config = Blip2Config(
                vision_config=Blip2VisionConfig(**dec_kwargs.pop("vision_config", {})),
                qformer_config=Blip2QFormerConfig(
                    **dec_kwargs.pop("qformer_config", {})
                ),
                text_config=T5Config(**dec_kwargs.pop("text_config", {})),
                num_query_tokens=dec_kwargs.pop("num_query_tokens", 32),
            )
            self.generator = Blip2ForConditionalGeneration(self.generator_config)
            self.decoder_start_token_id = (
                self.generator_config.text_config.decoder_start_token_id
            )
        else:
            self.generator_config = DecoderRerankConfig(
                text_config=BertConfig(**dec_kwargs.pop("text_config", {})),
                **dec_kwargs,
            )
            self.generator = VisionSeq2SeqLM(self.generator_config)
            self.decoder_start_token_id = self.generator_config.decoder_start_token_id
        import random as _random

        self._rng = _random.Random(42)
        self._setup_corpus()
        self.init_retrieve()
        ckpt_dir = mc.get("decoder_checkpoint_dir")
        if ckpt_dir and os.path.isdir(ckpt_dir) and self.backbone == "blip2":
            from ..models.hf_bridge import blip2_params, load_torch_checkpoint_dir

            logger.info("bridging BLIP-2 generator from %s", ckpt_dir)
            self.params = blip2_params(
                load_torch_checkpoint_dir(ckpt_dir), self.generator_config
            )
        else:
            img = self.generator_config.vision_config.image_size
            self.params = self.generator.init(
                jax.random.PRNGKey(0),
                jnp.ones((1, 8), jnp.int32),
                jnp.ones((1, 8), jnp.int32),
                jnp.ones((1, 1), jnp.int32),
                jnp.zeros((1, 3, img, img), jnp.float32),
            )["params"]
        self._train_state = None

    # ------------------------------------------------- generator dispatch
    def _encode(self, params, input_ids, attention_mask, pixel_values=None,
                vision_prefix=None):
        """(enc_states, enc_mask) for either backbone — safe under jit."""
        if self.backbone == "blip2":
            from ..models.blip2 import Blip2ForConditionalGeneration

            return self.generator.apply(
                {"params": params}, input_ids, attention_mask, pixel_values,
                vision_prefix,
                method=Blip2ForConditionalGeneration.encode_for_generation,
            )
        return self.generator.apply(
            {"params": params}, input_ids, attention_mask, pixel_values,
            vision_prefix, method=VisionSeq2SeqLM.encode,
        )

    def _vision_prefix(self, params, pixel_values):
        """Projected vision tokens, computed once per IMAGE — callers repeat
        the (cheap) prefix over the K candidate docs instead of running the
        vision tower K times on identical pixels."""
        if self.backbone == "blip2":
            from ..models.blip2 import Blip2ForConditionalGeneration

            return self.generator.apply(
                {"params": params}, pixel_values,
                method=Blip2ForConditionalGeneration.vision_prefix,
            )
        return self.generator.apply(
            {"params": params}, pixel_values,
            method=VisionSeq2SeqLM.vision_prefix,
        )

    def _decode_logits(self, params, decoder_input_ids, enc_states, enc_mask):
        if self.backbone == "blip2":
            from ..models.blip2 import Blip2ForConditionalGeneration

            return self.generator.apply(
                {"params": params}, decoder_input_ids, enc_states, enc_mask,
                method=Blip2ForConditionalGeneration.decode_logits,
            )
        logits, _h = self.generator.apply(
            {"params": params}, decoder_input_ids, enc_states, enc_mask,
            method=VisionSeq2SeqLM.decode,
        )
        return logits

    def generate(self, input_ids, attention_mask, pixel_values=None) -> np.ndarray:
        """Greedy decode — the decode half of :meth:`generate_with_losses`
        (one shared jitted program; tokens only)."""
        tokens, _ = self.generate_with_losses(
            input_ids, attention_mask, pixel_values)
        return tokens

    # ------------------------------------------------------------- train
    def prepare_training(self, total_steps: int):
        import jax
        import jax.numpy as jnp
        import optax

        tx, _ = self.build_optimizer(self.params, total_steps)
        self._tx = tx
        self._opt_state = tx.init(self.params)
        packed = getattr(self, "_restored_opt_state", None)
        if packed:
            from ..training.checkpointing import unpack_opt_state

            self._opt_state = unpack_opt_state(self._opt_state, packed)
            self._restored_opt_state = None
        K = self.rag_num_docs

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                pix = batch.get("pixel_values")  # [B, ...]: one per IMAGE
                prefix = (jnp.repeat(self._vision_prefix(p, pix), K, axis=0)
                          if pix is not None else None)
                enc_states, enc_mask = self._encode(
                    p, batch["input_ids"], batch["attention_mask"],
                    vision_prefix=prefix,
                )
                logits = self._decode_logits(
                    p, batch["decoder_input_ids"], enc_states, enc_mask
                )  # [B·K, La, V]
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                tok_ll = jnp.take_along_axis(
                    logp, batch["labels"][..., None], axis=-1
                )[..., 0]
                seq_ll = (tok_ll * batch["label_mask"]).sum(-1)  # [B·K]
                seq_ll = seq_ll.reshape(-1, K)
                log_prior = jax.nn.log_softmax(
                    batch["doc_scores"].astype(jnp.float32), axis=-1
                )
                # RAG-sequence marginal NLL over the K retrieved docs
                return -jnp.mean(jax.nn.logsumexp(log_prior + seq_ll, axis=-1))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

    def _answer_labels(self, tok, texts: List[str]):
        enc = tok(
            list(texts), padding="max_length", truncation=True,
            max_length=self.max_answer_length, return_tensors="np",
        )
        labels = np.asarray(enc["input_ids"], np.int32)
        mask = np.asarray(enc["attention_mask"], np.float32)
        start = np.full((labels.shape[0], 1), self.decoder_start_token_id, np.int32)
        dec_in = np.concatenate([start, labels[:, :-1]], axis=1)
        return labels, mask, dec_in

    def training_step(self, batch) -> Dict[str, float]:
        import jax.numpy as jnp

        tok = getattr(self.tokenizers.get("decoder_tokenizer"), "tok", None)
        K = self.rag_num_docs
        prompts, scores = [], []
        for qi, qid in enumerate(batch["question_ids"]):
            docs = self.static_retrieve(qid)[:K]
            while docs and len(docs) < K:
                docs = docs + docs[: K - len(docs)]
            if not docs:
                docs = [{"content": "", "score": 0.0}] * K
            prompts.extend(
                f"question: {batch['questions'][qi]} context: {d['content']}"
                for d in docs
            )
            scores.append([float(d.get("score", 1.0)) for d in docs])
        enc = tok(prompts, padding="max_length", truncation=True,
                  max_length=self.max_source_length, return_tensors="np")
        gold = [
            g or (a[0] if a else "")
            for g, a in zip(
                batch.get("gold_answer", [""] * len(batch["question_ids"])),
                batch.get("answers", [[]] * len(batch["question_ids"])),
            )
        ]
        labels, label_mask, dec_in = self._answer_labels(tok, gold)
        model_batch = dict(
            input_ids=jnp.asarray(enc["input_ids"], jnp.int32),
            attention_mask=jnp.asarray(enc["attention_mask"], jnp.int32),
            decoder_input_ids=jnp.asarray(np.repeat(dec_in, K, axis=0)),
            labels=jnp.asarray(np.repeat(labels, K, axis=0)),
            label_mask=jnp.asarray(np.repeat(label_mask, K, axis=0)),
            doc_scores=jnp.asarray(scores, jnp.float32),
        )
        pix = batch.get("pixel_values")
        if pix is not None:
            # un-repeated [B, ...]: the train step computes the vision
            # prefix once per image and repeats the prefix over the K docs
            model_batch["pixel_values"] = jnp.asarray(
                np.asarray(pix), jnp.float32)
        self.params, self._opt_state, loss = self._step(
            self.params, self._opt_state, model_batch
        )
        return {"loss": float(np.asarray(loss))}

    # -------------------------------------------------------------- eval
    def generate_with_losses(self, input_ids, attention_mask, pixel_values):
        """(tokens, per-doc NLL of each doc's OWN generation) in ONE jitted
        program — the encoder (vision + Q-Former + T5, the dominant eval
        cost) runs once and its states feed both the greedy decode and the
        teacher-forced loss. The losses are the reference's
        ``loss_with_doc_scores`` (`RAG_BLIP_executor.py:560-612`): lower
        loss ranks the doc's generation higher in ``compute_exact_match`` /
        the retriever-hit analysis."""
        import jax
        import jax.numpy as jnp

        pad_id = getattr(
            getattr(self.tokenizers.get("decoder_tokenizer"), "tok", None),
            "pad_token_id", 0) or 0

        if getattr(self, "_gen_loss_fn", None) is None:

            @jax.jit
            def _gen_loss(params, ids, mask, pix):
                prefix = None
                if pix is not None:
                    # vision tower runs once per IMAGE; the prefix is
                    # repeated over this image's candidate docs
                    prefix = jnp.repeat(
                        self._vision_prefix(params, pix),
                        ids.shape[0] // pix.shape[0], axis=0)
                enc_states, enc_mask = self._encode(
                    params, ids, mask, vision_prefix=prefix)
                return greedy_decode_with_nll(
                    lambda toks: self._decode_logits(
                        params, toks, enc_states, enc_mask),
                    enc_states, enc_mask, self.decoder_start_token_id,
                    pad_id, self.max_answer_length)

            self._gen_loss_fn = _gen_loss
        tokens, losses = self._gen_loss_fn(
            self.params, input_ids, attention_mask, pixel_values
        )
        return np.asarray(tokens), np.asarray(losses)

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
                pix_all = batch.get("pixel_values")
                for qi in range(real):
                    qid = batch["question_ids"][qi]
                    docs = self.static_retrieve(qid)[: self.docs_to_rerank]
                    doc_scores = [float(d.get("score", 1.0)) for d in docs]
                    prompts = [
                        f"question: {batch['questions'][qi]} context: {d['content']}"
                        for d in docs
                    ] or [f"question: {batch['questions'][qi]}"]
                    enc = tok(prompts, padding="max_length", truncation=True,
                              max_length=self.max_source_length,
                              return_tensors="np")
                    pix = None
                    if pix_all is not None:
                        # one image; generate_with_losses broadcasts its
                        # vision prefix over the len(prompts) candidates
                        pix = jnp.asarray(
                            np.asarray(pix_all)[qi : qi + 1], jnp.float32)
                    ids = jnp.asarray(enc["input_ids"], jnp.int32)
                    am = jnp.asarray(enc["attention_mask"], jnp.int32)
                    # one program: encode once, greedy-decode per doc, and
                    # score each doc's own generation (reference ranks
                    # proposals by ascending loss, `RAG_BLIP_executor.py:
                    # 560-612`); the final prediction is the lowest-loss
                    # doc's generation
                    out_tokens, losses = self.generate_with_losses(ids, am, pix)
                    answers = [tok.decode(t, skip_special_tokens=True)
                               for t in out_tokens]
                    best = int(np.argmin(losses)) if len(losses) else 0
                    results.append({
                        "question_id": qid,
                        "prediction": answers[best] if answers else "",
                        "per_doc_predictions": answers,
                        "loss_with_doc_scores": [float(x) for x in losses],
                        "doc_scores": doc_scores,
                        "retrieved_docs": docs,
                        "answers": batch.get("answers", [[]] * real)[qi],
                        # Infoseek numeric-answer range (reference
                        # `RAG_BLIP_executor.py:643`)
                        "numeric_range": (
                            batch.get("wikidata_ranges", [None] * real)[qi]
                        ),
                    })
        data_dict = {
            "predictions": [r["prediction"] for r in results],
            "answers": [r["answers"] for r in results],
            "batch_answers": [r["answers"] for r in results],
            "batch_question_ids": [r["question_id"] for r in results],
            "batch_retrieved_docs": [r["retrieved_docs"] for r in results],
            "batch_generation_outputs_for_docs":
                [r["per_doc_predictions"] for r in results],
            "batch_loss_with_doc_scores":
                [r["loss_with_doc_scores"] for r in results],
            "batch_numeric_ranges": [r["numeric_range"] for r in results],
            "batch_predictions": [
                {"question_id": r["question_id"], "answer": r["prediction"]}
                for r in results
            ],
            "batch_retrieval_result": results,
            "Ks": self.Ks,
        }
        log_dict = self.compute_metrics(data_dict)
        log_dict["batch_retrieval_result"] = results
        return log_dict
