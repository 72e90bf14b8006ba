"""SPMD triples trainer for the retrieval engine.

The role of the ColBERT engine's trainer
(`third_party/ColBERT/colbert/training/training.py:23-158` — "DDP training
loop over triples", SURVEY §2.8): train a late-interaction retriever from
``Examples`` triples + ``Queries`` + ``Collection``, with

- softmax-CE over ``nway`` passages (positive first, label 0) when the
  triples carry bare pids, or KL-distillation against
  ``log_softmax(target_scores · distillation_alpha)`` when they carry
  ``[pid, score]`` pairs (`training.py:109-119`);
- optional in-batch-negative loss added on top (`:121-126`);
- linear warmup + linear decay to ``maxsteps`` (`:63-67`);
- an EMA-smoothed train loss with μ=0.999 (`:76-78,137-139`);
- periodic checkpointing (`manage_checkpoints`, `:141-149`).

TPU-native redesign: the reference's per-rank DDP processes, AMP manager and
gradient accumulation collapse into ONE jitted SPMD step — the global batch
is sharded over the mesh's data axis, grad sync is a compiler-inserted
``psum`` over ICI, and bf16 is the ambient compute dtype. The strided
per-rank triple split (`examples.py:34-46`) survives only as the *host-level*
``Examples.tolist(shard, nshards)`` for multi-host (DCN) input feeding.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .data import Collection, Examples, Queries

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TriplesTrainerConfig:
    """The trainer-relevant slice of ColBERT's settings
    (`colbert/infra/config/settings.py:96-165`)."""

    bsize: int = 8
    nway: int = 2
    lr: float = 3e-6
    warmup: Optional[int] = 20
    maxsteps: int = 100
    use_ib_negatives: bool = False
    ignore_scores: bool = False
    distillation_alpha: float = 1.0
    query_maxlen: int = 32
    doc_maxlen: int = 180
    seed: int = 12345
    checkpoint_dir: Optional[str] = None
    save_every: Optional[int] = None


class LazyBatcher:
    """Assemble (query texts, passage texts, target scores) batches from
    triples — the reference ``LazyBatcher``
    (`colbert/training/lazy_batcher.py`) without its per-rank process split:
    pass ``shard/nshards`` only for multi-host input feeding."""

    def __init__(self, triples, queries, collection, bsize: int, nway: int,
                 shard: Optional[int] = None, nshards: Optional[int] = None):
        self.examples = Examples.cast(triples, nway=nway).tolist(shard, nshards)
        self.queries = Queries.cast(queries)
        self.collection = Collection.cast(collection)
        self.bsize = bsize
        self.nway = nway

    def __iter__(self) -> Iterator[Tuple[List[str], List[str], Optional[np.ndarray]]]:
        for start in range(0, len(self.examples) - self.bsize + 1, self.bsize):
            chunk = self.examples[start : start + self.bsize]
            q_texts: List[str] = []
            p_texts: List[str] = []
            scores: List[float] = []
            have_scores = True
            for ex in chunk:
                qid, passages = ex[0], ex[1 : self.nway + 1]
                q_texts.append(self.queries[qid])
                for p in passages:
                    if isinstance(p, (list, tuple)):
                        pid, s = p[0], float(p[1])
                        scores.append(s)
                    else:
                        pid, have_scores = p, False
                    p_texts.append(self.collection[int(pid)])
            target = (
                np.asarray(scores, np.float32).reshape(self.bsize, self.nway)
                if have_scores and scores
                else None
            )
            yield q_texts, p_texts, target

    def __len__(self):
        return len(self.examples) // self.bsize


def train(config: TriplesTrainerConfig, triples, queries, collection,
          model=None, params=None, tokenizers=None, mesh=None):
    """Train a late-interaction retriever over triples; returns
    ``(params, ema_loss)``.

    ``model``/``params`` default to a compact text-only
    :class:`~..models.flmr.FLMRModelForRetrieval` (the stock-ColBERT role:
    no vision tower, `colbert/modeling/colbert.py:24-60`); pass the real
    bridged model for production runs. ``tokenizers`` is an optional
    ``(query_tok, context_tok)`` pair with the FLMR marker conventions.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.flmr import FLMRConfig, FLMRModelForRetrieval

    rng = np.random.default_rng(config.seed)
    if model is None:
        model = FLMRModelForRetrieval(
            FLMRConfig.tiny(
                use_vision_encoder=False,
                query_concat_output_from_vision_encoder=False,
                use_transformer_mapping_network=False,
            )
        )
    if tokenizers is None:
        tokenize_q = tokenize_d = None
    else:
        tokenize_q, tokenize_d = tokenizers

    def encode_queries(texts):
        if tokenize_q is not None:
            enc = tokenize_q(texts)
            return (np.asarray(enc["input_ids"], np.int32),
                    np.asarray(enc["attention_mask"], np.int32))
        ids = rng.integers(3, 50, size=(len(texts), config.query_maxlen))
        return ids.astype(np.int32), np.ones_like(ids, np.int32)

    def encode_docs(texts):
        if tokenize_d is not None:
            enc = tokenize_d(texts)
            return (np.asarray(enc["input_ids"], np.int32),
                    np.asarray(enc["attention_mask"], np.int32))
        ids = rng.integers(3, 50, size=(len(texts), config.doc_maxlen))
        return ids.astype(np.int32), np.ones_like(ids, np.int32)

    reader = LazyBatcher(triples, queries, collection, config.bsize, config.nway)

    if params is None:
        qi, qm = encode_queries(["warmup"] * 2)
        di, dm = encode_docs(["warmup"] * (2 * config.nway))
        params = model.init(
            jax.random.PRNGKey(config.seed), qi, qm, di, dm,
            use_in_batch_negatives=False,
            num_negative_examples=config.nway - 1,
        )["params"]

    schedule = optax.warmup_linear_decay(
        init_value=0.0, peak_value=config.lr,
        warmup_steps=config.warmup or 0,
        decay_steps=max(config.maxsteps, (config.warmup or 0) + 1),
        end_value=0.0,
    ) if hasattr(optax, "warmup_linear_decay") else optax.join_schedules(
        [optax.linear_schedule(0.0, config.lr, config.warmup or 1),
         optax.linear_schedule(
             config.lr, 0.0,
             max(config.maxsteps - (config.warmup or 0), 1))],
        [config.warmup or 1],
    )
    tx = optax.adamw(schedule, eps=1e-8)
    opt_state = tx.init(params)

    nway = config.nway

    def loss_fn(p, batch):
        out = model.apply(
            {"params": p},
            batch["q_ids"], batch["q_mask"], batch["d_ids"], batch["d_mask"],
            use_in_batch_negatives=config.use_ib_negatives,
            num_negative_examples=nway - 1,
        )
        if batch.get("target") is not None and not config.ignore_scores:
            # KL-distillation (`training.py:109-116`)
            t = jax.nn.log_softmax(
                batch["target"] * config.distillation_alpha, axis=-1)
            s = jax.nn.log_softmax(out.scores, axis=-1)
            loss = jnp.mean(jnp.sum(jnp.exp(t) * (t - s), axis=-1))
        else:
            loss = out.loss
        if config.use_ib_negatives and out.in_batch_negative_loss is not None:
            loss = loss + out.in_batch_negative_loss
        return loss

    @jax.jit
    def step_has_target(p, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, batch))(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        data_sharding = NamedSharding(mesh, P(DATA_AXIS))
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)

    ema = None
    step_idx = 0
    saver = None
    if config.checkpoint_dir:
        from ..training.checkpointing import CheckpointManager

        saver = CheckpointManager(config.checkpoint_dir)
    for epoch_batch in reader:
        if step_idx >= config.maxsteps:
            break
        q_texts, p_texts, target = epoch_batch
        qi, qm = encode_queries(q_texts)
        di, dm = encode_docs(p_texts)
        batch = {
            "q_ids": jnp.asarray(qi), "q_mask": jnp.asarray(qm),
            "d_ids": jnp.asarray(di), "d_mask": jnp.asarray(dm),
            "target": jnp.asarray(target) if target is not None else None,
        }
        if mesh is not None:
            batch = {
                k: jax.device_put(v, data_sharding) if v is not None else None
                for k, v in batch.items()
            }
        params, opt_state, loss = step_has_target(params, opt_state, batch)
        loss = float(loss)
        ema = loss if ema is None else 0.999 * ema + 0.001 * loss
        step_idx += 1
        if step_idx % 10 == 0 or step_idx == 1:
            logger.info("triples step %d loss=%.4f ema=%.4f", step_idx, loss, ema)
        if saver and config.save_every and step_idx % config.save_every == 0:
            saver.save({"params": params}, step_idx, {"train_loss": ema})
    if saver:
        saver.save({"params": params}, step_idx, {"train_loss": ema or 0.0})
    return params, (ema if ema is not None else 0.0)
