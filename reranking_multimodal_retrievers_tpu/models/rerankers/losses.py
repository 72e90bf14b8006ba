"""Reranker loss construction.

Parity with the reference loss vocabulary
(`src/models/rerank/utils.py:208-254`):

- ``BCE``: sigmoid BCE on head-1 logits; default labels are
  [1, 0, …, 0] per (1 positive + N negatives) group; optional ``pos_weight``.
- ``2H_BCE``: the two heads' logits form 2-class logits; CE with optional
  class weight [1, pos_weight] on the positive class.
- ``negative_sampling``: head-1 logits reshaped to [B, 1+N]; CE with label 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def default_group_labels(batch_size: int, num_negative_examples: int) -> jnp.ndarray:
    """[1, 0, ..., 0] repeated per query (`utils.py:239-242`)."""
    group = jnp.zeros((num_negative_examples + 1,), jnp.float32).at[0].set(1.0)
    return jnp.tile(group, (batch_size,)).reshape(-1, 1)


def prepare_logits_labels(
    loss_fn_name: str,
    logits: jnp.ndarray,
    logits_secondary: jnp.ndarray,
    batch_size: int,
    num_negative_examples: int,
    labels: Optional[jnp.ndarray] = None,
):
    """Reference `utils.py:228-254`. Returns (logits, labels) shaped for
    :func:`rerank_loss`."""
    if labels is not None:
        labels = jnp.asarray(labels, jnp.float32).reshape(-1, 1)
    if loss_fn_name in ("BCE", "2H_BCE"):
        if labels is None:
            labels = default_group_labels(batch_size, num_negative_examples)
        if loss_fn_name == "2H_BCE":
            labels = labels.reshape(-1).astype(jnp.int32)
            logits = jnp.concatenate([logits, logits_secondary], axis=1)
    elif loss_fn_name == "negative_sampling":
        logits = logits.reshape(-1, num_negative_examples + 1)
        if labels is None:
            # the reference's sampling path always places the positive at
            # group index 0 (`Reranker_base_executor.py:513-515`)
            labels = jnp.zeros((batch_size,), jnp.int32)
        else:
            # explicit per-row binary labels → positive's index within each
            # (1+N) group, instead of silently discarding the caller's labels
            labels = jnp.argmax(
                labels.reshape(-1, num_negative_examples + 1), axis=1
            ).astype(jnp.int32)
    else:
        raise ValueError(f"Unknown loss function {loss_fn_name}")
    return logits, labels


def rerank_loss(
    loss_fn_name: str,
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    pos_weight: Optional[float] = None,
):
    """Reference `utils.py:208-224` (BCEWithLogits / weighted CE / CE)."""
    if loss_fn_name == "BCE":
        logits = logits.astype(jnp.float32).reshape(-1)
        labels = labels.astype(jnp.float32).reshape(-1)
        log_p = jax.nn.log_sigmoid(logits)
        log_not_p = jax.nn.log_sigmoid(-logits)
        w_pos = pos_weight if pos_weight is not None else 1.0
        per = -(w_pos * labels * log_p + (1.0 - labels) * log_not_p)
        return per.mean()
    if loss_fn_name == "2H_BCE":
        logits = logits.astype(jnp.float32)
        labels = labels.astype(jnp.int32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        per = logz - gold
        if pos_weight is not None:
            w = jnp.where(labels == 1, pos_weight, 1.0)
            return (per * w).sum() / jnp.maximum(w.sum(), 1e-9)
        return per.mean()
    if loss_fn_name == "negative_sampling":
        logits = logits.astype(jnp.float32)
        labels = labels.astype(jnp.int32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        return (logz - gold).mean()
    raise ValueError(f"Unknown loss function {loss_fn_name}")


def primary_logits(loss_fn_name: str, logits: jnp.ndarray) -> jnp.ndarray:
    """After 2H_BCE, ranking uses the positive-class head
    (`rerank_model.py:329-331`)."""
    if loss_fn_name == "2H_BCE":
        return logits[:, 1:2]
    if loss_fn_name == "negative_sampling":
        return logits.reshape(-1, 1)
    return logits
