"""Cross-encoder head: a shallow BERT over mapped late-interaction features.

Reference ``CrossEncoder`` (`src/models/rerank/utils.py:73-108`): an
``AttentionFusionBertModel`` (BertModel accepting an additive attention-bias
block, `attention_fusion.py:84-102`) consuming ``inputs_embeds``, with two
scalar heads over the CLS output.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..bert import BertConfig, BertModel


class CrossEncoder(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, inputs_embeds, attention_mask=None, attention_adj=None,
                 token_type_ids=None):
        out = BertModel(self.config, add_pooling_layer=False, name="bert_model")(
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            attention_adj=attention_adj,
            token_type_ids=token_type_ids,
        )
        cls = out["last_hidden_state"][:, 0]
        logits1 = nn.Dense(1, name="classifier1")(cls)
        logits2 = nn.Dense(1, name="classifier2")(cls)
        return logits1, logits2


def fusion_attention_adj(scores, query_rows: int, context_rows: int,
                         fusion_multiplier: float = 1.0):
    """Build the attention-fusion additive bias from a retriever token-score
    matrix (reference `rerank_model.py:276-319` / `interaction_rerank_model.py:131-142`).

    Args:
      scores: [B, context_rows, query_rows] MaxSim token-score block (context
        tokens × query(+vision) tokens).
    Returns:
      [B, query_rows+context_rows, query_rows+context_rows] additive bias:
      zero diagonal blocks, row-softmaxed cross blocks, scaled.
    """
    B = scores.shape[0]
    upper_left = jnp.zeros((B, query_rows, query_rows), scores.dtype)
    bottom_right = jnp.zeros((B, context_rows, context_rows), scores.dtype)
    upper_right = nn.softmax(jnp.swapaxes(scores, 1, 2), axis=-1)
    bottom_left = nn.softmax(scores, axis=-1)
    # a frozen retriever with FEWER query tokens than the reranker (e.g. a
    # text-only retriever biasing a vision-enabled reranker) speaks for only
    # its own tokens: the extra reranker query rows/cols get zero bias
    q_ret = scores.shape[2]
    assert q_ret <= query_rows, (q_ret, query_rows)
    if q_ret < query_rows:
        pad = query_rows - q_ret
        upper_right = jnp.pad(upper_right, ((0, 0), (0, pad), (0, 0)))
        bottom_left = jnp.pad(bottom_left, ((0, 0), (0, 0), (0, pad)))
    top = jnp.concatenate([upper_left, upper_right], axis=2)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=2)
    return jnp.concatenate([top, bottom], axis=1) * fusion_multiplier
