"""Megatron-style tensor-parallel parameter layouts over the mesh's model axis.

The reference has no tensor parallelism (SURVEY §2.10 — DDP only; its models
fit one GPU). This module exists for the scales the rebuild targets: the
Flan-T5-XL decoder reranker and larger retriever backbones, where sharding
the weight matrices over a second mesh axis buys memory headroom and keeps
MXU tiles large without changing any model code.

The layout is the standard two-matmul split, expressed purely as *parameter
shardings* — GSPMD propagates them through the activations and inserts the
single all-reduce per block on its own (the scaling-book recipe: annotate,
compile, let XLA place collectives on ICI):

- column-parallel (output dim over ``model``): attention Q/K/V projections,
  FFN up-projections (``intermediate``/``fc1``/``wi``/``wi_0``/``wi_1``),
  biases sharded alike;
- row-parallel (input dim over ``model``): attention output projections
  (``out``/``out_proj``/``o``), FFN down-projections
  (``output``/``fc2``/``wo``), biases replicated (added once, after the
  all-reduce);
- everything else (embeddings, layernorms, heads, mapping linears)
  replicated.

Path classification works on the last two key components, so the same rule
covers the BERT, CLIP-ViT, T5 and FLMR parameter trees AND their mirrored
optimizer-state trees (adam ``mu``/``nu`` nest the identical structure).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# parent-module names → column-parallel (out dim sharded)
_COLUMN = frozenset({
    "query", "key", "value", "q_proj", "k_proj", "v_proj", "q", "k", "v",
    "intermediate", "fc1", "wi", "wi_0", "wi_1",
})
# parent-module names → row-parallel (in dim sharded, bias replicated)
_ROW = frozenset({"out", "out_proj", "o", "output", "fc2", "wo"})


def _path_names(path) -> Sequence[str]:
    names = []
    for k in path:
        key = getattr(k, "key", None)
        if key is None:
            key = getattr(k, "name", None)
        if key is None and hasattr(k, "idx"):
            key = str(k.idx)
        names.append(str(key))
    return names


def partition_spec(path, leaf) -> P:
    """The TP PartitionSpec for one parameter (or optimizer-moment) leaf.

    The owning module is the nearest ancestor that classifies as column- or
    row-parallel, looking through the ``base`` level that ``LoRADense`` /
    ``_LoRAKernels`` nest their frozen kernel under — so the rule covers the
    plain FLMR/BERT/ViT trees AND the LoRA-wrapped OPT-2.7b / Flan-T5-XL
    decoder rerankers (`models/{opt,t5}.py`), whose q/v projections carry
    ``{q_proj,v}/base/kernel`` + ``lora_a``/``lora_b`` leaves.
    """
    names = _path_names(path)
    kind = names[-1]
    ndim = getattr(leaf, "ndim", 0)
    owner = ""
    for name in reversed(names[:-1]):
        if name == "base":  # LoRADense/_LoRAKernels nesting level
            continue
        owner = name
        break
    if owner in _COLUMN:
        if kind == "kernel" and ndim == 2:
            return P(None, MODEL_AXIS)
        if kind == "bias" and ndim == 1:
            return P(MODEL_AXIS)
        if kind == "lora_b" and ndim == 2:
            # B: [r, out] — out dim sharded with the base kernel; A ([in, r])
            # stays replicated (r is tiny)
            return P(None, MODEL_AXIS)
    if owner in _ROW:
        if kind == "kernel" and ndim == 2:
            return P(MODEL_AXIS, None)
        if kind == "lora_a" and ndim == 2:
            # A: [in, r] — in dim sharded with the base kernel; B replicated
            return P(MODEL_AXIS, None)
        # row-parallel bias: replicated, added after the all-reduce
    if owner == "relative_attention_bias" and kind == "embedding" and ndim == 2:
        # T5 position bias: [buckets, heads] — heads sharded with the
        # column-parallel QKV so the [B, heads, L, L] bias joins the
        # already-sharded attention logits without a resharding collective
        return P(None, MODEL_AXIS)
    return P()


def shard_tree(mesh: Mesh, tree: Any) -> Any:
    """Place every leaf of ``tree`` according to :func:`partition_spec`.

    Works on a params dict, a whole TrainState, or an optimizer state — the
    path rule matches the mirrored structures alike."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    placed = [
        jax.device_put(leaf, NamedSharding(mesh, partition_spec(path, leaf)))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, placed)


def describe(tree: Any) -> dict:
    """path → spec map for tests/debugging (only non-replicated entries)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        spec = partition_spec(path, leaf)
        if spec != P():
            out["/".join(_path_names(path))] = spec
    return out
