"""One-command PreFLMR checkpoint fetch + bridge + smoke eval.

Downloads a pretrained HF checkpoint (e.g. ``LinWeizheDragon/PreFLMR_ViT-B``
— the reference's retriever weights,
`tools/convert_flmr_original_checkpoint_to_pytorch.py:34-41`), bridges the
torch state dict into this framework's Flax params via
``hf_bridge.flmr_params``, runs a query/doc smoke forward, and saves the
bridged params with orbax for the executors' ``checkpoint_dir`` option.

This environment has no network egress; the download step degrades into a
clear error and the tool works from a pre-downloaded ``--local-dir``.

Usage:
  python tools/fetch_and_bridge.py --repo LinWeizheDragon/PreFLMR_ViT-B \
      --out bridged/preflmr_vit_b
  python tools/fetch_and_bridge.py --local-dir /path/to/ckpt --out bridged/x
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(repo: str, cache_dir: str) -> str:
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(repo, cache_dir=cache_dir)
    except Exception as e:  # no network / no hub
        raise SystemExit(
            f"could not download {repo}: {e}\n"
            "This environment has no network egress — pre-download the "
            "checkpoint elsewhere and pass --local-dir.") from e


def _load_tokenizer_from(ckpt_dir: str, subfolders: tuple):
    from transformers import AutoTokenizer

    for sub in subfolders:
        path = os.path.join(ckpt_dir, sub)
        if os.path.exists(os.path.join(path, "tokenizer_config.json")) or \
                os.path.exists(os.path.join(path, "vocab.txt")):
            return AutoTokenizer.from_pretrained(path)
    return None


def _instruction_token_id_from(ckpt_dir: str, instruction_token: str) -> int:
    """Resolve the instruction token id through the checkpoint's own query
    tokenizer (reference `modeling_flmr.py:711-716` does this at model init);
    leaving it unresolved would make instruction masking silently inert."""
    from reranking_multimodal_retrievers_tpu.models.tokenization import (
        instruction_token_id,
    )

    tok = _load_tokenizer_from(ckpt_dir, ("query_tokenizer", "tokenizer", "."))
    if tok is None:
        raise SystemExit(
            f"config sets mask_instruction_token={instruction_token!r} but no "
            f"query tokenizer was found under {ckpt_dir} to resolve its id — "
            "instruction masking would be silently inert. Pass a checkpoint "
            "dir containing the query_tokenizer/ subfolder.")
    return instruction_token_id(tok, instruction_token)


def _punctuation_ids_from(ckpt_dir: str) -> tuple:
    """Resolve the punctuation skiplist through the checkpoint's context
    tokenizer (reference `modeling_flmr.py:701-709`); an empty skiplist would
    make mask_punctuation silently inert."""
    from reranking_multimodal_retrievers_tpu.models.tokenization import (
        punctuation_skiplist_ids,
    )

    tok = _load_tokenizer_from(
        ckpt_dir, ("context_tokenizer", "query_tokenizer", "tokenizer", "."))
    if tok is None:
        raise SystemExit(
            f"config sets mask_punctuation but no context tokenizer was found "
            f"under {ckpt_dir} to build the skiplist — punctuation masking "
            "would be silently inert.")
    return punctuation_skiplist_ids(tok)


def flmr_config_from_hf(config_path: str):
    """Map the HF FLMRConfig json onto this framework's FLMRConfig."""
    from reranking_multimodal_retrievers_tpu.models import FLMRConfig
    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.vit import CLIPVisionConfig

    with open(config_path) as f:
        hf = json.load(f)
    tc, vc = hf["text_config"], hf["vision_config"]
    instr_tok = hf.get("mask_instruction_token")
    return FLMRConfig(
        text_config=BertConfig(
            vocab_size=tc.get("vocab_size", 30522),
            hidden_size=tc.get("hidden_size", 768),
            num_hidden_layers=tc.get("num_hidden_layers", 12),
            num_attention_heads=tc.get("num_attention_heads", 12),
            intermediate_size=tc.get("intermediate_size", 3072),
            max_position_embeddings=tc.get("max_position_embeddings", 512),
        ),
        vision_config=CLIPVisionConfig(
            hidden_size=vc.get("hidden_size", 768),
            intermediate_size=vc.get("intermediate_size", 3072),
            num_hidden_layers=vc.get("num_hidden_layers", 12),
            num_attention_heads=vc.get("num_attention_heads", 12),
            image_size=vc.get("image_size", 224),
            patch_size=vc.get("patch_size", 32),
        ),
        dim=hf.get("dim", 128),
        mapping_network_prefix_length=hf.get(
            "mapping_network_prefix_length", 32),
        use_vision_encoder=hf.get("use_vision_encoder", True),
        use_transformer_mapping_network=hf.get(
            "use_transformer_mapping_network", False),
        transformer_mapping_num_hidden_layers=hf.get(
            "transformer_mapping_num_hidden_layers", 1) or 1,
        transformer_mapping_cross_attention_length=hf.get(
            "transformer_mapping_cross_attention_length", 32),
        mask_punctuation=hf.get("mask_punctuation", True),
        punctuation_token_ids=(
            _punctuation_ids_from(os.path.dirname(config_path))
            if hf.get("mask_punctuation", True) else ()),
        mask_instruction=bool(instr_tok),
        instruction_token_id=(
            _instruction_token_id_from(os.path.dirname(config_path), instr_tok)
            if instr_tok else -1),
        separate_query_and_context_text_encoder=hf.get(
            "separate_query_and_context_text_encoder", False),
        separate_query_and_context_vision_encoder=hf.get(
            "separate_query_and_context_vision_encoder", False),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="LinWeizheDragon/PreFLMR_ViT-B")
    ap.add_argument("--local-dir", default=None,
                    help="pre-downloaded checkpoint dir (skips fetch)")
    ap.add_argument("--cache-dir", default="cache/hub")
    ap.add_argument("--out", required=True,
                    help="output dir for the bridged orbax params")
    args = ap.parse_args(argv)

    src = args.local_dir or fetch(args.repo, args.cache_dir)
    cfg_path = os.path.join(src, "config.json")
    if not os.path.exists(cfg_path):
        raise SystemExit(f"no config.json under {src}")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from reranking_multimodal_retrievers_tpu.models import FLMRModelForRetrieval
    from reranking_multimodal_retrievers_tpu.models.hf_bridge import (
        flmr_params, load_torch_checkpoint_dir,
    )

    cfg = flmr_config_from_hf(cfg_path)
    print(f"[bridge] config: dim={cfg.dim} text={cfg.text_config.hidden_size}"
          f"x{cfg.text_config.num_hidden_layers} "
          f"vision={cfg.vision_config.hidden_size}"
          f"x{cfg.vision_config.num_hidden_layers}")
    sd = load_torch_checkpoint_dir(src)
    params = flmr_params(sd, cfg)

    model = FLMRModelForRetrieval(cfg)
    img = cfg.vision_config.image_size
    out = model.apply(
        {"params": params},
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
        pixel_values=jnp.zeros((1, 3, img, img), jnp.float32),
        method=FLMRModelForRetrieval.query,
    )
    q = np.asarray(out.late_interaction_output)
    assert np.all(np.isfinite(q)), "bridged query forward is non-finite"
    print(f"[bridge] smoke query forward OK: {q.shape}, "
          f"norm={np.linalg.norm(q[0, 0]):.4f}")

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    out_dir = os.path.abspath(args.out)
    ckptr.save(out_dir, {"params": jax.tree.map(np.asarray, params)},
               force=True)
    print(f"[bridge] saved bridged params -> {out_dir}")
    print("Point model_config.checkpoint_dir at the ORIGINAL torch dir, or "
          "load this orbax tree via training.checkpointing.CheckpointManager."
          )
    return 0


if __name__ == "__main__":
    sys.exit(main())
