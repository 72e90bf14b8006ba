"""Tensor-parallel parameter layouts (parallel/tensor_parallel.py).

The reference trains DDP-only (SURVEY §2.10); TP here targets the rebuild's
larger backbones. Correctness bar: a dp×tp mesh step must produce the SAME
losses and updated params as the replicated-DP step — the layout is purely
a placement annotation, GSPMD inserts the collectives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from reranking_multimodal_retrievers_tpu.parallel import (
    MODEL_AXIS, make_mesh, replicate, shard_batch,
    tp_describe, tp_partition_spec, tp_shard_tree,
)
from reranking_multimodal_retrievers_tpu.training import (
    TrainState, make_optimizer, make_train_step,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs 4 virtual devices"
)


def _setup():
    from __graft_entry__ import _example_batch, _flagship_config
    from reranking_multimodal_retrievers_tpu.models import FLMRModelForRetrieval

    cfg = _flagship_config()
    model = FLMRModelForRetrieval(cfg)
    batch = _example_batch(B=4)
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    tx, _ = make_optimizer(params, optimizer_name="AdamW", lr=1e-3,
                           scheduler="constant", num_warmup_steps=0,
                           num_training_steps=10)
    return model, batch, params, tx


def test_partition_rules_cover_attention_and_ffn():
    model, batch, params, _ = _setup()
    specs = tp_describe(params)
    # column-parallel QKV + FFN-up, row-parallel out + FFN-down
    assert any(k.endswith("attention/query/kernel") and v == P(None, MODEL_AXIS)
               for k, v in specs.items())
    assert any(k.endswith("intermediate/kernel") and v == P(None, MODEL_AXIS)
               for k, v in specs.items())
    assert any(k.endswith("attention/out/kernel") and v == P(MODEL_AXIS, None)
               for k, v in specs.items())
    assert any(k.endswith("output/kernel") and v == P(MODEL_AXIS, None)
               for k, v in specs.items())
    # embeddings / layernorms replicated (absent from the non-trivial map)
    assert not any("word_embeddings" in k or "layernorm" in k for k in specs)


def test_dp_tp_step_matches_replicated_dp():
    model, batch, params, tx = _setup()

    apply_fn = lambda p, **kw: model.apply({"params": p}, **kw)

    # device_put may alias the source buffers, and the step donates its
    # state — give each branch its own host copy of the initial params
    params_dp = jax.tree_util.tree_map(np.asarray, params)
    params_tp = jax.tree_util.tree_map(np.asarray, params)

    # replicated DP over 4 devices
    mesh_dp = make_mesh(n_data=4)
    step_dp = make_train_step(apply_fn, tx, mesh=mesh_dp, loss_key="ib_loss")
    st_dp = replicate(mesh_dp, TrainState.create(params_dp, tx))
    st_dp, m_dp = step_dp(st_dp, shard_batch(mesh_dp, batch))

    # 2 data × 2 model with TP-sharded params
    mesh_tp = make_mesh(n_data=2, n_model=2)
    step_tp = make_train_step(apply_fn, tx, mesh=mesh_tp, loss_key="ib_loss",
                              tensor_parallel=True)
    st_tp = tp_shard_tree(mesh_tp, TrainState.create(params_tp, tx))
    # the weight shards really live on the model axis
    qk = st_tp.params["context_text_encoder"]["encoder"]["layer_0"][
        "attention"]["query"]["kernel"]
    assert qk.sharding.spec == P(None, MODEL_AXIS)
    st_tp, m_tp = step_tp(st_tp, shard_batch(mesh_tp, batch))

    np.testing.assert_allclose(float(m_dp["total_loss"]),
                               float(m_tp["total_loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=2e-5)
    # updated params agree (gather the TP shards back)
    a = jax.device_get(st_dp.params["context_text_encoder_linear"]["kernel"])
    b = jax.device_get(st_tp.params["context_text_encoder_linear"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)
    qk_dp = jax.device_get(st_dp.params["context_text_encoder"]["encoder"][
        "layer_0"]["attention"]["query"]["kernel"])
    qk_tp = jax.device_get(st_tp.params["context_text_encoder"]["encoder"][
        "layer_0"]["attention"]["query"]["kernel"])
    np.testing.assert_allclose(qk_dp, qk_tp, atol=2e-5, rtol=1e-4)


def test_tp_state_stays_sharded_across_steps():
    model, batch, params, tx = _setup()
    mesh_tp = make_mesh(n_data=2, n_model=2)
    step_tp = make_train_step(
        lambda p, **kw: model.apply({"params": p}, **kw), tx, mesh=mesh_tp,
        loss_key="ib_loss", tensor_parallel=True)
    params_c = jax.tree_util.tree_map(np.asarray, params)
    st = tp_shard_tree(mesh_tp, TrainState.create(params_c, tx))
    for _ in range(2):
        st, _ = step_tp(st, shard_batch(mesh_tp, batch))
    qk = st.params["context_text_encoder"]["encoder"]["layer_0"][
        "attention"]["query"]["kernel"]
    assert qk.sharding.spec == P(None, MODEL_AXIS)
    # adam moments keep the same layout (mirrored tree path rule)
    flat = jax.tree_util.tree_flatten_with_path(st.opt_state)[0]
    mu_specs = [leaf.sharding.spec for path, leaf in flat
                if any(getattr(k, "key", "") == "query" for k in path)
                and getattr(path[-1], "key", "") == "kernel"]
    assert mu_specs and all(s == P(None, MODEL_AXIS) for s in mu_specs)


# ---------------------------------------------------------------------------
# TP for the 2.7b-class decoder rerankers (VERDICT r2 #5): partition rules
# must cover the LoRA-wrapped OPT / T5 attention+FFN (and the BLIP2
# Q-Former), and a dp×tp scoring pass must agree with single-device.
# ---------------------------------------------------------------------------


def _blip2_rerank(opt: bool):
    from reranking_multimodal_retrievers_tpu.models.blip2 import Blip2Config
    from reranking_multimodal_retrievers_tpu.models.opt import OPTConfig
    from reranking_multimodal_retrievers_tpu.models.t5 import T5Config
    from reranking_multimodal_retrievers_tpu.models.rerankers.decoder import (
        Blip2DecoderRerankModel,
        Blip2RerankConfig,
    )

    if opt:
        text = OPTConfig.tiny(lora_r=4)
        blip2 = Blip2Config.tiny_opt(text_config=text)
    else:
        text = T5Config.tiny(lora_r=4)
        blip2 = Blip2Config.tiny(text_config=text)
    cfg = Blip2RerankConfig.tiny(blip2=blip2)
    model = Blip2DecoderRerankModel(cfg)

    B, nway, L = 4, 2, 10
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(1, 60, size=(B * nway, L)),
                              jnp.int32),
        attention_mask=jnp.ones((B * nway, L), jnp.int32),
        pixel_values=jnp.asarray(
            rng.normal(size=(B, 3, 32, 32)), jnp.float32),
        num_negative_examples=nway - 1,
    )
    params = model.init(jax.random.PRNGKey(0), **batch)["params"]
    return model, params, batch


@pytest.mark.parametrize("opt", [True, False], ids=["opt", "t5"])
def test_decoder_reranker_tp_rules_cover_lora_attention_ffn(opt):
    _, params, _ = _blip2_rerank(opt)
    specs = tp_describe(params)
    if opt:
        # LoRA-wrapped q/v: base kernel column-parallel, lora_b follows it
        assert any(k.endswith("self_attn/q_proj/base/kernel")
                   and v == P(None, MODEL_AXIS) for k, v in specs.items())
        assert any(k.endswith("self_attn/q_proj/lora_b")
                   and v == P(None, MODEL_AXIS) for k, v in specs.items())
        assert any(k.endswith("self_attn/out_proj/kernel")
                   and v == P(MODEL_AXIS, None) for k, v in specs.items())
        assert any(k.endswith("fc1/kernel") and v == P(None, MODEL_AXIS)
                   for k, v in specs.items())
        assert any(k.endswith("fc2/kernel") and v == P(MODEL_AXIS, None)
                   for k, v in specs.items())
        # lora_a of a column-parallel projection stays replicated
        assert not any(k.endswith("q_proj/lora_a") for k in specs)
    else:
        assert any(k.endswith("self_attn/q/base/kernel")
                   and v == P(None, MODEL_AXIS) for k, v in specs.items())
        assert any(k.endswith("self_attn/v/lora_b")
                   and v == P(None, MODEL_AXIS) for k, v in specs.items())
        assert any(k.endswith("self_attn/o/kernel")
                   and v == P(MODEL_AXIS, None) for k, v in specs.items())
        assert any(k.endswith("ff/wi_0/kernel") and v == P(None, MODEL_AXIS)
                   for k, v in specs.items())
        assert any(k.endswith("ff/wo/kernel") and v == P(MODEL_AXIS, None)
                   for k, v in specs.items())
        assert any(k.endswith("relative_attention_bias/embedding")
                   and v == P(None, MODEL_AXIS) for k, v in specs.items())
    # BLIP2 Q-Former attention rides the generic query/key/value/out rule
    assert any("attention/query/kernel" in k and v == P(None, MODEL_AXIS)
               for k, v in specs.items())
    assert any("attention/out/kernel" in k and v == P(MODEL_AXIS, None)
               for k, v in specs.items())
    # embeddings/layernorms replicated
    assert not any("embed_tokens" in k or "layernorm" in k.lower()
                   for k in specs)


@pytest.mark.parametrize("opt", [True, False], ids=["opt", "t5"])
def test_decoder_reranker_dp_tp_scoring_matches_single_device(opt):
    from jax.sharding import NamedSharding

    model, params, batch = _blip2_rerank(opt)
    nway = batch.pop("num_negative_examples") + 1

    def score(p, input_ids, attention_mask, pixel_values):
        out = model.apply(
            {"params": p}, input_ids=input_ids,
            attention_mask=attention_mask, pixel_values=pixel_values,
            num_negative_examples=nway - 1)
        return out.logits, out.loss

    # single-device reference
    ref_logits, ref_loss = jax.jit(score)(params, **batch)

    mesh = make_mesh(n_data=2, n_model=2)
    p_tp = tp_shard_tree(mesh, params)
    data = NamedSharding(mesh, P("data"))
    sharded = {
        "input_ids": jax.device_put(batch["input_ids"], data),
        "attention_mask": jax.device_put(batch["attention_mask"], data),
        "pixel_values": jax.device_put(batch["pixel_values"], data),
    }
    out_sh = NamedSharding(mesh, P())
    tp_logits, tp_loss = jax.jit(
        score, out_shardings=(out_sh, out_sh))(p_tp, **sharded)

    np.testing.assert_allclose(np.asarray(ref_logits),
                               np.asarray(tp_logits), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(float(ref_loss), float(tp_loss),
                               atol=2e-5, rtol=2e-5)
