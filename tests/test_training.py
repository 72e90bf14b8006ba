"""Training-layer tests: optimizer groups, freezing, schedules, and a real
SPMD train step over the 8-device CPU mesh that reduces the loss."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from reranking_multimodal_retrievers_tpu.models import FLMRConfig, FLMRModelForRetrieval
from reranking_multimodal_retrievers_tpu.parallel import make_mesh, shard_batch, replicate
from reranking_multimodal_retrievers_tpu.training import (
    TrainState,
    label_params,
    make_optimizer,
    make_schedule,
    make_train_step,
)


def make_batch(rng, B, nway=2, Lq=8, Ld=12):
    return dict(
        query_input_ids=jnp.asarray(rng.integers(10, 1000, size=(B, Lq)), jnp.int32),
        query_attention_mask=jnp.ones((B, Lq), jnp.int32),
        query_pixel_values=jnp.asarray(rng.normal(size=(B, 3, 32, 32)), jnp.float32),
        context_input_ids=jnp.asarray(rng.integers(10, 1000, size=(B * nway, Ld)), jnp.int32),
        context_attention_mask=jnp.ones((B * nway, Ld), jnp.int32),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = FLMRConfig.tiny()
    model = FLMRModelForRetrieval(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, B=8)
    variables = model.init(jax.random.PRNGKey(0), **batch)
    return cfg, model, variables["params"], rng


def test_schedules():
    lin = make_schedule("linear", 1.0, num_warmup_steps=10, num_training_steps=100)
    assert float(lin(0)) == 0.0
    assert abs(float(lin(10)) - 1.0) < 1e-6
    assert float(lin(100)) < 0.01
    cos = make_schedule("cosine", 1.0, num_warmup_steps=5, num_training_steps=50)
    assert float(cos(5)) == pytest.approx(1.0, abs=1e-5)
    const = make_schedule(None, 0.5, num_warmup_steps=4)
    assert float(const(2)) == pytest.approx(0.25)
    assert float(const(1000)) == pytest.approx(0.5)


def test_param_labels_and_freezing(setup):
    _, _, params, _ = setup
    labels = label_params(
        params,
        group_patterns=("vision_projection",),
        frozen_patterns=("vision_encoder",),
    )
    flat = jax.tree_util.tree_leaves_with_path(labels)
    lab = {"/".join(str(getattr(p, "key", p)) for p in path): v for path, v in flat}
    assert any(v == "frozen" for v in lab.values())
    assert any(v == "mapping" for v in lab.values())
    assert any(v == "main" for v in lab.values())
    # every vision-encoder leaf frozen
    for k, v in lab.items():
        if "vision_encoder" in k:
            assert v == "frozen", k


def test_train_step_reduces_loss_and_respects_freezing(setup):
    cfg, model, params, rng = setup
    # deep-copy: the jitted step donates its input state, and device_put may
    # alias the fixture's buffers
    params = jax.tree_util.tree_map(jnp.copy, params)
    tx, _ = make_optimizer(
        params,
        optimizer_name="AdamW",
        lr=1e-3,
        scheduler=None,
        frozen_patterns=("vision_encoder",),
        group_patterns=("vision_projection",),
        mapping_network_lr=1e-4,
    )
    mesh = make_mesh()
    step = make_train_step(
        lambda p, **kw: model.apply({"params": p}, **kw), tx, mesh=mesh,
        loss_key="ib_loss",
    )
    state = TrainState.create(params, tx)
    state = replicate(mesh, state)
    frozen_before = np.asarray(
        jax.device_get(
            params["context_vision_encoder"]["layer_0"]["fc1"]["kernel"]
        )
    )
    batch = shard_batch(mesh, make_batch(rng, B=8))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0], losses
    frozen_after = np.asarray(
        jax.device_get(
            state.params["context_vision_encoder"]["layer_0"]["fc1"]["kernel"]
        )
    )
    np.testing.assert_array_equal(frozen_before, frozen_after)
    assert int(jax.device_get(state.step)) == 5


def test_nan_batch_skips_update_then_recovers(setup):
    """The NaN guard takes the lax.cond skip branch on a poisoned batch —
    params AND opt state bit-unchanged, grads_finite=0, step still
    increments — and the next healthy step trains normally (the guard's
    contract: long runs survive a bad batch)."""
    cfg, model, params, rng = setup
    params = jax.tree_util.tree_map(jnp.copy, params)
    tx, _ = make_optimizer(params, optimizer_name="AdamW", lr=1e-3,
                           scheduler=None)
    step = make_train_step(
        lambda p, **kw: model.apply({"params": p}, **kw), tx, mesh=None,
        loss_key="ib_loss",
    )
    state = TrainState.create(params, tx)
    good = make_batch(rng, B=2)
    bad = dict(good)
    bad["query_pixel_values"] = good["query_pixel_values"].at[0, 0, 0, 0].set(
        jnp.nan)
    before = jax.device_get(state.params)
    state, metrics = step(state, bad)
    assert float(metrics["grads_finite"]) == 0.0
    assert int(jax.device_get(state.step)) == 1
    after = jax.device_get(state.params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(after),
            jax.tree_util.tree_leaves_with_path(before)):
        np.testing.assert_array_equal(a, b, err_msg=jax.tree_util.keystr(pa))
    state, metrics = step(state, good)
    assert float(metrics["grads_finite"]) == 1.0
    assert np.isfinite(float(metrics["total_loss"]))
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(np.any(a != b)), jax.device_get(state.params), after)
    assert any(jax.tree_util.tree_leaves(changed))


def test_training_stays_finite_with_masked_rows(setup):
    """Regression: padded/skiplisted context tokens produce all-zero rows
    before L2 normalization; the naive normalize had a NaN gradient at zero
    rows which corrupted params at step 1 (every checked-in round-1 run went
    NaN at step 2). Assert ≥10 finite, decreasing steps on a batch that
    exercises pad + skiplist masking."""
    cfg, model, params, rng = setup
    params = jax.tree_util.tree_map(jnp.copy, params)
    batch = make_batch(rng, B=8)
    # pad tails (id 0 + attention 0) and skiplist tokens (tiny cfg: ids 5/6/7)
    batch["context_input_ids"] = (
        batch["context_input_ids"].at[:, 8:].set(0).at[:, 3].set(5)
    )
    batch["context_attention_mask"] = batch["context_attention_mask"].at[:, 8:].set(0)
    batch["query_attention_mask"] = batch["query_attention_mask"].at[:, 6:].set(0)

    # grads must be finite everywhere, including the text-encoder embedding
    def loss_fn(p):
        out = model.apply({"params": p}, **batch, num_negative_examples=1)
        return out.in_batch_negative_loss

    grads = jax.grad(loss_fn)(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.all(np.isfinite(g)), jax.tree_util.keystr(path)

    tx, _ = make_optimizer(
        params, optimizer_name="AdamW", lr=1e-3, scheduler="linear",
        num_warmup_steps=2, num_training_steps=20, grad_clip=1.0,
        frozen_patterns=("vision_encoder",), group_patterns=("vision_projection",),
        mapping_network_lr=1e-3,
    )
    mesh = make_mesh()
    step = make_train_step(
        lambda p, **kw: model.apply({"params": p}, **kw), tx, mesh=mesh,
        loss_key="ib_loss",
    )
    state = replicate(mesh, TrainState.create(params, tx))
    sharded = shard_batch(mesh, batch)
    losses = []
    for _ in range(10):
        state, metrics = step(state, sharded)
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses[-1]), losses
        assert float(metrics["grads_finite"]) == 1.0, losses
    assert losses[-1] < losses[0], losses


def test_single_device_step_matches_api(setup):
    cfg, model, params, rng = setup
    tx, _ = make_optimizer(params, lr=1e-3)
    step = make_train_step(
        lambda p, **kw: model.apply({"params": p}, **kw), tx, mesh=None,
        loss_key="sum",
    )
    state = TrainState.create(params, tx)
    state, metrics = step(state, make_batch(rng, B=2))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["total_loss"]) == pytest.approx(
        float(metrics["loss"]) + float(metrics["ib_loss"]), rel=1e-5
    )


def test_schedules_zero_warmup_full_lr_at_step0():
    """num_warmup_steps=0 means NO warmup (HF parity): step 0 runs at full
    lr — a forced 1-step warmup used to waste the first batch at lr=0."""
    lin = make_schedule("linear", 1.0, num_warmup_steps=0,
                        num_training_steps=100)
    assert float(lin(0)) == pytest.approx(1.0)
    cos = make_schedule("cosine", 1.0, num_warmup_steps=0,
                        num_training_steps=50)
    assert float(cos(0)) == pytest.approx(1.0)
    const = make_schedule(None, 0.5, num_warmup_steps=0)
    assert float(const(0)) == pytest.approx(0.5)


def test_checkpoint_prune_keeps_unscored_by_recency(tmp_path):
    """A monitor that never appears in saved metrics must NOT cause every
    non-last checkpoint to be pruned — unscored checkpoints are kept by
    recency up to save_top_k (regression: only 'last' used to survive)."""
    import numpy as np

    from reranking_multimodal_retrievers_tpu.training.checkpointing import (
        CheckpointManager,
    )

    mgr = CheckpointManager(str(tmp_path / "ckpts"),
                            monitor="recall_at_5", mode="max", save_top_k=2)
    state = {"w": np.zeros((2,), np.float32)}
    for step in (1, 2, 3):
        mgr.save(state, step=step, metrics={"loss": 1.0 / step})
    names = {c["name"] for c in mgr._index["checkpoints"]}
    # newest two survive (top-k budget by recency) — not just 'last'
    assert names == {"step_2", "step_3"}, names
    import os

    for n in names:
        assert os.path.isdir(str(tmp_path / "ckpts" / n))
