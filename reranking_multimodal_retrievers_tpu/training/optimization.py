"""Optimizers, schedules, and parameter-group labeling (optax).

Capability parity with the reference's optimizer factory
(`runway_for_ml/executors/base_executor.py:199-269` — AdamW/Adafactor/Adam ×
linear/cosine/constant-with-warmup) and the FLMR executor's two LR groups
split on the ``late_interaction_adapter`` name substring
(`src/executors/FLMR_base_executor.py:311-336`), plus encoder freezing
(`FLMR_base_executor.py:185-189`) expressed as an optax ``set_to_zero``
partition instead of ``requires_grad`` mutation.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import jax
import optax


def make_schedule(
    name: Optional[str],
    lr: float,
    num_warmup_steps: int = 0,
    num_training_steps: Optional[int] = None,
    eta_min: float = 1e-5,
):
    """linear | cosine | constant (default), all with linear warmup.

    ``num_warmup_steps=0`` means NO warmup — step 0 runs at full lr, matching
    HF's ``get_linear_schedule_with_warmup`` (a forced 1-step warmup used to
    waste the first batch at lr=0, the whole run under limit_batches=1)."""
    if name == "linear":
        assert num_training_steps is not None
        decay = optax.linear_schedule(
            lr, 0.0, max(num_training_steps - num_warmup_steps, 1)
        )
        if num_warmup_steps <= 0:
            return decay
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, num_warmup_steps), decay],
            [num_warmup_steps],
        )
    if name == "cosine":
        assert num_training_steps is not None
        if num_warmup_steps <= 0:
            return optax.cosine_decay_schedule(
                init_value=lr, decay_steps=num_training_steps,
                alpha=eta_min / lr if lr else 0.0,
            )
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=num_warmup_steps,
            decay_steps=num_training_steps,
            end_value=eta_min,
        )
    # constant with warmup
    if num_warmup_steps > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, num_warmup_steps), optax.constant_schedule(lr)],
            [num_warmup_steps],
        )
    return optax.constant_schedule(lr)


def _base_optimizer(name: str, schedule, weight_decay: float = 0.0, **kw):
    if name == "AdamW":
        return optax.adamw(schedule, weight_decay=weight_decay, **kw)
    if name == "Adam":
        return optax.adam(schedule, **kw)
    if name == "Adafactor":
        return optax.adafactor(schedule)
    raise ValueError(f"Invalid optimizer name: {name}")


def label_params(
    params,
    group_patterns: Sequence[str] = ("late_interaction_adapter",),
    frozen_patterns: Sequence[str] = (),
):
    """Label each leaf 'frozen' | 'mapping' | 'main' by path-substring match.

    ``group_patterns`` selects the second LR group (the reference matches the
    substring ``late_interaction_adapter`` in torch param names; callers can
    pass e.g. ``("vision_projection", "transformer_mapping")``).
    ``frozen_patterns`` emulates ``requires_grad=False`` (the reference
    freezes both vision encoders).
    """

    def label(path, _):
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        for pat in frozen_patterns:
            if pat in path_str:
                return "frozen"
        for pat in group_patterns:
            if pat in path_str:
                return "mapping"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    params,
    optimizer_name: str = "AdamW",
    lr: float = 1e-3,
    mapping_network_lr: Optional[float] = None,
    scheduler: Optional[str] = None,
    num_warmup_steps: int = 0,
    num_training_steps: Optional[int] = None,
    weight_decay: float = 0.0,
    group_patterns: Sequence[str] = ("late_interaction_adapter",),
    frozen_patterns: Sequence[str] = (),
    grad_clip: Optional[float] = None,
):
    """Build the (optionally multi-group) optax transform + its labels."""
    main_sched = make_schedule(scheduler, lr, num_warmup_steps, num_training_steps)
    mapping_sched = make_schedule(
        scheduler, mapping_network_lr if mapping_network_lr is not None else lr,
        num_warmup_steps, num_training_steps,
    )
    transforms = {
        "main": _base_optimizer(optimizer_name, main_sched, weight_decay),
        "mapping": _base_optimizer(optimizer_name, mapping_sched, weight_decay),
        "frozen": optax.set_to_zero(),
    }
    labels = label_params(params, group_patterns, frozen_patterns)
    tx = optax.multi_transform(transforms, labels)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx, labels
