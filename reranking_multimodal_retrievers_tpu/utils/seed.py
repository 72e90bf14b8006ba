"""Deterministic seeding (reference `runway_for_ml/utils/seed.py`).

JAX PRNGs are explicit keys, so 'seeding' here covers the host-side
randomness (python/numpy) used by samplers and data ops; model/update
randomness flows through ``jax.random.PRNGKey(seed)`` at call sites.
"""

import random

import numpy as np


def set_seed(seed: int) -> int:
    random.seed(seed)
    np.random.seed(seed)
    return seed
