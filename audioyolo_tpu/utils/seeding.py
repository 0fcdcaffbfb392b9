"""Determinism helpers (reference seeds numpy/random/torch + cudnn flags,
``train.py:19-27``; under JAX, jit purity + explicit PRNG keys give
reproducibility for free — the only ambient state is python/numpy RNG used by
the host-side data loader shuffle)."""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int = 42) -> None:
    random.seed(seed)
    np.random.seed(seed)
