"""Seeding utilities (parity: /root/reference/utils/utils.py:50-67).

JAX threads RNG keys explicitly, so there is far less global state to pin
than in torch; this seeds numpy/python for the host-side augmentation and
returns the root jax PRNGKey for everything on device.
"""

from __future__ import annotations

import random

import numpy as np

import jax


def seed_everything(seed: int = 11) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
