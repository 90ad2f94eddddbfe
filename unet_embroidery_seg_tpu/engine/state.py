"""Functional training state (the torch ``model + optimizer`` replacement).

A single pytree that jitted steps take and return with donation, holding
master f32 params, BatchNorm running statistics, optimizer state, and the
step counter. Unlike the reference (which never saves optimizer state —
SURVEY.md §5 checkpoint gap), checkpointing this struct gives true resume.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: dict, tx) -> "TrainState":
        import jax.numpy as jnp

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)
        if hasattr(tx, "cast_params"):
            # FlatAdam: the f32 master lives in opt_state; the param tree is
            # stored in the compute dtype (bf16) so apply() never casts.
            params = tx.cast_params(params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
