"""Single-file msgpack checkpoints with flexible restore.

Replaces ``torch.save(model.state_dict())`` best/last checkpointing
(/root/reference/train.py:376-383) and improves on it: the full TrainState
(params + batch_stats + optimizer state + step) is saved, so training can
truly resume — the reference loses optimizer/epoch/RNG (SURVEY.md §5).

Format: flax.serialization msgpack of a plain nested dict. Model-only
restores (val/predict) read just params/batch_stats; ``restore_flexible``
implements the shape-matched partial load of model_factory.py:41-64.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

from unet_embroidery_seg_tpu.engine.state import TrainState
from unet_embroidery_seg_tpu.models.factory import load_weights_flexible


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_state(path: str, state: TrainState, extra: dict | None = None) -> None:
    """Serialize the full TrainState (+ optional metadata) to one file."""
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(serialization.to_state_dict(state.opt_state)),
        "step": int(state.step),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def master_variables(state: TrainState) -> dict:
    """Model variables with the f32 MASTER params when the optimizer holds them.

    Under AMP the TrainState params are the bf16 compute copies (TreeAdam /
    FlatAdam keep the f32 masters inside ``opt_state``), so saving
    ``state.variables`` would round best/last to bf16 — while the reference's
    ``best.pth`` state_dict is f32 (/root/reference/train.py:376-383). This
    slices the master tree out of the optimizer state so model-only
    checkpoints stay f32 and ``--weights`` finetunes never start from rounded
    weights. Falls back to ``state.variables`` when the optimizer keeps no
    master (optax chains, no-amp runs where params == master dtype).
    """
    master = getattr(state.opt_state, "master", None)
    if master is None:
        return state.variables
    if isinstance(master, jax.Array):
        # FlatAdam: one flat f32 arena; slice it back into the param treedef
        # (dtype is preserved — no cast to the bf16 compute dtype here).
        from unet_embroidery_seg_tpu.ops.flat_adam import _unflatten

        params = _unflatten(master, state.params)
    else:
        params = master  # TreeAdam: already a param-shaped f32 tree
    v = {"params": params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def save_variables(path: str, variables: dict) -> None:
    """Model-weights-only checkpoint (the ``state_dict()`` analogue)."""
    payload = {
        "params": _to_host(variables["params"]),
        "batch_stats": _to_host(variables.get("batch_stats", {})),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_payload(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_variables(path: str) -> dict:
    """Strict model-variables restore (val.py:68-69 / predict.py:35 analogue)."""
    payload = load_payload(path)
    out = {"params": payload["params"]}
    if payload.get("batch_stats"):
        out["batch_stats"] = payload["batch_stats"]
    return out


def restore_state(path: str, state: TrainState) -> tuple[TrainState, dict]:
    """Full-state restore onto a template TrainState (true resume)."""
    payload = load_payload(path)
    opt_state = serialization.from_state_dict(state.opt_state, payload["opt_state"])
    import jax.numpy as jnp

    new_state = state.replace(
        step=jnp.asarray(payload["step"], jnp.int32),
        params=jax.tree.map(jnp.asarray, payload["params"]),
        batch_stats=jax.tree.map(jnp.asarray, payload.get("batch_stats", {})),
        opt_state=opt_state,
    )
    return new_state, payload.get("extra", {})


def restore_variables_into_state(path: str, state: TrainState) -> TrainState:
    """Load a model-only checkpoint's params/batch_stats into a TrainState.

    Leaves are cast to the template state's leaf dtypes (when the trees
    match) so loading an f32 master checkpoint into a bf16-compute state
    keeps the jitted eval step's compiled signature — otherwise the post-
    training test eval would silently retrace to an f32 variant.
    """
    import jax.numpy as jnp

    def _like(template, loaded):
        try:
            return jax.tree.map(
                lambda t, l: jnp.asarray(l, dtype=t.dtype), template, loaded
            )
        except (ValueError, TypeError):  # structure mismatch: flexible caller
            return jax.tree.map(jnp.asarray, loaded)

    payload = load_payload(path)
    return state.replace(
        params=_like(state.params, payload["params"]),
        batch_stats=_like(state.batch_stats, payload.get("batch_stats", {})),
    )


def restore_flexible(path: str, variables: dict) -> tuple[dict, int, int]:
    """Shape-matched partial restore (model_factory.py:41-64 semantics)."""
    payload = load_payload(path)
    pretrained = {"params": payload["params"]}
    if payload.get("batch_stats"):
        pretrained["batch_stats"] = payload["batch_stats"]
    merged, loaded, skipped = load_weights_flexible(variables, pretrained)
    print(f"Loaded weights: {loaded} keys, Skipped: {skipped} keys")
    return merged, loaded, skipped
