"""Checkpoint interop with the PyTorch reference (both directions).

A reference user migrating here has trained ``best.pth`` checkpoints
(``torch.save(model.state_dict())``, /root/reference/train.py:376-383); this
module maps them onto this framework's variables tree — and back, so weights
trained here load into the unmodified reference with ``strict=True``
(/root/reference/val.py:68-69). The mapping is by NAME TRANSLATION (the Flax
modules mirror the reference topology one-to-one) plus layout conversion:

  - conv kernels: torch OIHW  <->  flax HWIO
  - linear weights: torch (out, in)  <->  flax (in, out)
  - BatchNorm: weight/bias/running_mean/running_var  <->
    params ``.../bn.scale|bias`` + batch_stats ``.../bn.mean|var``
  - ``num_batches_tracked``: dropped on import, emitted as 0 on export
    (torch only uses it for momentum=None, /root/reference never does)

Pure numpy — torch is only needed by the CLI (scripts/import_torch_checkpoint.py)
to read/write ``.pth`` files. The name maps cover all five model families
(/root/reference/model/model_factory.py:13-19); forward-output parity per
family is pinned in tests/test_torch_interop.py.
"""

from __future__ import annotations

import re

import numpy as np

# DoubleConv (reference model/unet_plain.py:8-15): nn.Sequential of
# [conv, bn, relu, conv, bn, relu] -> indices 0/1/3/4 carry parameters.
_DC = {"conv1": "net.0", "norm1": "net.1", "conv2": "net.3", "norm2": "net.4"}
_DC_GROUP = "(conv1|norm1|conv2|norm2)"


def _sub(rules: list[tuple[str, object]], module: str) -> str:
    """Apply every rule in order (re.sub, anchored patterns as written)."""
    for pat, repl in rules:
        module = re.sub(pat, repl, module)
    return module


def _backbone_rules(prefix: str) -> list[tuple[str, object]]:
    """ResNet-50 feature extractor (reference model/resnet_backbone.py):
    ours ``layer{L}_block{B}`` <-> torch ``layer{L}.{B}``; the projection
    shortcut is ``downsample`` Sequential[conv, bn] (:91-101)."""
    p = re.escape(prefix)
    return [
        (rf"^({p})layer(\d)_block(\d+)\.", r"\1layer\2.\3."),
        (rf"^({p}layer\d\.\d+)\.downsample_conv$", r"\1.downsample.0"),
        (rf"^({p}layer\d\.\d+)\.downsample_bn$", r"\1.downsample.1"),
    ]


def _up_conv_rules() -> list[tuple[str, object]]:
    """unet_resnet/multitask full-res head: Sequential[up, conv, relu, conv,
    relu] -> indices 1/3 (reference model/unet_resnet.py:70-76)."""
    return [
        (r"^up_conv\.conv1$", "up_conv.1"),
        (r"^up_conv\.conv2$", "up_conv.3"),
    ]


_DENSE_RULES = [
    # DenseConvBlock (reference model/unet_dualdense.py:5-47): each
    # _DenseLayer is Sequential[bn, relu, conv] -> 0/2; the 1x1 transition
    # is Sequential[conv, bn] -> 0/1.
    (r"dense\.norm(\d+)$", r"dense.layers.\1.net.0"),
    (r"dense\.conv(\d+)$", r"dense.layers.\1.net.2"),
    (r"trans_conv$", "trans.0"),
    (r"trans_bn$", "trans.1"),
]


def _model_rules(model_name: str) -> list[tuple[str, object]]:
    if model_name == "unet_plain":
        # Down = Sequential[maxpool, DoubleConv] -> .net.1 (unet_plain.py:21-30)
        return [
            (rf"^inc\.{_DC_GROUP}$", lambda m: f"inc.{_DC[m.group(1)]}"),
            (rf"^down(\d)\.conv\.{_DC_GROUP}$",
             lambda m: f"down{m.group(1)}.net.1.{_DC[m.group(2)]}"),
            (rf"^up(\d)\.conv\.{_DC_GROUP}$",
             lambda m: f"up{m.group(1)}.conv.{_DC[m.group(2)]}"),
        ]
    if model_name == "attention_unet":
        # Down = Sequential[maxpool, DoubleConv] -> .1 (unet_attention.py:61-65);
        # gate branches are Sequential[conv, bn] -> .0/.1 (:13-28).
        return [
            (rf"^inc\.{_DC_GROUP}$", lambda m: f"inc.{_DC[m.group(1)]}"),
            (rf"^down(\d)\.conv\.{_DC_GROUP}$",
             lambda m: f"down{m.group(1)}.1.{_DC[m.group(2)]}"),
            (r"^(up\d\.attn\.(?:theta|phi|psi))_bn$", r"\1.1"),
            (r"^(up\d\.attn\.(?:theta|phi|psi))$", r"\1.0"),
            (rf"^up(\d)\.conv\.{_DC_GROUP}$",
             lambda m: f"up{m.group(1)}.conv.{_DC[m.group(2)]}"),
        ]
    if model_name == "dualdense_unet":
        # Down = Sequential[maxpool, DenseConvBlock] -> .1 (unet_dualdense.py:80-83)
        return [(r"^down(\d)\.", r"down\1.1.")] + _DENSE_RULES
    if model_name == "unet_resnet50":
        return _backbone_rules("resnet.") + _up_conv_rules()
    if model_name == "multitask_unet":
        # cls head: Sequential[gap, flatten, linear, relu, dropout, linear]
        # -> 2/5 (reference model/unet_multitask.py:73-80).
        return _backbone_rules("encoder.") + _up_conv_rules() + [
            (r"^cls_fc1$", "cls_head.2"),
            (r"^cls_fc2$", "cls_head.5"),
        ]
    raise ValueError(f"no torch name map for model {model_name!r}")


# Leaf kinds: (our collection, our suffix) <-> torch suffix.
_LEAVES = [
    # (collection, ours_suffix, strip, torch_suffix)
    ("params", ".bn.scale", ".bn.scale", ".weight"),
    ("params", ".bn.bias", ".bn.bias", ".bias"),
    ("params", ".kernel", ".kernel", ".weight"),
    ("params", ".bias", ".bias", ".bias"),
    ("batch_stats", ".bn.mean", ".bn.mean", ".running_mean"),
    ("batch_stats", ".bn.var", ".bn.var", ".running_var"),
]


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for k in tree:
        p = f"{prefix}.{k}" if prefix else k
        if isinstance(tree[k], dict):
            out.update(_flatten(tree[k], p))
        else:
            out[p] = tree[k]
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for path, v in flat.items():
        node = out
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = v
    return out


def torch_key(model_name: str, collection: str, path: str) -> str:
    """Reference state_dict key for one of our (collection, dotted-path) leaves."""
    for col, suffix, strip, torch_suffix in _LEAVES:
        if col == collection and path.endswith(suffix):
            module = path[: -len(strip)]
            return _sub(_model_rules(model_name), module) + torch_suffix
    raise ValueError(f"unmappable leaf {collection}:{path}")


def _to_torch_layout(v: np.ndarray) -> np.ndarray:
    if v.ndim == 4:  # HWIO -> OIHW
        return np.transpose(v, (3, 2, 0, 1))
    if v.ndim == 2:  # (in, out) -> (out, in)
        return np.ascontiguousarray(v.T)
    return v


def _from_torch_layout(v: np.ndarray) -> np.ndarray:
    if v.ndim == 4:  # OIHW -> HWIO
        v = np.transpose(v, (2, 3, 1, 0))
    elif v.ndim == 2:
        v = v.T
    return np.ascontiguousarray(v)


def import_state_dict(model_name: str, variables: dict,
                      state_dict: dict[str, np.ndarray]) -> dict:
    """New variables tree built from a reference ``state_dict``.

    ``variables`` is a template (e.g. ``init_model(...)``) providing the tree
    structure, shapes, and dtypes; every template leaf must find its torch
    twin (strict, like /root/reference/val.py:68-69). Unused torch keys other
    than ``num_batches_tracked`` raise, so a wrong --model fails loudly.
    """
    out = {}
    used = set()
    for col in ("params", "batch_stats"):
        if col not in variables:
            continue
        flat = {}
        for path, tmpl in _flatten(variables[col]).items():
            key = torch_key(model_name, col, path)
            if key not in state_dict:
                raise KeyError(
                    f"reference checkpoint has no {key!r} "
                    f"(for {col}:{path})"
                )
            v = _from_torch_layout(np.asarray(state_dict[key]))
            if v.shape != tuple(tmpl.shape):
                raise ValueError(
                    f"{key!r}: shape {v.shape} != expected {tuple(tmpl.shape)}"
                )
            flat[path] = v.astype(np.asarray(tmpl).dtype)
            used.add(key)
        out[col] = _unflatten(flat)
    leftover = {
        k for k in state_dict
        if k not in used and not k.endswith("num_batches_tracked")
    }
    if leftover:
        raise KeyError(
            f"{len(leftover)} reference keys not consumed (wrong --model?): "
            f"{sorted(leftover)[:5]}..."
        )
    return out


def export_state_dict(model_name: str, variables: dict) -> dict[str, np.ndarray]:
    """Reference-loadable state_dict (strict=True) from our variables."""
    out: dict[str, np.ndarray] = {}
    for col in ("params", "batch_stats"):
        for path, v in _flatten(variables.get(col, {})).items():
            key = torch_key(model_name, col, path)
            out[key] = _to_torch_layout(np.asarray(v, dtype=np.float32))
    for key in [k for k in out if k.endswith(".running_mean")]:
        out[key[: -len("running_mean")] + "num_batches_tracked"] = np.zeros(
            (), np.int64
        )
    return out
