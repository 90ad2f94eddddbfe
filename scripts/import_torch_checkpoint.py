"""Convert checkpoints between the PyTorch reference and this framework.

Migration path for reference users: a trained ``best.pth``
(``torch.save(model.state_dict())``, /root/reference/train.py:376-383)
becomes a ``best.msgpack`` loadable by this repo's train/val/predict CLIs —
and the reverse, so weights trained here load into the unmodified reference
with ``strict=True`` (/root/reference/val.py:68-69).

Direction is inferred from the input extension:
  .pth / .pt      -> import  (torch state_dict -> msgpack variables)
  .msgpack        -> export  (msgpack variables -> torch state_dict)

Usage (repo root):
    python scripts/import_torch_checkpoint.py --weights best.pth \
        --out best.msgpack [--model unet_resnet50] [--task binary]
        [--num-classes 1]

The (model, task, num-classes) flags follow val.py's conventions and must
match what the checkpoint was trained as; a mismatch fails loudly (every
key must map, both directions).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def resolve_total_classes(task: str, num_classes: int) -> int:
    if task in ("binary", "multitask"):
        return 2
    return num_classes + 1


def build_template(args):
    import jax

    from unet_embroidery_seg_tpu.models import build_model, init_model

    total = resolve_total_classes(args.task, args.num_classes)
    if args.task == "multitask":
        model = build_model(args.model, num_classes=1, num_seg_classes=1,
                            num_cls_classes=3)
    else:
        model = build_model(args.model, num_classes=total)
    # Param shapes are input-size independent; init small for speed.
    return init_model(model, jax.random.PRNGKey(0), (64, 64))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True,
                   help="Input checkpoint (.pth/.pt or .msgpack)")
    p.add_argument("--out", required=True, help="Output path")
    p.add_argument("--model", default="unet_resnet50")
    p.add_argument("--task", default="binary",
                   choices=["binary", "multiclass", "multitask"])
    p.add_argument("--num-classes", default=1, type=int,
                   help="Foreground classes (multiclass only; total = N+1)")
    args = p.parse_args()

    import torch

    from unet_embroidery_seg_tpu.engine import checkpoint
    from unet_embroidery_seg_tpu.utils import torch_interop

    ext = os.path.splitext(args.weights)[1].lower()
    if ext in (".pth", ".pt"):
        sd = torch.load(args.weights, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        template = build_template(args)
        variables = torch_interop.import_state_dict(args.model, template, sd)
        checkpoint.save_variables(args.out, variables)
        n = len(sd)
        print(f"[import] {args.weights} ({n} torch keys) -> {args.out}")
    elif ext == ".msgpack":
        variables = checkpoint.restore_variables(args.weights)
        sd = torch_interop.export_state_dict(args.model, variables)
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                   args.out)
        print(f"[export] {args.weights} -> {args.out} ({len(sd)} torch keys)")
    else:
        raise SystemExit(f"unknown checkpoint extension {ext!r}")


if __name__ == "__main__":
    main()
