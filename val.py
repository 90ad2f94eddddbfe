"""Evaluation CLI on the test split (parity target: /root/reference/val.py).

Strict checkpoint restore, test-split evaluation, and the same console
reports: binary metric table, multitask seg+per-class cls accuracy, or the
multiclass metric dict.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from unet_embroidery_seg_tpu.data import CLASS_NAMES, DataLoader, SegmentationDataset, open_source
from unet_embroidery_seg_tpu.data.cache import CanvasCache
from unet_embroidery_seg_tpu.engine import TrainState, checkpoint, resident, steps
from unet_embroidery_seg_tpu.models import SUPPORTED_MODELS, build_model
from unet_embroidery_seg_tpu.ops import metrics as M
from unet_embroidery_seg_tpu.ops import schedules
from unet_embroidery_seg_tpu.utils import seed_everything


class LogColor:
    GREEN = "\033[1;32m"
    YELLOW = "\033[1;33m"
    RED = "\033[1;31m"
    RESET = "\033[0m"
    BLUE = "\033[1;34m"


def val(args):
    if args.task in ("binary", "multitask"):
        num_classes = 2
    else:
        num_classes = args.num_classes + 1
    os.makedirs(args.cache_dir, exist_ok=True)
    input_shape = [args.input_size, args.input_size]

    print(
        f"Loading HF Dataset from: {args.data_path}, config: {args.data_config}, split: test"
    )
    source = open_source(args.data_path, args.data_config, "test", args.cache_dir)
    use_resident = args.device_resident
    if use_resident is None:
        import jax

        use_resident = jax.default_backend() != "cpu"
    ds_task = "binary" if args.task == "multitask" else args.task
    if use_resident:
        cache = CanvasCache(
            source, tuple(input_shape), return_cls_label=(args.task == "multitask")
        )
        print(f"Test samples: {len(cache)}")
        loader = None
    else:
        cache = None
        dataset = SegmentationDataset(
            source,
            input_shape,
            num_classes,
            augmentation=False,
            task=ds_task,
            return_cls_label=(args.task == "multitask"),
            seed=11,
        )
        print(f"Test samples: {len(dataset)}")
        loader = DataLoader(dataset, batch_size=1, shuffle=False, prefetch=2)

    seed_everything(11)
    if args.amp is None:
        # Mirror train.py's per-config default so val reproduces the
        # test_metrics.json of a defaults training run (f32 for
        # resnet50+lovasz — PARITY.md; bf16 otherwise).
        from train import resolve_amp_default

        args.amp = resolve_amp_default(args.model, args.loss, args.task)
    dtype = jnp.bfloat16 if args.amp else None
    if args.task == "multitask":
        model = build_model(args.model, num_classes=1, num_seg_classes=1,
                            num_cls_classes=3, dtype=dtype,
                            decoder_width=args.decoder_width)
    else:
        model = build_model(args.model, num_classes=num_classes, dtype=dtype,
                            decoder_width=args.decoder_width)
    variables = checkpoint.restore_variables(args.weights)
    print(f"Model loaded from: {args.weights}")
    print("Starting evaluation...\n")

    tx = schedules.make_optimizer(1e-4)
    state = TrainState.create(variables, tx)

    def _resident_outs(eval_step, multitask):
        """Whole-split eval on device: scan over batches of the HBM canvases."""
        data = resident.upload(cache)
        chunk = resident.make_eval_chunk_fn(
            eval_step, tuple(input_shape),
            binary=(ds_task == "binary"), num_classes=num_classes,
            multitask=multitask,
        )
        idx, maskp = resident.epoch_index_plan(data.n, args.batch_size, 0, False, 11)
        return chunk(state, data, idx, maskp), len(idx)

    if args.task == "multitask":
        # --pos-weight passthrough (ADVICE r4): a checkpoint trained with
        # the multitask pos_weight escape hatch reports its val loss on the
        # same scale as training. IoU/confusion metrics are unaffected.
        pos_weight = float(args.pos_weight) if args.pos_weight else None
        eval_step = steps.make_multitask_eval_step(
            model, seg_loss_name=args.loss, pos_weight=pos_weight
        )
        seg_counts = np.zeros(4, np.int64)
        confusion = np.zeros((3, 3), np.int64)
        if use_resident:
            ((_t, _s, _c), sc, cf), _ = _resident_outs(eval_step, True)
            seg_counts += np.asarray(sc, np.int64).sum(axis=0)
            confusion += np.asarray(cf, np.int64).sum(axis=0)
        else:
            for batch, n_valid in loader.epoch(0):
                mask = (np.arange(batch.images.shape[0]) < n_valid).astype(np.float32)
                _, sc, cf = eval_step(state, batch.images, batch.pngs, batch.cls_labels, mask)
                seg_counts += np.asarray(sc, np.int64)
                confusion += np.asarray(cf, np.int64)
        seg_m = M.multitask_seg_metrics_from_counts(*seg_counts)
        correct, total = int(np.trace(confusion)), int(confusion.sum())
        cls_acc = 100.0 * correct / max(total, 1)
        print("=" * 50)
        print(f"{LogColor.BLUE}Multi-Task Evaluation Results{LogColor.RESET}")
        print("=" * 50)
        print(f"\n{LogColor.RED}Segmentation Metrics:{LogColor.RESET}")
        print(f"  IoU:  {seg_m['IoU']:.4f}")
        print(f"  Dice: {seg_m['Dice']:.4f}")
        print(f"\n{LogColor.RED}Classification Metrics:{LogColor.RESET}")
        print(f"  Overall Accuracy: {cls_acc:.2f}%")
        print("\n  Per-Class Accuracy:")
        for i, name in enumerate(CLASS_NAMES):
            n_i = int(confusion[i].sum())
            if n_i > 0:
                acc = 100.0 * confusion[i, i] / n_i
                print(f"    {name}: {acc:.2f}% ({n_i} samples)")
        print("=" * 50)
    elif args.task == "binary":
        eval_step = steps.make_binary_eval_step(model, args.loss)
        counts = np.zeros(4, np.int64)
        total_loss, seen = 0.0, 0
        if use_resident:
            (loss, c), seen = _resident_outs(eval_step, False)
            counts += np.asarray(c, np.int64).sum(axis=0)
            total_loss = float(np.asarray(loss).sum())
        else:
            for batch, n_valid in loader.epoch(0):
                mask = (np.arange(batch.images.shape[0]) < n_valid).astype(np.float32)
                loss, c = eval_step(state, batch.images, batch.pngs, mask)
                counts += np.asarray(c, np.int64)
                total_loss += float(loss)
                seen += 1
        metrics = M.binary_metrics_from_counts(*counts)
        metrics["Loss"] = total_loss / max(seen, 1)
        print(
            f"{LogColor.RED}Dice{LogColor.RESET}\t"
            f"{LogColor.RED}IoU{LogColor.RESET}\t"
            f"{LogColor.RED}Precision{LogColor.RESET}\t"
            f"{LogColor.RED}Recall{LogColor.RESET}\t"
            f"{LogColor.RED}Accuracy{LogColor.RESET}"
        )
        print(
            f"{metrics['Dice']:.4f}\t{metrics['IoU']:.4f}\t"
            f"{metrics['Precision']:.4f}\t{metrics['Recall']:.4f}\t"
            f"{metrics['Accuracy']:.4f}"
        )
        return metrics
    else:
        # Per-SAMPLE metric sums at any batch size — the same statistic as the
        # reference CLI's batch_size=1 loop (val.py:50-59 + per-batch-averaged
        # metrics, train_and_eval.py:480-495), which batch-averaged values at
        # bs>1 would NOT reproduce (class presence is per sample).
        eval_step = steps.make_multiclass_persample_eval_step(
            model, num_classes, use_dice=True
        )
        sums: dict[str, float] = {}
        loss_sum, n_total = 0.0, 0.0
        if use_resident:
            (loss_sums, m, n_valid), _ = _resident_outs(eval_step, False)
            loss_sum = float(np.asarray(loss_sums).sum())
            n_total = float(np.asarray(n_valid).sum())
            sums = {k: float(np.asarray(v).sum()) for k, v in m.items()}
        else:
            for batch, n_valid in loader.epoch(0):
                mask = (np.arange(batch.images.shape[0]) < n_valid).astype(np.float32)
                ls, m, nv = eval_step(state, batch.images, batch.pngs, mask)
                loss_sum += float(ls)
                n_total += float(nv)
                for k, v in m.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
        n_total = max(n_total, 1.0)
        metrics = {k: v / n_total for k, v in sums.items()}
        metrics["Loss"] = loss_sum / n_total
        print(metrics)
        return metrics


def parse_args(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="U-Net Validation with HF Dataset (TPU)")
    parser.add_argument("--data-path", default="./hf_datasets/merged_dataset_v2")
    parser.add_argument("--data-config", default="no-ai", choices=["full", "no-ai", "sam3"])
    parser.add_argument("--weights", default="run/train/exp/weights/best.msgpack")
    parser.add_argument("--task", default="binary",
                        choices=["binary", "multiclass", "multitask"])
    parser.add_argument("--decoder-width", default=1.0, type=float,
                        help="unet_resnet50 only: must match the width the "
                             "checkpoint was trained with (train.py "
                             "--decoder-width)")
    parser.add_argument("--model", default="unet_resnet50",
                        choices=sorted(SUPPORTED_MODELS.keys()))
    parser.add_argument("--loss", default="lovasz_hinge",
                        choices=["bce", "lovasz_hinge", "ce", "focal"])
    parser.add_argument("--num-classes", default=4, type=int)
    parser.add_argument("--pos-weight", default=None,
                        help="multitask only: the pos_weight the checkpoint "
                             "was TRAINED with (train.py --pos-weight), so "
                             "the reported loss is on the training scale. "
                             "Numeric only — 'auto' is data-dependent, so "
                             "pass the run's resolved value (config.json "
                             "'resolved_pos_weight', also printed by "
                             "train.py). Metrics other than loss are "
                             "unaffected")
    parser.add_argument("--input-size", default=512, type=int)
    parser.add_argument("--cache-dir", default=".hf-cache/datasets")
    parser.add_argument("--device", default="tpu", help="Accepted for parity; ignored")
    parser.add_argument("--amp", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="bf16 compute (default: train.py's per-config "
                             "rule, so eval reproduces training's dtype)")
    parser.add_argument("--batch-size", default=8, type=int,
                        help="Eval batch size on the device-resident path "
                             "(host path keeps the reference's bs=1)")
    parser.add_argument("--device-resident", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="Evaluate from HBM-resident canvases "
                             "(default: auto — on for TPU, off for CPU)")
    return parser.parse_args(argv)


if __name__ == "__main__":
    val(parse_args())
