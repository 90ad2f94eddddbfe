"""U-Net training CLI (TPU-native; parity target: /root/reference/train.py).

Same argparse surface, same experiment-folder artifacts (config.json,
summary.json, test_metrics.json, val_metrics_history.{json,csv},
weights/{best,last}.msgpack, loss/metrics curves, vis/), same task modes —
but the engine is a jitted JAX train step with donated state, bf16 compute,
device-accumulated metrics, and mesh data parallelism.

Differences by design (TPU-first):
  - checkpoints are flax msgpack (full TrainState: true resume, which the
    reference lacks), named best.msgpack/last.msgpack;
  - AMP flag maps to bf16 compute (no GradScaler needed on TPU);
  - ``--data-path synthetic`` runs without any dataset on disk.
"""

from __future__ import annotations

import csv
import datetime
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.data import DataLoader, SegmentationDataset, open_source
from unet_embroidery_seg_tpu.data.cache import CanvasCache
from unet_embroidery_seg_tpu.engine import TrainState, checkpoint, resident, steps
from unet_embroidery_seg_tpu.models import SUPPORTED_MODELS, build_model, init_model
from unet_embroidery_seg_tpu.ops import schedules
from unet_embroidery_seg_tpu.parallel import make_mesh, replicate
from unet_embroidery_seg_tpu.utils import create_exp_folder, seed_everything
from unet_embroidery_seg_tpu.utils import profiling
from unet_embroidery_seg_tpu.utils.plotting import plot_training_curves
from unet_embroidery_seg_tpu.utils.vis_export import export_binary_visuals


class LogColor:
    GREEN = "\033[1;32m"
    YELLOW = "\033[1;33m"
    RED = "\033[1;31m"
    RESET = "\033[0m"
    BLUE = "\033[1;34m"


def resolve_amp_default(model: str, loss: str, task: str = "binary") -> bool:
    """Default compute dtype per config. Currently: bf16 for every config.

    History (PARITY.md): round 3's unpaired converged study flipped
    (binary, unet_resnet50, lovasz_hinge) to f32 on a seed-0 +0.026 IoU
    delta; the round-4 matched-init study (bit-identical torch-exported
    init, 4 seeds, paired per-seed f32-vs-bf16 arms on identical
    init+data) measured the dtype effect at -0.020 +/- 0.048 IoU — no
    systematic f32 advantage, and the weak-seed pathology inverted sides —
    so the f32 default was reverted (bf16 is also 1.48x faster on that
    step, BENCH). The hook stays (and keeps the model/loss/task signature)
    so val.py/predict.py mirror whatever rule future evidence installs;
    any future rule must key on the EFFECTIVE loss after multiclass
    lowering, as the f32 rule did.
    """
    del model, loss, task
    return True


def resolve_num_classes(args) -> int:
    if args.task == "binary":
        return 2
    if args.task == "multitask":
        return 2
    return args.num_classes + 1


def create_model_and_state(args, num_classes, rng, tx):
    dtype = jnp.bfloat16 if args.amp else None
    if args.task == "multitask":
        model = build_model(
            args.model, num_classes=1, num_seg_classes=1, num_cls_classes=3,
            dtype=dtype, decoder_width=args.decoder_width,
        )
    else:
        # Binary training uses the diff head (blocks.ClassHead): identical
        # params, but the model emits the (N, H, W) logit difference the
        # binary loss/metrics consume — skipping the 2-channel logits that
        # cost ~3.6 ms/step at 512^2 b8 (T(2,128)-tiled head fwd/bwd).
        model = build_model(
            args.model, num_classes=num_classes, dtype=dtype,
            diff_head=(args.task == "binary"),
            decoder_width=args.decoder_width,
        )
    variables = init_model(model, rng, (args.input_size, args.input_size))
    if args.weights:
        if os.path.exists(args.weights):
            variables, _, _ = checkpoint.restore_flexible(args.weights, variables)
        else:
            print(f"[WARN] weights not found: {args.weights}; training from scratch")
    state = TrainState.create(variables, tx)
    return model, state


def estimate_pos_weight(train_dataset, n_samples: int) -> float | None:
    """Auto pos_weight = neg/pos over <=n linspace-sampled items (train.py:189-205)."""
    total_pos = 0
    total_neg = 0
    n = min(n_samples, len(train_dataset))
    idxs = np.linspace(0, len(train_dataset) - 1, n, dtype=int)
    for i in idxs:
        _, png, _ = train_dataset.get(int(i), epoch=0)
        total_pos += int((png == 1).sum())
        total_neg += int((png == 0).sum())
    if total_pos > 0:
        pw = total_neg / total_pos
        print(f"[pos_weight auto] neg/pos = {pw:.4f} (samples={n})")
        return pw
    return None


class HostPipeline:
    """Reference-parity host augmentation feeding sharded device batches."""

    def __init__(self, loader: DataLoader, mesh, batch_size: int):
        self.loader = loader
        self.mesh = mesh
        self.batch_size = batch_size

    def __len__(self) -> int:
        return len(self.loader)

    def epoch(self, epoch: int):
        from unet_embroidery_seg_tpu.parallel import shard_batch_arrays as shard

        for batch, n_valid in self.loader.epoch(epoch):
            sm = (np.arange(self.batch_size) < n_valid).astype(np.float32)
            if batch.cls_labels is not None:
                images, pngs, cls_t, smd = shard(
                    self.mesh, batch.images, batch.pngs, batch.cls_labels, sm
                )
            else:
                images, pngs, smd = shard(self.mesh, batch.images, batch.pngs, sm)
                cls_t = None
            yield images, pngs, cls_t, smd, n_valid


def print_train_header():
    print(
        f"{LogColor.GREEN}Epoch{LogColor.RESET}{' ' * 12}"
        f"{LogColor.YELLOW}data_num{LogColor.RESET}{' ' * 12}"
        f"{LogColor.YELLOW}Loss{LogColor.RESET}{' ' * 12}"
        f"{LogColor.YELLOW}LR{LogColor.RESET}{' ' * 12}"
        f"{LogColor.YELLOW}Image_size{LogColor.RESET}{' ' * 12}"
        f"{LogColor.YELLOW}img/s{LogColor.RESET}"
    )


def print_train_row(epoch, train_epoch, it, n_batches, loss, lr, size, ips):
    e = f"{epoch + 1}/{train_epoch}"
    b = f"{it + 1}/{n_batches}"
    lo = f"{loss:.8f}"
    lrs = f"{lr:.8f}"
    print(
        f"\r{e}{' ' * (len('Epoch') + 12 - len(e))}"
        f"{b}{' ' * (len('data_num') + 12 - len(b))}"
        f"{lo}{' ' * (len('Loss') + 12 - len(lo))}"
        f"{lrs}{' ' * (len('LR') + 12 - len(lrs))}"
        f"{size}{' ' * (len('Image_size') + 12 - len(str(size)))}"
        f"{ips:.1f}",
        end="",
        flush=True,
    )


def train(args):
    # Fail fast on task/model mismatches the reference only surfaces as an
    # unpack crash deep in its epoch loop (/root/reference/train.py:244 —
    # ``seg_logits, cls_logits = model(images)`` with a single-head model).
    if (args.task == "multitask") != (args.model == "multitask_unet"):
        raise SystemExit(
            f"--task {args.task} is incompatible with --model {args.model}: "
            "multitask training requires the two-headed multitask_unet "
            "(and multitask_unet only trains under --task multitask)"
        )
    if args.amp is None:
        args.amp = resolve_amp_default(args.model, args.loss, args.task)
        if not args.amp:
            # Unreachable today: resolve_amp_default returns True for every
            # config since the matched-init study reverted the round-3 f32
            # flip (PARITY.md). Kept for any future rule that reintroduces
            # an f32 default — the message must come back with it.
            print(
                "[amp] defaulting to f32 for this config "
                "(see PARITY.md); pass --amp to force bf16"
            )
    rng = seed_everything(args.seed)
    num_classes = resolve_num_classes(args)
    train_epoch = args.epochs
    batch_size = args.batch_size

    mesh = make_mesh(n_data=args.mesh_data, n_space=args.mesh_space)
    n_devices = mesh.devices.size
    if batch_size % max(n_devices // args.mesh_space, 1) != 0:
        raise ValueError(
            f"batch size {batch_size} must divide the data axis "
            f"({mesh.shape}); adjust --batch-size or --mesh-data"
        )

    exp_folder, weights_folder = create_exp_folder()
    os.makedirs(args.cache_dir, exist_ok=True)
    input_shape = [args.input_size, args.input_size]

    with open(os.path.join(exp_folder, "config.json"), "w", encoding="utf-8") as f:
        json.dump(vars(args), f, ensure_ascii=False, indent=2)

    print(f"Loading HF Dataset from: {args.data_path}, config: {args.data_config}")
    return_cls_label = args.task == "multitask"
    ds_task = "binary" if args.task == "multitask" else args.task

    def make_ds(split, augmentation):
        source = open_source(args.data_path, args.data_config, split, args.cache_dir)
        return SegmentationDataset(
            source,
            input_shape,
            num_classes,
            augmentation=augmentation,
            task=ds_task,
            return_cls_label=return_cls_label,
            seed=args.seed,
        )

    use_device_aug = args.device_augment
    if use_device_aug is None:
        use_device_aug = jax.default_backend() != "cpu"

    if use_device_aug:
        print(
            "[input] device-resident path: uint8 canvases uploaded to HBM once, "
            "on-device augmentation, scan-chunked epochs"
        )
        train_cache = CanvasCache(
            open_source(args.data_path, args.data_config, "train", args.cache_dir),
            input_shape, return_cls_label=return_cls_label,
        )
        val_cache = CanvasCache(
            open_source(args.data_path, args.data_config, "validation", args.cache_dir),
            input_shape, return_cls_label=return_cls_label,
        )
        print(f"Train samples: {len(train_cache)}, Val samples: {len(val_cache)}")
        train_pipe = val_pipe = None
        train_dataset = None
    else:
        train_dataset = make_ds("train", True)
        val_dataset = make_ds("validation", False)
        print(f"Train samples: {len(train_dataset)}, Val samples: {len(val_dataset)}")
        train_pipe = HostPipeline(
            DataLoader(train_dataset, batch_size, shuffle=True, seed=args.seed,
                       prefetch=args.workers),
            mesh, batch_size,
        )
        val_pipe = HostPipeline(
            DataLoader(val_dataset, batch_size, shuffle=False, seed=args.seed,
                       prefetch=args.workers),
            mesh, batch_size,
        )

    # Optimizer + epoch-indexed LR schedule (reference clamps init LR to 1e-4).
    init_lr_fit, min_lr_fit = schedules.resolve_init_lrs(batch_size, init_lr=args.lr)
    tx = schedules.make_train_optimizer(
        init_lr_fit,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        param_dtype=jnp.bfloat16 if args.amp else jnp.float32,
    )
    lr_scheduler_func = schedules.get_lr_scheduler(
        "cos", init_lr_fit, min_lr_fit, train_epoch
    )

    model, state = create_model_and_state(args, num_classes, rng, tx)

    # pos_weight for the BCE seg loss (auto = neg/pos estimate). Task
    # defaults differ to stay reference-parity: auto for binary
    # (train.py:189-205), OFF for multitask (unet_multitask.py:109-139
    # never weights its seg BCE — but that unweighted loss has a measured
    # trivial all-background attractor, PARITY.md, so --pos-weight
    # auto/<float> is offered as the opt-in escape hatch).
    pw_flag = args.pos_weight
    if pw_flag is None:
        pw_flag = "auto" if args.task == "binary" else ""
    pw_applies = (args.task == "binary" and args.loss == "bce") or (
        args.task == "multitask" and args.loss != "lovasz_hinge"
    )
    pos_weight = None
    if pw_applies and pw_flag:
        if pw_flag == "auto":
            if train_dataset is None:
                # Device path: estimate from host-AUGMENTED samples exactly
                # like the reference (train.py:189-205). A canvas-cache
                # estimate would count letterbox padding as negative and bias
                # pos_weight upward for non-square images.
                train_dataset = make_ds("train", True)
            pos_weight = estimate_pos_weight(train_dataset, args.pos_weight_samples)
        else:
            pos_weight = float(pw_flag)
    if pos_weight is not None:
        # Rewrite config.json with the RESOLVED value ('auto' is data-
        # dependent): it's what val.py --pos-weight needs to report the
        # loss on the training scale. Additive key — the reference's
        # config.json consumers (make_tables filters) ignore it.
        with open(os.path.join(exp_folder, "config.json"), "w",
                  encoding="utf-8") as f:
            json.dump({**vars(args), "resolved_pos_weight": pos_weight},
                      f, ensure_ascii=False, indent=2)

    max_train_batches = args.max_train_batches or None
    max_val_batches = args.max_val_batches or None
    max_test_batches = args.max_test_batches or None

    # Build jitted steps for the task.
    focal = args.loss == "focal"
    if args.task == "multiclass" and args.loss in ("bce", "lovasz_hinge"):
        # The reference lowers these silently (train.py keys only on
        # 'focal'); be explicit so loss-comparison tables can't mislabel
        # two identical CE runs as different losses.
        print(
            f"[WARN] --loss {args.loss} is binary-only; multiclass training "
            f"uses ce (+dice) instead"
        )
    if args.task == "binary":
        train_step = steps.make_binary_train_step(model, tx, args.loss, pos_weight)
        eval_step = steps.make_binary_eval_step(model, args.loss, pos_weight)
    elif args.task == "multitask":
        train_step = steps.make_multitask_train_step(
            model, tx, seg_loss_name=args.loss,
            cls_loss_weight=args.cls_loss_weight, pos_weight=pos_weight,
        )
        eval_step = steps.make_multitask_eval_step(
            model, seg_loss_name=args.loss,
            cls_loss_weight=args.cls_loss_weight, pos_weight=pos_weight,
        )
    else:
        train_step = steps.make_multiclass_train_step(
            model, tx, num_classes, focal=focal, use_dice=args.use_dice
        )
        eval_step = steps.make_multiclass_eval_step(
            model, num_classes, focal=focal, use_dice=args.use_dice
        )

    # Replicate state over the mesh.
    state = jax.device_put(state, replicate(mesh))
    dropout_rng = jax.random.fold_in(rng, 1)

    # Device-resident path: upload canvases to HBM once, build chunked scans.
    is_multitask = args.task == "multitask"
    if use_device_aug:
        train_res = resident.upload(train_cache, mesh)
        val_res = resident.upload(val_cache, mesh)
        binary = ds_task == "binary"
        train_chunk = resident.make_train_chunk_fn(
            train_step, tuple(input_shape), binary, num_classes,
            multitask=is_multitask,
        )
        eval_chunk = resident.make_eval_chunk_fn(
            eval_step, tuple(input_shape), binary, num_classes,
            multitask=is_multitask,
        )

    start_time = time.time()
    best_score = -1.0
    best_epoch = None
    best_val_metrics = None
    deferred_best_vars = None  # --defer-ckpt: on-device copy of best masters
    best_model_path = os.path.join(weights_folder, "best.msgpack")
    last_model_path = os.path.join(weights_folder, "last.msgpack")

    train_losses: list[float] = []
    val_losses: list[float] = []
    val_metrics_history: list[dict] = []

    # True resume (the capability the reference lacks — its --weights restart
    # loses optimizer state, epoch counter, and histories; SURVEY.md §5).
    # Restores the full TrainState + epoch + best tracking + metric history;
    # RNG needs nothing extra: every stream is derived from args.seed and the
    # epoch counter (fold_in / epoch_index_plan), so continuing at epoch N
    # reproduces the uninterrupted run exactly.
    start_epoch = 0
    if args.resume:
        if not os.path.exists(args.resume):
            raise FileNotFoundError(f"--resume checkpoint not found: {args.resume}")
        state, extra = checkpoint.restore_state(args.resume, state)
        state = jax.device_put(state, replicate(mesh))
        start_epoch = int(extra.get("epoch", 0))
        best_score = float(extra.get("best_score", -1.0))
        best_epoch = extra.get("best_epoch")
        best_val_metrics = extra.get("best_val_metrics")
        train_losses = list(extra.get("train_losses", []))
        val_losses = list(extra.get("val_losses", []))
        val_metrics_history = list(extra.get("val_metrics_history", []))
        if extra.get("seed") is not None and int(extra["seed"]) != args.seed:
            print(
                f"[WARN] resume checkpoint was trained with seed {extra['seed']}, "
                f"current run uses {args.seed}; data order/augmentation will differ"
            )
        # Carry the previous run's best/last weights into this exp folder so
        # the end-of-run test eval works even if no new best is found.
        import shutil

        for name, dst in (("best.msgpack", best_model_path),
                          ("last.msgpack", last_model_path)):
            src = os.path.join(os.path.dirname(args.resume), name)
            if os.path.exists(src):
                shutil.copyfile(src, dst)
        print(f"[resume] restored {args.resume}: starting at epoch "
              f"{start_epoch + 1}/{train_epoch}, best={best_score:.4f}")

    def run_train_epoch_resident(epoch: int, lr_now: float, mt_stats: dict):
        """Scan-chunked epoch over HBM-resident data; returns (loss_sum, steps)."""
        nonlocal state
        idx, maskp = resident.epoch_index_plan(
            train_res.n, batch_size, epoch, True, args.seed, max_train_batches
        )
        step_ids = (np.arange(len(idx)) + epoch * 100000).astype(np.int32)
        n_batches = len(idx)
        chunk = max(args.scan_chunk, 1)
        trace_dir = os.path.join(exp_folder, "trace")
        epoch_loss = 0.0
        t_epoch = time.time()
        images_done = 0
        for ci, c0 in enumerate(range(0, n_batches, chunk)):
            sl = slice(c0, min(c0 + chunk, n_batches))
            tracing = args.profile and epoch == 0 and ci == 1
            if tracing:
                tracing = profiling.safe_start_trace(trace_dir)
            state, out = train_chunk(
                state, train_res, idx[sl], maskp[sl], step_ids[sl], dropout_rng
            )
            if args.task == "multitask":
                totals, segs, clss, corrects = (np.asarray(o) for o in out)
                losses = totals
                mt_stats["seg"] += float(segs.sum())
                mt_stats["cls"] += float(clss.sum())
                mt_stats["correct"] += int(corrects.sum())
                mt_stats["total"] += int(maskp[sl].sum())
            else:
                losses = np.asarray(out)
            if tracing:
                profiling.safe_stop_trace(trace_dir)
            epoch_loss += float(losses.sum())
            images_done += int(maskp[sl].sum())
            ips = images_done / max(time.time() - t_epoch, 1e-6)
            for j, lv in enumerate(losses):
                print_train_row(
                    epoch, train_epoch, c0 + j, n_batches, float(lv), lr_now,
                    args.input_size, ips,
                )
        return epoch_loss, n_batches

    def run_train_epoch(epoch: int) -> float | dict:
        nonlocal state
        epoch_loss = 0.0
        seen = 0
        lr_now = lr_scheduler_func(epoch)
        state = state.replace(
            opt_state=schedules.set_learning_rate(state.opt_state, lr_now)
        )
        hbm = profiling.device_memory_stats()
        if hbm:
            print(f"HBM: {hbm}")
        print_train_header()
        mt_stats = {"seg": 0.0, "cls": 0.0, "correct": 0, "total": 0}
        if use_device_aug:
            epoch_loss, seen = run_train_epoch_resident(epoch, lr_now, mt_stats)
            print(LogColor.RESET)
            avg = epoch_loss / max(seen, 1)
            if args.task == "multitask":
                acc = 100.0 * mt_stats["correct"] / max(mt_stats["total"], 1)
                print(
                    f"Epoch {epoch + 1}/{train_epoch} - Loss: {avg:.4f} "
                    f"(Seg: {mt_stats['seg'] / max(seen, 1):.4f}, "
                    f"Cls: {mt_stats['cls'] / max(seen, 1):.4f}), Cls Acc: {acc:.2f}%"
                )
            return avg
        n_batches = len(train_pipe)
        t_epoch = time.time()
        images_done = 0
        trace_dir = os.path.join(exp_folder, "trace")
        tracing = False
        for it, (images, pngs, cls_t, mask, n_valid) in enumerate(
            train_pipe.epoch(epoch)
        ):
            if max_train_batches and it >= max_train_batches:
                break
            # Profile a post-compile window of epoch 0 (--profile): steps
            # [1, 1+profile_steps) land in a TensorBoard-loadable XLA trace.
            if args.profile and epoch == 0:
                if it == 1:
                    tracing = profiling.safe_start_trace(trace_dir)
                elif tracing and it == 1 + args.profile_steps:
                    profiling.safe_stop_trace(trace_dir)
                    tracing = False
            step_rng = jax.random.fold_in(dropout_rng, epoch * 100000 + it)
            if args.task == "multitask":
                state, (total_l, seg_l, cls_l), correct = train_step(
                    state, images, pngs, cls_t, mask, step_rng
                )
                loss_val = float(total_l)
                mt_stats["seg"] += float(seg_l)
                mt_stats["cls"] += float(cls_l)
                mt_stats["correct"] += int(correct)
                mt_stats["total"] += n_valid
            else:
                state, loss = train_step(state, images, pngs, mask, step_rng)
                loss_val = float(loss)
            epoch_loss += loss_val
            seen += 1
            images_done += n_valid
            ips = images_done / max(time.time() - t_epoch, 1e-6)
            print_train_row(
                epoch, train_epoch, it, n_batches, loss_val, lr_now, args.input_size, ips
            )
        if tracing:
            profiling.safe_stop_trace(trace_dir)
        print(LogColor.RESET)
        avg = epoch_loss / max(seen, 1)
        if args.task == "multitask":
            acc = 100.0 * mt_stats["correct"] / max(mt_stats["total"], 1)
            print(
                f"Epoch {epoch + 1}/{train_epoch} - Loss: {avg:.4f} "
                f"(Seg: {mt_stats['seg'] / max(seen, 1):.4f}, "
                f"Cls: {mt_stats['cls'] / max(seen, 1):.4f}), Cls Acc: {acc:.2f}%"
            )
        return avg

    def run_eval(pipe, max_batches) -> dict:
        total_loss = 0.0
        seen = 0
        counts = np.zeros(4, np.int64)
        mt_counts = np.zeros(4, np.int64)
        mt_confusion = np.zeros((3, 3), np.int64)
        mc_sums: dict[str, float] = {}
        if isinstance(pipe, resident.ResidentData):
            # whole-split eval in one device dispatch (scan over batches)
            idx, maskp = resident.epoch_index_plan(
                pipe.n, batch_size, 0, False, args.seed, max_batches
            )
            outs = eval_chunk(state, pipe, idx, maskp)
            seen = len(idx)
            if args.task == "multitask":
                (total_l, _seg, _cls), seg_counts, confusion = outs
                total_loss = float(np.asarray(total_l).sum())
                mt_counts += np.asarray(seg_counts, np.int64).sum(axis=0)
                mt_confusion += np.asarray(confusion, np.int64).sum(axis=0)
            elif args.task == "binary":
                loss, c = outs
                total_loss = float(np.asarray(loss).sum())
                counts += np.asarray(c, np.int64).sum(axis=0)
            else:
                loss, m = outs
                total_loss = float(np.asarray(loss).sum())
                mc_sums = {k: float(np.asarray(v).sum()) for k, v in m.items()}
        else:
            for it, (images, pngs, cls_t, mask, n_valid) in enumerate(pipe.epoch(0)):
                if max_batches and it >= max_batches:
                    break
                if args.task == "multitask":
                    (total_l, seg_l, cls_l), seg_counts, confusion = eval_step(
                        state, images, pngs, cls_t, mask
                    )
                    total_loss += float(total_l)
                    mt_counts += np.asarray(seg_counts, np.int64)
                    mt_confusion += np.asarray(confusion, np.int64)
                elif args.task == "binary":
                    loss, c = eval_step(state, images, pngs, mask)
                    total_loss += float(loss)
                    counts += np.asarray(c, np.int64)
                else:
                    loss, m = eval_step(state, images, pngs, mask)
                    total_loss += float(loss)
                    for k, v in m.items():
                        mc_sums[k] = mc_sums.get(k, 0.0) + float(v)
                seen += 1
        seen = max(seen, 1)
        from unet_embroidery_seg_tpu.ops import metrics as M

        if args.task == "binary":
            out = M.binary_metrics_from_counts(*counts)
            out["Loss"] = total_loss / seen
            return out
        if args.task == "multitask":
            seg_m = M.multitask_seg_metrics_from_counts(*mt_counts)
            correct = int(np.trace(mt_confusion))
            total = int(mt_confusion.sum())
            return {
                "Loss": total_loss / seen,
                "IoU": seg_m["IoU"],
                "Dice": seg_m["Dice"],
                "Cls Acc": 100.0 * correct / max(total, 1),
            }
        out = {k: v / seen for k, v in mc_sums.items()}
        out["Loss"] = total_loss / seen
        return out

    for epoch in range(start_epoch, train_epoch):
        loss = run_train_epoch(epoch)
        train_losses.append(loss)

        metrics = run_eval(val_res if use_device_aug else val_pipe, max_val_batches)
        if args.task == "binary":
            current_score = float(metrics["IoU"])
        elif args.task == "multitask":
            current_score = float(metrics["IoU"])
            print(
                f"Val - IoU: {metrics['IoU']:.4f}, Dice: {metrics['Dice']:.4f}, "
                f"Cls Acc: {metrics['Cls Acc']:.2f}%"
            )
        else:
            current_score = float(metrics["Mean IoU"])
        val_losses.append(metrics["Loss"])
        val_metrics_history.append(metrics)

        if current_score > best_score:
            best_score = current_score
            best_epoch = epoch + 1
            best_val_metrics = metrics
            # model-only, like the reference's best.pth state_dict — saved
            # from the f32 MASTER params (not the bf16 compute copies) so
            # finetunes from best.msgpack start from unrounded weights.
            if args.defer_ckpt:
                # Copy now (the step donates/overwrites state buffers);
                # the host fetch + disk write happen once, after the loop.
                deferred_best_vars = jax.tree_util.tree_map(
                    jnp.copy, checkpoint.master_variables(state)
                )
            else:
                checkpoint.save_variables(
                    best_model_path, checkpoint.master_variables(state)
                )
            print(f"New best model saved with score: {best_score:.4f}")
        if not args.defer_ckpt:
            checkpoint.save_variables(last_model_path, checkpoint.master_variables(state))
        # Full TrainState (params + opt state + step) for true resume — the
        # capability the reference lacks. Saved every --ckpt-every epochs
        # because it is 3x the bytes (matters on slow host links).
        if args.ckpt_every and (epoch + 1) % args.ckpt_every == 0:
            checkpoint.save_state(
                os.path.join(weights_folder, "resume.msgpack"),
                state,
                extra={
                    "epoch": epoch + 1,
                    "seed": args.seed,
                    "best_score": best_score,
                    "best_epoch": best_epoch,
                    "best_val_metrics": best_val_metrics,
                    "train_losses": train_losses,
                    "val_losses": val_losses,
                    "val_metrics_history": val_metrics_history,
                },
            )

    if args.defer_ckpt:
        if deferred_best_vars is not None:
            checkpoint.save_variables(best_model_path, deferred_best_vars)
        checkpoint.save_variables(last_model_path, checkpoint.master_variables(state))

    total_time = time.time() - start_time
    print(f"Training completed in {datetime.timedelta(seconds=int(total_time))}")

    plot_training_curves(train_losses, val_losses, val_metrics_history, weights_folder)

    # Test-set evaluation of the best checkpoint (+ vis export).
    test_metrics = None
    try:
        test_source = open_source(args.data_path, args.data_config, "test", args.cache_dir)
        if use_device_aug:
            test_cache = CanvasCache(
                test_source, input_shape, return_cls_label=return_cls_label
            )
            test_pipe = resident.upload(test_cache, mesh)
        else:
            test_dataset = SegmentationDataset(
                test_source,
                input_shape,
                num_classes,
                augmentation=False,
                task=ds_task,
                return_cls_label=return_cls_label,
                seed=args.seed,
            )
            test_pipe = HostPipeline(
                DataLoader(test_dataset, batch_size, shuffle=False, seed=args.seed,
                           prefetch=2),
                mesh, batch_size,
            )
        state = checkpoint.restore_variables_into_state(best_model_path, state)
        state = jax.device_put(state, replicate(mesh))
        test_metrics = run_eval(test_pipe, max_test_batches)
        with open(os.path.join(exp_folder, "test_metrics.json"), "w", encoding="utf-8") as f:
            json.dump(test_metrics, f, ensure_ascii=False, indent=2)

        if args.task in ["binary", "multitask"] and args.export_vis:
            vis_model = model
            if getattr(model, "diff_head", False):
                # Vis wants 2-channel softmax logits; same params, plain head.
                vis_model = build_model(
                    args.model, num_classes=num_classes,
                    dtype=jnp.bfloat16 if args.amp else None,
                    decoder_width=args.decoder_width,
                )
            predict_fn = steps.make_predict_fn(vis_model)
            export_binary_visuals(
                predict_fn,
                state.variables,
                test_source,
                out_dir=os.path.join(exp_folder, "vis"),
                input_shape=tuple(input_shape),
                num_samples=args.vis_num,
                seed=args.vis_seed,
                multitask=(args.task == "multitask"),
            )
    except Exception as e:  # keep artifact writing alive, like the reference
        print(f"[WARN] Skip test evaluation: {e}")

    with open(os.path.join(exp_folder, "val_metrics_history.json"), "w", encoding="utf-8") as f:
        json.dump(val_metrics_history, f, ensure_ascii=False, indent=2)

    csv_path = os.path.join(exp_folder, "val_metrics_history.csv")
    fieldnames = ["epoch"]
    for m in val_metrics_history:
        for k in m.keys():
            if k not in fieldnames:
                fieldnames.append(k)
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        for i, m in enumerate(val_metrics_history, start=1):
            row = {"epoch": i}
            row.update(m)
            writer.writerow(row)

    with open(os.path.join(exp_folder, "summary.json"), "w", encoding="utf-8") as f:
        json.dump(
            {
                "best_epoch": best_epoch,
                "best_score": float(best_score),
                "best_val_metrics": best_val_metrics,
                "test_metrics": test_metrics,
                "best_model_path": best_model_path,
                "last_model_path": last_model_path,
            },
            f,
            ensure_ascii=False,
            indent=2,
        )
    return exp_folder


def parse_args(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="U-Net Training with HF Dataset (TPU)")

    parser.add_argument("--weights", default="",
                        help="Path to pretrained weights (msgpack checkpoint)")
    parser.add_argument("--resume", default="",
                        help="Path to a resume.msgpack full-state checkpoint: "
                             "restores params, optimizer state, epoch counter, "
                             "best tracking, and metric history (true resume — "
                             "the reference's --weights restart loses all of "
                             "those)")
    parser.add_argument("--data-path", default="./hf_datasets/merged_dataset_v2",
                        help="Path to HF dataset directory, or 'synthetic[:N]'")
    parser.add_argument("--data-config", default="no-ai", choices=["full", "no-ai", "sam3"],
                        help="Dataset config to use")
    parser.add_argument("--task", default="binary",
                        choices=["binary", "multiclass", "multitask"],
                        help="Segmentation task")
    parser.add_argument("--model", default="unet_resnet50",
                        choices=sorted(SUPPORTED_MODELS.keys()),
                        help="Model architecture (use 'multitask_unet' for multitask)")
    parser.add_argument("--decoder-width", default=1.0, type=float,
                        help="unet_resnet50 only: decoder width multiplier "
                             "(TPU MXU-utilization lever, not in the "
                             "reference; 1.0 = reference-parity decoder; "
                             "checkpoints are width-specific)")
    parser.add_argument("--cls-loss-weight", default=1.0, type=float,
                        help="For multitask only: classification loss weight")
    parser.add_argument("--loss", default="lovasz_hinge",
                        choices=["bce", "lovasz_hinge", "ce", "focal"],
                        help="Loss function")
    parser.add_argument("--pos-weight", default=None,
                        help="'auto', a float, or '' to disable. Default: "
                             "auto for binary BCE (reference parity), OFF "
                             "for multitask seg BCE (the reference never "
                             "weights it; setting it is the escape hatch "
                             "for the trivial all-background attractor, "
                             "PARITY.md)")
    parser.add_argument("--pos-weight-samples", default=80, type=int)
    parser.add_argument("--use-dice", action=_boolopt(), default=True,
                        help="For multiclass only: add Dice loss")
    parser.add_argument("--num-classes", default=4, type=int,
                        help="For multiclass only: foreground classes (no background)")
    parser.add_argument("--device", default="tpu", help="Accepted for CLI parity; ignored (JAX picks the backend)")
    parser.add_argument("--batch-size", default=8, type=int)
    parser.add_argument("--epochs", default=50, type=int, metavar="N")
    parser.add_argument("--input-size", default=512, type=int)
    parser.add_argument("--workers", default=4, type=int, metavar="N",
                        help="Prefetch depth of the host input pipeline")
    parser.add_argument("--lr", default=0.0001, type=float)
    parser.add_argument("--momentum", default=0.9, type=float, metavar="M")
    parser.add_argument("--wd", "--weight-decay", default=1e-4, type=float,
                        metavar="W", dest="weight_decay")
    parser.add_argument("--amp", action=_boolopt(), default=None,
                        help="bf16 compute with f32 master params (default: "
                             "on, except f32 for unet_resnet50+lovasz_hinge "
                             "— converged-parity evidence, PARITY.md)")
    parser.add_argument("--seed", default=11, type=int)
    parser.add_argument("--cache-dir", default=".hf-cache/datasets")
    parser.add_argument("--export-vis", action=_boolopt(), default=True)
    parser.add_argument("--vis-num", default=8, type=int)
    parser.add_argument("--vis-seed", default=0, type=int)
    parser.add_argument("--max-train-batches", default=0, type=int)
    parser.add_argument("--max-val-batches", default=0, type=int)
    parser.add_argument("--max-test-batches", default=0, type=int)
    parser.add_argument("--device-augment", action=_boolopt(), default=None,
                        help="HBM-resident dataset + on-device augmentation "
                             "(default: auto — on for TPU, off for CPU)")
    parser.add_argument("--scan-chunk", default=8, type=int,
                        help="Train steps per device dispatch on the resident path")
    parser.add_argument("--defer-ckpt", action=_boolopt(), default=False,
                        help="Defer best/last.msgpack writes to after the "
                             "training loop (best is kept as an on-device "
                             "copy). The reference writes every epoch "
                             "(/root/reference/train.py:376-383) and so does "
                             "this CLI by default; defer on hosts with a slow "
                             "device link, where per-epoch 100MB+ param "
                             "fetches dominate small-dataset epochs.")
    parser.add_argument("--ckpt-every", default=5, type=int,
                        help="Save the full resume state (params+optimizer) "
                             "every N epochs (0 = never); best/last stay "
                             "model-only like the reference")
    parser.add_argument("--profile", action=_boolopt(), default=False,
                        help="Write an XLA trace of a few train steps to expN/trace")
    parser.add_argument("--profile-steps", default=4, type=int)
    parser.add_argument("--mesh-data", default=None, type=int,
                        help="Data-parallel axis size (default: all devices)")
    parser.add_argument("--mesh-space", default=1, type=int,
                        help="Spatial-parallel axis size over image H")

    args = parser.parse_args(argv)
    if args.pos_weight == "":
        args.pos_weight = None
    return args


def _boolopt():
    import argparse

    return argparse.BooleanOptionalAction


if __name__ == "__main__":
    train(parse_args())
