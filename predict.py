"""Inference CLI (parity target: /root/reference/predict.py).

Single image or directory glob; 480x480 letterbox (the reference hardcodes
480 here despite training at 512 — preserved, overridable), softmax ->
un-pad crop -> resize back -> argmax -> VOC-palette / HSV colorize ->
alpha-0.7 blend, saved as ``*_mask.png`` under run/predict/expN, with
device-synchronized wall-clock timing.
"""

from __future__ import annotations

import colorsys
import os
import time
from pathlib import Path

import cv2
import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.data.augment import letterbox
from unet_embroidery_seg_tpu.engine import checkpoint, steps
from unet_embroidery_seg_tpu.models import SUPPORTED_MODELS, build_model
from unet_embroidery_seg_tpu.utils import create_val_exp_folder

VOC_COLORS = [
    (0, 0, 0), (128, 0, 0), (0, 128, 0), (128, 128, 0), (0, 0, 128),
    (128, 0, 128), (0, 128, 128), (128, 128, 128), (64, 0, 0), (192, 0, 0),
    (64, 128, 0), (192, 128, 0), (64, 0, 128), (192, 0, 128), (64, 128, 128),
    (192, 128, 128), (0, 64, 0), (128, 64, 0), (0, 192, 0), (128, 192, 0),
    (0, 64, 128), (128, 64, 128),
]


def time_synchronized() -> float:
    """Drain the device queue, then timestamp.

    Fetches the VALUE of a fresh op enqueued behind all dispatched work —
    ``block_until_ready`` alone returns early through the axon relay
    (ROADMAP.md environment traps), but a host fetch cannot.
    """
    float(jnp.zeros(()) + 0.0)
    return time.time()


def make_colors(num_classes: int):
    if num_classes <= 21:
        return VOC_COLORS
    hsv = [(x / num_classes, 1.0, 1.0) for x in range(num_classes)]
    colors = [colorsys.hsv_to_rgb(*t) for t in hsv]
    return [(int(r * 255), int(g * 255), int(b * 255)) for r, g, b in colors]


def load_model(model_name: str, model_path: str, num_classes: int,
               input_size: int, amp: bool, decoder_width: float = 1.0):
    dtype = jnp.bfloat16 if amp else None
    model = build_model(model_name, num_classes=num_classes, dtype=dtype,
                        decoder_width=decoder_width)
    variables = checkpoint.restore_variables(model_path)
    predict_fn = steps.make_predict_fn(model)
    return predict_fn, variables


def load_and_letterbox(file_path: str, input_size: int):
    """Open + letterbox one image; returns (x_f32_canvas, meta) or None.

    Letterbox follows resize_image semantics (utils.py:24-36).
    """
    try:
        image = Image.open(file_path)
    except (FileNotFoundError, IOError) as e:
        print(f"Error opening image: {e}")
        return None
    image = image.convert("RGB")
    input_shape = (input_size, input_size)
    iw, ih = image.size
    scale = min(input_shape[1] / iw, input_shape[0] / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    dummy_mask = Image.new("L", image.size, 0)
    image_data, _ = letterbox(image, dummy_mask, input_shape)
    x = np.array(image_data, np.float32) / 255.0
    meta = {"file_path": file_path, "image": image, "nw": nw, "nh": nh}
    return x, meta


def save_mask(
    pr_softmax: np.ndarray,
    meta: dict,
    num_classes: int,
    exp_folder: str,
    input_size: int,
    mix_type: bool,
):
    """Un-pad crop -> resize to original -> argmax -> colorize -> save."""
    old_img = meta["image"]
    original_w, original_h = old_img.size
    nw, nh = meta["nw"], meta["nh"]
    top = (input_size - nh) // 2
    left = (input_size - nw) // 2
    pr = pr_softmax[top : top + nh, left : left + nw]
    pr = cv2.resize(pr, (original_w, original_h), interpolation=cv2.INTER_LINEAR)
    pr = pr.argmax(axis=-1)

    colors = make_colors(num_classes)
    seg_img = np.reshape(
        np.array(colors, np.uint8)[np.reshape(pr, [-1])], [original_h, original_w, -1]
    )
    if mix_type:
        old_np = np.array(old_img)
        alpha = 0.7
        blended = cv2.addWeighted(old_np, 1 - alpha, seg_img, alpha, 0)
        out = Image.fromarray(blended)
    else:
        out = Image.fromarray(np.uint8(seg_img))

    img_name = os.path.basename(meta["file_path"])
    mask_filename = os.path.splitext(img_name)[0] + "_mask.png"
    save_path = os.path.join(exp_folder, mask_filename)
    out.save(save_path)
    print(f"Mask saved at: {save_path}")


def detect_image(
    file_path: str,
    predict_fn,
    variables: dict,
    num_classes: int,
    exp_folder: str,
    input_size: int = 480,
    mix_type: bool = True,
):
    prepared = load_and_letterbox(file_path, input_size)
    if prepared is None:
        return
    x, meta = prepared
    logits = predict_fn(variables, jnp.asarray(x)[None])[0]
    pr = np.asarray(jax.nn.softmax(logits, axis=-1))
    save_mask(pr, meta, num_classes, exp_folder, input_size, mix_type)


def detect_batch(
    file_paths: list[str],
    batch: int,
    predict_fn,
    variables: dict,
    num_classes: int,
    exp_folder: str,
    input_size: int = 480,
    mix_type: bool = True,
):
    """Directory inference in fixed-size device batches.

    One device round-trip per ``batch`` images instead of per image — on the
    relayed TPU the per-dispatch RTT dominates single-image latency, so this
    amortizes it (ROADMAP.md). The final chunk is padded to keep the jitted
    shape static; padded rows are discarded on the host.
    """
    for start in range(0, len(file_paths), batch):
        chunk = file_paths[start : start + batch]
        prepared = [load_and_letterbox(p, input_size) for p in chunk]
        prepared = [p for p in prepared if p is not None]
        if not prepared:
            continue
        xs = np.stack([x for x, _ in prepared])
        if len(prepared) < batch:  # pad to the static batch shape
            pad = np.repeat(xs[-1:], batch - len(prepared), axis=0)
            xs = np.concatenate([xs, pad], axis=0)
        logits = predict_fn(variables, jnp.asarray(xs))
        prs = np.asarray(jax.nn.softmax(logits, axis=-1))
        for (x, meta), pr in zip(prepared, prs):
            save_mask(pr, meta, num_classes, exp_folder, input_size, mix_type)


def predict(args):
    exp_folder = create_val_exp_folder()
    num_classes = args.num_classes + 1
    assert os.path.exists(args.weights), f"weights {args.weights} not found."

    if args.amp is None:
        # Mirror train.py's per-config default (the way val.py does) so a
        # checkpoint trained at the defaults is always inferred in the
        # dtype it trained in, whatever rule PARITY.md evidence installs.
        from train import resolve_amp_default

        task = "binary" if args.num_classes == 1 else "multiclass"
        args.amp = resolve_amp_default(args.model, args.loss, task)

    predict_fn, variables = load_model(
        args.model, args.weights, num_classes, args.input_size, args.amp,
        decoder_width=args.decoder_width,
    )

    if os.path.isdir(args.data_path):
        file_paths = [
            str(p)
            for p in Path(args.data_path).rglob("*")
            if p.suffix in [".jpg", ".png", ".jpeg"]
        ]
    elif os.path.isfile(args.data_path):
        file_paths = [args.data_path]
    else:
        raise ValueError(f"Unsupported input path: {args.data_path}")

    file_paths = [p for p in file_paths if p.endswith((".jpg", ".png", ".jpeg"))]
    t_start = time_synchronized()
    if args.batch > 1 and len(file_paths) > 1:
        detect_batch(
            file_paths,
            args.batch,
            predict_fn,
            variables,
            num_classes,
            exp_folder,
            input_size=args.input_size,
            mix_type=args.mix_type,
        )
    else:
        for file_path in file_paths:
            detect_image(
                file_path,
                predict_fn,
                variables,
                num_classes,
                exp_folder,
                input_size=args.input_size,
                mix_type=args.mix_type,
            )
    t_end = time_synchronized()
    print(f"inference time for: {t_end - t_start}")
    return exp_folder


def parse_args(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="TPU U-Net predict")
    parser.add_argument("--data_path", default="samples/example.jpg", help="data root")
    parser.add_argument("--weights", default="run/train/exp/weights/best.msgpack")
    parser.add_argument("--num-classes", default=1, type=int,
                        help="Foreground classes (output channels = this + 1)")
    parser.add_argument("--model", default="unet_resnet50",
                        choices=sorted(SUPPORTED_MODELS.keys()))
    parser.add_argument("--decoder-width", default=1.0, type=float,
                        help="unet_resnet50 only: must match the width the "
                             "checkpoint was trained with (train.py "
                             "--decoder-width)")
    parser.add_argument("--input-size", default=480, type=int,
                        help="Inference letterbox size (reference hardcodes 480)")
    parser.add_argument("--mix_type", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="Alpha-blend the mask over the original image")
    parser.add_argument("--loss", default="lovasz_hinge",
                        help="Loss the checkpoint was trained with; only used "
                             "to resolve the default compute dtype the same "
                             "way train/val do (f32 for binary "
                             "resnet50+lovasz, bf16 otherwise)")
    parser.add_argument("--amp", default=None, action=argparse.BooleanOptionalAction,
                        help="bf16 inference. Default resolves per config "
                             "like train/val: f32 for the binary "
                             "resnet50+lovasz defaults config (PARITY.md), "
                             "bf16 otherwise; mask output differs only at "
                             "borderline pixels")
    parser.add_argument("--batch", default=1, type=int,
                        help="Directory inference batch size (amortizes the "
                             "per-dispatch device RTT; 1 = reference-parity "
                             "per-image loop)")
    return parser.parse_args(argv)


if __name__ == "__main__":
    predict(parse_args())
