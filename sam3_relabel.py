"""SAM3-based dataset relabeling tool (offline; not on the training path).

Parity target: /root/reference/sam3_relabel.py — a click CLI with three
commands:

  relabel          text-prompted SAM3 segmentation over the per-category
                   image globs, optional VLM-generated prompts (OpenAI-
                   compatible API, file-cached, thread-parallel), mask union
                   -> 0/255 PNG, skip-if-exists resume.
  check            environment doctor (deps, checkpoint, accelerator, VLM env).
  download-script  emit a ModelScope download script for the SAM3 weights.

All heavy dependencies (sam3, torch-CUDA, openai, dotenv) are imported
lazily and gated with actionable error messages, so the command-line surface
works on machines without them (e.g. this TPU host, where SAM3 inference is
not available and the tool exists for workflow parity).
"""

from __future__ import annotations

import base64
import json
import os
import random
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np
from PIL import Image

import click

try:  # optional: .env loading
    from dotenv import load_dotenv

    load_dotenv()
except ImportError:
    pass

CATEGORIES = ["动物类", "植物类", "复合类"]

# Default text prompt used for every category (reference :108-118).
DEFAULT_PROMPT = (
    "Traditional Chinese Ruyi cloud motif, quadrilobed symmetrical scroll "
    "pattern, four interlocking S-shaped volutes, auspicious cloud embroidery design"
)
CATEGORY_PROMPTS = {c: [DEFAULT_PROMPT] for c in CATEGORIES}

VLM_SYSTEM_PROMPT = """You are an expert in analyzing traditional embroidery and textile patterns.
Your task is to describe the main pattern/motif in the image for segmentation purposes.

Provide a concise description (10-20 words) that would help an AI segmentation model identify and segment the main pattern. Focus on:
- The type of pattern/motif
- Key visual characteristics
- Colors and shapes
- Style (traditional, modern, etc.)

Output only the description, nothing else."""


# --------------------------------------------------------------------------
# VLM prompt generation
# --------------------------------------------------------------------------

def get_vlm_client():
    try:
        from openai import OpenAI
    except ImportError as e:
        raise RuntimeError(
            "the 'openai' package is required for --use-vlm (pip install openai)"
        ) from e
    api_key = os.environ.get("VLM_API_KEY")
    base_url = os.environ.get("VLM_BASE_URL", "https://api.openai.com/v1")
    if not api_key:
        raise ValueError("VLM_API_KEY environment variable not set")
    return OpenAI(api_key=api_key, base_url=base_url)


def encode_image_to_base64(image_path: str | Path) -> str:
    with open(image_path, "rb") as f:
        return base64.b64encode(f.read()).decode("utf-8")


def generate_prompt_with_vlm(image_path, category, client, model=None) -> str:
    if model is None:
        model = os.environ.get("VLM_MODEL")
        if not model:
            raise ValueError("VLM_MODEL environment variable not set")
    b64 = encode_image_to_base64(image_path)
    response = client.chat.completions.create(
        model=model,
        messages=[
            {"role": "system", "content": VLM_SYSTEM_PROMPT},
            {
                "role": "user",
                "content": [
                    {
                        "type": "image_url",
                        "image_url": {"url": f"data:image/png;base64,{b64}"},
                    }
                ],
            },
        ],
        max_tokens=100,
        temperature=0.3,
    )
    return response.choices[0].message.content.strip()


def get_cached_prompt(cache_file: Path) -> list[str] | None:
    if cache_file.exists():
        try:
            data = json.loads(cache_file.read_text(encoding="utf-8"))
            prompts = data.get("prompts")
            if isinstance(prompts, list) and prompts:
                return prompts
        except (json.JSONDecodeError, OSError):
            pass
    return None


def generate_vlm_prompts(
    image_paths: list[Path],
    category: str,
    cache_dir: Path,
    client,
    model: str,
    workers: int = 4,
) -> dict[Path, list[str]]:
    """File-cached, thread-parallel VLM prompt generation (reference :658-704)."""
    cache_dir.mkdir(parents=True, exist_ok=True)
    out: dict[Path, list[str]] = {}
    todo = []
    for p in image_paths:
        cache_file = cache_dir / f"{p.stem}.json"
        cached = get_cached_prompt(cache_file)
        if cached is not None:
            out[p] = cached
        else:
            todo.append((p, cache_file))

    def generate_single(item):
        p, cache_file = item
        try:
            prompt = generate_prompt_with_vlm(p, category, client, model)
            cache_file.write_text(
                json.dumps({"prompts": [prompt]}, ensure_ascii=False),
                encoding="utf-8",
            )
            return p, [prompt]
        except Exception as e:
            click.echo(f"  [VLM error] {p.name}: {e}")
            return p, CATEGORY_PROMPTS[category]

    if todo:
        click.echo(f"  generating {len(todo)} VLM prompts ({workers} workers)...")
        with ThreadPoolExecutor(max_workers=workers) as pool:
            for p, prompts in pool.map(generate_single, todo):
                out[p] = prompts
    return out


# --------------------------------------------------------------------------
# SAM3 segmentation
# --------------------------------------------------------------------------

def load_sam3_model(checkpoint_path: str | None = None, device: str = "cpu"):
    try:
        import torch  # noqa: F401
        from sam3 import SAM3ImageModel, Sam3Processor
    except ImportError as e:
        raise RuntimeError(
            "the 'sam3' package is not installed on this machine. "
            "Run `sam3_relabel.py download-script` to get the weights-download "
            "script and install SAM3 per its README; this TPU host ships "
            "without it."
        ) from e
    model = SAM3ImageModel.from_pretrained(checkpoint_path, device=device)
    processor = Sam3Processor(model)
    return model, processor


def segment_with_sam3(processor, image: Image.Image, prompts: list[str], confidence: float):
    """Text-prompted masks above the confidence threshold (reference :471-497)."""
    masks = []
    for prompt in prompts:
        result = processor.set_text_prompt(image, prompt)
        for mask, score in zip(result["masks"], result["scores"]):
            if float(score) >= confidence:
                masks.append(np.asarray(mask, dtype=bool))
    return masks


def merge_masks(masks: list[np.ndarray], image_size: tuple[int, int]) -> np.ndarray:
    """Union of all masks -> uint8 0/255 (reference :500-534)."""
    w, h = image_size
    merged = np.zeros((h, w), dtype=bool)
    for m in masks:
        if m.shape != (h, w):
            m = np.asarray(
                Image.fromarray(m.astype(np.uint8) * 255).resize((w, h), Image.NEAREST)
            ).astype(bool)
        merged |= m
    return merged.astype(np.uint8) * 255


def process_category(
    model,
    processor,
    input_dir: Path,
    output_dir: Path,
    category: str,
    confidence: float,
    max_images: int | None,
    use_vlm: bool,
    vlm_client,
    vlm_model,
    vlm_cache: Path,
    vlm_workers: int,
    sample: int | None,
) -> None:
    # per-category glob `{category}*.{png,jpg,jpeg}` (reference :556)
    image_paths = sorted(
        {p for ext in (".png", ".jpg", ".jpeg") for p in input_dir.glob(f"{category}*{ext}")}
    )
    if sample is not None and len(image_paths) > sample:
        image_paths = random.sample(image_paths, sample)
    if max_images is not None:
        image_paths = image_paths[:max_images]
    click.echo(f"\n[{category}] {len(image_paths)} images")

    prompts_by_image: dict[Path, list[str]] = {}
    if use_vlm:
        prompts_by_image = generate_vlm_prompts(
            image_paths, category, vlm_cache / category, vlm_client, vlm_model, vlm_workers
        )

    n_done = n_skip = n_err = 0
    for p in image_paths:
        out_path = output_dir / f"{p.stem}.png"
        if out_path.exists():  # resume (reference :581-583)
            n_skip += 1
            continue
        try:
            image = Image.open(p).convert("RGB")
            prompts = prompts_by_image.get(p, CATEGORY_PROMPTS[category])
            masks = segment_with_sam3(processor, image, prompts, confidence)
            if not masks:
                click.echo(f"  [no masks] {p.name}")
                n_err += 1
                continue
            merged = merge_masks(masks, image.size)
            Image.fromarray(merged, mode="L").save(out_path)
            n_done += 1
        except Exception as e:
            click.echo(f"  [error] {p.name}: {e}")
            n_err += 1
    click.echo(f"  done={n_done} skipped={n_skip} failed={n_err}")


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------

@click.group()
def cli():
    """SAM3 dataset relabeling tool."""


@cli.command()
@click.option("--input-dir", type=click.Path(exists=True, file_okay=False, path_type=Path),
              default=Path("raw_datasets/VOCdevkit/VOC2012/JPEGImages"))
@click.option("--output-dir", type=click.Path(file_okay=False, path_type=Path),
              default=Path("raw_datasets/VOCdevkit_SAM3/VOC2012/JPEGImages"))
@click.option("--checkpoint", type=click.Path(dir_okay=False), default="weights/sam3/sam3.pt")
@click.option("--categories", multiple=True, default=CATEGORIES)
@click.option("--confidence", type=float, default=0.3)
@click.option("--device", default="cpu", help="cuda/cpu (SAM3 is a torch model)")
@click.option("--max-images", type=int, default=None)
@click.option("--use-vlm", is_flag=True,
              help="Generate prompts with a VLM (env: VLM_API_KEY, VLM_BASE_URL, VLM_MODEL)")
@click.option("--vlm-cache", type=click.Path(file_okay=False, path_type=Path),
              default=Path("vlm_cache"))
@click.option("--vlm-workers", type=int, default=4)
@click.option("--sample", type=int, default=None)
def relabel(input_dir, output_dir, checkpoint, categories, confidence, device,
            max_images, use_vlm, vlm_cache, vlm_workers, sample):
    """Relabel the dataset with SAM3 text-prompted segmentation."""
    output_dir.mkdir(parents=True, exist_ok=True)
    click.echo(f"Device: {device}")

    vlm_client = vlm_model = None
    if use_vlm:
        vlm_model = os.environ.get("VLM_MODEL")
        if not vlm_model:
            raise ValueError("VLM_MODEL environment variable not set (required for --use-vlm)")
        vlm_client = get_vlm_client()
        click.echo(f"VLM Model: {vlm_model}")
        click.echo(f"VLM Base URL: {os.environ.get('VLM_BASE_URL', 'https://api.openai.com/v1')}")
        vlm_cache.mkdir(parents=True, exist_ok=True)

    model, processor = load_sam3_model(checkpoint, device)
    for category in categories:
        process_category(
            model, processor, input_dir, output_dir, category, confidence,
            max_images, use_vlm, vlm_client, vlm_model, vlm_cache, vlm_workers, sample,
        )
    click.echo("\nDone!")


@cli.command()
def check():
    """Environment doctor: verify deps, weights, accelerator, and VLM env."""
    ok = True

    click.echo("Python:")
    v = sys.version_info
    good = v >= (3, 10)
    click.echo(f"  {'✓' if good else '✗'} {v.major}.{v.minor}.{v.micro} (need >= 3.10)")
    ok &= good

    click.echo("Packages:")
    for pkg, required in [("numpy", True), ("PIL", True), ("click", True),
                          ("torch", True), ("sam3", True), ("openai", False),
                          ("dotenv", False)]:
        try:
            __import__(pkg)
            click.echo(f"  ✓ {pkg}")
        except ImportError:
            mark = "✗" if required else "-"
            click.echo(f"  {mark} {pkg} (not installed{'' if required else ', optional'})")
            if required:
                ok = False

    click.echo("Checkpoint:")
    ckpt = Path("weights/sam3/sam3.pt")
    if ckpt.exists():
        click.echo(f"  ✓ {ckpt} ({ckpt.stat().st_size / 1e6:.1f} MB)")
    else:
        click.echo(f"  ✗ {ckpt} (run `sam3_relabel.py download-script` first)")
        ok = False

    click.echo("Accelerator:")
    try:
        import torch

        if torch.cuda.is_available():
            click.echo(f"  ✓ CUDA: {torch.cuda.get_device_name(0)}")
        else:
            click.echo("  - no CUDA GPU (SAM3 will run on CPU; slow)")
    except ImportError:
        click.echo("  ✗ torch not installed")
        ok = False

    click.echo("VLM env (optional, for --use-vlm):")
    for var in ("VLM_API_KEY", "VLM_MODEL", "VLM_BASE_URL"):
        val = os.environ.get(var)
        click.echo(f"  {'✓' if val else '-'} {var}{' set' if val else ' not set'}")

    click.echo(f"\n{'All checks passed.' if ok else 'Some checks FAILED.'}")
    sys.exit(0 if ok else 1)


@cli.command(name="download-script")
@click.option("--output", type=click.Path(dir_okay=False), default="download_sam3_model.sh")
def download_script(output):
    """Write a ModelScope download script for the SAM3 weights."""
    script = """#!/usr/bin/env bash
# Download the SAM3 checkpoint from ModelScope into weights/sam3/.
set -euo pipefail

TARGET_DIR="weights/sam3"
mkdir -p "$TARGET_DIR"

if ! command -v modelscope >/dev/null 2>&1; then
  echo "Installing modelscope CLI..."
  pip install modelscope
fi

echo "Downloading SAM3 weights to $TARGET_DIR ..."
modelscope download --model facebook/sam3 --local_dir "$TARGET_DIR"

echo "Done. Checkpoint at $TARGET_DIR/sam3.pt"
"""
    Path(output).write_text(script, encoding="utf-8")
    os.chmod(output, 0o755)
    click.echo(f"Wrote {output}")


if __name__ == "__main__":
    cli()
