"""Export a trained model to a portable StableHLO serving artifact.

TPU-native deployment story the torch reference has no analogue of: the
inference forward (``steps.make_predict_fn`` semantics + on-device softmax —
exactly what predict.py runs, /root/reference/predict.py:78-81) is traced,
lowered to StableHLO via ``jax.export``, and serialized to one file per
batch size. The artifact is runnable WITHOUT this package — any process
with jax installed can ``jax.export.deserialize(bytes).call(x)`` — and is
lowered for both ``tpu`` and ``cpu`` by default, so the same file serves on
a TPU host and in a CPU fallback/canary.

Weights are baked into the artifact as constants by default (one
self-contained file = one deployable model). ``--no-bake-weights`` instead
exports ``f(variables, x)`` so serving loads the msgpack checkpoint
separately (smaller artifacts when many batch shapes share weights).

Usage (repo root):
    python scripts/export_serving.py --weights run/train/exp/weights/best.msgpack \
        [--model unet_resnet50] [--num-classes 1] [--input-size 480] \
        [--batches 1 8] [--platforms tpu cpu] [--out serving/] [--check]

Writes ``{out}/{model}_{size}_b{B}.shlo`` + ``manifest.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_predict(model):
    """Inference forward + softmax — predict.py's on-device computation."""
    import jax

    def predict(variables, x):
        logits = model.apply(variables, x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    return predict


def export_one(predict, variables, batch, size, platforms, bake):
    import jax
    from jax import export as jexport

    x_spec = jax.ShapeDtypeStruct((batch, size, size, 3), "float32")
    if bake:
        fn = jax.jit(lambda x: predict(variables, x))
        exp = jexport.export(fn, platforms=platforms)(x_spec)
    else:
        var_specs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
        )
        exp = jexport.export(jax.jit(predict), platforms=platforms)(
            var_specs, x_spec
        )
    return exp.serialize()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True)
    p.add_argument("--model", default="unet_resnet50")
    p.add_argument("--num-classes", default=1, type=int,
                   help="Foreground classes (predict.py convention: "
                        "total = N+1)")
    p.add_argument("--decoder-width", default=1.0, type=float)
    p.add_argument("--input-size", default=480, type=int)
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8])
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    p.add_argument("--amp", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="bf16 compute inside the artifact (params stay f32)")
    p.add_argument("--bake-weights", default=True,
                   action=argparse.BooleanOptionalAction)
    p.add_argument("--out", default="serving")
    p.add_argument("--check", action="store_true",
                   help="Deserialize each artifact and compare against the "
                        "direct forward on random data (runs on this host's "
                        "backend)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unet_embroidery_seg_tpu.engine import checkpoint
    from unet_embroidery_seg_tpu.models import build_model

    model = build_model(
        args.model, num_classes=args.num_classes + 1,
        dtype=jnp.bfloat16 if args.amp else None,
        decoder_width=args.decoder_width,
    )
    variables = checkpoint.restore_variables(args.weights)
    predict = build_predict(model)

    os.makedirs(args.out, exist_ok=True)
    manifest = {
        "model": args.model,
        "num_classes_total": args.num_classes + 1,
        "decoder_width": args.decoder_width,
        "input_size": args.input_size,
        "platforms": args.platforms,
        "amp": args.amp,
        "baked_weights": args.bake_weights,
        "weights": os.path.abspath(args.weights),
        "jax_version": jax.__version__,
        "output": "softmax probabilities (N, H, W, C), NHWC float",
        "artifacts": {},
    }
    for b in args.batches:
        data = export_one(predict, variables, b, args.input_size,
                          args.platforms, args.bake_weights)
        name = f"{args.model}_{args.input_size}_b{b}.shlo"
        with open(os.path.join(args.out, name), "wb") as f:
            f.write(data)
        manifest["artifacts"][str(b)] = {"file": name, "bytes": len(data)}
        print(f"[export] {name}: {len(data)/1e6:.1f} MB", flush=True)

        if args.check:
            from jax import export as jexport

            back = jexport.deserialize(data)
            x = np.random.RandomState(0).rand(
                b, args.input_size, args.input_size, 3
            ).astype(np.float32)
            got = back.call(x) if args.bake_weights else back.call(variables, x)
            want = jax.jit(predict)(variables, x)
            diff = float(jnp.max(jnp.abs(got - want)))
            manifest["artifacts"][str(b)]["check_max_abs_diff"] = diff
            print(f"[check] b{b}: max|Δ| = {diff:.2e}", flush=True)
            assert diff < 1e-3, "roundtrip mismatch"

    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"[export] manifest -> {os.path.join(args.out, 'manifest.json')}")


if __name__ == "__main__":
    main()
