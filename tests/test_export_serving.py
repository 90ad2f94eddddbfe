"""StableHLO serving export: artifact roundtrip == direct forward.

The exported file must be callable WITHOUT this package (pure jax.export
deserialize), produce the same softmax probabilities as the live model, and
carry an accurate manifest — the contract scripts/export_serving.py states.
"""

import json
import os
import subprocess
import sys

import numpy as np

import jax

from unet_embroidery_seg_tpu.engine import checkpoint
from unet_embroidery_seg_tpu.models import build_model, init_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_checkpoint(tmp_path):
    model = build_model("unet_plain", num_classes=2)
    variables = init_model(model, jax.random.PRNGKey(3), (32, 32))
    path = str(tmp_path / "w.msgpack")
    checkpoint.save_variables(path, variables)
    return path


def test_export_roundtrip_cli(tmp_path):
    weights = _make_checkpoint(tmp_path)
    out = str(tmp_path / "serving")
    env = dict(
        os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
    )
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_serving.py"),
         "--weights", weights, "--model", "unet_plain", "--num-classes", "1",
         "--input-size", "32", "--batches", "1", "--platforms", "cpu",
         "--no-amp", "--out", out, "--check"],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    art = manifest["artifacts"]["1"]
    assert art["check_max_abs_diff"] < 1e-5  # f32 export, tiny tolerance

    # The consumer side needs ONLY jax: deserialize and call.
    from jax import export as jexport

    data = open(os.path.join(out, art["file"]), "rb").read()
    back = jexport.deserialize(data)
    x = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    probs = np.asarray(back.call(x))
    assert probs.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)


def test_unbaked_export_takes_variables(tmp_path):
    """--no-bake-weights artifacts accept (variables, x) at call time."""
    from jax import export as jexport

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import export_serving

    model = build_model("unet_plain", num_classes=2)
    variables = init_model(model, jax.random.PRNGKey(0), (32, 32))
    predict = export_serving.build_predict(model)
    data = export_serving.export_one(
        predict, variables, batch=1, size=32, platforms=["cpu"], bake=False
    )
    back = jexport.deserialize(data)
    x = np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32)
    got = np.asarray(back.call(variables, x))
    want = np.asarray(jax.jit(predict)(variables, x))
    np.testing.assert_allclose(got, want, atol=1e-5)
