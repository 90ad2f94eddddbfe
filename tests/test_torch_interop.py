"""torch_interop: checkpoint conversion against the live PyTorch reference.

The strongest architecture-parity evidence in the suite: reference-trained
weights imported here must produce the SAME forward outputs as the torch
model itself (exercising the ceil-mode stem maxpool, the BN-free decoder,
align_corners upsampling, gate/dense block wiring — every structural claim
at once), and our exports must load into the unmodified reference with
``strict=True`` (/root/reference/val.py:68-69).

Skips cleanly when torch or the reference tree is unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = os.environ.get("UNET_REFERENCE_DIR", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference tree not available",
)

import jax  # noqa: E402

from unet_embroidery_seg_tpu.models import build_model, init_model  # noqa: E402
from unet_embroidery_seg_tpu.utils import torch_interop  # noqa: E402

# (name, build kwargs ours, forward tuple?)
MODELS = [
    ("unet_plain", {"num_classes": 2}, False),
    ("unet_resnet50", {"num_classes": 2}, False),
    ("attention_unet", {"num_classes": 2}, False),
    ("dualdense_unet", {"num_classes": 2}, False),
    ("multitask_unet",
     {"num_classes": 1, "num_seg_classes": 1, "num_cls_classes": 3}, True),
]


def _ref_model(name):
    sys.path.insert(0, REF)
    try:
        from model.model_factory import build_model as ref_build
    finally:
        sys.path.remove(REF)
    torch.manual_seed(3)
    m = ref_build(name, num_classes=2)
    m.eval()
    return m


def _ours(name, kwargs):
    model = build_model(name, **kwargs)
    variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
    return model, variables


@pytest.mark.parametrize("name,kwargs,is_tuple", MODELS)
def test_import_forward_parity(name, kwargs, is_tuple):
    """Reference weights -> our variables: forward outputs must match."""
    ref = _ref_model(name)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    model, template = _ours(name, kwargs)
    variables = torch_interop.import_state_dict(name, template, sd)

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = model.apply(variables, x, train=False)

    if is_tuple:
        seg_w, cls_w = (w.numpy() for w in want)
        seg_g, cls_g = got
        # ours: seg (N, H, W, 1) NHWC; ref (N, 1, H, W)
        np.testing.assert_allclose(
            np.transpose(np.asarray(seg_g), (0, 3, 1, 2)), seg_w,
            atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(cls_g), cls_w,
                                   atol=1e-5, rtol=1e-4)
    else:
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)),
            want.numpy(), atol=1e-5, rtol=1e-4,
        )


@pytest.mark.parametrize("name,kwargs,is_tuple", MODELS)
def test_export_strict_load_and_roundtrip(name, kwargs, is_tuple):
    """Our variables -> torch: strict load into the unmodified reference,
    then back — bit-identical round trip."""
    model, variables = _ours(name, kwargs)
    sd = torch_interop.export_state_dict(name, variables)

    ref = _ref_model(name)
    ref.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=True
    )

    back = torch_interop.import_state_dict(name, variables, sd)
    flat_a = torch_interop._flatten(variables["params"])
    flat_b = torch_interop._flatten(back["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k], np.float32),
                                      flat_b[k], err_msg=k)


def test_wrong_model_fails_loudly():
    ref = _ref_model("unet_plain")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    _, template = _ours("attention_unet", {"num_classes": 2})
    with pytest.raises(KeyError):
        torch_interop.import_state_dict("attention_unet", template, sd)
