"""Model zoo shape/dtype/param-count tests.

Shape expectations derive from the reference forward traces (SURVEY.md §3.2):
ResNet feats [64@/2, 256@/4, 512@/8, 1024@/16, 2048@/32], full-resolution
class logits for all variants. Small inputs (64x64) keep CPU runtime sane.
Parameter counts are compared against the torch reference architectures
rebuilt inline, which pins every layer's width/wiring.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu import models


def _init_and_apply(model, x, train=False, seed=0):
    rng = jax.random.PRNGKey(seed)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    if train:
        return model.apply(
            variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": rng}
        )
    return model.apply(variables, x, train=False), variables


def _n_params(variables):
    return sum(np.prod(v.shape) for v in jax.tree.leaves(variables["params"]))


class TestBackbone:
    def test_feature_pyramid_shapes(self):
        x = jnp.zeros((1, 64, 64, 3))
        feats, _ = _init_and_apply(models.ResNet50Backbone(), x)
        shapes = [f.shape for f in feats]
        assert shapes == [
            (1, 32, 32, 64),
            (1, 16, 16, 256),
            (1, 8, 8, 512),
            (1, 4, 4, 1024),
            (1, 2, 2, 2048),
        ]

    def test_odd_input_ceil_mode(self):
        # 100x100 input: conv s2 -> 50, ceil maxpool -> 25, then 13, 7, 4.
        x = jnp.zeros((1, 100, 100, 3))
        feats, _ = _init_and_apply(models.ResNet50Backbone(), x)
        assert [f.shape[1] for f in feats] == [50, 25, 13, 7, 4]

    def test_packed_stem_equivalence(self):
        """StemConv7x7 (space-to-depth lowering) == the direct 7x7 s2 conv.

        Same param tree, so the same variables drive both lowerings.
        """
        from unet_embroidery_seg_tpu.models.blocks import StemConv7x7

        rng = jax.random.PRNGKey(3)
        x = jax.random.uniform(rng, (2, 64, 64, 3), jnp.float32)
        stem = StemConv7x7(8)
        variables = stem.init(rng, x)
        direct = jax.lax.conv_general_dilated(
            x,
            variables["params"]["kernel"],
            (2, 2),
            ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        for mode in ("packed", "im2col"):
            got = StemConv7x7(8, mode=mode).apply(variables, x)
            assert got.shape == direct.shape == (2, 32, 32, 8)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(direct), rtol=1e-5, atol=1e-5
            )
        # odd input falls back to the direct lowering
        x_odd = jax.random.uniform(rng, (1, 33, 33, 3), jnp.float32)
        assert stem.apply(variables, x_odd).shape == (1, 17, 17, 8)


class TestModels:
    @pytest.mark.parametrize(
        "name,num_classes",
        [
            ("unet_plain", 2),
            ("attention_unet", 2),
            # dualdense compiles ~49s on XLA-CPU (dense-block concat chains):
            # slow-tier only; the other families keep inner-loop coverage.
            pytest.param("dualdense_unet", 2, marks=pytest.mark.slow),
            ("unet_resnet50", 2),
        ],
    )
    def test_forward_shapes(self, name, num_classes):
        model = models.build_model(name, num_classes=num_classes)
        x = jnp.zeros((2, 64, 64, 3))
        logits, variables = _init_and_apply(model, x)
        assert logits.shape == (2, 64, 64, num_classes)
        assert logits.dtype == jnp.float32
        assert "batch_stats" in variables or name == "unet_resnet50"

    def test_multitask_outputs(self):
        model = models.build_model("multitask_unet", num_classes=1)
        x = jnp.zeros((2, 64, 64, 3))
        (seg, cls), _ = _init_and_apply(model, x)
        assert seg.shape == (2, 64, 64, 1)
        assert cls.shape == (2, 3)

    def test_train_mode_updates_batch_stats(self):
        model = models.build_model("unet_plain", num_classes=2)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, x, train=False)
        _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(updates["batch_stats"])
        assert any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )

    def test_bf16_compute_f32_params(self):
        model = models.build_model("unet_plain", num_classes=2, dtype=jnp.bfloat16)
        x = jnp.zeros((1, 32, 32, 3))
        logits, variables = _init_and_apply(model, x)
        assert logits.dtype == jnp.float32  # head casts back
        for leaf in jax.tree.leaves(variables["params"]):
            assert leaf.dtype == jnp.float32

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError):
            models.build_model("nope", num_classes=2)


class TestDecoderWidth:
    """unet_resnet50 decoder_width: the opt-in MXU-utilization lever
    (unet_resnet.py module docstring). Non-parity — defaults stay 1.0."""

    def test_wide_decoder_shapes_and_widths(self):
        model = models.build_model("unet_resnet50", num_classes=2,
                                   decoder_width=2.0)
        x = jnp.zeros((1, 64, 64, 3))
        logits, variables = _init_and_apply(model, x)
        assert logits.shape == (1, 64, 64, 2)
        # Every decoder stage doubles: up_concat1..4 = 128/256/512/1024.
        params = variables["params"]
        for stage, width in [("up_concat1", 128), ("up_concat2", 256),
                             ("up_concat3", 512), ("up_concat4", 1024),
                             ("up_conv", 128)]:
            k = params[stage]["conv2"]["kernel"]
            assert k.shape[-1] == width, (stage, k.shape)

    def test_base_checkpoint_restores_backbone_only(self):
        """Flexible restore across widths: the shared ResNet50 encoder loads,
        the width-mismatched decoder entries are skipped (not an error)."""
        rng = jax.random.PRNGKey(0)
        base = models.build_model("unet_resnet50", num_classes=2)
        wide = models.build_model("unet_resnet50", num_classes=2,
                                  decoder_width=2.0)
        x = jnp.zeros((1, 32, 32, 3))
        base_vars = base.init({"params": rng}, x, train=False)
        wide_vars = wide.init({"params": rng}, x, train=False)
        merged, loaded, skipped = models.load_weights_flexible(
            dict(wide_vars), dict(base_vars)
        )
        n_backbone = len(
            jax.tree.leaves({"params": base_vars["params"]["resnet"],
                             "batch_stats": base_vars["batch_stats"]})
        )
        assert loaded >= n_backbone  # full encoder transfers
        assert skipped > 0  # decoder widths differ
        np.testing.assert_array_equal(
            merged["params"]["resnet"]["conv1"]["kernel"],
            base_vars["params"]["resnet"]["conv1"]["kernel"],
        )

    def test_width_rejected_for_other_models(self):
        with pytest.raises(ValueError, match="decoder_width"):
            models.build_model("unet_plain", num_classes=2, decoder_width=2.0)


class TestDiffHead:
    """blocks.ClassHead diff mode: the binary-train fast head."""

    def test_matches_channel_difference(self):
        """Same params: diff output == logits[...,1] - logits[...,0]."""
        std = models.build_model("unet_plain", num_classes=2)
        fast = models.build_model("unet_plain", num_classes=2, diff_head=True)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
        logits, variables = _init_and_apply(std, x)
        diff = fast.apply(variables, x, train=False)
        assert diff.shape == (2, 32, 32)
        np.testing.assert_allclose(
            np.asarray(diff),
            np.asarray(logits[..., 1] - logits[..., 0]),
            atol=1e-5, rtol=1e-5,
        )

    def test_param_trees_identical(self):
        std = models.build_model("unet_resnet50", num_classes=2)
        fast = models.build_model("unet_resnet50", num_classes=2, diff_head=True)
        rng = jax.random.PRNGKey(3)
        x = jnp.zeros((1, 64, 64, 3))
        vs = std.init({"params": rng, "dropout": rng}, x, train=False)
        vf = fast.init({"params": rng, "dropout": rng}, x, train=False)
        ks = {tuple(k.split("/")) for k in _flat_keys(vs["params"])}
        kf = {tuple(k.split("/")) for k in _flat_keys(vf["params"])}
        assert ks == kf
        for a, b in zip(jax.tree.leaves(vs["params"]), jax.tree.leaves(vf["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_binary_eval_step_counts_match(self):
        """Diff-head eval step produces the same confusion counts and loss."""
        from unet_embroidery_seg_tpu.engine import TrainState, steps
        from unet_embroidery_seg_tpu.ops import schedules

        std = models.build_model("unet_plain", num_classes=2)
        fast = models.build_model("unet_plain", num_classes=2, diff_head=True)
        x = jnp.asarray(np.random.RandomState(1).rand(4, 32, 32, 3), jnp.float32)
        pngs = jnp.asarray(
            (np.random.RandomState(2).rand(4, 32, 32) > 0.6).astype(np.int32)
        )
        mask = jnp.asarray(np.array([1, 1, 1, 0], np.float32))
        _, variables = _init_and_apply(std, x)
        tx = schedules.make_optimizer(1e-3)
        state = TrainState.create(variables, tx)
        loss_s, counts_s = steps.make_binary_eval_step(std, "bce")(
            state, x, pngs, mask
        )
        state2 = TrainState.create(variables, tx)
        loss_f, counts_f = steps.make_binary_eval_step(fast, "bce")(
            state2, x, pngs, mask
        )
        np.testing.assert_array_equal(np.asarray(counts_s), np.asarray(counts_f))
        assert abs(float(loss_s) - float(loss_f)) < 1e-5


def _flat_keys(tree, prefix=""):
    out = []
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(_flat_keys(v, p))
        else:
            out.append(p)
    return out


class TestParamCounts:
    """Pin total parameter counts against the torch reference models."""

    @pytest.mark.parametrize(
        "name,kwargs",
        [
            ("unet_plain", dict(num_classes=2)),
            ("attention_unet", dict(num_classes=2)),
            ("dualdense_unet", dict(num_classes=2)),
            ("unet_resnet50", dict(num_classes=2)),
            ("multitask_unet", dict(num_classes=1)),
        ],
    )
    def test_count_matches_torch(self, name, kwargs):
        torch_model = _build_torch_reference(name)
        expected = sum(p.numel() for p in torch_model.parameters())
        model = models.build_model(name, **kwargs)
        x = jnp.zeros((1, 32, 32, 3))
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng}, x, train=False)
        got = _n_params(variables)
        assert got == expected, f"{name}: ours {got} vs torch {expected}"


def _build_torch_reference(name):
    """Reconstruct the reference architectures in torch for param-count parity.

    This re-states the layer wiring from /root/reference/model/*.py using
    torch built-ins only (no code copied; the wiring *is* the spec).
    """
    import torch
    import torch.nn as nn

    class DoubleConv(nn.Sequential):
        def __init__(self, cin, cout):
            super().__init__(
                nn.Conv2d(cin, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU(),
                nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU(),
            )

    def bottleneck_params(cin, planes, stride, downsample):
        layers = [
            nn.Conv2d(cin, planes, 1, bias=False),
            nn.BatchNorm2d(planes),
            nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False),
            nn.BatchNorm2d(planes),
            nn.Conv2d(planes, planes * 4, 1, bias=False),
            nn.BatchNorm2d(planes * 4),
        ]
        if downsample:
            layers += [
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            ]
        return nn.ModuleList(layers)

    def resnet50_trunk():
        mods = nn.ModuleList([nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False), nn.BatchNorm2d(64)])
        inplanes = 64
        for planes, blocks, stride in [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]:
            for b in range(blocks):
                ds = b == 0 and (stride != 1 or inplanes != planes * 4)
                mods.append(bottleneck_params(inplanes, planes, stride if b == 0 else 1, ds))
                inplanes = planes * 4
        return mods

    def unet_up(cin, cout):
        return nn.ModuleList(
            [nn.Conv2d(cin, cout, 3, padding=1), nn.Conv2d(cout, cout, 3, padding=1)]
        )

    def resnet_decoder(num_classes):
        in_f = [192, 512, 1024, 3072]
        out_f = [64, 128, 256, 512]
        mods = nn.ModuleList()
        for i in range(4):
            mods.append(unet_up(in_f[i], out_f[i]))
        mods.append(unet_up(64, 64))  # up_conv (two conv3x3 with bias)
        mods.append(nn.Conv2d(64, num_classes, 1))
        return mods

    if name == "unet_plain":
        c = 64
        mods = nn.ModuleList([DoubleConv(3, c)])
        for i in range(4):
            mods.append(DoubleConv(c * 2**i, c * 2 ** (i + 1)))
        ups = [(c * 16 + c * 8, c * 8), (c * 8 + c * 4, c * 4), (c * 4 + c * 2, c * 2), (c * 2 + c, c)]
        for cin, cout in ups:
            mods.append(DoubleConv(cin, cout))
        mods.append(nn.Conv2d(c, 2, 1))
        return mods

    if name == "attention_unet":
        c = 64

        class Gate(nn.Module):
            def __init__(self, gate_ch, skip_ch, inter):
                super().__init__()
                self.theta = nn.Sequential(nn.Conv2d(skip_ch, inter, 1, bias=False), nn.BatchNorm2d(inter))
                self.phi = nn.Sequential(nn.Conv2d(gate_ch, inter, 1, bias=False), nn.BatchNorm2d(inter))
                self.psi = nn.Sequential(nn.Conv2d(inter, 1, 1, bias=True), nn.BatchNorm2d(1))

        mods = nn.ModuleList([DoubleConv(3, c)])
        for i in range(4):
            mods.append(DoubleConv(c * 2**i, c * 2 ** (i + 1)))
        specs = [(c * 16, c * 8, c * 8), (c * 8, c * 4, c * 4), (c * 4, c * 2, c * 2), (c * 2, c, c)]
        for gate_ch, skip_ch, out_ch in specs:
            mods.append(Gate(gate_ch, skip_ch, max(out_ch // 2, 16)))
            mods.append(DoubleConv(gate_ch + skip_ch, out_ch))
        mods.append(nn.Conv2d(c, 2, 1))
        return mods

    if name == "dualdense_unet":
        c, g, L = 64, 32, 3

        class DenseConvBlock(nn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                layers = []
                cur = cin
                for _ in range(L):
                    layers.append(
                        nn.Sequential(nn.BatchNorm2d(cur), nn.ReLU(), nn.Conv2d(cur, g, 3, padding=1, bias=False))
                    )
                    cur += g
                self.layers = nn.ModuleList(layers)
                self.trans = nn.Sequential(nn.Conv2d(cur, cout, 1, bias=False), nn.BatchNorm2d(cout), nn.ReLU())

        mods = nn.ModuleList([DenseConvBlock(3, c)])
        for i in range(4):
            mods.append(DenseConvBlock(c * 2**i, c * 2 ** (i + 1)))
        ups = [(c * 16 + c * 8, c * 8), (c * 8 + c * 4, c * 4), (c * 4 + c * 2, c * 2), (c * 2 + c, c)]
        for cin, cout in ups:
            mods.append(DenseConvBlock(cin, cout))
        mods.append(nn.Conv2d(c, 2, 1))
        return mods

    if name == "unet_resnet50":
        return nn.ModuleList([resnet50_trunk(), resnet_decoder(2)])

    if name == "multitask_unet":
        cls_head = nn.Sequential(nn.Linear(2048, 512), nn.Linear(512, 3))
        return nn.ModuleList([resnet50_trunk(), resnet_decoder(1), cls_head])

    raise ValueError(name)
