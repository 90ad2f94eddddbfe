"""Loss parity tests vs the reference formulas, reimplemented in torch.

Each test builds the torch-side expectation from the same math the reference
uses (file:line cites in the loss docstrings), then checks our jitted JAX
implementation matches to float tolerance. Layout note: reference is NCHW,
ours is NHWC — tests transpose accordingly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.ops import losses


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestBCE:
    def test_matches_torch(self):
        logits = _rand((4, 16, 16))
        targets = (_rand((4, 16, 16), seed=1) > 0).astype(np.float32)
        expected = F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(targets)
        ).item()
        got = jax.jit(losses.bce_with_logits)(logits, targets)
        assert abs(float(got) - expected) < 5e-6

    def test_pos_weight(self):
        logits = _rand((2, 8, 8))
        targets = (_rand((2, 8, 8), seed=2) > 0.3).astype(np.float32)
        pw = 3.7
        expected = F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(targets), pos_weight=torch.tensor([pw])
        ).item()
        got = losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), pos_weight=pw)
        assert abs(float(got) - expected) < 5e-6

    def test_mask(self):
        logits = _rand((2, 4, 4))
        targets = (_rand((2, 4, 4), seed=3) > 0).astype(np.float32)
        mask = (_rand((2, 4, 4), seed=4) > 0).astype(np.float32)
        lt, tt = torch.tensor(logits), torch.tensor(targets)
        valid = torch.tensor(mask) > 0
        expected = F.binary_cross_entropy_with_logits(lt[valid], tt[valid]).item()
        got = losses.bce_with_logits(logits, targets, mask=mask)
        assert abs(float(got) - expected) < 5e-5


def _torch_lovasz_hinge(logits, labels):
    """Reference lovasz (unet_training.py:219-280 math) in torch."""
    losses_t = []
    for logit, lab in zip(logits, labels):
        logit = logit.reshape(-1)
        lab = lab.reshape(-1).float()
        signs = 2.0 * lab - 1.0
        errors = 1.0 - logit * signs
        errors_sorted, perm = torch.sort(errors, descending=True)
        gt_sorted = lab[perm]
        gts = gt_sorted.sum()
        intersection = gts - gt_sorted.cumsum(0)
        union = gts + (1 - gt_sorted).cumsum(0)
        jaccard = 1.0 - intersection / union
        if jaccard.numel() > 1:
            jaccard = jaccard.clone()
            jaccard[1:] = jaccard[1:] - jaccard[:-1]
        losses_t.append(torch.dot(F.relu(errors_sorted), jaccard))
    return torch.stack(losses_t).mean()


class TestLovasz:
    def test_matches_torch(self):
        logits = _rand((3, 24, 24)) * 2
        labels = (_rand((3, 24, 24), seed=7) > 0.2).astype(np.float32)
        expected = _torch_lovasz_hinge(torch.tensor(logits), torch.tensor(labels)).item()
        got = jax.jit(losses.lovasz_hinge)(jnp.asarray(logits), jnp.asarray(labels))
        assert abs(float(got) - expected) < 1e-5

    def test_gradient_matches_torch(self):
        logits_np = _rand((2, 12, 12))
        labels_np = (_rand((2, 12, 12), seed=9) > 0).astype(np.float32)
        lt = torch.tensor(logits_np, requires_grad=True)
        loss_t = _torch_lovasz_hinge(lt, torch.tensor(labels_np))
        loss_t.backward()
        grad_j = jax.grad(losses.lovasz_hinge)(
            jnp.asarray(logits_np), jnp.asarray(labels_np)
        )
        np.testing.assert_allclose(np.asarray(grad_j), lt.grad.numpy(), atol=1e-5)

    def test_all_background(self):
        logits = jnp.asarray(_rand((1, 8, 8)))
        labels = jnp.zeros((1, 8, 8))
        val = losses.lovasz_hinge(logits, labels)
        assert np.isfinite(float(val))


class TestBinaryDispatch:
    def test_two_class_equivalence(self):
        out = _rand((2, 8, 8, 2))
        png = (_rand((2, 8, 8), seed=5) > 0).astype(np.int32)
        # sigmoid(l1 - l0) == softmax[..., 1]
        binary_logits = losses.binary_logits_from_two_class(jnp.asarray(out))
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(binary_logits)),
            np.asarray(jax.nn.softmax(jnp.asarray(out), axis=-1)[..., 1]),
            atol=1e-5,
        )
        got = losses.binary_segmentation_loss(jnp.asarray(out), jnp.asarray(png), "bce")
        lt = torch.tensor(out[..., 1] - out[..., 0])
        expected = F.binary_cross_entropy_with_logits(
            lt, torch.tensor(png.astype(np.float32))
        ).item()
        assert abs(float(got) - expected) < 5e-6

    def test_lovasz_dispatch(self):
        out = _rand((2, 8, 8, 2))
        png = (_rand((2, 8, 8), seed=6) > 0).astype(np.int32)
        got = losses.binary_segmentation_loss(
            jnp.asarray(out), jnp.asarray(png), "lovasz_hinge"
        )
        expected = _torch_lovasz_hinge(
            torch.tensor(out[..., 1] - out[..., 0]),
            torch.tensor(png.astype(np.float32)),
        ).item()
        assert abs(float(got) - expected) < 1e-5

    def test_unknown_loss_raises(self):
        with pytest.raises(ValueError):
            losses.binary_segmentation_loss(
                jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 4, 4), jnp.int32), "nope"
            )

    @pytest.mark.parametrize("loss_name", ["bce", "lovasz_hinge"])
    def test_all_valid_sample_mask_is_identity(self, loss_name):
        """Regression: a (N,) all-ones sample_mask must not change the loss.

        (The mask broadcasts to (N,1,1); the mean's denominator must count
        every pixel, not just N — this once inflated BCE by H*W.)
        """
        out = _rand((4, 8, 8, 2))
        png = (_rand((4, 8, 8), seed=7) > 0).astype(np.int32)
        base = losses.binary_segmentation_loss(jnp.asarray(out), jnp.asarray(png), loss_name)
        masked = losses.binary_segmentation_loss(
            jnp.asarray(out), jnp.asarray(png), loss_name,
            sample_mask=jnp.ones((4,), jnp.float32),
        )
        assert abs(float(base) - float(masked)) < 1e-6

    def test_padded_tail_sample_mask(self):
        """Masked-out samples must not contribute; result == loss on the
        valid prefix alone."""
        out = _rand((4, 8, 8, 2))
        png = (_rand((4, 8, 8), seed=8) > 0).astype(np.int32)
        mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        got = losses.binary_segmentation_loss(
            jnp.asarray(out), jnp.asarray(png), "bce", sample_mask=mask
        )
        expected = losses.binary_segmentation_loss(
            jnp.asarray(out[:3]), jnp.asarray(png[:3]), "bce"
        )
        assert abs(float(got) - float(expected)) < 1e-6


class TestCE:
    def test_matches_torch_with_ignore(self):
        num_classes = 5
        logits = _rand((2, 6, 6, num_classes))
        rng = np.random.RandomState(0)
        target = rng.randint(0, num_classes + 1, size=(2, 6, 6))  # includes ignore
        lt = torch.tensor(np.transpose(logits, (0, 3, 1, 2)))
        tt = torch.tensor(target)
        flat = lt.permute(0, 2, 3, 1).reshape(-1, num_classes)
        expected = torch.nn.CrossEntropyLoss(
            weight=torch.ones(num_classes), ignore_index=num_classes
        )(flat, tt.reshape(-1)).item()
        got = jax.jit(losses.ce_loss, static_argnames="num_classes")(
            jnp.asarray(logits), jnp.asarray(target), num_classes=num_classes
        )
        assert abs(float(got) - expected) < 1e-5

    def test_class_weights(self):
        num_classes = 3
        logits = _rand((1, 4, 4, num_classes))
        rng = np.random.RandomState(1)
        target = rng.randint(0, num_classes, size=(1, 4, 4))
        w = np.array([0.3, 1.0, 2.5], np.float32)
        lt = torch.tensor(np.transpose(logits, (0, 3, 1, 2)))
        flat = lt.permute(0, 2, 3, 1).reshape(-1, num_classes)
        expected = torch.nn.CrossEntropyLoss(
            weight=torch.tensor(w), ignore_index=num_classes
        )(flat, torch.tensor(target).reshape(-1)).item()
        got = losses.ce_loss(
            jnp.asarray(logits), jnp.asarray(target), cls_weights=w, num_classes=num_classes
        )
        assert abs(float(got) - expected) < 5e-5


class TestFocal:
    def test_matches_reference_math(self):
        num_classes = 4
        alpha, gamma = 0.5, 2.0
        logits = _rand((2, 5, 5, num_classes))
        rng = np.random.RandomState(2)
        target = rng.randint(0, num_classes + 1, size=(2, 5, 5))
        lt = torch.tensor(np.transpose(logits, (0, 3, 1, 2)))
        flat = lt.permute(0, 2, 3, 1).reshape(-1, num_classes)
        logpt = -torch.nn.CrossEntropyLoss(
            weight=torch.ones(num_classes),
            ignore_index=num_classes,
            reduction="none",
        )(flat, torch.tensor(target).reshape(-1))
        pt = torch.exp(logpt)
        logpt = logpt * alpha
        expected = (-((1 - pt) ** gamma) * logpt).mean().item()
        got = losses.focal_loss(
            jnp.asarray(logits), jnp.asarray(target), num_classes=num_classes
        )
        assert abs(float(got) - expected) < 1e-5


class TestDice:
    def test_matches_reference_math(self):
        num_classes = 3
        logits = _rand((2, 6, 6, num_classes))
        rng = np.random.RandomState(3)
        png = rng.randint(0, num_classes + 1, size=(2, 6, 6))
        onehot = np.eye(num_classes + 1, dtype=np.float32)[png]
        # torch expectation (unet_training.py:67-91 math)
        lt = torch.tensor(np.transpose(logits, (0, 3, 1, 2)))
        n, c = 2, num_classes
        temp_inputs = torch.softmax(
            lt.transpose(1, 2).transpose(2, 3).contiguous().view(n, -1, c), -1
        )
        temp_target = torch.tensor(onehot).view(n, -1, num_classes + 1)
        tp = torch.sum(temp_target[..., :-1] * temp_inputs, axis=[0, 1])
        fp = torch.sum(temp_inputs, axis=[0, 1]) - tp
        fn = torch.sum(temp_target[..., :-1], axis=[0, 1]) - tp
        score = (2 * tp + 1e-5) / (2 * tp + fn + fp + 1e-5)
        expected = (1 - torch.mean(score)).item()
        got = losses.dice_loss(jnp.asarray(logits), jnp.asarray(onehot))
        assert abs(float(got) - expected) < 1e-5


class TestMultitask:
    def test_bce_plus_ce(self):
        seg_logits = _rand((2, 8, 8, 1))
        cls_logits = _rand((2, 3), seed=11)
        seg_t = (_rand((2, 8, 8), seed=12) > 0).astype(np.int32)
        cls_t = np.array([0, 2], np.int32)
        total, seg_l, cls_l = losses.multitask_loss(
            jnp.asarray(seg_logits),
            jnp.asarray(cls_logits),
            jnp.asarray(seg_t),
            jnp.asarray(cls_t),
            cls_loss_weight=1.5,
        )
        exp_seg = F.binary_cross_entropy_with_logits(
            torch.tensor(seg_logits[..., 0]), torch.tensor(seg_t.astype(np.float32))
        ).item()
        exp_cls = torch.nn.CrossEntropyLoss()(
            torch.tensor(cls_logits), torch.tensor(cls_t.astype(np.int64))
        ).item()
        assert abs(float(seg_l) - exp_seg) < 2e-5
        assert abs(float(cls_l) - exp_cls) < 2e-5
        assert abs(float(total) - (exp_seg + 1.5 * exp_cls)) < 2e-5

    def test_pos_weight_matches_torch(self):
        # Opt-in seg pos_weight (OFF by default — the reference never
        # weights its multitask seg BCE, unet_multitask.py:109-139).
        seg_logits = _rand((2, 8, 8, 1))
        cls_logits = _rand((2, 3), seed=11)
        seg_t = (_rand((2, 8, 8), seed=12) > 0).astype(np.int32)
        cls_t = np.array([0, 2], np.int32)
        pw = 4.25
        _, seg_l, cls_l = losses.multitask_loss(
            jnp.asarray(seg_logits),
            jnp.asarray(cls_logits),
            jnp.asarray(seg_t),
            jnp.asarray(cls_t),
            pos_weight=pw,
        )
        exp_seg = F.binary_cross_entropy_with_logits(
            torch.tensor(seg_logits[..., 0]),
            torch.tensor(seg_t.astype(np.float32)),
            pos_weight=torch.tensor([pw]),
        ).item()
        assert abs(float(seg_l) - exp_seg) < 2e-5
        # cls loss is unaffected by the seg pos_weight
        _, seg_unweighted, cls_unweighted = losses.multitask_loss(
            jnp.asarray(seg_logits),
            jnp.asarray(cls_logits),
            jnp.asarray(seg_t),
            jnp.asarray(cls_t),
        )
        assert abs(float(cls_l) - float(cls_unweighted)) < 1e-7
        assert float(seg_l) != float(seg_unweighted)
