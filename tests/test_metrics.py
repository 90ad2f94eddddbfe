"""Metric parity tests vs the reference formulas (train_and_eval.py:20-152)."""

import numpy as np

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.ops import metrics


def _np_binary_confusion(pred, target):
    pf, tf = pred == 1, target == 1
    return (
        np.sum(pf & tf),
        np.sum(pf & ~tf),
        np.sum(~pf & tf),
        np.sum(~pf & ~tf),
    )


class TestBinary:
    def test_counts(self):
        rng = np.random.RandomState(0)
        pred = rng.randint(0, 2, (3, 16, 16))
        target = rng.randint(0, 2, (3, 16, 16))
        got = np.asarray(
            jax.jit(metrics.binary_confusion_counts)(jnp.asarray(pred), jnp.asarray(target))
        )
        assert tuple(got) == _np_binary_confusion(pred, target)

    def test_counts_with_ignore(self):
        rng = np.random.RandomState(1)
        pred = rng.randint(0, 2, (2, 8, 8))
        target = rng.randint(0, 3, (2, 8, 8))  # 2 == ignore
        got = np.asarray(
            metrics.binary_confusion_counts(
                jnp.asarray(pred), jnp.asarray(target), ignore_index=2
            )
        )
        valid = target != 2
        assert tuple(got) == _np_binary_confusion(pred[valid], target[valid])

    def test_finalize(self):
        m = metrics.binary_metrics_from_counts(10, 5, 3, 82)
        eps = 1e-7
        assert abs(m["Dice"] - 20 / (20 + 5 + 3 + eps)) < 1e-12
        assert abs(m["IoU"] - 10 / (10 + 5 + 3 + eps)) < 1e-12
        assert abs(m["Precision"] - 10 / (15 + eps)) < 1e-12
        assert abs(m["Recall"] - 10 / (13 + eps)) < 1e-12
        assert abs(m["Accuracy"] - 92 / (100 + eps)) < 1e-12


def _np_multiclass(pred, target, num_classes):
    """Reference metric math (train_and_eval.py:20-103) in numpy."""
    pixel_acc = np.mean(pred == target)
    accs, ious_present, ious_all, freqs = [], [], [], []
    for i in range(num_classes):
        tm, pm = target == i, pred == i
        inter = np.sum(tm & pm)
        union = np.sum(tm | pm)
        freqs.append(np.sum(tm))
        ious_all.append(inter / union if union > 0 else 0.0)
        if np.sum(tm) > 0:
            accs.append(inter / np.sum(tm))
            ious_present.append(inter / union if union > 0 else 0.0)
    mean_acc = np.mean(accs) if accs else 0.0
    mean_iou = np.mean(ious_present) if ious_present else 0.0
    total = np.sum(freqs)
    fw_iou = sum(f * i for f, i in zip(freqs, ious_all)) / total if total else 0.0
    return pixel_acc, mean_acc, mean_iou, fw_iou


class TestMulticlass:
    def test_matches_reference(self):
        num_classes = 5
        rng = np.random.RandomState(3)
        logits = rng.randn(2, 12, 12, num_classes).astype(np.float32)
        target = rng.randint(0, num_classes, (2, 12, 12))
        got = jax.jit(metrics.multiclass_batch_metrics, static_argnames="num_classes")(
            jnp.asarray(logits), jnp.asarray(target), num_classes=num_classes
        )
        pred = np.argmax(logits, -1)
        pa, ma, mi, fw = _np_multiclass(pred, target, num_classes)
        assert abs(float(got["Pixel Accuracy"]) - pa) < 1e-6
        assert abs(float(got["Mean Accuracy"]) - ma) < 1e-6
        assert abs(float(got["Mean IoU"]) - mi) < 1e-6
        assert abs(float(got["Frequency Weighted IoU"]) - fw) < 1e-6

    def test_absent_class_excluded(self):
        num_classes = 4
        logits = np.zeros((1, 4, 4, num_classes), np.float32)
        logits[..., 1] = 5.0  # predict class 1 everywhere
        target = np.ones((1, 4, 4), np.int64)  # only class 1 present
        got = metrics.multiclass_batch_metrics(
            jnp.asarray(logits), jnp.asarray(target), num_classes=num_classes
        )
        assert float(got["Mean IoU"]) == 1.0
        assert float(got["Mean Accuracy"]) == 1.0


class TestMultitaskSeg:
    def test_counts_and_finalize(self):
        rng = np.random.RandomState(4)
        seg_logits = rng.randn(3, 8, 8, 1).astype(np.float32)
        seg_targets = rng.randint(0, 2, (3, 8, 8))
        counts = np.asarray(
            metrics.multitask_seg_counts(jnp.asarray(seg_logits), jnp.asarray(seg_targets))
        )
        pred = 1 / (1 + np.exp(-seg_logits[..., 0])) > 0.5
        tgt = seg_targets == 1
        assert counts[0] == np.sum(pred & tgt)
        assert counts[1] == np.sum(pred | tgt)
        m = metrics.multitask_seg_metrics_from_counts(*counts)
        assert abs(m["IoU"] - counts[0] / (counts[1] + 1e-6)) < 1e-9
        assert abs(m["Dice"] - 2 * counts[0] / (counts[2] + counts[3] + 1e-6)) < 1e-9
