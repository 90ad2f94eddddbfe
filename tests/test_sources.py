"""SyntheticSource regression tests: the parity exports depend on its
deterministic per-index streams staying stable across rounds, and the
scaled multitask regime (PARITY.md) depends on the opt-in high-foreground
/ visual-label knobs actually changing the data distribution."""

import collections

import numpy as np

from unet_embroidery_seg_tpu.data.sources import (
    CLASS_NAMES,
    SyntheticSource,
    class_index_from_label,
)


def test_defaults_bit_identical_to_explicit_default_params():
    # Committed parity datasets were exported before the n_blobs_range /
    # label_mode knobs existed; the default-args stream must not move.
    a = SyntheticSource(split="train", length=6, seed=0)
    b = SyntheticSource(split="train", length=6, seed=0,
                        n_blobs_range=(1, 5), label_mode="random")
    for i in range(6):
        sa, sb = a[i], b[i]
        assert np.array_equal(np.array(sa["image"]), np.array(sb["image"]))
        assert np.array_equal(np.array(sa["mask"]), np.array(sb["mask"]))
        assert sa["label"] == sb["label"]


def test_high_blob_count_raises_foreground_fraction():
    base = SyntheticSource(split="train", length=16, seed=0)
    dense = SyntheticSource(split="train", length=16, seed=0,
                            n_blobs_range=(3, 8))
    fg = lambda src: np.mean(  # noqa: E731
        [(np.array(src[i]["mask"]) > 0).mean() for i in range(16)]
    )
    fg_base, fg_dense = fg(base), fg(dense)
    assert fg_dense > fg_base
    # The scaled multitask regime needs a roughly balanced BCE target.
    assert 0.3 < fg_dense < 0.6, fg_dense


def test_visual_labels_derive_from_blob_colors():
    src = SyntheticSource(split="train", length=24, seed=0,
                          n_blobs_range=(3, 8), label_mode="visual")
    counts = collections.Counter()
    for i in range(24):
        s = src[i]
        idx = class_index_from_label(s["label"])
        assert CLASS_NAMES[idx] == s["label"][: len(CLASS_NAMES[idx])]
        counts[idx] += 1
        # The label is a function of image content: the dominant channel of
        # the image's blob pixels (mask>0) should usually agree with the
        # labeled class — exact recomputation of the mean drawn fill color
        # isn't possible from the composited image (occlusion), so check
        # the dominant-channel statistic over foreground pixels instead.
        img = np.asarray(s["image"], dtype=np.float64)
        m = np.array(s["mask"]) > 0
        dom = int(np.argmax(img[m].mean(axis=0)))
        counts["agree"] += int(dom == idx)
    # All three classes occur, and the visual statistic predicts the label
    # far above the 1/3 chance floor (it IS the label modulo occlusion).
    assert all(counts[c] > 0 for c in range(3)), counts
    assert counts["agree"] >= 16, counts  # >= 2/3 agreement


def test_visual_mode_keeps_images_and_masks_identical():
    # label_mode only changes the label: no rng draws are added/removed
    # before the image/mask are finished.
    a = SyntheticSource(split="train", length=6, seed=3,
                        n_blobs_range=(3, 8), label_mode="random")
    b = SyntheticSource(split="train", length=6, seed=3,
                        n_blobs_range=(3, 8), label_mode="visual")
    for i in range(6):
        assert np.array_equal(np.array(a[i]["image"]), np.array(b[i]["image"]))
        assert np.array_equal(np.array(a[i]["mask"]), np.array(b[i]["mask"]))
