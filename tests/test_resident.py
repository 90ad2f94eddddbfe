"""Device-resident pipeline: index planning + eval chunk equivalence.

The full train-chunk scan is exercised on TPU (CPU XLA takes minutes to
compile a scanned conv backward, so CI pins the cheap pieces: the host-side
epoch plan and the forward-only eval scan).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.data.cache import CanvasCache
from unet_embroidery_seg_tpu.data.sources import SyntheticSource
from unet_embroidery_seg_tpu.engine import TrainState, resident, steps
from unet_embroidery_seg_tpu.models import build_model, init_model
from unet_embroidery_seg_tpu.ops import schedules


class TestEpochIndexPlan:
    def test_shapes_and_padding(self):
        idx, mask = resident.epoch_index_plan(10, 4, epoch=0, shuffle=False, seed=0)
        assert idx.shape == (3, 4) and mask.shape == (3, 4)
        # unshuffled: rows cover 0..9 then pad by repeating
        np.testing.assert_array_equal(idx[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(idx[2], [8, 9, 8, 9])
        np.testing.assert_array_equal(mask[2], [1, 1, 0, 0])

    def test_shuffle_determinism_and_coverage(self):
        a_idx, _ = resident.epoch_index_plan(32, 8, epoch=3, shuffle=True, seed=11)
        b_idx, _ = resident.epoch_index_plan(32, 8, epoch=3, shuffle=True, seed=11)
        np.testing.assert_array_equal(a_idx, b_idx)
        c_idx, _ = resident.epoch_index_plan(32, 8, epoch=4, shuffle=True, seed=11)
        assert not np.array_equal(a_idx, c_idx)
        assert set(a_idx.flatten()) == set(range(32))

    def test_max_batches(self):
        idx, _ = resident.epoch_index_plan(64, 8, 0, False, 0, max_batches=2)
        assert idx.shape == (2, 8)

    def test_matches_dataloader_order(self):
        """Same (seed, epoch) shuffle as the host DataLoader."""
        from unet_embroidery_seg_tpu.data import DataLoader, SegmentationDataset

        src = SyntheticSource(split="train", length=10)
        ds = SegmentationDataset(src, (32, 32), 2, augmentation=False, task="binary")
        dl = DataLoader(ds, 4, shuffle=True, seed=7, prefetch=0)
        # DataLoader shuffles with default_rng((seed, epoch)) like the plan
        order = np.arange(10)
        np.random.default_rng((7, 2)).shuffle(order)
        idx, _ = resident.epoch_index_plan(10, 4, epoch=2, shuffle=True, seed=7)
        np.testing.assert_array_equal(idx.flatten()[:10][np.argsort(np.arange(10))],
                                      idx.flatten()[:10])
        np.testing.assert_array_equal(idx[0], order[:4])


class TestTrainChunkTPU:
    """Full scanned train chunk — TPU only (XLA-CPU compiles this in ~5 min)."""

    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="scanned conv backward too slow to compile on CPU",
    )
    def test_loss_decreases_over_chunks(self):
        cache = CanvasCache(
            SyntheticSource(split="train", length=16), (64, 64), verbose=False
        )
        data = resident.upload(cache)
        model = build_model("unet_plain", num_classes=2)
        variables = init_model(model, jax.random.PRNGKey(0), (64, 64))
        tx = schedules.make_optimizer(1e-3)
        state = TrainState.create(variables, tx)
        train_step = steps.make_binary_train_step(model, tx, "bce", 5.0)
        chunk = resident.make_train_chunk_fn(train_step, (64, 64), True, 2)
        idx, maskp = resident.epoch_index_plan(16, 8, 0, True, 11)
        steps_ids = np.arange(len(idx), dtype=np.int32)
        losses = []
        for _ in range(6):
            state, ls = chunk(state, data, idx, maskp, steps_ids, jax.random.PRNGKey(1))
            losses.append(float(np.asarray(ls).mean()))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))


class TestEvalChunk:
    def test_matches_per_batch_eval(self):
        """Scanned resident eval == looped eval_step on the same batches."""
        cache = CanvasCache(
            SyntheticSource(split="validation", length=6), (32, 32), verbose=False
        )
        data = resident.upload(cache)
        model = build_model("unet_plain", num_classes=2)
        variables = init_model(model, jax.random.PRNGKey(0), (32, 32))
        state = TrainState.create(variables, schedules.make_optimizer(1e-4))
        eval_step = steps.make_binary_eval_step(model, "bce")
        chunk = resident.make_eval_chunk_fn(eval_step, (32, 32), True, 2)
        idx, maskp = resident.epoch_index_plan(6, 4, 0, False, 0)
        losses, counts = chunk(state, data, idx, maskp)
        assert losses.shape == (2,) and counts.shape == (2, 4)

        from unet_embroidery_seg_tpu.ops import device_augment as da

        total = np.zeros(4, np.int64)
        for row, m in zip(idx, maskp):
            img, png = da.preprocess_eval_batch(
                jnp.asarray(cache.images[row]), jnp.asarray(cache.masks[row])
            )
            _, c = eval_step(state, img, png, jnp.asarray(m))
            total += np.asarray(c, np.int64)
        np.testing.assert_array_equal(np.asarray(counts, np.int64).sum(0), total)
