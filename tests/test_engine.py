"""Engine tests: train/eval steps, sharded execution, checkpoint round trips.

TPU-native analogue of the reference's missing test layer (SURVEY.md §4):
the jitted steps must (a) actually learn, (b) produce metric counts equal to
a numpy recomputation, (c) round-trip through checkpoints bit-exactly, and
(d) run identically under a multi-device mesh (data-parallel psum semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unet_embroidery_seg_tpu.engine import TrainState, checkpoint, steps
from unet_embroidery_seg_tpu.models import build_model, init_model
from unet_embroidery_seg_tpu.ops import schedules
from unet_embroidery_seg_tpu.parallel import make_mesh, replicate, shard_batch_arrays


def _toy_batch(b=8, s=32, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(b, s, s, 3).astype(np.float32)
    # learnable signal: mask = bright pixels
    pngs = (images.mean(-1) > 0.5).astype(np.int32)
    mask = np.ones(b, np.float32)
    return images, pngs, mask


@pytest.fixture(scope="module")
def _model_tx():
    model = build_model("unet_plain", num_classes=2)
    tx = schedules.make_optimizer(1e-3)
    return model, tx


@pytest.fixture
def small_setup(_model_tx):
    # Fresh state per test: train steps donate their state argument, so a
    # shared state's buffers would be invalidated by the first test that
    # steps it.
    model, tx = _model_tx
    variables = init_model(model, jax.random.PRNGKey(0), (32, 32))
    state = TrainState.create(variables, tx)
    return model, tx, state


class TestBinarySteps:
    def test_loss_decreases(self, small_setup):
        model, tx, state = small_setup
        train_step = steps.make_binary_train_step(model, tx, "bce")
        images, pngs, mask = _toy_batch()
        rng = jax.random.PRNGKey(1)
        first = None
        for i in range(8):
            state, loss = train_step(
                state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(mask), rng
            )
            if first is None:
                first = float(loss)
        assert float(loss) < first

    def test_eval_counts_match_numpy(self, small_setup):
        model, tx, state = small_setup
        eval_step = steps.make_binary_eval_step(model, "bce")
        images, pngs, mask = _toy_batch(seed=3)
        _, counts = eval_step(state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(mask))
        logits = model.apply(state.variables, jnp.asarray(images), train=False)
        pred = np.asarray(jnp.argmax(logits, -1))
        tp = int(((pred == 1) & (pngs == 1)).sum())
        fp = int(((pred == 1) & (pngs == 0)).sum())
        fn = int(((pred == 0) & (pngs == 1)).sum())
        tn = int(((pred == 0) & (pngs == 0)).sum())
        np.testing.assert_array_equal(np.asarray(counts, np.int64), [tp, fp, fn, tn])

    def test_padded_tail_neutralized(self, small_setup):
        model, tx, state = small_setup
        eval_step = steps.make_binary_eval_step(model, "bce")
        images, pngs, _ = _toy_batch(seed=4)
        mask = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
        _, counts_masked = eval_step(
            state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(mask)
        )
        _, counts_prefix = eval_step(
            state,
            jnp.asarray(np.tile(images[:4], (2, 1, 1, 1))),
            jnp.asarray(np.tile(pngs[:4], (2, 1, 1))),
            jnp.asarray(mask),
        )
        np.testing.assert_array_equal(
            np.asarray(counts_masked), np.asarray(counts_prefix)
        )


class TestShardedExecution:
    def test_mesh_matches_single_device(self, small_setup):
        """Data-parallel sharded eval == single-device eval (same counts)."""
        model, tx, state = small_setup
        eval_step = steps.make_binary_eval_step(model, "bce")
        images, pngs, mask = _toy_batch(seed=5)
        _, counts_single = eval_step(
            state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(mask)
        )
        mesh = make_mesh()
        state_r = jax.device_put(state, replicate(mesh))
        im, pn, ms = shard_batch_arrays(mesh, images, pngs, mask)
        _, counts_sharded = eval_step(state_r, im, pn, ms)
        np.testing.assert_array_equal(
            np.asarray(counts_single), np.asarray(counts_sharded)
        )

    def test_space_axis_matches(self, small_setup):
        """Spatial (H) partitioning must not change the metric counts."""
        model, tx, state = small_setup
        eval_step = steps.make_binary_eval_step(model, "bce")
        images, pngs, mask = _toy_batch(seed=6)
        mesh = make_mesh(n_data=4, n_space=2)
        state_r = jax.device_put(state, replicate(mesh))
        im, pn, ms = shard_batch_arrays(mesh, images, pngs, mask)
        loss_sp, counts_sp = eval_step(state_r, im, pn, ms)
        loss_1, counts_1 = eval_step(
            state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(mask)
        )
        np.testing.assert_array_equal(np.asarray(counts_sp), np.asarray(counts_1))
        assert abs(float(loss_sp) - float(loss_1)) < 1e-5


class TestMultitaskSteps:
    def test_step_and_confusion(self):
        model = build_model(
            "multitask_unet", num_classes=1, num_seg_classes=1, num_cls_classes=3
        )
        variables = init_model(model, jax.random.PRNGKey(0), (32, 32))
        tx = schedules.make_optimizer(1e-3)
        state = TrainState.create(variables, tx)
        train_step = steps.make_multitask_train_step(model, tx, "bce", 1.0)
        eval_step = steps.make_multitask_eval_step(model, "bce", 1.0)
        images, pngs, mask = _toy_batch(b=4)
        cls = np.array([0, 1, 2, 1], np.int32)
        rng = jax.random.PRNGKey(2)
        state, (total, seg_l, cls_l), correct = train_step(
            state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(cls),
            jnp.asarray(mask[:4]), rng,
        )
        assert np.isfinite(float(total))
        assert abs(float(total) - (float(seg_l) + float(cls_l))) < 1e-5
        (t2, _, _), seg_counts, confusion = eval_step(
            state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(cls),
            jnp.asarray(mask[:4]),
        )
        assert np.asarray(confusion).sum() == 4
        inter, union, psum, tsum = np.asarray(seg_counts, np.int64)
        # counts semantics: union = psum + tsum - inter (train.py:334-351)
        assert union == psum + tsum - inter
        assert tsum == int((pngs == 1).sum())


class TestCheckpoint:
    def test_full_state_roundtrip(self, small_setup, tmp_path):
        model, tx, state = small_setup
        train_step = steps.make_binary_train_step(model, tx, "bce")
        images, pngs, mask = _toy_batch()
        state, _ = train_step(
            state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(mask),
            jax.random.PRNGKey(0),
        )
        path = str(tmp_path / "ckpt.msgpack")
        checkpoint.save_state(path, state, extra={"epoch": 7})
        fresh = TrainState.create(
            init_model(model, jax.random.PRNGKey(9), (32, 32)), tx
        )
        restored, extra = checkpoint.restore_state(path, fresh)
        assert extra["epoch"] == 7
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state restored too (true resume, unlike the reference)
        for a, b in zip(
            jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_flexible_restore_skips_mismatches(self, small_setup, tmp_path):
        model, tx, state = small_setup
        path = str(tmp_path / "w.msgpack")
        checkpoint.save_variables(path, state.variables)
        other = build_model("unet_plain", num_classes=5)
        ov = init_model(other, jax.random.PRNGKey(1), (32, 32))
        merged, loaded, skipped = checkpoint.restore_flexible(path, ov)
        assert loaded > 0 and skipped > 0  # head (num_classes) mismatch skipped
