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
    @pytest.mark.slow
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


class TestMulticlassSteps:
    NUM_CLASSES = 3  # model output channels; labels in [0,3), ignore id = 3

    def _batch(self, b=8, s=32, seed=0):
        rng = np.random.RandomState(seed)
        images = rng.rand(b, s, s, 3).astype(np.float32)
        # learnable 3-way signal: brightness terciles
        m = images.mean(-1)
        pngs = np.digitize(m, [0.4, 0.6]).astype(np.int32)
        return images, pngs, np.ones(b, np.float32)

    @pytest.mark.slow
    def test_loss_decreases(self):
        model = build_model("unet_plain", num_classes=self.NUM_CLASSES)
        tx = schedules.make_optimizer(1e-3)
        state = TrainState.create(init_model(model, jax.random.PRNGKey(0), (32, 32)), tx)
        train_step = steps.make_multiclass_train_step(model, tx, self.NUM_CLASSES)
        images, pngs, mask = self._batch()
        rng = jax.random.PRNGKey(1)
        first = None
        for _ in range(8):
            state, loss = train_step(
                state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(mask), rng
            )
            if first is None:
                first = float(loss)
        assert float(loss) < first

    def test_persample_eval_matches_bs1_loop(self):
        """Per-sample eval sums at bs=8 == a bs=1 loop of batch metrics.

        This is the reference val CLI's statistic (/root/reference/val.py:50-59
        with per-batch-averaged metrics, train_and_eval.py:480-495).
        """
        from unet_embroidery_seg_tpu.ops import metrics as M

        model = build_model("unet_plain", num_classes=self.NUM_CLASSES)
        tx = schedules.make_optimizer(1e-3)
        state = TrainState.create(init_model(model, jax.random.PRNGKey(2), (32, 32)), tx)
        eval_step = steps.make_multiclass_persample_eval_step(
            model, self.NUM_CLASSES, use_dice=True
        )
        images, pngs, _ = self._batch(seed=7)
        mask = np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32)  # padded tail
        loss_sum, sums, n_valid = eval_step(
            state, jnp.asarray(images), jnp.asarray(pngs), jnp.asarray(mask)
        )
        assert float(n_valid) == 6.0
        logits = model.apply(state.variables, jnp.asarray(images), train=False)
        expected = {}
        for i in range(6):  # valid samples only
            m1 = M.multiclass_batch_metrics(
                logits[i : i + 1], jnp.asarray(pngs[i : i + 1]), self.NUM_CLASSES
            )
            for k, v in m1.items():
                expected[k] = expected.get(k, 0.0) + float(v)
        for k in expected:
            np.testing.assert_allclose(float(sums[k]), expected[k], rtol=1e-5)

    def test_batch_averaged_differs_from_persample(self):
        """Sanity: the bs>1 batch-averaged statistic is genuinely different,
        so val.py must not use it (the bug this guards against)."""
        from unet_embroidery_seg_tpu.ops import metrics as M

        rng = np.random.RandomState(3)
        logits = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32))
        # class 2 appears in only one sample: per-batch presence != per-sample
        pngs = np.zeros((4, 8, 8), np.int32)
        pngs[0, :2] = 2
        pngs[1:, 4:] = 1
        pngs = jnp.asarray(pngs)
        batch_m = M.multiclass_batch_metrics(logits, pngs, 3)
        sums, n = M.multiclass_per_sample_sums(logits, pngs, 3)
        assert (
            abs(float(batch_m["Mean IoU"]) - float(sums["Mean IoU"]) / float(n))
            > 1e-4
        )


class TestShardedTrainStep:
    @pytest.mark.slow
    def test_data_parallel_train_step_matches_single(self, _model_tx):
        """One sharded train step == the single-device step on the same batch.

        Covers the gradient-psum and sync-BN claims of parallel/mesh.py: with
        replicated params and a batch sharded over the data axis, GSPMD's
        collectives must reproduce the single-device numerics (f32, b8).

        Uses SGD so params differ exactly by lr*(grad difference): a tight
        test of the cross-shard gradient reduction. (One Adam step divides
        g/sqrt(g^2) which amplifies reduction-order noise on near-zero grads
        to O(lr) — it would need a vacuous tolerance; Adam-under-mesh is
        exercised by dryrun_multichip instead.)
        """
        import optax

        model, _ = _model_tx
        tx = optax.sgd(1e-2)
        variables = init_model(model, jax.random.PRNGKey(4), (32, 32))
        images, pngs, mask = _toy_batch(seed=8)
        rng = jax.random.PRNGKey(5)

        train_step = steps.make_binary_train_step(model, tx, "bce")
        # The jitted step donates its state arg; copy so `variables` survives
        # for the sharded state below.
        state_single = TrainState.create(jax.tree.map(jnp.copy, variables), tx)
        state_single, loss_single = train_step(
            state_single, jnp.asarray(images), jnp.asarray(pngs),
            jnp.asarray(mask), rng,
        )

        mesh = make_mesh()
        state_sharded = jax.device_put(TrainState.create(variables, tx), replicate(mesh))
        im, pn, ms = shard_batch_arrays(mesh, images, pngs, mask)
        state_sharded, loss_sharded = train_step(state_sharded, im, pn, ms, rng)

        assert abs(float(loss_single) - float(loss_sharded)) < 1e-6
        # f32 reduction order differs across shards, so grads carry ~1e-4
        # relative noise (measured max param delta 5e-6 at lr=1e-2). A missing
        # gradient psum or per-shard BN stats would be O(1e-2) — far outside.
        for a, b in zip(
            jax.tree.leaves(state_single.params), jax.tree.leaves(state_sharded.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
        for a, b in zip(
            jax.tree.leaves(state_single.batch_stats),
            jax.tree.leaves(state_sharded.batch_stats),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


class TestMultihostGlue:
    def test_init_multihost_noop_single_process(self, monkeypatch):
        from unet_embroidery_seg_tpu.parallel import init_multihost

        for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                    "TPU_WORKER_HOSTNAMES"):
            monkeypatch.delenv(var, raising=False)
        assert init_multihost() == 0

    def test_global_batch_from_local_single_process(self):
        """With one process, local == global: same values and shardings as
        shard_batch_arrays."""
        from unet_embroidery_seg_tpu.parallel import global_batch_from_local

        mesh = make_mesh()
        rng = np.random.RandomState(0)
        images = rng.rand(8, 16, 16, 3).astype(np.float32)
        mask = np.ones(8, np.float32)
        g_im, g_ms = global_batch_from_local(mesh, images, mask)
        s_im, s_ms = shard_batch_arrays(mesh, images, mask)
        np.testing.assert_array_equal(np.asarray(g_im), images)
        np.testing.assert_array_equal(np.asarray(g_ms), mask)
        assert g_im.sharding == s_im.sharding
        assert g_ms.sharding == s_ms.sharding


class TestMultitaskSteps:
    @pytest.mark.slow
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
    @pytest.mark.slow
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
