"""FlatAdam (ops/flat_adam.py) — semantic equivalence with the optax chain.

The flat-arena optimizer must implement exactly torch.optim.Adam semantics
(/root/reference/train.py:62-78: coupled L2 decay before the moment updates,
bias correction from step 1), which ``schedules.make_optimizer`` already
reproduces and tests/test_schedules.py verifies against torch. Proving
FlatAdam == the optax chain therefore chains the parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from unet_embroidery_seg_tpu.engine import TrainState, checkpoint, steps
from unet_embroidery_seg_tpu.models import build_model, init_model
from unet_embroidery_seg_tpu.ops import schedules
from unet_embroidery_seg_tpu.ops.flat_adam import FlatAdam, TreeAdam


def _copy(tree):
    return jax.tree.map(lambda x: jnp.array(np.asarray(x)), tree)


def _synthetic_grads(params, key, scale=1e-2):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    gl = [
        jax.random.normal(jax.random.fold_in(key, j), l.shape) * scale
        for j, l in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, gl)


@pytest.fixture(scope="module")
def small_params():
    model = build_model("unet_plain", num_classes=2, dtype=jnp.float32)
    variables = init_model(model, jax.random.PRNGKey(0), (32, 32))
    return variables["params"]


class TestFlatAdamEquivalence:
    @pytest.mark.parametrize("cls", [FlatAdam, TreeAdam])
    @pytest.mark.slow
    def test_matches_optax_chain_over_10_steps(self, small_params, cls):
        lr, wd = 1e-3, 1e-4
        tx = schedules.make_optimizer(lr, momentum=0.9, weight_decay=wd)
        fa = cls(lr, b1=0.9, weight_decay=wd, param_dtype=jnp.float32)

        p_ref = _copy(small_params)
        os_ref = tx.init(p_ref)
        st = fa.init(_copy(small_params))
        p_flat = fa.cast_params(_copy(small_params))

        for i in range(10):
            g = _synthetic_grads(small_params, jax.random.PRNGKey(100 + i))
            u, os_ref = tx.update(g, os_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u)
            p_flat, st = fa.apply_grads(g, st)

        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), p_ref, p_flat
        )
        assert max(jax.tree.leaves(diffs)) < 1e-6

    @pytest.mark.parametrize("cls", [FlatAdam, TreeAdam])
    def test_no_weight_decay(self, small_params, cls):
        tx = schedules.make_optimizer(1e-3, momentum=0.9, weight_decay=0.0)
        fa = cls(1e-3, b1=0.9, weight_decay=0.0, param_dtype=jnp.float32)
        p_ref = _copy(small_params)
        os_ref = tx.init(p_ref)
        st = fa.init(_copy(small_params))
        g = _synthetic_grads(small_params, jax.random.PRNGKey(7))
        u, os_ref = tx.update(g, os_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        p_flat, st = fa.apply_grads(g, st)
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), p_ref, p_flat
        )
        assert max(jax.tree.leaves(diffs)) < 1e-6  # f32 ulp-level

    @pytest.mark.parametrize("cls", [FlatAdam])
    def test_bf16_param_store_rounds_master(self, small_params, cls):
        """Stored params are the bf16 rounding of the f32 master."""
        fa = cls(1e-3, param_dtype=jnp.bfloat16)
        st = fa.init(small_params)
        p = fa.cast_params(small_params)
        assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(p))
        g = _synthetic_grads(small_params, jax.random.PRNGKey(3))
        p2, st = fa.apply_grads(g, st)
        flat_master = st.master
        # first leaf's slice must equal its bf16 cast
        leaf0 = jax.tree.leaves(p2)[0]
        n0 = leaf0.size
        np.testing.assert_array_equal(
            np.asarray(leaf0).ravel(),
            np.asarray(flat_master[:n0].astype(jnp.bfloat16)),
        )


class TestFlatAdamEngineIntegration:
    @pytest.mark.parametrize("variant", ["tree", "flat"])
    def test_train_step_learns_and_lr_injection(self, variant):
        model = build_model("unet_plain", num_classes=2, dtype=jnp.float32)
        variables = init_model(model, jax.random.PRNGKey(0), (32, 32))
        tx = schedules.make_train_optimizer(
            1e-3, param_dtype=jnp.float32, variant=variant
        )
        state = TrainState.create(variables, tx)
        step = steps.make_binary_train_step(model, tx, "bce", pos_weight=2.0)

        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        pngs = jnp.asarray((rng.rand(2, 32, 32) > 0.7), jnp.int32)
        sm = jnp.ones(2, jnp.float32)
        k = jax.random.PRNGKey(1)
        losses = []
        for i in range(8):
            state, loss = step(state, images, pngs, sm, k)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert int(state.opt_state.count) == 8
        assert int(state.step) == 8

        # per-epoch LR injection must not retrace
        state = state.replace(
            opt_state=schedules.set_learning_rate(state.opt_state, 5e-4)
        )
        assert float(state.opt_state.learning_rate) == pytest.approx(5e-4)
        state, loss = step(state, images, pngs, sm, k)  # same compiled fn
        assert np.isfinite(float(loss))

    @pytest.mark.parametrize("variant", ["tree", "flat"])
    def test_checkpoint_roundtrip(self, tmp_path, variant):
        model = build_model("unet_plain", num_classes=2, dtype=jnp.float32)
        variables = init_model(model, jax.random.PRNGKey(0), (32, 32))
        tx = schedules.make_train_optimizer(
            1e-3, param_dtype=jnp.float32, variant=variant
        )
        state = TrainState.create(variables, tx)
        step = steps.make_binary_train_step(model, tx, "bce")
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        pngs = jnp.asarray((rng.rand(2, 32, 32) > 0.7), jnp.int32)
        state, _ = step(state, images, pngs, jnp.ones(2, jnp.float32),
                        jax.random.PRNGKey(1))

        path = str(tmp_path / "resume.msgpack")
        checkpoint.save_state(path, state, extra={"epoch": 3})
        fresh = TrainState.create(
            init_model(model, jax.random.PRNGKey(9), (32, 32)), tx
        )
        restored, extra = checkpoint.restore_state(path, fresh)
        assert extra["epoch"] == 3
        assert int(restored.opt_state.count) == 1
        for a, b in zip(
            jax.tree.leaves(restored.opt_state.master),
            jax.tree.leaves(state.opt_state.master),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        d = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            restored.params, state.params,
        )
        assert max(jax.tree.leaves(d)) == 0.0
