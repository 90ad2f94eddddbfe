"""LR schedule parity tests (unet_training.py:116-199, train.py:62-78)."""

import math

import numpy as np
import optax

from unet_embroidery_seg_tpu.ops import schedules


def _ref_warm_cos(lr, min_lr, total_iters, wti, wls, nai, iters):
    if iters <= wti:
        return (lr - wls) * pow(iters / float(wti), 2) + wls
    elif iters >= total_iters - nai:
        return min_lr
    else:
        return min_lr + 0.5 * (lr - min_lr) * (
            1.0 + math.cos(math.pi * (iters - wti) / (total_iters - wti - nai))
        )


class TestWarmCos:
    def test_full_50_epoch_trajectory(self):
        lr, min_lr, total = 1e-4, 1e-6, 50
        wti = min(max(0.05 * total, 1), 3)
        wls = max(0.1 * lr, 1e-6)
        nai = min(max(0.05 * total, 1), 15)
        fn = schedules.get_lr_scheduler("cos", lr, min_lr, total)
        for epoch in range(total):
            assert abs(fn(epoch) - _ref_warm_cos(lr, min_lr, total, wti, wls, nai, epoch)) < 1e-12

    def test_step_decay(self):
        lr, min_lr, total = 1e-4, 1e-6, 50
        fn = schedules.get_lr_scheduler("step", lr, min_lr, total)
        decay_rate = (min_lr / lr) ** (1 / 9)
        step_size = total / 10
        for epoch in range(total):
            n = epoch // step_size
            assert abs(fn(epoch) - lr * decay_rate**n) < 1e-15

    def test_lr_clamping(self):
        # lr_limit_max == lr_limit_min == 1e-4 pins the init LR at 1e-4.
        for bs in [1, 8, 16, 64]:
            init, mn = schedules.resolve_init_lrs(bs)
            assert init == 1e-4
            assert 1e-6 <= mn <= 1e-6 + 1e-12


class TestOptimizer:
    def test_adam_matches_torch_one_step(self):
        import torch

        w0 = np.array([0.5, -1.2, 2.0], np.float32)
        g = np.array([0.1, -0.2, 0.3], np.float32)
        lr, wd, b1 = 1e-3, 1e-4, 0.9

        p = torch.nn.Parameter(torch.tensor(w0.copy()))
        opt = torch.optim.Adam([p], lr=lr, betas=(b1, 0.999), weight_decay=wd)
        p.grad = torch.tensor(g.copy())
        opt.step()
        expected = p.detach().numpy()

        tx = schedules.make_optimizer(lr, momentum=b1, weight_decay=wd)
        params = {"w": np.array(w0)}
        state = tx.init(params)
        updates, state = tx.update({"w": np.array(g)}, state, params)
        new_params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(new_params["w"], expected, atol=1e-6)

    def test_set_learning_rate_no_retrace(self):
        tx = schedules.make_optimizer(1e-4)
        params = {"w": np.zeros(3, np.float32)}
        state = tx.init(params)
        state = schedules.set_learning_rate(state, 5e-5)
        assert abs(float(state.hyperparams["learning_rate"]) - 5e-5) < 1e-9
