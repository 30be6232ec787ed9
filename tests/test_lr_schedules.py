"""LR schedules: open_CLIP scheduler.py shapes (cosine/const/const-cooldown)
and megatron OptimizerParamScheduler decay styles
(megatron/optimizer_param_scheduler.py: constant | linear | cosine |
inverse-square-root over --lr-decay-iters, floored at --min-lr)."""
import numpy as np

from megatron_clip_tpu.training.optim import (
    cosine_lr, const_lr, const_lr_cooldown, megatron_lr)


def test_megatron_cosine_matches_openclip_cosine():
    a = megatron_lr(1e-3, 5, 100)
    b = cosine_lr(1e-3, 5, 100)
    for s in [0, 3, 5, 50, 99, 100]:
        np.testing.assert_allclose(float(a(s)), float(b(s)), rtol=1e-7)


def test_linear_decays_to_min_lr():
    lin = megatron_lr(1e-3, 5, 100, decay_style="linear", min_lr=1e-5)
    np.testing.assert_allclose(float(lin(100)), 1e-5, rtol=1e-6)
    # midpoint of the decay span
    mid = float(lin(5 + (100 - 5) // 2))
    assert 1e-5 < mid < 1e-3
    # past the horizon it clamps (megatron min(num_steps, decay_steps))
    np.testing.assert_allclose(float(lin(500)), 1e-5, rtol=1e-6)


def test_inverse_square_root_shape():
    isr = megatron_lr(1e-3, 4, 100, decay_style="inverse-square-root",
                      min_lr=1e-5)
    # lr(step) = max_lr * sqrt(warmup)/sqrt(step): at step 16 -> max_lr/2
    np.testing.assert_allclose(float(isr(16)), 5e-4, rtol=1e-6)
    assert float(isr(4)) <= 1e-3 * (1 + 1e-6)
    np.testing.assert_allclose(float(isr(10_000_000)), 1e-5,
                               rtol=1e-6)  # min_lr floor


def test_constant_style_and_warmup():
    con = megatron_lr(1e-3, 5, 100, decay_style="constant")
    np.testing.assert_allclose(float(con(50)), 1e-3, rtol=1e-6)
    assert float(con(0)) < 1e-3  # warming up


def test_const_cooldown_endpoints():
    sch = const_lr_cooldown(1e-3, 2, 100, cooldown_steps=20,
                            cooldown_end_lr=1e-5)
    np.testing.assert_allclose(float(sch(50)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sch(100)), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(const_lr(1e-3, 2)(50)), 1e-3, rtol=1e-6)
