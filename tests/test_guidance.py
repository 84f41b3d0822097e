"""Guidance condition-function tests: CFG math, composite cond fns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion.guidance import (
    CondFnSpec,
    guide_schedule_mask,
    make_grad_cond_fn,
    make_model_fn,
    make_value_cond_fn,
)


def test_make_model_fn_cfg_combination():
    """(1+w)*eps_c - w*eps_null with the null class == num_classes."""
    num_classes = 3

    def model_apply(x, t, y):
        # eps = y broadcast, so cond/uncond differ deterministically
        return jnp.ones_like(x) * y.astype(jnp.float32)[:, None, None, None]

    w = 4.0
    fn = make_model_fn(model_apply, num_classes=num_classes, cfg=True, w=w)
    x = jnp.zeros((2, 1, 4, 4))
    t = jnp.zeros((2,))
    y = jnp.array([1, 2])
    out = fn(x, t, y)
    # eps_c = y, eps_null = 3 -> (1+4)*y - 4*3
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 5 * 1 - 12)
    np.testing.assert_allclose(np.asarray(out)[1, 0, 0, 0], 5 * 2 - 12)


def test_make_model_fn_uncond_uses_null_label():
    seen = {}

    def model_apply(x, t, y):
        seen["y"] = y
        return x

    fn = make_model_fn(model_apply, num_classes=3, class_cond=False)
    fn(jnp.zeros((2, 1, 2, 2)), jnp.zeros((2,)), jnp.array([0, 1]))
    np.testing.assert_array_equal(np.asarray(seen["y"]), [3, 3])


def test_grad_cond_fn_mse_gradient_direction():
    """grad of -||cls(x) - target||² points toward reducing the error."""

    def classifier(x, t):
        # logits = mean of x per example, 2-dim
        m = x.reshape(x.shape[0], -1).mean(axis=-1)
        return jnp.stack([m, 2 * m], axis=-1)

    spec = CondFnSpec(fn="grad_nn_zt_mse", rule_name="r", scale=1.0,
                      classifier=classifier)
    cond = make_grad_cond_fn([spec])
    x = jnp.zeros((1, 1, 2, 2))
    rules = {"r": jnp.asarray([[1.0, 2.0]])}  # wants mean(x) == 1
    g = cond(x, jnp.zeros((1,)), rules)
    assert float(g.min()) > 0.0  # push x up toward the target


def test_grad_cond_fn_composite_sums_terms():
    def cls_a(x, t):
        return x.reshape(x.shape[0], -1).mean(-1, keepdims=True)

    def cls_b(x, t):
        return -x.reshape(x.shape[0], -1).mean(-1, keepdims=True)

    specs = [
        CondFnSpec(fn="grad_nn_zt_mse", rule_name="a", scale=1.0,
                   classifier=cls_a),
        CondFnSpec(fn="grad_nn_zt_mse", rule_name="b", scale=1.0,
                   classifier=cls_b),
    ]
    cond = make_grad_cond_fn(specs)
    x = jnp.zeros((1, 1, 2, 2))
    rules = {"a": jnp.asarray([[1.0]]), "b": jnp.asarray([[1.0]])}
    # terms push in opposite directions with equal magnitude -> cancel
    g = cond(x, jnp.zeros((1,)), rules)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_value_cond_fn_rule_x0():
    spec = CondFnSpec(fn="rule_x0_mse_dummy", rule_name="pitch_hist", scale=2.0)
    cond = make_value_cond_fn([spec])
    roll = np.full((1, 1, 128, 128), -1.0, dtype=np.float32)
    roll[:, 0, 60, :] = 0.5
    x = jnp.asarray(roll)
    target = np.zeros((1, 12), dtype=np.float32)
    target[0, 0] = 1.0
    lp_match = cond(x, jnp.zeros((1,)), {"pitch_hist": jnp.asarray(target)})
    target_off = np.roll(target, 3, axis=-1)
    lp_off = cond(x, jnp.zeros((1,)), {"pitch_hist": jnp.asarray(target_off)})
    assert float(lp_match[0]) > float(lp_off[0])


def test_chord_cond_fn_dual_heads():
    def classifier(x, t):
        b = x.shape[0]
        key_logits = jnp.tile(jnp.arange(25.0)[None], (b, 1))
        chord_logits = jnp.zeros((b, 4, 8)).at[:, :, 5].set(3.0)
        return key_logits, chord_logits

    spec = CondFnSpec(fn="grad_nn_zt_chord", rule_name="chord", scale=1.0,
                      classifier=classifier)
    # value path via the spec's logprob
    x = jnp.zeros((2, 1, 4, 4))
    rules = {"chord": jnp.full((2, 4), 5, dtype=jnp.int32)}
    lp = spec.logprob(x, jnp.zeros((2,)), rules)
    rules_off = {"chord": jnp.full((2, 4), 2, dtype=jnp.int32)}
    lp_off = spec.logprob(x, jnp.zeros((2,)), rules_off)
    assert float(lp.sum()) > float(lp_off.sum())


def test_guide_schedule_mask_semantics():
    # t in [t_end, t_start) and (t+1) % interval == 0
    assert bool(guide_schedule_mask(jnp.int32(100), 750, 0, 1))
    assert not bool(guide_schedule_mask(jnp.int32(750), 750, 0, 1))
    assert not bool(guide_schedule_mask(jnp.int32(900), 750, 0, 1))
    assert bool(guide_schedule_mask(jnp.int32(749), 750, 0, 1))
    # interval 2: guided when (t+1) even
    assert bool(guide_schedule_mask(jnp.int32(5), 750, 0, 2))
    assert not bool(guide_schedule_mask(jnp.int32(6), 750, 0, 2))
