"""DPM-Solver++ multistep sampler (SamplerConfig.sampler == "dpmpp").

Beyond-reference deterministic ODE sampler (arXiv 2211.01095, data
prediction).  Anchors:
  * order 1 is ANALYTICALLY DDIM(eta=0) — checked against the in-repo DDIM
    branch step-for-step;
  * a model whose x̂0 prediction is a constant c must be solved EXACTLY
    (the probability-flow ODE is linear in that case) regardless of step
    count;
  * on a smooth nonlinear model the 2M scheme converges to the fine-grid
    solution faster than order 1 at equal model-call budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion.sampling import (
    EditConfig,
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
    sample_loop,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule

SHAPE = (2, 4, 32, 16)


def _tables(n):
    return make_schedule("linear", 1000, timestep_respacing=str(n)).tables()


def _smooth_model(x, model_t, y=None):
    # smooth nonlinear eps-prediction, continuous in the ORIGINAL t scale
    # (model_t), so chains respaced at different N discretize the same ODE
    scale = (1.0 + model_t.reshape((-1,) + (1,) * (x.ndim - 1)) / 1000.0)
    return 0.1 * jnp.sin(x) * scale.astype(x.dtype)


def test_dpmpp_order1_equals_ddim_eta0():
    tables = _tables(8)
    rng = jax.random.PRNGKey(0)
    ddim = sample_loop(rng, _smooth_model, SHAPE, tables,
                       SamplerConfig(sampler="ddim", eta=0.0))[0]
    dpm1 = sample_loop(rng, _smooth_model, SHAPE, tables,
                       SamplerConfig(sampler="dpmpp", dpmpp_order=1))[0]
    np.testing.assert_allclose(np.asarray(dpm1), np.asarray(ddim),
                               rtol=1e-4, atol=1e-4)


def test_dpmpp_constant_x0_solved_exactly():
    """x̂0(x_t, t) ≡ c makes the data-prediction ODE linear: any step count
    must land on exactly c (final ᾱ_prev = 1)."""
    tables = _tables(4)
    c = 0.37
    model_ts = tables.model_t  # ascending in table index

    def model_fn(x, model_t, y=None):
        # invert the table gather: model_t -> respaced index -> ᾱ
        idx = jnp.searchsorted(model_ts, model_t)
        acp = tables.alphas_cumprod[idx].reshape(
            (-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return (x - jnp.sqrt(acp) * c) / jnp.sqrt(1.0 - acp)

    for order in (1, 2):
        out = sample_loop(
            jax.random.PRNGKey(1), model_fn, SHAPE, tables,
            SamplerConfig(sampler="dpmpp", dpmpp_order=order))[0]
        np.testing.assert_allclose(np.asarray(out), c, rtol=0, atol=1e-4)


def test_dpmpp_order2_converges_faster():
    """Error to a fine-grid (N=128) solution: 2M at N=8 beats order 1 at
    N=8, and 2M error shrinks with N (8 -> 16)."""
    rng = jax.random.PRNGKey(2)
    ref = sample_loop(rng, _smooth_model, SHAPE, _tables(128),
                      SamplerConfig(sampler="dpmpp", dpmpp_order=2))[0]

    def err(n, order):
        out = sample_loop(rng, _smooth_model, SHAPE, _tables(n),
                          SamplerConfig(sampler="dpmpp",
                                        dpmpp_order=order))[0]
        return float(jnp.abs(out - ref).mean())

    e8_1, e8_2, e16_2 = err(8, 1), err(8, 2), err(16, 2)
    assert e8_2 < e8_1, (e8_1, e8_2)
    assert e16_2 < e8_2, (e8_2, e16_2)


def test_dpmpp_final_step_drops_to_order1():
    """lower_order_final: at the final step λ_{t-1} exists only through the
    σ clamp, so 2M must fall back to order 1 there. On a 2-step chain BOTH
    steps are then order 1 (first step: no history; last step: final), so
    order-2 config must match DDIM(eta=0) exactly."""
    tables = _tables(2)
    rng = jax.random.PRNGKey(11)
    ddim = sample_loop(rng, _smooth_model, SHAPE, tables,
                       SamplerConfig(sampler="ddim", eta=0.0))[0]
    dpm2 = sample_loop(rng, _smooth_model, SHAPE, tables,
                       SamplerConfig(sampler="dpmpp", dpmpp_order=2))[0]
    np.testing.assert_allclose(np.asarray(dpm2), np.asarray(ddim),
                               rtol=1e-4, atol=1e-4)


def test_dpmpp_order_validated():
    tables = _tables(4)
    with pytest.raises(ValueError, match="dpmpp_order"):
        sample_loop(jax.random.PRNGKey(0), _smooth_model, SHAPE, tables,
                    SamplerConfig(sampler="dpmpp", dpmpp_order=3))


def test_dpmpp_is_deterministic_in_sampling_noise():
    """Only the chain INIT consumes randomness: two runs whose rngs produce
    the same x_init but would produce different per-step noise must agree.
    (Same key -> same init; the per-step noise streams are multiplied by
    g_coeff = 0, so bitwise-identical outputs certify determinism.)"""
    tables = _tables(8)
    cfg = SamplerConfig(sampler="dpmpp")
    a = sample_loop(jax.random.PRNGKey(5), _smooth_model, SHAPE, tables, cfg)[0]
    b = sample_loop(jax.random.PRNGKey(5), _smooth_model, SHAPE, tables, cfg)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a fixed init via noise= pins the whole chain regardless of key
    x0 = jax.random.normal(jax.random.PRNGKey(6), SHAPE)
    c1 = sample_loop(jax.random.PRNGKey(7), _smooth_model, SHAPE, tables,
                     cfg, noise=x0)[0]
    c2 = sample_loop(jax.random.PRNGKey(8), _smooth_model, SHAPE, tables,
                     cfg, noise=x0)[0]
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_dpmpp_classifier_guidance_shifts_samples():
    tables = _tables(8)
    guid = GuidanceConfig(method="classifier_guidance", schedule=True,
                          t_start=8, t_end=0)

    def cond_fn(x, model_t, rules):
        return 0.05 * jnp.ones_like(x)

    cfg = SamplerConfig(sampler="dpmpp", guidance=guid)
    plain = sample_loop(jax.random.PRNGKey(3), _smooth_model, SHAPE, tables,
                        SamplerConfig(sampler="dpmpp"))[0]
    guided = sample_loop(jax.random.PRNGKey(3), _smooth_model, SHAPE, tables,
                         cfg, cond_fn=cond_fn)[0]
    assert np.isfinite(np.asarray(guided)).all()
    assert not np.allclose(np.asarray(plain), np.asarray(guided))
    # constant positive score gradient pushes the ensemble mean up
    assert float(guided.mean()) > float(plain.mean())


def test_dpmpp_edit_chain_runs():
    tables = _tables(8)
    cfg = SamplerConfig(
        sampler="dpmpp",
        edit=EditConfig(noise_level=5, l_start=0, l_end=16))
    gt = jnp.ones(SHAPE) * 2.0
    mask = jnp.zeros(SHAPE).at[:, :, :8, :].set(1.0)
    out = sample_loop(jax.random.PRNGKey(4), _smooth_model, SHAPE, tables,
                      cfg, edit_gt=gt, edit_mask=mask)[0]
    assert np.isfinite(np.asarray(out)).all()
    # replacement editing pins the masked region to (α-scaled) gt
    np.testing.assert_allclose(np.asarray(out[:, :, :8, :]), 2.0, atol=0.2)


def test_dpmpp_reuse_composes():
    tables = _tables(16)
    cfg = SamplerConfig(sampler="dpmpp", reuse_interval=2, reuse_t_max=4)
    out = sample_loop(jax.random.PRNGKey(9), _smooth_model, SHAPE, tables,
                      cfg)[0]
    assert np.isfinite(np.asarray(out)).all()


def test_dpmpp_rejects_scg_and_segments_and_unknown():
    tables = _tables(8)
    with pytest.raises(ValueError, match="stochastic sampler"):
        sample_loop(
            jax.random.PRNGKey(0), _smooth_model, SHAPE, tables,
            SamplerConfig(sampler="dpmpp",
                          scg=SCGConfig(num_samples=2)))
    with pytest.raises(ValueError, match="order 2"):
        sample_loop(
            jax.random.PRNGKey(0), _smooth_model, SHAPE, tables,
            SamplerConfig(sampler="dpmpp"), t_begin=8, t_stop=4)
    with pytest.raises(ValueError, match="unknown sampler"):
        sample_loop(
            jax.random.PRNGKey(0), _smooth_model, SHAPE, tables,
            SamplerConfig(sampler="heun2"))
    # order 1 is single-step: segmented chains stay allowed
    seg = sample_loop(
        jax.random.PRNGKey(0), _smooth_model, SHAPE, tables,
        SamplerConfig(sampler="dpmpp", dpmpp_order=1), t_begin=8, t_stop=4)[0]
    assert np.isfinite(np.asarray(seg)).all()


def test_dpmpp_yaml_config():
    from types import SimpleNamespace

    from rule_guided_music_tpu.config import sampler_config_from_yaml

    cfg = SimpleNamespace(
        sampling=SimpleNamespace(use_ddim=False, sampler="dpmpp",
                                 dpmpp_order=1, t_end=0))
    sc = sampler_config_from_yaml(cfg)
    assert sc.sampler == "dpmpp" and sc.dpmpp_order == 1
    # use_ddim still honored when sampling.sampler is absent
    cfg2 = SimpleNamespace(sampling=SimpleNamespace(use_ddim=True))
    assert sampler_config_from_yaml(cfg2).sampler == "ddim"
