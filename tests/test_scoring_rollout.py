"""Light scoring-rollout denoiser routing (make_sample_fn
scoring_denoiser_model / sample_loop scoring_model_fn).

The SCG one-step rollout exists only to rank candidates — its x̂0 estimate
never enters the trajectory — so a cheaper denoiser may stand in for it
(selection-only, like the light scoring decoder). These tests pin the
routing semantics:
  * scoring model with the MAIN model's params -> bitwise-identical chain
    (the substitution is exact when the models agree);
  * scoring model with different params -> the SCG selection (and hence
    the chain) actually changes, proving the rollout is routed through it;
  * the plain (non-SCG) path is untouched by the option.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models
from rule_guided_music_tpu.pipeline import make_sample_fn

SHAPE = (2, 4, 128, 16)


def _setup():
    model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3,
        learn_sigma=False,
    )
    x = jnp.zeros((1, 4, 128, 16))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), dtype=jnp.int32)
    p_main = model.init(jax.random.PRNGKey(0), x, t, y)
    p_other = model.init(jax.random.PRNGKey(7), x, t, y)
    # perturb so adaLN-Zero isn't the zero map and outputs differ
    p_main = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                               a.shape, a.dtype), p_main)
    p_other = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                               a.shape, a.dtype), p_other)
    tables = make_schedule("linear", 1000, timestep_respacing="6").tables()
    config = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=6, t_end=0),
        scg=SCGConfig(num_samples=4, weights=(("pitch_hist", 1.0),)),
    )
    return model, p_main, p_other, tables, config


def _decodeless_rules():
    return {"pitch_hist": jnp.ones((SHAPE[0], 12)) / 12.0}


def _run(fn, params):
    y = jnp.zeros((SHAPE[0],), dtype=jnp.int32)
    out, _ = fn(jax.random.PRNGKey(3), params, _decodeless_rules(), y)
    return np.asarray(out)


def test_scoring_rollout_with_same_params_is_exact():
    model, p_main, _, tables, config = _setup()
    common = dict(tables=tables, sampler_config=config, gen_shape=SHAPE,
                  use_decode=False, num_classes=3, class_cond=True)
    base = make_sample_fn(denoiser_model=model, **common)
    routed = make_sample_fn(denoiser_model=model,
                            scoring_denoiser_model=model, **common)
    out_base = _run(base, {"denoiser": p_main})
    out_routed = _run(routed, {"denoiser": p_main,
                               "scoring_denoiser": p_main})
    np.testing.assert_array_equal(out_base, out_routed)
    assert np.isfinite(out_routed).all()


def test_scoring_rollout_with_different_params_changes_selection():
    model, p_main, p_other, tables, config = _setup()
    common = dict(tables=tables, sampler_config=config, gen_shape=SHAPE,
                  use_decode=False, num_classes=3, class_cond=True)
    routed = make_sample_fn(denoiser_model=model,
                            scoring_denoiser_model=model, **common)
    out_same = _run(routed, {"denoiser": p_main, "scoring_denoiser": p_main})
    out_diff = _run(routed, {"denoiser": p_main, "scoring_denoiser": p_other})
    assert np.abs(out_same - out_diff).max() > 1e-6


def test_plain_path_unaffected_by_scoring_model():
    model, p_main, p_other, tables, _ = _setup()
    config = SamplerConfig(sampler="ddpm")          # no SCG
    common = dict(tables=tables, sampler_config=config, gen_shape=SHAPE,
                  use_decode=False, num_classes=3, class_cond=True)
    base = make_sample_fn(denoiser_model=model, **common)
    routed = make_sample_fn(denoiser_model=model,
                            scoring_denoiser_model=model, **common)
    out_base = _run(base, {"denoiser": p_main})
    out_routed = _run(routed, {"denoiser": p_main,
                               "scoring_denoiser": p_other})
    np.testing.assert_array_equal(out_base, out_routed)
