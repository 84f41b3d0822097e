"""pipeline.ScoringBundle: CLI-facing loader for the light-scoring levers.

Covers the npz artifact round trip (distill-script layout: scalar
``agreement`` + '/'-flattened params), make_sample_fn wiring through
``model_kwargs``/``params``, and the rollout-without-weights error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models, RuleFeatureHead
from rule_guided_music_tpu.pipeline import ScoringBundle, make_sample_fn
from rule_guided_music_tpu.utils.fixtures import flatten_tree

SHAPE = (2, 4, 128, 16)


def _write_head_npz(path, seed=0):
    head = RuleFeatureHead(ch=16, depth=2)
    params = head.init(jax.random.PRNGKey(seed),
                       jnp.zeros((1,) + SHAPE[1:]))
    flat = flatten_tree(jax.device_get(params))
    np.savez_compressed(path, agreement=np.float32(0.5), **flat)
    return params


def test_bundle_loads_feature_head_and_samples(tmp_path):
    npz = str(tmp_path / "feat.npz")
    _write_head_npz(npz)
    scoring = ScoringBundle.create(
        features_path=npz, feature_ch=16, feature_depth=2,
        dtype=jnp.float32,
    )
    assert scoring.agreements["scoring_features"] == pytest.approx(0.5)
    assert "scoring_features" in scoring.params
    assert "scoring_feature_model" in scoring.model_kwargs

    model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3,
        learn_sigma=False,
    )
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 128, 16)),
                   jnp.zeros((1,)), jnp.zeros((1,), dtype=jnp.int32))
    tables = make_schedule("linear", 1000, timestep_respacing="4").tables()
    config = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=4, t_end=0),
        scg=SCGConfig(num_samples=2, weights=(("note_density", 1.0),)),
    )
    fn = make_sample_fn(
        denoiser_model=model, tables=tables, sampler_config=config,
        gen_shape=SHAPE, use_decode=False, num_classes=3, class_cond=True,
        **scoring.model_kwargs,
    )
    bundle = {"denoiser": p, **scoring.params}
    rules = {"note_density": jnp.ones((SHAPE[0], 16)) * 2.0}
    y = jnp.zeros((SHAPE[0],), dtype=jnp.int32)
    out, _ = fn(jax.random.PRNGKey(1), bundle, rules, y)
    assert np.isfinite(np.asarray(out)).all()


def test_rollout_without_weights_raises():
    with pytest.raises(ValueError, match="rollout_path"):
        ScoringBundle.create(rollout="DiTRotary_XS_8")


def test_empty_bundle_is_noop():
    scoring = ScoringBundle.create()
    assert scoring.model_kwargs == {}
    assert scoring.params == {}
