"""Rule-feature head (models/scoring_head.py) + its SCG routing.

The head predicts FUNC_DICT-contract rule features straight from x̂0
latents so SCG ranking skips the candidate VAE decode (selection-only,
like the light scoring decoder / rollout — reference semantics
gaussian_diffusion.py:524,1347-1358).  Pinned here:

  * output contract (shapes, dtypes, normalization, tag range);
  * an exactness proof of the plumbing: a feature fn that computes the
    same decode+FUNC_DICT the decode path runs produces a bitwise
    identical chain;
  * routing: different head params change the selection;
  * chunked (lax.map over candidate groups) == unchunked with dict
    feature outputs;
  * dc_base windowed selection is rejected with the head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
    sample_loop,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models, RuleFeatureHead
from rule_guided_music_tpu.pipeline import make_sample_fn
from rule_guided_music_tpu.rules.registry import FUNC_DICT

SHAPE = (2, 4, 128, 16)
W = SHAPE[2] // 16


def _head_params(head, seed=0, shape=SHAPE):
    z = jnp.zeros((1,) + shape[1:])
    return head.init(jax.random.PRNGKey(seed), z)


def test_head_output_contract():
    head = RuleFeatureHead(ch=16, depth=2)
    params = _head_params(head)
    z = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    feats = head.apply(params, z, method=RuleFeatureHead.features)

    assert feats["pitch_hist"].shape == (SHAPE[0], 12)
    np.testing.assert_allclose(
        np.asarray(feats["pitch_hist"]).sum(-1), 1.0, atol=1e-5)
    assert feats["note_density"].shape == (SHAPE[0], 2 * W)
    assert (np.asarray(feats["note_density"]) >= 0).all()
    assert feats["chord_progression"].shape == (SHAPE[0], W)
    assert feats["chord_progression"].dtype == jnp.int32
    tags = np.asarray(feats["chord_progression"])
    assert ((tags >= 0) & (tags < 8)).all()


def test_head_handles_single_window():
    head = RuleFeatureHead(ch=16, depth=2)
    shape = (3, 4, 16, 16)
    params = _head_params(head, shape=shape)
    z = jax.random.normal(jax.random.PRNGKey(2), shape)
    feats = head.apply(params, z, method=RuleFeatureHead.features)
    assert feats["note_density"].shape == (3, 2)
    assert feats["chord_progression"].shape == (3, 1)


def _setup_chain(k=4, decode_chunks=1):
    model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False,
    )
    x = jnp.zeros((1, 4, 128, 16))
    t = jnp.zeros((1,))
    p = model.init(jax.random.PRNGKey(0), x, t)
    p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                               a.shape, a.dtype), p)
    tables = make_schedule("linear", 1000, timestep_respacing="5").tables()
    config = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=5, t_end=0),
        scg=SCGConfig(
            num_samples=k,
            weights=(("pitch_hist", 40.0), ("note_density", 1.0),
                     ("chord_progression", 1.0)),
            decode_chunks=decode_chunks,
        ),
    )
    model_fn = lambda xx, tt, yy=None: model.apply(p, xx, tt)
    rules = {
        "pitch_hist": jnp.ones((SHAPE[0], 12)) / 12.0,
        "note_density": jnp.ones((SHAPE[0], 2 * W)) * 2.0,
        "chord_progression": jnp.ones((SHAPE[0], W), dtype=jnp.int32),
    }
    return model_fn, tables, config, rules


def _fake_decode(x0):
    """A cheap stand-in 'decoder': latents -> (N, 3, 128, L) rolls."""
    up = jnp.repeat(jnp.repeat(x0[:, :3], 8, axis=2), 8, axis=3)
    return jnp.transpose(up, (0, 1, 3, 2))       # (N, 3, 8P, 8T)


def test_feature_fn_reproducing_decode_is_exact():
    """scoring_feature_fn that computes decode+FUNC_DICT == decode path."""
    model_fn, tables, config, rules = _setup_chain()

    def oracle_features(x0):
        roll = _fake_decode(x0)
        return {name: FUNC_DICT[name](roll) for name in rules}

    run_decode = jax.jit(lambda r: sample_loop(
        r, model_fn, SHAPE, tables, config, rules=rules,
        decode_fn=_fake_decode)[0])
    run_feat = jax.jit(lambda r: sample_loop(
        r, model_fn, SHAPE, tables, config, rules=rules,
        decode_fn=_fake_decode, scoring_feature_fn=oracle_features)[0])

    a = np.asarray(run_decode(jax.random.PRNGKey(3)))
    b = np.asarray(run_feat(jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


def test_head_routing_changes_selection():
    model_fn, tables, config, rules = _setup_chain()
    head = RuleFeatureHead(ch=16, depth=2)
    p1, p2 = _head_params(head, 10), _head_params(head, 11)

    def run(hp):
        fn = jax.jit(lambda r: sample_loop(
            r, model_fn, SHAPE, tables, config, rules=rules,
            scoring_feature_fn=lambda z: head.apply(
                hp, z, method=RuleFeatureHead.features))[0])
        return np.asarray(fn(jax.random.PRNGKey(4)))

    out1, out2 = run(p1), run(p2)
    assert np.isfinite(out1).all() and np.isfinite(out2).all()
    assert not np.array_equal(out1, out2), \
        "different head params must change SCG selection"


def test_feature_chunked_matches_unchunked():
    model_fn, tables, config1, rules = _setup_chain(k=4, decode_chunks=1)
    _, _, config2, _ = _setup_chain(k=4, decode_chunks=2)
    head = RuleFeatureHead(ch=16, depth=2)
    hp = _head_params(head, 12)
    feat = lambda z: head.apply(hp, z, method=RuleFeatureHead.features)

    run1 = jax.jit(lambda r: sample_loop(
        r, model_fn, SHAPE, tables, config1, rules=rules,
        scoring_feature_fn=feat)[0])
    run2 = jax.jit(lambda r: sample_loop(
        r, model_fn, SHAPE, tables, config2, rules=rules,
        scoring_feature_fn=feat)[0])
    np.testing.assert_allclose(
        np.asarray(run1(jax.random.PRNGKey(5))),
        np.asarray(run2(jax.random.PRNGKey(5))), rtol=0, atol=0)


def test_dc_base_rejected_with_feature_head():
    model_fn, tables, config, rules = _setup_chain()
    import dataclasses
    config = dataclasses.replace(
        config, scg=dataclasses.replace(config.scg, dc_base=64))
    with pytest.raises(ValueError, match="dc_base"):
        sample_loop(jax.random.PRNGKey(0), model_fn, SHAPE, tables, config,
                    rules=rules, scoring_feature_fn=lambda z: {})


def test_make_sample_fn_feature_head_end_to_end():
    """pipeline wiring: params['scoring_features'] routed, operating point
    z/scale_factor, chain finite; different head params change output."""
    model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3,
        learn_sigma=False,
    )
    x = jnp.zeros((1, 4, 128, 16))
    p = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                   jnp.zeros((1,), dtype=jnp.int32))
    p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                               a.shape, a.dtype), p)
    tables = make_schedule("linear", 1000, timestep_respacing="4").tables()
    config = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=4, t_end=0),
        scg=SCGConfig(num_samples=2,
                      weights=(("note_density", 1.0),)),
    )
    head = RuleFeatureHead(ch=16, depth=2)
    hp = _head_params(head, 13)
    fn = make_sample_fn(
        denoiser_model=model, tables=tables, sampler_config=config,
        gen_shape=SHAPE, use_decode=False, num_classes=3, class_cond=True,
        scoring_feature_model=head,
    )
    y = jnp.zeros((SHAPE[0],), dtype=jnp.int32)
    rules = {"note_density": jnp.ones((SHAPE[0], 2 * W)) * 2.0}
    out, _ = fn(jax.random.PRNGKey(6),
                {"denoiser": p, "scoring_features": hp}, rules, y)
    assert np.isfinite(np.asarray(out)).all()
