"""SCG prefilter ("trust-but-verify") selection mechanics.

SCGConfig.prefilter=m: the rule-feature head ranks all k candidates
decode-free, the decoder re-ranks only the top m (sampling.py::
_scg_select_prefilter).  Invariants tested here, no learned fixture
needed:

  * m = k  ->  bitwise-identical to full-decode SCG (re-ranking the whole
    candidate set by the decoder IS full SCG; the head only permutes);
  * a PERFECT head (features computed from the same decode) with m = 1
    -> bitwise-identical to full-decode SCG (its top-1 is the argmax);
  * an ADVERSARIAL head (ranks exactly backwards) with m = k -> still
    identical to full SCG — the decode re-rank bounds head damage;
  * record parity: candidate_log_prob is the (k, B) head matrix.
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
from rule_guided_music_tpu.rules.registry import FUNC_DICT

B, C, H, W = 2, 4, 128, 8
K = 8
SHAPE = (B, C, H, W)
TABLES = make_schedule("linear", 1000, timestep_respacing="4").tables()


def model_fn(x, t, y=None):
    # deterministic, state-dependent eps so candidates genuinely differ
    return 0.1 * x * jnp.cos(t)[:, None, None, None]


def decode_fn(z):
    # latent (g, 4, 128, 8) -> roll (g, 3, 128, 1024): fixed "decoder"
    # (rules expect the 1024-col excerpt geometry: 8 windows x 128)
    up = jnp.repeat(z[:, :3], 128, axis=-1)
    return jnp.tanh(up + 0.05 * z[:, 3:4].mean(axis=(2, 3))[..., None, None])


def perfect_feature_fn(x0):
    return {"note_density": FUNC_DICT["note_density"](decode_fn(x0))}


def _cfg(prefilter, k=K):
    return SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=TABLES.num_timesteps, t_end=0),
        scg=SCGConfig(num_samples=k, weights=(("note_density", 1.0),),
                      prefilter=prefilter),
        record=prefilter > 0,
    )


def _run(cfg, feature_fn=None, dec=decode_fn):
    out, rec = jax.jit(lambda r: sample_loop(
        r, model_fn, SHAPE, TABLES, cfg,
        rules={"note_density": jnp.zeros((B, 16))},
        decode_fn=dec, scoring_feature_fn=feature_fn,
    ))(jax.random.PRNGKey(0))
    return np.asarray(out), rec


def test_prefilter_k_equals_full_scg():
    full, _ = _run(_cfg(prefilter=0))
    pre, rec = _run(_cfg(prefilter=K), feature_fn=perfect_feature_fn)
    np.testing.assert_array_equal(full, pre)
    assert rec["candidate_log_prob"].shape == (TABLES.num_timesteps, K, B)


def test_perfect_head_prefilter1_equals_full_scg():
    full, _ = _run(_cfg(prefilter=0))
    pre, _ = _run(_cfg(prefilter=1), feature_fn=perfect_feature_fn)
    np.testing.assert_array_equal(full, pre)


def test_adversarial_head_bounded_by_reRank():
    """A head that ranks exactly backwards cannot hurt when m=k: the
    decode re-rank restores the full-SCG pick (the Goodhart failure mode
    the prefilter exists to bound — docs/allrules_gate_study.json)."""
    def inverted(x0):
        nd = FUNC_DICT["note_density"](decode_fn(x0))
        # target is 0, loss is mse(nd) — negate features' distance by
        # mapping nd -> 1/(1+|nd|): monotone-decreasing in |nd|
        return {"note_density": 1.0 / (1.0 + jnp.abs(nd))}

    full, _ = _run(_cfg(prefilter=0))
    pre, _ = _run(_cfg(prefilter=K), feature_fn=inverted)
    np.testing.assert_array_equal(full, pre)


def test_prefilter_subset_never_worse_than_head_argmin():
    """With m=2 the final pick's TRUE loss is <= the head-argmin pick's
    TRUE loss at every step of a one-step selection (the re-rank can only
    improve on trusting the head)."""
    from rule_guided_music_tpu.diffusion import gaussian as gd
    from rule_guided_music_tpu.diffusion.sampling import _scg_select

    cfg_pre = _cfg(prefilter=2)
    cfg_feat = _cfg(prefilter=0)
    rng = jax.random.PRNGKey(3)
    x_t = jax.random.normal(rng, SHAPE)
    t = jnp.full((B,), 2, dtype=jnp.int32)
    eps = model_fn(x_t, TABLES.model_t[t])
    x0 = gd.predict_xstart_from_eps(TABLES, x_t, t, eps)
    mean, _, logvar = gd.q_posterior_mean_variance(TABLES, x0, x_t, t)
    g_coeff = jnp.exp(0.5 * logvar)
    rules = {"note_density": jnp.zeros((B, 16))}

    def noisy_head(x0):
        nd = FUNC_DICT["note_density"](decode_fn(x0))
        return {"note_density": nd + 0.5 * jax.random.normal(
            jax.random.PRNGKey(7), nd.shape)}

    def true_loss(sel):
        # the selection criterion itself: rollout at level t, decode, score
        eps_s = model_fn(sel, TABLES.model_t[t])
        x0_s = gd.predict_xstart_from_eps(TABLES, sel, t, eps_s)
        nd = FUNC_DICT["note_density"](decode_fn(x0_s))
        return np.asarray(((nd - 0.0) ** 2).mean(axis=-1))

    sel_pre, _ = _scg_select(
        cfg_pre, TABLES, model_fn, decode_fn, rules, jax.random.PRNGKey(11),
        mean, g_coeff, t, None, scoring_feature_fn=noisy_head)
    sel_head, _ = _scg_select(
        cfg_feat, TABLES, model_fn, None, rules, jax.random.PRNGKey(11),
        mean, g_coeff, t, None, scoring_feature_fn=noisy_head)
    assert true_loss(sel_pre).mean() <= true_loss(sel_head).mean() + 1e-6
