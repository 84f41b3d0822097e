"""End-to-end quality gate for the light scoring decoder AND light scoring
rollout on the LEARNED fixture (VERDICT r2 missing #3).

The distilled substitutes rank SCG candidates; the final decode and the
trajectory always use the full models (reference semantics:
gaussian_diffusion.py:524,1347-1358 — selection only).  This suite measures
what matters instead of argmax agreement:

  * final rule loss of light-ranked SCG vs full-ranked SCG vs no guidance
    (all scored through the FULL decoder), asserted within the production
    pass thresholds defined in docs/PERF.md:
        light <= 0.8 x no-guidance   AND   light <= 1.6 x full
    (measured on this fixture: light/plain 0.66, light/full 1.34);
  * selected-candidate regret: at guided steps, the full-decoder loss of
    the candidate the light ranker picks, minus the best candidate's loss,
    normalized by the candidate spread.

Fixtures: tests/fixtures/quality_tiny.npz (learned ch=32 VAE + tiny DiT,
scripts/make_quality_fixture.py) + tests/fixtures/light_gate_tiny.npz
(ch=16 decoder + rollout student distilled against it,
scripts/make_light_gate_fixtures.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.latent import make_decode_fn, make_encode_fn
from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
    sample_loop,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import (
    AutoencoderKL,
    DiT_models,
    RuleFeatureHead,
    ScoringDecoder,
)
from rule_guided_music_tpu.rules.registry import FUNC_DICT
from rule_guided_music_tpu.utils.fixtures import (
    load_fixture_npz,
    make_rolls,
    unflatten_tree,
)

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
QUALITY = os.path.join(_DIR, "quality_tiny.npz")
GATE = os.path.join(_DIR, "light_gate_tiny.npz")

pytestmark = [
    pytest.mark.skipif(
        not (os.path.exists(QUALITY) and os.path.exists(GATE)),
        reason="gate fixtures missing — run scripts/make_quality_fixture.py "
               "and scripts/make_light_gate_fixtures.py",
    ),
    pytest.mark.slow,
]

SHAPE = (4, 4, 128, 16)
K = 8


def _load_gate():
    data = np.load(GATE)
    dec = {k[len("decoder/"):]: data[k] for k in data.files
           if k.startswith("decoder/")}
    roll = {k[len("rollout/"):]: data[k] for k in data.files
            if k.startswith("rollout/")}
    feat = {k[len("feathead/"):]: data[k] for k in data.files
            if k.startswith("feathead/")}
    return unflatten_tree(dec), unflatten_tree(roll), unflatten_tree(feat)


@pytest.fixture(scope="module")
def gate():
    fx = load_fixture_npz(QUALITY)
    light_dec_params, rollout_params, feat_params = _load_gate()
    scale = fx["scale"]

    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    light = ScoringDecoder(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    dit = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False,
    )
    tables = make_schedule("linear", 1000, timestep_respacing="16").tables()

    decode = make_decode_fn(
        lambda c: vae.apply(fx["vae"], c, method=AutoencoderKL.decode),
        scale_factor=scale)
    light_decode = make_decode_fn(
        lambda c: light.apply(light_dec_params, c,
                              method=ScoringDecoder.decode),
        scale_factor=scale)
    encode = make_encode_fn(
        lambda x: vae.apply(fx["vae"], x,
                            method=AutoencoderKL.encode_moments),
        scale_factor=scale)
    model_fn = lambda x, t, y=None: dit.apply(fx["dit"], x, t)
    rollout_fn = lambda x, t, y=None: dit.apply(rollout_params, x, t)
    # rule-feature head: sample_loop hands it raw x̂0; the deployment
    # operating point is x0 / scale (pipeline.make_sample_fn divides by
    # scale_factor before apply — mirror that here).
    head = RuleFeatureHead(ch=16, depth=2)
    feature_fn = lambda z: head.apply(feat_params, z / scale,
                                      method=RuleFeatureHead.features)

    # in-distribution target (same protocol as test_quality_regression)
    train = jnp.asarray(make_rolls(8, seed=21))
    rec = decode(encode(train))
    nds = np.asarray(FUNC_DICT["note_density"](rec))
    sparse = nds[np.argsort(nds[:, :8].mean(axis=1))[0]]
    target = jnp.asarray(np.tile(sparse[None], (SHAPE[0], 1)))
    rules = {"note_density": target}

    cfg_plain = SamplerConfig(sampler="ddpm")
    cfg_scg = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=tables.num_timesteps, t_end=0),
        scg=SCGConfig(num_samples=K, weights=(("note_density", 1.0),)),
    )

    def make_run(decode_fn=None, scoring_model_fn=None,
                 scoring_feature_fn=None, plain=False):
        cfg = cfg_plain if plain else cfg_scg
        return jax.jit(lambda r: sample_loop(
            r, model_fn, SHAPE, tables, cfg, rules=rules,
            decode_fn=decode_fn, scoring_model_fn=scoring_model_fn,
            scoring_feature_fn=scoring_feature_fn)[0])

    runs = {
        "plain": make_run(plain=True),
        "full": make_run(decode_fn=decode),
        "light_dec": make_run(decode_fn=light_decode),
        "light_roll": make_run(decode_fn=decode,
                               scoring_model_fn=rollout_fn),
        "light_both": make_run(decode_fn=light_decode,
                               scoring_model_fn=rollout_fn),
        "feat": make_run(scoring_feature_fn=feature_fn),
        "feat_roll": make_run(scoring_feature_fn=feature_fn,
                              scoring_model_fn=rollout_fn),
    }
    losses = {}
    for name, run in runs.items():
        total = 0.0
        for seed in (0, 1):
            nd = FUNC_DICT["note_density"](decode(run(jax.random.PRNGKey(seed))))
            total += float(((nd - target) ** 2).mean())
        losses[name] = total
    return dict(losses=losses, fx=fx, tables=tables, decode=decode,
                light_decode=light_decode, encode=encode, model_fn=model_fn,
                rollout_fn=rollout_fn, feature_fn=feature_fn, target=target)


def test_full_scg_beats_no_guidance(gate):
    losses = gate["losses"]
    assert losses["full"] < 0.8 * losses["plain"], losses


def test_light_decoder_gate(gate):
    """PERF.md production pass thresholds for the light scoring decoder."""
    losses = gate["losses"]
    assert losses["light_dec"] < 0.8 * losses["plain"], losses
    assert losses["light_dec"] < 1.6 * losses["full"], losses


def test_light_rollout_gate(gate):
    losses = gate["losses"]
    assert losses["light_roll"] < 0.8 * losses["plain"], losses
    assert losses["light_roll"] < 1.6 * losses["full"], losses


def test_combined_light_gate(gate):
    """Both substitutions stacked (the 'ddim100_light_rollout' bench
    config's quality analog) must still clearly beat no guidance."""
    losses = gate["losses"]
    assert losses["light_both"] < 0.8 * losses["plain"], losses
    assert losses["light_both"] < 2.0 * losses["full"], losses


def test_feature_head_gate(gate):
    """Rule-feature head ranking (no candidate decode at all) must pass the
    same PERF.md thresholds as the other light-scoring substitutes."""
    losses = gate["losses"]
    assert losses["feat"] < 0.8 * losses["plain"], losses
    assert losses["feat"] < 1.6 * losses["full"], losses


def test_feature_head_with_rollout_gate(gate):
    """Feature head + light rollout stacked (the 'ddim100_feat_rollout'
    bench config's quality analog) must still clearly beat no guidance."""
    losses = gate["losses"]
    assert losses["feat_roll"] < 0.8 * losses["plain"], losses
    assert losses["feat_roll"] < 2.0 * losses["full"], losses


def test_selected_candidate_regret(gate):
    """Regret of light-decoder ranking vs full ranking, measured on
    candidate sets from the learned model's own posterior at guided steps,
    normalized by the candidate-loss spread."""
    tables = gate["tables"]
    model_fn = gate["model_fn"]
    decode = gate["decode"]
    light_decode = gate["light_decode"]
    target = gate["target"]
    gt = gate["encode"](jnp.asarray(make_rolls(SHAPE[0], seed=33)))

    feature_fn = gate["feature_fn"]

    @jax.jit
    def cand_losses(x_t, t, noise):
        eps = model_fn(x_t, tables.model_t[t])
        x0 = gd.predict_xstart_from_eps(tables, x_t, t, eps)
        mean, _, logvar = gd.q_posterior_mean_variance(tables, x0, x_t, t)
        cands = mean[None] + jnp.exp(0.5 * logvar)[None] * noise
        flat = cands.reshape((K * x_t.shape[0],) + x_t.shape[1:])
        t_k = jnp.concatenate([t] * K)
        eps_c = model_fn(flat, tables.model_t[t_k])
        x0_c = gd.predict_xstart_from_eps(tables, flat, t_k, eps_c)
        tgt = jnp.concatenate([target] * K, axis=0)
        out = []
        for nd_of in (
            lambda z: FUNC_DICT["note_density"](decode(z)),
            lambda z: FUNC_DICT["note_density"](light_decode(z)),
            lambda z: feature_fn(z)["note_density"],
        ):
            nd = nd_of(x0_c)
            out.append(((nd - tgt) ** 2).mean(-1).reshape(K, -1))
        return tuple(out)

    regrets = {"light_dec": [], "feat": []}
    spreads = []
    for i, t_scalar in enumerate((2, 5, 8, 11, 14)):
        t = jnp.full((SHAPE[0],), t_scalar, dtype=jnp.int32)
        key = jax.random.PRNGKey(100 + i)
        k1, k2 = jax.random.split(key)
        x_t = gd.q_sample(tables, gt, t, jax.random.normal(k1, gt.shape))
        noise = jax.random.normal(k2, (K,) + gt.shape)
        lf, ll, lh = (np.asarray(a) for a in cand_losses(x_t, t, noise))
        for b in range(SHAPE[0]):
            for name, lm in (("light_dec", ll), ("feat", lh)):
                choice = lm[:, b].argmin()
                regrets[name].append(lf[choice, b] - lf[:, b].min())
            spreads.append(lf[:, b].max() - lf[:, b].min())
    # 0 = always picks the full ranker's best; 1 ~ picking the worst.
    # Chance level for a random pick is ~0.5 of the spread.
    for name, r in regrets.items():
        norm_regret = float(np.mean(r) / (np.mean(spreads) + 1e-12))
        assert norm_regret < 0.35, (name, norm_regret, np.mean(r),
                                    np.mean(spreads))
