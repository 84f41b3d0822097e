"""W8A8 int8 serving path (ops/quant.py) — numerics + quality envelope.

Fast tier: kernel/layer-level parity against fp denses and param-tree
structure agreement between `quantize_dit_params` and the quant model's
own init. Slow tier: eps-prediction error and end-to-end DDIM trajectory
divergence on the LEARNED fixture (tests/fixtures/quality_tiny.npz), the
same instrument every other quality gate in this repo uses.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.models import DiT_models
from rule_guided_music_tpu.ops.quant import (
    QuantDense,
    normalize_quant_mode,
    quant_dense_apply,
    quantize_dense,
    quantize_dit_params,
    wo_dense_apply,
)

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "quality_tiny.npz")


def test_quantize_dense_roundtrip_error():
    rng = np.random.RandomState(0)
    k = rng.randn(128, 256).astype(np.float32) * 0.05
    q, s = quantize_dense(k)
    assert q.dtype == np.int8 and s.shape == (256,)
    deq = q.astype(np.float32) * s
    # uniform step = amax/127; for Gaussian cols (amax ~ 3.5 sigma at
    # n=128) expected relative RMS ~ 3.5/(127*sqrt(12)) ~ 0.8%
    rms = np.sqrt(np.mean((deq - k) ** 2)) / np.sqrt(np.mean(k ** 2))
    assert rms < 1e-2


@pytest.mark.parametrize("apply_fn,tol", [
    (quant_dense_apply, 0.02),   # weight + activation quant error
    (wo_dense_apply, 0.015),     # weight-only: no activation error
])
def test_quant_dense_apply_matches_fp(apply_fn, tol):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32, 96).astype(np.float32))
    k = rng.randn(96, 192).astype(np.float32) * 0.1
    b = rng.randn(192).astype(np.float32) * 0.1
    ref = jnp.einsum("bnd,df->bnf", x, k,
                     precision=jax.lax.Precision.HIGHEST) + b
    q, s = quantize_dense(k)
    out = apply_fn(x, jnp.asarray(q), jnp.asarray(s), jnp.asarray(b),
                   dtype=jnp.float32)
    rel = jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
    assert float(rel) < tol, float(rel)


def test_normalize_quant_mode():
    assert normalize_quant_mode(False) == ""
    assert normalize_quant_mode("") == ""
    assert normalize_quant_mode("False") == ""
    assert normalize_quant_mode(True) == "w8a8"
    assert normalize_quant_mode("True") == "w8a8"
    assert normalize_quant_mode("W8A16") == "w8a16"
    with pytest.raises(ValueError):
        normalize_quant_mode("int4")


def test_quant_dense_module_params_and_apply():
    x = jnp.ones((2, 8, 16))
    mod = QuantDense(24, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    leaves = params["params"]
    assert leaves["kernel_i8"].dtype == jnp.int8
    assert leaves["scale"].shape == (24,)
    out = mod.apply(params, x)
    assert out.shape == (2, 8, 24)


@pytest.mark.parametrize("mode", ["w8a8", "w8a16"])
def test_quantize_dit_params_matches_quant_init_structure(mode):
    fp_model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3)
    q_model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3, quant=mode)
    x = jnp.zeros((1, 4, 128, 16))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), dtype=jnp.int32)
    fp_params = fp_model.init(jax.random.PRNGKey(0), x, t, y)
    q_init = q_model.init(jax.random.PRNGKey(0), x, t, y)
    converted = quantize_dit_params(fp_params)
    flat_c = jax.tree_util.tree_flatten_with_path(converted)[0]
    flat_q = jax.tree_util.tree_flatten_with_path(q_init)[0]
    assert [p for p, _ in flat_c] == [p for p, _ in flat_q]
    for (path, a), (_, b) in zip(flat_c, flat_q):
        assert a.shape == b.shape, path
        assert jnp.asarray(a).dtype == b.dtype, path
    # and the quant model runs with the converted tree
    out = q_model.apply(converted, x, t, y)
    assert out.shape == (1, 4, 128, 16)


@pytest.mark.slow
@pytest.mark.parametrize("mode,eps_tol,traj_tol", [
    ("w8a8", 0.05, 0.15),
    ("w8a16", 0.04, 0.12),   # no activation error -> tighter envelope
])
@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="quality fixture missing")
def test_quant_quality_envelope_on_learned_fixture(mode, eps_tol, traj_tol):
    """eps error and DDIM trajectory divergence of int8 vs fp serving."""
    from rule_guided_music_tpu.diffusion.sampling import (
        SamplerConfig, sample_loop)
    from rule_guided_music_tpu.diffusion.schedule import make_schedule
    from rule_guided_music_tpu.utils.fixtures import load_fixture_npz

    fx = load_fixture_npz(FIXTURE)
    fp = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False)
    qm = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False, quant=mode)
    q_params = quantize_dit_params(fx["dit"])

    # 1. pointwise eps-prediction error across the chain
    tables = make_schedule("linear", 1000, timestep_respacing="16").tables()
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (4, 4, 128, 16))
    rels = []
    for t_val in (2, 7, 12, 15):
        t = jnp.full((4,), t_val, dtype=jnp.int32)
        e_fp = fp.apply(fx["dit"], x, t)
        e_q = qm.apply(q_params, x, t)
        rels.append(float(jnp.linalg.norm(e_q - e_fp)
                          / jnp.linalg.norm(e_fp)))
    assert max(rels) < eps_tol, rels

    # 2. end-to-end deterministic DDIM chain: final samples stay close
    cfg = SamplerConfig(sampler="ddim", eta=0.0)
    outs = {}
    for tag, model, params in (("fp", fp, fx["dit"]), ("q", qm, q_params)):
        sample, _ = sample_loop(
            jax.random.PRNGKey(3),
            lambda xx, tt, yy=None, _m=model, _p=params: _m.apply(_p, xx, tt),
            (4, 4, 128, 16), tables, cfg,
        )
        outs[tag] = sample
    num = jnp.linalg.norm(outs["q"] - outs["fp"])
    den = jnp.linalg.norm(outs["fp"])
    assert float(num / den) < traj_tol, float(num / den)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["w8a8", "w8a16"])
@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="quality fixture missing")
def test_quant_rule_loss_and_scg_selection_envelope(mode):
    """VERDICT r3 item 10: bound int8 serving's impact on what the
    framework actually optimizes — rule losses and SCG candidate selection
    — not just raw sample divergence.

    1. Rule-loss parity: decode fp vs int8 deterministic-DDIM finals with
       the fixture VAE and assert per-rule loss deltas (vs a common
       extracted target) stay within an envelope.
    2. Selection impact: at spread chain states, build k candidate
       pred_xstarts from posterior samples, score them through decode +
       the weighted rule programs (gaussian_diffusion.py:518-560
       semantics) under the fp trunk vs the int8 trunk; assert the int8
       trunk's argmin candidate carries near-zero regret under fp scoring.
    """
    import rule_guided_music_tpu.diffusion.gaussian as gd
    from rule_guided_music_tpu.diffusion.latent import (
        make_decode_fn, make_encode_fn)
    from rule_guided_music_tpu.diffusion.sampling import (
        SamplerConfig, sample_loop)
    from rule_guided_music_tpu.diffusion.schedule import make_schedule
    from rule_guided_music_tpu.models import AutoencoderKL
    from rule_guided_music_tpu.rules.registry import FUNC_DICT, LOSS_DICT
    from rule_guided_music_tpu.utils.fixtures import (
        load_fixture_npz, make_rolls)

    fx = load_fixture_npz(FIXTURE)
    fp = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False)
    qm = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False, quant=mode)
    q_params = quantize_dit_params(fx["dit"])
    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    decode = make_decode_fn(
        lambda c: vae.apply(fx["vae"], c, method=AutoencoderKL.decode),
        scale_factor=fx["scale"])
    encode = make_encode_fn(
        lambda x: vae.apply(fx["vae"], x,
                            method=AutoencoderKL.encode_moments),
        scale_factor=fx["scale"])
    tables = make_schedule("linear", 1000, timestep_respacing="16").tables()

    rules = ("pitch_hist", "note_density", "chord_progression")
    weights = {"pitch_hist": 40.0, "note_density": 1.0,
               "chord_progression": 1.0}
    rec = decode(encode(jnp.asarray(make_rolls(4, seed=21))))
    # batch-1 targets broadcast against both the 4-sample finals (part 1)
    # and the k-candidate axis (part 2)
    targets = {r: FUNC_DICT[r](rec[:1]) for r in rules}

    def weighted_loss(roll):
        total = 0.0
        per = {}
        for r in rules:
            per[r] = LOSS_DICT[r](FUNC_DICT[r](roll), targets[r])
            total = total + weights[r] * per[r]
        return total, per

    # --- 1. rule-loss parity on the deterministic chain -------------------
    cfg = SamplerConfig(sampler="ddim", eta=0.0)
    finals = {}
    for tag, model, params in (("fp", fp, fx["dit"]), ("q", qm, q_params)):
        finals[tag], _ = sample_loop(
            jax.random.PRNGKey(3),
            lambda xx, tt, yy=None, _m=model, _p=params: _m.apply(_p, xx, tt),
            (4, 4, 128, 16), tables, cfg)
    _, per_fp = weighted_loss(decode(finals["fp"]))
    _, per_q = weighted_loss(decode(finals["q"]))
    for r in rules:
        d = abs(float(per_q[r].mean()) - float(per_fp[r].mean()))
        scale = max(abs(float(per_fp[r].mean())), 0.05)
        assert d / scale < 0.35, (r, float(per_fp[r].mean()),
                                  float(per_q[r].mean()))

    # --- 2. SCG selection regret of the int8 trunk under fp scoring -------
    k = 8
    regrets = []
    for t_val in (4, 9, 14):
        rng = jax.random.PRNGKey(100 + t_val)
        x0 = encode(rec[:1])
        t = jnp.full((1,), t_val, dtype=jnp.int32)
        x_t = gd.q_sample(tables, x0, t,
                          jax.random.normal(rng, x0.shape))

        # ONE shared candidate set (fp posterior draws), so fp vs int8
        # differ only in the scoring rollout's eps — the serving question
        eps = fp.apply(fx["dit"], x_t, t)
        x0_hat = gd.predict_xstart_from_eps(tables, x_t, t, eps)
        mean, _, logvar = gd.q_posterior_mean_variance(
            tables, x0_hat, x_t, t)
        noise = jax.random.normal(
            jax.random.PRNGKey(5), (k,) + mean.shape[1:])
        cands = mean + jnp.exp(0.5 * logvar) * noise
        t_prev = jnp.full((k,), max(t_val - 1, 0), dtype=jnp.int32)

        def candidate_losses(model, params):
            eps_c = model.apply(params, cands, t_prev)
            x0_c = gd.predict_xstart_from_eps(tables, cands, t_prev, eps_c)
            total, _ = weighted_loss(decode(x0_c))
            return np.asarray(total)

        fp_scores = candidate_losses(fp, fx["dit"])
        q_scores = candidate_losses(qm, q_params)
        # identical candidates + identical rule programs, only the trunk's
        # eps differs: the int8 argmin evaluated under fp scoring must be
        # near-optimal (normalized regret)
        pick = int(np.argmin(q_scores))
        spread = float(fp_scores.max() - fp_scores.min()) + 1e-9
        regrets.append(float(fp_scores[pick] - fp_scores.min()) / spread)
    assert float(np.mean(regrets)) < 0.25, regrets
