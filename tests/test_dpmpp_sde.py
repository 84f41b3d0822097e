"""SDE-DPM-Solver++ (SamplerConfig.dpmpp_sde=True).

Beyond-reference stochastic few-step sampler (arXiv 2211.01095 SDE variant):
the same data-prediction exponential integrator as the dpmpp ODE branch, but
discretizing the reverse-time SDE — each step contracts x_t by e^{−h} and
injects fresh noise σ_{t-1}·√(1−e^{−2h}).  Its purpose is SCG on 10-20 step
chains: the reference's SCG (gaussian_diffusion.py:491-592) needs per-step
stochasticity and therefore lives on 1000/100-step ancestral chains only.

Anchors:
  * constant-x̂0 models are solved EXACTLY at any step count (the per-step
    transition kernel preserves the true reverse marginals exactly for
    linear models — verified analytically in sampling.py and numerically
    here);
  * on analytic Gaussian data (exact posterior model) the final-sample
    distribution matches the data distribution (mean/std within tolerance);
  * the chain is genuinely stochastic (keys matter) yet seeded
    (reproducible);
  * SCG selection works and improves rule loss on a 16-step chain;
  * config validation (dpmpp_sde needs sampler="dpmpp"; plain dpmpp still
    rejects SCG).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
    sample_loop,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.rules.registry import FUNC_DICT, LOSS_DICT

SHAPE = (2, 4, 32, 16)


def _tables(n):
    return make_schedule("linear", 1000, timestep_respacing=str(n)).tables()


def _acp_of_model_t(tables, x, model_t):
    """Invert the model_t gather: model_t -> respaced index -> ᾱ (col vec)."""
    idx = jnp.searchsorted(tables.model_t, model_t)
    return (
        tables.alphas_cumprod[idx]
        .reshape((-1,) + (1,) * (x.ndim - 1))
        .astype(x.dtype),
        idx,
    )


def test_sde_constant_x0_solved_exactly():
    """x̂0 ≡ c: every per-step transition is exact for this linear model, and
    the final contraction e^{−h} → 0 (σ_0 clamp) wipes the accumulated
    noise, so ANY step count and order must land on exactly c."""
    tables = _tables(4)
    c = 0.37

    def model_fn(x, model_t, y=None):
        acp, _ = _acp_of_model_t(tables, x, model_t)
        return (x - jnp.sqrt(acp) * c) / jnp.sqrt(1.0 - acp)

    for order in (1, 2):
        out = sample_loop(
            jax.random.PRNGKey(1), model_fn, SHAPE, tables,
            SamplerConfig(sampler="dpmpp", dpmpp_order=order,
                          dpmpp_sde=True))[0]
        np.testing.assert_allclose(np.asarray(out), c, rtol=0, atol=1e-4)


def test_sde_marginals_converge_to_gaussian_data():
    """Exact-posterior model for data ~ N(m, s²) i.i.d. per coordinate:
    E[x₀|x_t] = (σ_t²·m + s²·α_t·x_t)/(α_t²·s² + σ_t²).  The reverse SDE's
    final marginal is the data distribution.  The scheme's distributional
    error is first-order in the step count (measured on this model: order-1
    std 0.543→0.667 and order-2 std 1.069→0.709 over N=16→128, both
    converging to s=0.7; DDPM ancestral shows the same N-dependence
    0.736→0.700), so the pin is CONVERGENCE: the mean is right at every N,
    and the std error shrinks decisively from N=16 to N=128.  A wrong noise
    scale (e.g. missing the e^{−h} contraction or using 1−e^{−h}) breaks
    the N=128 bound immediately."""
    m, s = 0.3, 0.7
    shape = (128, 1, 8, 8)  # 8192 scalar coordinates

    def model_of(tables):
        def model_fn(x, model_t, y=None):
            acp, _ = _acp_of_model_t(tables, x, model_t)
            alpha, sig2 = jnp.sqrt(acp), 1.0 - acp
            x0_hat = (sig2 * m + s * s * alpha * x) / (acp * s * s + sig2)
            return (x - alpha * x0_hat) / jnp.sqrt(sig2)
        return model_fn

    for order in (1, 2):
        errs = {}
        for n in (16, 128):
            tables = _tables(n)
            out = np.asarray(sample_loop(
                jax.random.PRNGKey(2), model_of(tables), shape, tables,
                SamplerConfig(sampler="dpmpp", dpmpp_order=order,
                              dpmpp_sde=True))[0])
            assert abs(out.mean() - m) < 0.05, (order, n, out.mean())
            errs[n] = abs(out.std() - s)
        assert errs[128] < 0.04, (order, errs)              # ~6% of s
        assert errs[128] < 0.5 * errs[16], (order, errs)    # converging


def test_sde_is_stochastic_and_seeded():
    tables = _tables(8)

    def model_fn(x, model_t, y=None):
        return 0.1 * jnp.sin(x)

    cfg = SamplerConfig(sampler="dpmpp", dpmpp_sde=True)
    a = sample_loop(jax.random.PRNGKey(5), model_fn, SHAPE, tables, cfg)[0]
    b = sample_loop(jax.random.PRNGKey(5), model_fn, SHAPE, tables, cfg)[0]
    c = sample_loop(jax.random.PRNGKey(6), model_fn, SHAPE, tables, cfg)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # and the SAME key with a fixed init differs from the ODE branch (the
    # per-step noise stream is live, not multiplied by zero)
    x0 = jax.random.normal(jax.random.PRNGKey(7), SHAPE)
    ode = sample_loop(jax.random.PRNGKey(8), model_fn, SHAPE, tables,
                      SamplerConfig(sampler="dpmpp"), noise=x0)[0]
    sde = sample_loop(jax.random.PRNGKey(8), model_fn, SHAPE, tables,
                      cfg, noise=x0)[0]
    assert not np.allclose(np.asarray(ode), np.asarray(sde))


def test_sde_scg_improves_rule_loss():
    """Rule-guided SCG on a 16-step SDE-DPM-Solver++ chain: selection over
    k diverging candidates lands closer to the pitch target than the
    unguided SDE chain — the capability the stochastic variant exists for.
    The toy effect size is modest (pitch_hist of a clipped noise roll is a
    blunt feature): measured guided/plain ratios 0.96-0.97 on every seed
    (3 seeds x {w=0, 0.2, 0.3, 0.5} x {k=8,16} sweeps), so the bar is the
    3-seed mean at 0.99.  The record's per-step candidate-loss std also
    certifies the MECHANISM: the k candidates genuinely diverge (the
    deterministic ODE branch would give exactly 0 spread)."""
    tables = _tables(16)
    b = 1
    shape = (b, 1, 128, 128)
    roll = np.full(shape, -1.0, dtype=np.float32)
    roll[:, 0, 60, :] = 0.5
    x0_roll = jnp.asarray(roll)

    target_hist = np.zeros((b, 12), dtype=np.float32)
    target_hist[:, 0] = 1.0
    rules = {"pitch_hist": jnp.asarray(target_hist)}

    # x̂0 must depend on x_t for selection to matter: mix the zero-eps
    # inversion of the candidate with a weak pull toward the target roll.
    def mixed_model(x, model_t, y=None):
        _, idx = _acp_of_model_t(tables, x, model_t)
        reps = x.shape[0] // x0_roll.shape[0]
        target = jnp.tile(x0_roll, (reps, 1, 1, 1))
        x0_from_x = jnp.clip(
            gd.predict_xstart_from_eps(tables, x, idx, jnp.zeros_like(x)),
            -1, 1,
        )
        x0_pred = 0.8 * x0_from_x + 0.2 * target
        return gd.predict_eps_from_xstart(tables, x, idx, x0_pred)

    scg_cfg = SamplerConfig(
        sampler="dpmpp", dpmpp_sde=True,
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=16, t_end=0, interval=1),
        scg=SCGConfig(num_samples=16, weights=(("pitch_hist", 1.0),)),
        record=True,
    )
    plain_cfg = SamplerConfig(sampler="dpmpp", dpmpp_sde=True)

    loss = lambda sm: float(LOSS_DICT["pitch_hist"](
        FUNC_DICT["pitch_hist"](sm), rules["pitch_hist"]).mean())

    guided, plain = [], []
    spreads = None
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        out, rec = sample_loop(key, mixed_model, shape, tables, scg_cfg,
                               rules=rules)
        guided.append(loss(out))
        if spreads is None:
            spreads = np.asarray(rec["loss_std"])
        plain.append(loss(sample_loop(key, mixed_model, shape, tables,
                                      plain_cfg, rules=rules)[0]))
    assert np.mean(guided) < 0.99 * np.mean(plain), (guided, plain)
    # mechanism: candidates diverge at every guided step but the last
    # (t == t_end runs the plain branch; the record there is zero-filled)
    assert (spreads[:-1] > 0).all(), spreads


def test_sde_validation():
    tables = _tables(8)

    def model_fn(x, model_t, y=None):
        return jnp.zeros_like(x)

    with pytest.raises(ValueError, match="dpmpp_sde"):
        sample_loop(jax.random.PRNGKey(0), model_fn, SHAPE, tables,
                    SamplerConfig(sampler="ddpm", dpmpp_sde=True))
    # the deterministic ODE branch still rejects SCG
    with pytest.raises(ValueError, match="stochastic sampler"):
        sample_loop(jax.random.PRNGKey(0), model_fn, SHAPE, tables,
                    SamplerConfig(sampler="dpmpp",
                                  scg=SCGConfig(num_samples=2)))


def test_sde_yaml_config():
    from types import SimpleNamespace

    from rule_guided_music_tpu.config import sampler_config_from_yaml

    cfg = SimpleNamespace(
        sampling=SimpleNamespace(sampler="dpmpp", dpmpp_sde=True, t_end=0))
    sc = sampler_config_from_yaml(cfg)
    assert sc.sampler == "dpmpp" and sc.dpmpp_sde is True
    # absent key -> off (the ODE default is unchanged)
    cfg2 = SimpleNamespace(sampling=SimpleNamespace(sampler="dpmpp"))
    assert sampler_config_from_yaml(cfg2).dpmpp_sde is False
