"""Diffusion math invariants vs closed forms (SURVEY.md §4 fixture (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.schedule import make_schedule


@pytest.fixture(scope="module")
def tables():
    return make_schedule("linear", 100).tables()


def test_q_sample_moments(tables):
    """Empirical mean/var of q_sample match q_mean_variance."""
    rng = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 2, 8, 8)) * 0.5
    t = jnp.array([0, 10, 50, 99])
    n = 4000
    noises = jax.random.normal(rng, (n,) + x0.shape)
    xts = jax.vmap(lambda nz: gd.q_sample(tables, x0, t, nz))(noises)
    mean, var, logvar = gd.q_mean_variance(tables, x0, t)
    emp_mean = np.asarray(xts.mean(axis=0))
    emp_var = np.asarray(xts.var(axis=0))
    mean = np.broadcast_to(np.asarray(mean), emp_mean.shape)
    var = np.broadcast_to(np.asarray(var), emp_var.shape)
    np.testing.assert_allclose(emp_mean, mean, atol=0.1)
    np.testing.assert_allclose(emp_var, var, rtol=0.2, atol=0.02)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(jnp.exp(logvar)), var.shape), var, rtol=1e-4
    )


def test_eps_xstart_roundtrip(tables):
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (3, 4, 16, 16))
    eps = jax.random.normal(k2, x0.shape)
    t = jnp.array([5, 42, 87])
    xt = gd.q_sample(tables, x0, t, eps)
    # predict_xstart(eps) inverts q_sample
    x0_hat = gd.predict_xstart_from_eps(tables, xt, t, eps)
    np.testing.assert_allclose(x0_hat, x0, atol=1e-4)
    # predict_eps inverts predict_xstart
    eps_hat = gd.predict_eps_from_xstart(tables, xt, t, x0_hat)
    np.testing.assert_allclose(eps_hat, eps, atol=1e-3)


def test_xprev_roundtrip(tables):
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (2, 1, 4, 4))
    xt = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([10, 20])
    xprev, _, _ = gd.q_posterior_mean_variance(tables, x0, xt, t)
    x0_hat = gd.predict_xstart_from_xprev(tables, xt, t, xprev)
    np.testing.assert_allclose(x0_hat, x0, atol=1e-4)


def test_p_mean_variance_epsilon_fixed_large(tables):
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, (2, 4, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    t = jnp.array([30, 70])
    out = gd.p_mean_variance(tables, eps, x, t)
    x0 = gd.predict_xstart_from_eps(tables, x, t, eps)
    mean, _, _ = gd.q_posterior_mean_variance(tables, x0, x, t)
    np.testing.assert_allclose(out.mean, mean, atol=1e-5)
    np.testing.assert_allclose(out.pred_xstart, x0, atol=1e-5)
    # fixed-large variance table value
    expected_var = np.asarray(tables.fixed_large_variance)[np.asarray(t)]
    np.testing.assert_allclose(
        np.asarray(out.variance)[:, 0, 0, 0], expected_var, rtol=1e-6
    )


def test_p_mean_variance_clip(tables):
    x = jnp.zeros((1, 1, 4, 4))
    eps = jnp.full(x.shape, -50.0)  # drives pred_xstart far above 1
    t = jnp.array([50])
    out = gd.p_mean_variance(tables, eps, x, t, clip_denoised=True)
    assert float(out.pred_xstart.max()) <= 1.0


def test_p_mean_variance_learned_range(tables):
    rng = jax.random.PRNGKey(6)
    x = jax.random.normal(rng, (2, 4, 8, 8))
    model_out = jnp.concatenate([jnp.zeros_like(x), jnp.ones_like(x)], axis=1)
    t = jnp.array([10, 90])
    out = gd.p_mean_variance(
        tables, model_out, x, t, var_type=gd.ModelVarType.LEARNED_RANGE
    )
    # var_values == +1 -> frac 1 -> log variance = log beta_t
    expected = np.asarray(tables.log_betas)[np.asarray(t)]
    np.testing.assert_allclose(
        np.asarray(out.log_variance)[:, 0, 0, 0], expected, rtol=1e-5
    )
    # var_values == -1 -> posterior_log_variance_clipped
    model_out = jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=1)
    out = gd.p_mean_variance(
        tables, model_out, x, t, var_type=gd.ModelVarType.LEARNED_RANGE
    )
    expected = np.asarray(tables.posterior_log_variance_clipped)[np.asarray(t)]
    np.testing.assert_allclose(
        np.asarray(out.log_variance)[:, 0, 0, 0], expected, rtol=1e-5
    )


def test_edit_replacement(tables):
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (1, 4, 16, 4))
    eps = jax.random.normal(jax.random.PRNGKey(8), x.shape)
    t = jnp.array([40])
    gt = jnp.full(x.shape, 0.25)
    mask = jnp.zeros(x.shape).at[:, :, :8, :].set(1.0)
    out = gd.p_mean_variance(tables, eps, x, t, edit_mask=mask, edit_gt=gt)
    np.testing.assert_allclose(out.pred_xstart[:, :, :8, :], 0.25, atol=1e-6)
    # eps is re-derived so that predict_xstart(eps) == replaced x0
    x0_back = gd.predict_xstart_from_eps(tables, x, t, out.eps)
    np.testing.assert_allclose(x0_back, out.pred_xstart, atol=1e-4)


def test_normal_kl_zero_for_identical():
    kl = gd.normal_kl(jnp.array(0.3), jnp.array(-1.0), jnp.array(0.3), jnp.array(-1.0))
    np.testing.assert_allclose(kl, 0.0, atol=1e-7)


def test_normal_kl_closed_form():
    # KL(N(m1, v1) || N(0, 1)) = 0.5 (v1 + m1^2 - 1 - log v1)
    m1, logv1 = 0.7, -0.5
    kl = gd.normal_kl(jnp.array(m1), jnp.array(logv1), 0.0, 0.0)
    expected = 0.5 * (np.exp(logv1) + m1**2 - 1 - logv1)
    np.testing.assert_allclose(kl, expected, rtol=1e-5)


def test_discretized_gaussian_ll_is_normalized_ish():
    # For a wide Gaussian the discretized LL should integrate to ~1 over bins.
    x = jnp.linspace(-1, 1, 256).reshape(1, 1, 16, 16)
    ll = gd.discretized_gaussian_log_likelihood(
        x, means=jnp.zeros_like(x), log_scales=jnp.zeros_like(x)
    )
    assert ll.shape == x.shape
    assert bool(jnp.isfinite(ll).all())


def test_training_losses_epsilon_mse(tables):
    rng = jax.random.PRNGKey(9)
    x0 = jax.random.normal(rng, (4, 2, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(10), x0.shape)
    t = jnp.array([3, 33, 66, 99])

    # A "perfect" model that returns the true noise gives zero loss.
    xt = gd.q_sample(tables, x0, t, noise)

    def perfect_model(x, model_t):
        return noise

    terms = gd.training_losses(tables, perfect_model, x0, t, noise)
    np.testing.assert_allclose(terms["loss"], 0.0, atol=1e-10)

    def zero_model(x, model_t):
        return jnp.zeros_like(x)

    terms = gd.training_losses(tables, zero_model, x0, t, noise)
    expected = gd.mean_flat(noise**2)
    np.testing.assert_allclose(terms["loss"], expected, rtol=1e-5)


def test_training_losses_learned_range_has_vb(tables):
    rng = jax.random.PRNGKey(11)
    x0 = jax.random.normal(rng, (2, 2, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(12), x0.shape)
    t = jnp.array([0, 50])

    def model(x, model_t):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)

    terms = gd.training_losses(
        tables, model, x0, t, noise,
        var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.RESCALED_MSE,
    )
    assert "vb" in terms and terms["vb"].shape == (2,)
    assert bool(jnp.isfinite(terms["loss"]).all())


def test_respaced_chain_matches_full_chain_marginals():
    """q(x_t|x_0) at a retained step equals the full chain's marginal there."""
    full = make_schedule("linear", 1000).tables()
    spaced_sched = make_schedule("linear", 1000, timestep_respacing="ddim50")
    spaced = spaced_sched.tables()
    x0 = jnp.ones((1, 1, 2, 2)) * 0.3
    noise = jnp.ones_like(x0) * 0.7
    for i_spaced in [0, 10, 49]:
        i_orig = int(spaced_sched.timestep_map[i_spaced])
        a = gd.q_sample(spaced, x0, jnp.array([i_spaced]), noise)
        b = gd.q_sample(full, x0, jnp.array([i_orig]), noise)
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_prior_bpd_small_for_standard_normal(tables):
    # x0 ~ 0 => q(x_T|x0) ~ N(0, I) => prior KL ~ 0
    import rule_guided_music_tpu.diffusion.gaussian as gd2

    x0 = jnp.zeros((2, 1, 4, 4))
    prior = gd2.prior_bpd(tables, x0)
    assert float(prior.max()) < 0.01


def test_calc_bpd_loop_perfect_model(tables):
    import rule_guided_music_tpu.diffusion.gaussian as gd2

    x0 = jnp.full((2, 1, 4, 4), 0.3)

    def perfect_model(x_t, model_t):
        t = model_t.astype(jnp.int32)
        return gd2.predict_eps_from_xstart(tables, x_t, t, x0)

    out = gd2.calc_bpd_loop(
        tables, perfect_model, x0, jax.random.PRNGKey(0), clip_denoised=False
    )
    assert out["vb"].shape == (100, 2)
    assert bool(jnp.isfinite(out["total_bpd"]).all())
    # perfect eps-prediction => eps mse ~ 0 and xstart mse ~ 0
    np.testing.assert_allclose(np.asarray(out["mse"]).mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["xstart_mse"]).mean(), 0.0,
                               atol=1e-6)
