"""Schedule/respacing invariants vs closed forms (SURVEY.md §4 fixture (a)/(d))."""

import numpy as np
import pytest

from rule_guided_music_tpu.diffusion.schedule import (
    Schedule,
    get_named_beta_schedule,
    make_schedule,
    space_timesteps,
)


def test_linear_schedule_endpoints():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.dtype == np.float64
    assert np.isclose(betas[0], 0.0001)
    assert np.isclose(betas[-1], 0.02)
    assert (np.diff(betas) > 0).all()


def test_linear_schedule_scales_with_steps():
    # The "extended to any number of steps" property: scale = 1000/N.
    betas = get_named_beta_schedule("linear", 500)
    assert np.isclose(betas[0], 0.0002)
    assert np.isclose(betas[-1], 0.04)


def test_cosine_schedule_bounded():
    betas = get_named_beta_schedule("cosine", 1000)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_stable_diffusion_schedule():
    betas = get_named_beta_schedule("stable-diffusion", 1000)
    assert np.isclose(betas[0], 0.00085)
    assert np.isclose(betas[-1], 0.012)


def test_posterior_coefficients_closed_form():
    sched = make_schedule("linear", 100)
    betas = sched.betas
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    # posterior q(x_{t-1}|x_t,x_0) coefficients (Ho et al. eq. 7)
    np.testing.assert_allclose(
        sched.posterior_mean_coef1, betas * np.sqrt(acp_prev) / (1 - acp)
    )
    np.testing.assert_allclose(
        sched.posterior_mean_coef2, (1 - acp_prev) * np.sqrt(alphas) / (1 - acp)
    )
    np.testing.assert_allclose(
        sched.posterior_variance, betas * (1 - acp_prev) / (1 - acp)
    )


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim25")
    assert len(steps) == 25
    assert steps == set(range(0, 1000, 40))


def test_space_timesteps_sections():
    steps = space_timesteps(300, [10, 15, 20])
    assert len(steps) == 45


def test_space_timesteps_invalid():
    with pytest.raises(ValueError):
        space_timesteps(10, "ddim7")  # no integer stride gives exactly 7


def test_respaced_alphas_cumprod_match_retained_steps():
    """Respacing must preserve alpha-bar at the retained original steps."""
    full = make_schedule("linear", 1000)
    spaced = make_schedule("linear", 1000, timestep_respacing="ddim50")
    assert spaced.num_timesteps == 50
    retained = spaced.timestep_map
    np.testing.assert_allclose(
        spaced.alphas_cumprod, full.alphas_cumprod[retained], rtol=1e-12
    )


def test_no_respacing_is_identity():
    full = make_schedule("linear", 100)
    assert full.num_timesteps == 100
    np.testing.assert_array_equal(full.timestep_map, np.arange(100))


def test_model_t_mapping_and_rescale():
    spaced = make_schedule("linear", 1000, timestep_respacing="ddim25")
    t = np.arange(25)
    mt = np.asarray(spaced.model_t(t))
    np.testing.assert_array_equal(mt, spaced.timestep_map.astype(np.float32))

    rescaled = make_schedule(
        "linear", 500, timestep_respacing="ddim25", rescale_timesteps=True
    )
    mt = np.asarray(rescaled.model_t(np.arange(25)))
    np.testing.assert_allclose(mt, rescaled.timestep_map * (1000.0 / 500))


def test_tables_roundtrip():
    sched = make_schedule("linear", 64)
    tables = sched.tables()
    assert tables.num_timesteps == 64
    np.testing.assert_allclose(
        np.asarray(tables.sqrt_alphas_cumprod),
        sched.sqrt_alphas_cumprod.astype(np.float32),
    )


def test_fixed_large_variance_table():
    sched = make_schedule("linear", 50)
    expected = np.append(sched.posterior_variance[1], sched.betas[1:])
    np.testing.assert_allclose(sched.fixed_large_variance, expected)
