"""Functional Gaussian-diffusion math over precomputed tables.

Pure-function re-architecture of guided_diffusion/gaussian_diffusion.py's
GaussianDiffusion class: every method becomes a stateless function over a
``Tables`` pytree so it can live inside ``jit``/``scan``/``vmap`` bodies.

Behavioral parity references (file:line into /root/reference):
  - q moments / q_sample:     gaussian_diffusion.py:191-226
  - posterior:                gaussian_diffusion.py:228-250
  - p_mean_variance:          gaussian_diffusion.py:252-357
  - eps/xstart conversions:   gaussian_diffusion.py:359-380
  - VLB terms:                gaussian_diffusion.py:1145-1178, losses.py
  - training losses:          gaussian_diffusion.py:1180-1253
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import Tables


class ModelMeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-step constants for a batch of t and broadcast to ndim dims."""
    out = table[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_mean_variance(tables: Tables, x_start, t):
    mean = _extract(tables.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    variance = _extract(1.0 - tables.alphas_cumprod, t, x_start.ndim)
    log_variance = _extract(tables.log_one_minus_alphas_cumprod, t, x_start.ndim)
    return mean, variance, log_variance


def q_sample(tables: Tables, x_start, t, noise):
    """Sample x_t ~ q(x_t | x_0)."""
    return (
        _extract(tables.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _extract(tables.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior_mean_variance(tables: Tables, x_start, x_t, t):
    """Moments of q(x_{t-1} | x_t, x_0)."""
    mean = (
        _extract(tables.posterior_mean_coef1, t, x_t.ndim) * x_start
        + _extract(tables.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    variance = _extract(tables.posterior_variance, t, x_t.ndim)
    log_variance = _extract(tables.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, variance, log_variance


def predict_xstart_from_eps(tables: Tables, x_t, t, eps):
    return (
        _extract(tables.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(tables.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_eps_from_xstart(tables: Tables, x_t, t, pred_xstart):
    return (
        _extract(tables.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
    ) / _extract(tables.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def predict_xstart_from_xprev(tables: Tables, x_t, t, xprev):
    coef1 = _extract(tables.posterior_mean_coef1, t, x_t.ndim)
    coef2 = _extract(tables.posterior_mean_coef2, t, x_t.ndim)
    return xprev / coef1 - (coef2 / coef1) * x_t


class PMeanVar(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray
    eps: jnp.ndarray  # model's (possibly edited) epsilon — handy for DDIM/SCG


def p_mean_variance(
    tables: Tables,
    model_output: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.FIXED_LARGE,
    clip_denoised: bool = False,
    denoised_fn: Optional[Callable] = None,
    edit_mask: Optional[jnp.ndarray] = None,
    edit_gt: Optional[jnp.ndarray] = None,
) -> PMeanVar:
    """Compute p(x_{t-1} | x_t) moments + x0 prediction from a model output.

    ``model_output`` is the raw denoiser output (2C channels when variance is
    learned).  ``edit_mask``/``edit_gt`` implement replacement-based editing:
    the predicted x0 is overwritten by gt inside the mask and eps re-derived
    (reference: gaussian_diffusion.py:293-298).
    """

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    c = x.shape[1]
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        model_output, model_var_values = jnp.split(model_output, 2, axis=1)
        if var_type == ModelVarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = _extract(tables.posterior_log_variance_clipped, t, x.ndim)
            max_log = _extract(tables.log_betas, t, x.ndim)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif var_type == ModelVarType.FIXED_LARGE:
        model_variance = _extract(tables.fixed_large_variance, t, x.ndim) * jnp.ones_like(x)
        model_log_variance = _extract(tables.fixed_large_log_variance, t, x.ndim) * jnp.ones_like(x)
    elif var_type == ModelVarType.FIXED_SMALL:
        model_variance = _extract(tables.posterior_variance, t, x.ndim) * jnp.ones_like(x)
        model_log_variance = _extract(
            tables.posterior_log_variance_clipped, t, x.ndim
        ) * jnp.ones_like(x)
    else:
        raise NotImplementedError(var_type)

    if mean_type == ModelMeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(tables, x, t, model_output))
        model_mean = model_output
        eps = predict_eps_from_xstart(tables, x, t, pred_xstart)
    elif mean_type in (ModelMeanType.START_X, ModelMeanType.EPSILON):
        if mean_type == ModelMeanType.START_X:
            pred_xstart = model_output
        else:
            pred_xstart = predict_xstart_from_eps(tables, x, t, model_output)
        if edit_mask is not None:
            # Replacement-based editing happens before clip/denoised_fn, on
            # the raw x0 prediction, mirroring gaussian_diffusion.py:293-298
            # (there process_xstart is applied first; with clip_denoised=False
            # — the sampling default — the order is equivalent, and we keep
            # the mask semantics: gt inside mask, prediction outside).
            pred_xstart = edit_mask * edit_gt + (1.0 - edit_mask) * pred_xstart
        pred_xstart = process_xstart(pred_xstart)
        eps = predict_eps_from_xstart(tables, x, t, pred_xstart)
        model_mean, _, _ = q_posterior_mean_variance(tables, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

    return PMeanVar(
        mean=model_mean,
        variance=model_variance,
        log_variance=model_log_variance,
        pred_xstart=pred_xstart,
        eps=eps,
    )


# --------------------------------------------------------------------------
# Likelihood helpers (reference: guided_diffusion/losses.py)
# --------------------------------------------------------------------------


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal Gaussians (in nats)."""
    logvar1 = jnp.asarray(logvar1, dtype=jnp.float32)
    logvar2 = jnp.asarray(logvar2, dtype=jnp.float32)
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to uint8-scaled [-1, 1] bins."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, a_min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, a_min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, a_min=1e-12))),
    )


def mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def vb_terms_bpd(
    tables: Tables,
    model_output,
    x_start,
    x_t,
    t,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
    clip_denoised: bool = False,
):
    """One VLB term (bits/dim): KL at t>0, decoder NLL at t==0."""
    true_mean, _, true_log_var = q_posterior_mean_variance(tables, x_start, x_t, t)
    out = p_mean_variance(
        tables, model_output, x_t, t,
        mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
    )
    kl = normal_kl(true_mean, true_log_var, out.mean, out.log_variance)
    kl = mean_flat(kl) / np.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return output, out.pred_xstart


def training_losses(
    tables: Tables,
    model_fn: Callable,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.FIXED_LARGE,
    loss_type: LossType = LossType.MSE,
    model_kwargs: Optional[dict] = None,
):
    """Per-example training losses (dict of [N] arrays).

    ``model_fn(x_t, model_t, **model_kwargs)`` is the denoiser closure; it is
    conditioned on ``tables.model_t[t]`` so respaced training "just works".
    Mirrors gaussian_diffusion.py:1180-1253.
    """
    model_kwargs = model_kwargs or {}
    x_t = q_sample(tables, x_start, t, noise)
    terms = {}
    model_t = tables.model_t[t]

    if loss_type in (LossType.KL, LossType.RESCALED_KL):
        model_output = model_fn(x_t, model_t, **model_kwargs)
        loss, _ = vb_terms_bpd(
            tables, model_output, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )
        if loss_type == LossType.RESCALED_KL:
            loss = loss * tables.num_timesteps
        terms["loss"] = loss
        return terms

    model_output = model_fn(x_t, model_t, **model_kwargs)
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        eps_out, var_values = jnp.split(model_output, 2, axis=1)
        # Learn the variance with the VLB but freeze the mean prediction.
        frozen = jnp.concatenate([jax.lax.stop_gradient(eps_out), var_values], axis=1)
        vb, _ = vb_terms_bpd(
            tables, frozen, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=False,
        )
        if loss_type == LossType.RESCALED_MSE:
            vb = vb * tables.num_timesteps / 1000.0
        terms["vb"] = vb
        model_output = eps_out

    if mean_type == ModelMeanType.PREVIOUS_X:
        target = q_posterior_mean_variance(tables, x_start, x_t, t)[0]
    elif mean_type == ModelMeanType.START_X:
        target = x_start
    else:
        target = noise
    terms["mse"] = mean_flat((target - model_output) ** 2)
    terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
    return terms


def prior_bpd(tables: Tables, x_start: jnp.ndarray) -> jnp.ndarray:
    """Prior KL term of the VLB in bits/dim (gaussian_diffusion.py:1255-1271)."""
    t = jnp.full((x_start.shape[0],), tables.num_timesteps - 1, dtype=jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(tables, x_start, t)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return mean_flat(kl) / np.log(2.0)


def calc_bpd_loop(
    tables: Tables,
    model_fn: Callable,
    x_start: jnp.ndarray,
    rng: jnp.ndarray,
    *,
    mean_type: ModelMeanType = ModelMeanType.EPSILON,
    var_type: ModelVarType = ModelVarType.FIXED_LARGE,
    clip_denoised: bool = True,
    model_kwargs: Optional[dict] = None,
):
    """Full VLB in bits/dim as one scan over timesteps
    (gaussian_diffusion.py:1273-1328). Returns dict with total_bpd,
    prior_bpd, and per-timestep vb / xstart_mse / mse arrays (T, N)."""
    model_kwargs = model_kwargs or {}
    b = x_start.shape[0]

    def body(carry, t_scalar):
        rng = carry
        rng, sub = jax.random.split(rng)
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(sub, x_start.shape)
        x_t = q_sample(tables, x_start, t, noise)
        model_output = model_fn(x_t, tables.model_t[t], **model_kwargs)
        vb, pred_xstart = vb_terms_bpd(
            tables, model_output, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type,
            clip_denoised=clip_denoised,
        )
        xstart_mse = mean_flat((pred_xstart - x_start) ** 2)
        eps = predict_eps_from_xstart(tables, x_t, t, pred_xstart)
        mse = mean_flat((eps - noise) ** 2)
        return rng, (vb, xstart_mse, mse)

    ts = jnp.arange(tables.num_timesteps - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(body, rng, ts)
    prior = prior_bpd(tables, x_start)
    total = vb.sum(axis=0) + prior
    return {
        "total_bpd": total,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }
