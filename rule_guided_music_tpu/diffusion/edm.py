"""EDM / Karras-style generic sampler (Heun with churn).

Re-architecture of diff_collage/generic_sampler.py:46-113 (the standalone
sigma-space sampler the reference carries for its DiffCollage experiments):
Karras sigma schedule over [sigma_min, sigma_max], stochastic churn, and a
2nd-order Heun correction — expressed as one `lax.scan`.

The denoiser here is sigma-parameterized: ``eps_fn(x, sigma_batch) -> eps``
with x0 = x - sigma * eps (the reference's SimpleWork.eps_scalar_t_fn
contract).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def karras_sigmas(
    num_steps: int,
    sigma_min: float = 1e-3,
    sigma_max: float = 80.0,
    rho: float = 7.0,
) -> np.ndarray:
    """Karras et al. (2022) sigma schedule, descending, with final 0."""
    ramp = np.linspace(0, 1, num_steps)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.append(sigmas, 0.0)


def heun_sample_loop(
    rng: jnp.ndarray,
    eps_fn: Callable,
    shape: Tuple[int, ...],
    num_steps: int = 40,
    sigma_min: float = 1e-3,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    s_churn: float = 0.0,
    s_tmin: float = 0.05,
    s_tmax: float = 50.0,
    s_noise: float = 1.003,
    noise: Optional[jnp.ndarray] = None,
):
    """Karras Heun sampler with churn (generic_sampler.py:46-113).

    Returns the final x (x0 estimate at sigma=0).
    """
    sigmas = jnp.asarray(karras_sigmas(num_steps, sigma_min, sigma_max, rho),
                         dtype=jnp.float32)
    rng, init_rng = jax.random.split(rng)
    if noise is None:
        noise = jax.random.normal(init_rng, shape)
    x = noise * sigma_max
    gamma_max = min(s_churn / num_steps, np.sqrt(2.0) - 1.0)

    def body(carry, i):
        x, rng = carry
        rng, churn_rng = jax.random.split(rng)
        sigma = sigmas[i]
        sigma_next = sigmas[i + 1]

        # churn: bump sigma up and add matching noise
        in_range = (sigma >= s_tmin) & (sigma <= s_tmax)
        gamma = jnp.where(in_range, gamma_max, 0.0)
        sigma_hat = sigma * (1 + gamma)
        extra = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        x_hat = x + extra * s_noise * jax.random.normal(churn_rng, x.shape)

        sig_b = jnp.full((shape[0],), sigma_hat)
        d = eps_fn(x_hat, sig_b)                       # dx/dsigma = eps
        x_euler = x_hat + (sigma_next - sigma_hat) * d

        # Heun 2nd-order correction except at the final (sigma_next==0) step
        def heun(_):
            d2 = eps_fn(x_euler, jnp.full((shape[0],), sigma_next))
            return x_hat + (sigma_next - sigma_hat) * 0.5 * (d + d2)

        x_next = jax.lax.cond(sigma_next > 0, heun, lambda _: x_euler,
                              operand=None)
        return (x_next, rng), None

    (x, _), _ = jax.lax.scan(body, (x, rng), jnp.arange(num_steps))
    return x


def vp_eps_fn_from_model(tables, model_fn, y=None):
    """Adapt an epsilon DDPM denoiser to the sigma parameterization:
    sigma(t) = sqrt(1-acp)/sqrt(acp); x_sigma = x_t / sqrt(acp).

    Maps a requested sigma to the nearest trained timestep (table lookup),
    letting the VP-trained model drive the EDM sampler.
    """
    sigmas_table = jnp.asarray(
        np.sqrt(1.0 - np.asarray(tables.alphas_cumprod))
        / np.sqrt(np.asarray(tables.alphas_cumprod))
    )

    def eps_fn(x, sigma_b):
        t = jnp.argmin(
            jnp.abs(sigmas_table[None, :] - sigma_b[:, None]), axis=-1
        )
        acp = tables.alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        x_t = x * jnp.sqrt(acp)
        return model_fn(x_t, tables.model_t[t], y)

    return eps_fn
