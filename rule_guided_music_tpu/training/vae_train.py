"""KL-VAE training: L1 reconstruction + KL, optional patch-GAN adversary.

Re-architecture of taming/modules/losses/contperceptual.py:7-110 (the
LPIPSWithDiscriminator loss the reference trains its piano-roll VAE with)
and the two-optimizer Lightning step (taming/models/klvae_pedal.py:104-148).
The released config disables both the perceptual term (weight 0) and the
discriminator (disc_weight 0), so the default training here is L1 + KL;
the patch-GAN path is provided for full capability parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..models.vae import AutoencoderKL


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (taming/modules/discriminator/model.py:17)."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 3, 1))
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for i in range(1, self.n_layers + 1):
            mult = min(2**i, 8)
            stride = 2 if i < self.n_layers else 1
            h = nn.Conv(self.ndf * mult, (4, 4), strides=(stride, stride),
                        padding=1, use_bias=False, dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, self.ndf * mult),
                             dtype=self.dtype, name=f"norm{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, (4, 4), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


@dataclass
class VAETrainConfig:
    lr: float = 4.5e-6 * 128          # base_lr * batch (Lightning convention)
    kl_weight: float = 1e-2
    disc_weight: float = 0.0          # released config: disc off
    disc_start: int = 100_000
    perceptual_weight: float = 0.0    # released config: LPIPS off for rolls
    betas: Tuple[float, float] = (0.5, 0.9)


def make_vae_train_steps(
    vae: AutoencoderKL,
    config: VAETrainConfig,
    disc: Optional[NLayerDiscriminator] = None,
    lpips=None,
):
    """Build jitted (ae_step, disc_step). Each takes/returns explicit state
    trees; the discriminator step is a no-op closure when disc_weight == 0.
    ``lpips``: frozen perceptual module (training/perceptual.py) added to
    the reconstruction term when ``perceptual_weight > 0``
    (contperceptual.py:42-46 semantics); its params are the ``lpips_p``
    argument of ``ae_step`` — threaded per call, never closed over
    (CLAUDE.md remote-compile rule)."""
    ae_opt = optax.adam(config.lr, b1=config.betas[0], b2=config.betas[1])
    disc_opt = optax.adam(config.lr, b1=config.betas[0], b2=config.betas[1])

    def ae_loss_fn(params, disc_params, batch, rng, step, lpips_p):
        recon, posterior = vae.apply(params, batch, rng=rng)
        rec_loss = jnp.abs(batch - recon).mean()
        if lpips is not None and config.perceptual_weight > 0:
            p_loss = lpips.apply(lpips_p, batch, recon).mean()
            rec_loss = rec_loss + config.perceptual_weight * p_loss
        kl_loss = posterior.kl().mean() / jnp.prod(
            jnp.asarray(batch.shape[1:], jnp.float32)
        )
        loss = rec_loss + config.kl_weight * kl_loss
        g_loss = 0.0
        if disc is not None and config.disc_weight > 0:
            logits_fake = disc.apply(disc_params, recon)
            active = (step >= config.disc_start).astype(jnp.float32)
            g_loss = -jnp.mean(logits_fake)
            loss = loss + config.disc_weight * active * g_loss
        return loss, {"rec_loss": rec_loss, "kl_loss": kl_loss,
                      "g_loss": g_loss}

    # lpips weights (~59 MB VGG16) are threaded as a jit argument, never
    # closed over (CLAUDE.md: closed-over arrays become HLO constants and
    # choke the remote compiler)
    def ae_step(params, opt_state, disc_params, batch, rng, step,
                lpips_p=None):
        (loss, aux), grads = jax.value_and_grad(ae_loss_fn, has_aux=True)(
            params, disc_params, batch, rng, step, lpips_p
        )
        updates, opt_state = ae_opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["aeloss"] = loss
        return params, opt_state, aux

    def disc_loss_fn(disc_params, params, batch, rng):
        recon, _ = vae.apply(params, batch, rng=rng)
        logits_real = disc.apply(disc_params, batch)
        logits_fake = disc.apply(disc_params, jax.lax.stop_gradient(recon))
        return hinge_d_loss(logits_real, logits_fake)

    def disc_step(disc_params, disc_opt_state, params, batch, rng):
        loss, grads = jax.value_and_grad(disc_loss_fn)(
            disc_params, params, batch, rng
        )
        updates, disc_opt_state = disc_opt.update(
            grads, disc_opt_state, disc_params
        )
        disc_params = optax.apply_updates(disc_params, updates)
        return disc_params, disc_opt_state, {"discloss": loss}

    return ae_opt, disc_opt, jax.jit(ae_step), (
        jax.jit(disc_step) if disc is not None else None
    )
