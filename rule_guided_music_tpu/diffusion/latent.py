"""Latent <-> pixel bridges between the denoiser and the KL-VAE.

The denoiser works on (B, 4, 128, 16) latent "images" = 8 chunk-latents of a
10.24 s excerpt concatenated along time and transposed.  These helpers chunk
/ re-assemble around VAE calls, mirroring guided_diffusion/
gaussian_diffusion.py:1347-1395 (chunk order: "1st second for all batch,
2nd second for all batch, ...").
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..constants import BACKGROUND_THRESHOLD


def latent_to_chunks(z: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, P) latent image -> (n*B, C, P, P) square chunk latents."""
    b, c, t, p = z.shape
    n = t // p
    z = jnp.transpose(z, (0, 1, 3, 2))            # (B, C, P, T)
    z = z.reshape(b, c, p, n, p)                  # split time into n chunks
    z = jnp.transpose(z, (3, 0, 1, 2, 4))         # (n, B, C, P, P)
    return z.reshape(n * b, c, p, p)


def chunks_to_pixels(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n*B, C, H, H) decoded chunks -> (B, C, H, n*H) long piano roll."""
    nb, c, h, w = x.shape
    b = nb // n
    x = x.reshape(n, b, c, h, w)
    x = jnp.transpose(x, (1, 2, 3, 0, 4))         # (B, C, H, n, W)
    return x.reshape(b, c, h, n * w)


def pixels_to_chunks(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, L) long roll -> (n*B, C, H, H) square chunks."""
    b, c, h, length = x.shape
    n = length // h
    x = x.reshape(b, c, h, n, h)
    x = jnp.transpose(x, (3, 0, 1, 2, 4))         # (n, B, C, H, H)
    return x.reshape(n * b, c, h, h)


def chunks_to_latent(z: jnp.ndarray, n: int) -> jnp.ndarray:
    """(n*B, C, P, P) chunk latents -> (B, C, n*P, P) latent image."""
    nb, c, p, _ = z.shape
    b = nb // n
    z = z.reshape(n, b, c, p, p)
    z = jnp.transpose(z, (1, 2, 3, 0, 4))         # (B, C, P, n, P)
    z = z.reshape(b, c, p, n * p)                 # (B, C, P, T)
    return jnp.transpose(z, (0, 1, 3, 2))         # (B, C, T, P)


def make_decode_fn(
    vae_apply: Callable, scale_factor: float = 1.0, threshold: bool = False
) -> Callable:
    """Build latent-image -> long-piano-roll decoder (ref :1347-1358).

    ``vae_apply(z_chunks)``: (N, 4, P, P) -> (N, 3, 8P, 8P).
    """

    def decode(z: jnp.ndarray) -> jnp.ndarray:
        b, c, t, p = z.shape
        n = t // p
        chunks = latent_to_chunks(z / scale_factor)
        decoded = vae_apply(chunks)
        roll = chunks_to_pixels(decoded, n)
        if threshold:
            roll = jnp.where(roll <= BACKGROUND_THRESHOLD, -1.0, roll)
        return roll

    return decode


def make_encode_fn(vae_encode_moments: Callable, scale_factor: float = 1.0) -> Callable:
    """Build long-roll -> latent-image encoder using the posterior mode
    (ref :1382-1395; mean half of the 8-channel moments)."""

    def encode(x: jnp.ndarray) -> jnp.ndarray:
        b, c, h, length = x.shape
        n = length // h
        chunks = pixels_to_chunks(x)
        moments = vae_encode_moments(chunks)
        if moments.shape[1] == 8:
            z = jnp.split(moments, 2, axis=1)[0]
        else:
            z = moments
        return chunks_to_latent(z, n) * scale_factor

    return encode
