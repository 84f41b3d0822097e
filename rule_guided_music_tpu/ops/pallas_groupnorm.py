"""Fused GroupNorm + swish Pallas kernel (VAE decoder epilogue).

Round-2 groundwork for the measured decoder bottleneck (docs/PERF.md): the
taming-style decoder interleaves GroupNorm -> swish -> conv, and at the SCG
width each GroupNorm+swish costs two full HBM round trips of a multi-GB
activation. This kernel computes the 32-group statistics, normalization,
affine and swish in one VMEM pass per example.

Layout: NHWC, one grid program per example. VMEM budget note: the kernel
upcasts the example slice to fp32, so it covers stages up to ~64x64x256
(4 MB fp32); the decoder's level-0 stage (128x128x128 -> 33 MB fp32) needs
an H-striped two-pass (Welford) variant — the planned round-2 follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gn_swish_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
                     eps: float):
    x = x_ref[0].astype(jnp.float32)                 # (H, W, C)
    h, w, c = x.shape
    gs = c // num_groups
    grouped = x.reshape(h * w, num_groups, gs)
    mean = grouped.mean(axis=(0, 2), keepdims=True)          # (1, G, 1)
    var = ((grouped - mean) ** 2).mean(axis=(0, 2), keepdims=True)
    normed = (grouped - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(h, w, c)
    y = normed * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)   # swish


@functools.partial(jax.jit, static_argnames=("num_groups", "eps"))
def groupnorm_swish(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Fused GroupNorm(num_groups, eps) + affine + swish over (N, H, W, C)."""
    n, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    return pl.pallas_call(
        functools.partial(_gn_swish_kernel, num_groups=num_groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
    )(x, scale, bias)
