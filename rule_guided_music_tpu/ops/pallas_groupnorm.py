"""Fused GroupNorm + swish Pallas kernel (VAE decoder epilogue).

Round-2 groundwork for the measured decoder bottleneck (docs/PERF.md): the
taming-style decoder interleaves GroupNorm -> swish -> conv, and at the SCG
width each GroupNorm+swish costs multiple HBM round trips of a multi-GB
activation (XLA: one read for statistics + read/write for the normalize).
This kernel holds one example's activation in VMEM (bf16) and streams fp32
statistics/normalization over row stripes — a single HBM read + write.

Layout: NHWC, one grid program per example. VMEM budget: in + out blocks at
bf16 (the decoder's largest stage, 128x128x128, is 4.2 MB each) plus one
fp32 row stripe; fits the ~16 MB/core budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gn_swish_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
                     eps: float, stripe: int):
    h, w, c = x_ref.shape[1:]
    gs = c // num_groups
    n_stripes = h // stripe

    # Pass 1: per-group sum / sumsq, fp32-accumulated over bf16 row stripes.
    def stats_body(i, carry):
        s, ss = carry
        rows = x_ref[0, pl.ds(i * stripe, stripe), :, :].astype(jnp.float32)
        g = rows.reshape(stripe * w, num_groups, gs)
        s = s + g.sum(axis=(0, 2))
        ss = ss + (g * g).sum(axis=(0, 2))
        return s, ss

    zeros = jnp.zeros((num_groups,), jnp.float32)
    total, total_sq = jax.lax.fori_loop(0, n_stripes, stats_body,
                                        (zeros, zeros))
    count = jnp.float32(h * w * gs)
    mean = total / count                                     # (G,)
    var = total_sq / count - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    # broadcast per-group stats to per-channel vectors
    mean_c = jnp.repeat(mean, gs)                            # (C,)
    inv_c = jnp.repeat(inv, gs)
    scale = scale_ref[...].astype(jnp.float32)
    bias = bias_ref[...].astype(jnp.float32)
    a = inv_c * scale                                        # y = a*x + b
    b_vec = bias - mean_c * inv_c * scale

    # Pass 2: normalize + affine + swish, stripe by stripe.
    def apply_body(i, _):
        rows = x_ref[0, pl.ds(i * stripe, stripe), :, :].astype(jnp.float32)
        y = rows * a[None, None, :] + b_vec[None, None, :]
        y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * stripe, stripe), :, :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_stripes, apply_body, 0)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "stripe"))
def groupnorm_swish(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    stripe: int = 8,
) -> jnp.ndarray:
    """Fused GroupNorm(num_groups, eps) + affine + swish over (N, H, W, C)."""
    n, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    stripe = min(stripe, h)
    while h % stripe != 0:
        stripe -= 1
    return pl.pallas_call(
        functools.partial(_gn_swish_kernel, num_groups=num_groups, eps=eps,
                          stripe=stripe),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
    )(x, scale, bias)
