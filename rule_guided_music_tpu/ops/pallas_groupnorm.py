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

Mosaic constraint shaping the kernel: the channel axis lives in vector
lanes, and lane-splitting reshapes like (HW, C) -> (HW, G, C/G) are
unsupported shape casts. So the stats pass reduces to per-CHANNEL (1, C)
rows, and channel<->group folding is done with tiny one-hot matmuls
((1,C)@(C,G) and (1,G)@(G,C)) that ride the MXU instead of reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e/v5p have 128 MiB of VMEM per core; Mosaic's default *scoped* limit is
# 16 MiB. Whole-example blocks at the decoder's widest stage (128x128x256
# bf16 = 8.4 MB, double-buffered in+out = 33.5 MB) need the limit raised.
_VMEM_CAP = 100 * 1024 * 1024


def _gn_swish_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
                     eps: float, stripe: int):
    h, w, c = x_ref.shape[1:]
    gs = c // num_groups
    n_stripes = h // stripe

    # Pass 1: per-CHANNEL sum / sumsq, fp32-accumulated over bf16 row stripes.
    def stats_body(i, carry):
        s, ss = carry  # (1, C) each
        rows = x_ref[0, pl.ds(i * stripe, stripe), :, :].astype(jnp.float32)
        flat = rows.reshape(stripe * w, c)  # merges sublane dims; lanes kept
        s = s + flat.sum(axis=0, keepdims=True)
        ss = ss + (flat * flat).sum(axis=0, keepdims=True)
        return s, ss

    zeros = jnp.zeros((1, c), jnp.float32)
    sum_c, sumsq_c = jax.lax.fori_loop(0, n_stripes, stats_body,
                                       (zeros, zeros))

    # channel->group one-hot (C, G) and its transpose, built from iota (no
    # lane reshapes, no transposes).
    cg_ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gs
    cg_g = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    fold = (cg_ch == cg_g).astype(jnp.float32)           # (C, G)
    gc_g = jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 0)
    gc_ch = jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 1) // gs
    unfold = (gc_g == gc_ch).astype(jnp.float32)         # (G, C)

    count = jnp.float32(h * w * gs)
    sum_g = jnp.dot(sum_c, fold, preferred_element_type=jnp.float32)
    sumsq_g = jnp.dot(sumsq_c, fold, preferred_element_type=jnp.float32)
    mean_g = sum_g / count                               # (1, G)
    var_g = sumsq_g / count - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)

    # broadcast per-group stats back to per-channel rows
    mean_c = jnp.dot(mean_g, unfold, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, unfold, preferred_element_type=jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)           # (1, C)
    bias = bias_ref[...].astype(jnp.float32)
    a = inv_c * scale                                    # y = a*x + b
    b_vec = bias - mean_c * inv_c * scale

    # Pass 2: normalize + affine + swish, stripe by stripe.
    def apply_body(i, _):
        rows = x_ref[0, pl.ds(i * stripe, stripe), :, :].astype(jnp.float32)
        y = rows * a[None, :, :] + b_vec[None, :, :]     # (S,W,C)*(1,1,C)
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
    # in + out whole-example blocks, double-buffered by the pipeline, plus
    # one fp32 stripe of working set; beyond the VMEM cap, fall back to the
    # plain XLA formulation rather than fail to compile.
    block_bytes = h * w * c * x.dtype.itemsize
    need = 4 * block_bytes + 8 * stripe * w * c + (1 << 20)
    if need > _VMEM_CAP:
        xf = x.astype(jnp.float32).reshape(n, h * w, num_groups, c // num_groups)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
        y = y * scale.reshape(1, 1, 1, c) + bias.reshape(1, 1, 1, c)
        return (y * jax.nn.sigmoid(y)).astype(x.dtype)
    return pl.pallas_call(
        functools.partial(_gn_swish_kernel, num_groups=num_groups, eps=eps,
                          stripe=stripe),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(_VMEM_CAP, max(need, 32 * 1024 * 1024)),
        ),
    )(x.reshape(n, h, w, c), scale.reshape(1, c), bias.reshape(1, c))


def _gn_swish_ref(x, scale, bias, num_groups, eps):
    """Pure-XLA GroupNorm+swish (numerics reference / backward formulation)."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    y = (y * scale.reshape(1, 1, 1, c) + bias.reshape(1, 1, 1, c)).astype(
        x.dtype
    )
    return y * jax.nn.sigmoid(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_groupnorm_swish(x, scale, bias, num_groups=32, eps=1e-6):
    """Differentiable fused GroupNorm+swish with per-platform dispatch.

    Forward runs the Pallas kernel when lowered for TPU and the pure-XLA
    formulation elsewhere (CPU init/tests). `pallas_call` has no autodiff
    rule, so the backward is defined via `jax.vjp` of the XLA formulation —
    this keeps gradient consumers (DPS guidance differentiates through the
    VAE decoder; sampling.py `_dps_mean_shift`) working with the fused VAE.
    """
    return jax.lax.platform_dependent(
        x, scale, bias,
        tpu=functools.partial(groupnorm_swish, num_groups=num_groups,
                              eps=eps),
        default=functools.partial(_gn_swish_ref, num_groups=num_groups,
                                  eps=eps),
    )


def _fgs_fwd(x, scale, bias, num_groups, eps):
    out = fused_groupnorm_swish(x, scale, bias, num_groups, eps)
    return out, (x, scale, bias)


def _fgs_bwd(num_groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _gn_swish_ref(xx, ss, bb, num_groups, eps),
        x, scale, bias,
    )
    return vjp(g)


fused_groupnorm_swish.defvjp(_fgs_fwd, _fgs_bwd)
