"""W8A8 int8 quantized dense layers for TPU serving.

Beyond-reference serving lever (the reference has no quantized inference
path; its fp16_util.py:1-76 mixed precision is a training-only concern).
On v5e-class TPUs the MXU executes s8 x s8 -> s32 `dot_general` at twice
the bf16 rate, so the token-level matmuls of the DiT trunk (qkv / proj /
fc1 / fc2 — >95% of forward FLOPs) can run at 2x peak while everything
numerically delicate (embedders, adaLN modulation, LayerNorms, attention
softmax, final zero-init head) stays in bf16/fp32.

Scheme (standard weight-static / activation-dynamic W8A8):
  * weights: per-output-channel symmetric int8, scale = max|W[:, j]| / 127,
    folded offline by `quantize_dense` / `quantize_dit_params` — no
    training, no calibration set needed;
  * activations: per-token (row) dynamic symmetric int8, scale computed in
    fp32 inside the kernel — per-token scales track the wide dynamic range
    adaLN modulation induces across tokens;
  * accumulation: int32 on the MXU (`preferred_element_type`), dequantized
    by the rank-1 outer product of the two scales, bias added in fp32.

Opt-in and selection-safe: quantization only changes which denoiser the
sampler calls; SCG candidate scoring / final decode are untouched.  The
quality envelope is measured in tests/test_quant.py on the learned fixture
(eps relative error, end-to-end DDIM trajectory divergence) — as with all
in-repo quality evidence it awaits re-validation on converted release
checkpoints (docs/ROADMAP.md).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = jnp.dtype

# Leaf names a quantized dense carries instead of {kernel, bias}.
QUANT_KERNEL = "kernel_i8"
QUANT_SCALE = "scale"

# Dense submodules of a DiTBlock that carry token-level matmuls (the only
# ones worth quantizing — adaLN sees (B, hidden) and is FLOP-free).
DIT_BLOCK_QUANT_LEAVES = (("attn", "qkv"), ("attn", "proj"),
                          ("mlp", "fc1"), ("mlp", "fc2"))


def quantize_dense(kernel: np.ndarray):
    """Per-output-channel symmetric int8 quantization of a dense kernel.

    kernel: (d_in, d_out) float. Returns (kernel_i8 int8, scale f32 (d_out,)).
    """
    kernel = np.asarray(kernel, dtype=np.float32)
    amax = np.max(np.abs(kernel), axis=0)
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.rint(kernel / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quant_dense_apply(x: jnp.ndarray, kernel_i8: jnp.ndarray,
                      scale: jnp.ndarray, bias=None,
                      dtype: Dtype = jnp.bfloat16) -> jnp.ndarray:
    """y = dequant(int8(x) @ kernel_i8) + bias with dynamic per-token scales.

    x: (..., d_in); kernel_i8: (d_in, d_out) int8; scale: (d_out,) f32.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8, kernel_i8,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class QuantDense(nn.Module):
    """Drop-in dense with int8 weights + dynamic int8 activations.

    Parameter leaves are {kernel_i8, scale, bias} — produced offline from a
    trained fp32 Dense by `quantize_dense` (see `quantize_dit_params`); the
    zero-init here only defines shapes/dtypes for `init`/`eval_shape`.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        kernel = self.param(
            QUANT_KERNEL, nn.initializers.zeros_init(),
            (d_in, self.features), jnp.int8)
        scale = self.param(
            QUANT_SCALE, nn.initializers.ones_init(),
            (self.features,), jnp.float32)
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32)
        return quant_dense_apply(x, kernel, scale, bias, dtype=self.dtype)


def quantize_dit_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a trained DiT/DiTRotary param tree to the quant model's tree.

    Walks every `blocks_*` entry and replaces the four token-level dense
    leaf groups (attn/{qkv,proj}, mlp/{fc1,fc2}) with int8 kernel + scale;
    all other leaves (embedders, adaLN, final layer, norms) pass through
    unchanged.  Host-side numpy — call before `jax.device_put`.
    """
    tree = params["params"] if "params" in params else params

    def convert(sub):
        out = dict(sub)
        for outer, inner in DIT_BLOCK_QUANT_LEAVES:
            dense = dict(sub[outer][inner])
            q, s = quantize_dense(np.asarray(dense.pop("kernel")))
            dense[QUANT_KERNEL] = q
            dense[QUANT_SCALE] = s
            if "bias" in dense:
                dense["bias"] = np.asarray(dense["bias"], dtype=np.float32)
            out_outer = dict(out[outer])
            out_outer[inner] = dense
            out[outer] = out_outer
        return out

    new_tree = {k: (convert(v) if k.startswith("blocks_") else v)
                for k, v in tree.items()}
    return {"params": new_tree} if "params" in params else new_tree
