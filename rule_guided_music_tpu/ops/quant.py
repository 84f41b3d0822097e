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


def normalize_quant_mode(v) -> str:
    """CLI/config value -> '' (off) | 'w8a8' | 'w8a16'.

    Accepts bools (True -> 'w8a8', the original opt-in) and strings in any
    case, so `--quant True` and `--quant w8a16` both work.
    """
    if v is None or v is False:
        return ""
    if v is True:
        return "w8a8"
    s = str(v).strip().lower()
    if s in ("", "0", "false", "none", "off"):
        return ""
    if s in ("1", "true", "w8a8"):
        return "w8a8"
    if s in ("w8a16", "weight_only", "wo"):
        return "w8a16"
    raise ValueError(f"unknown quant mode {v!r} (use w8a8 or w8a16)")


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


def wo_dense_apply(x: jnp.ndarray, kernel_i8: jnp.ndarray,
                   scale: jnp.ndarray, bias=None,
                   dtype: Dtype = jnp.bfloat16) -> jnp.ndarray:
    """Weight-only int8 (W8A16): y = (x @ bf16(kernel_i8)) * scale + bias.

    The per-output-channel scale commutes with the contraction, so the
    int8->bf16 cast fuses into the dot's operand read (no dequantized
    weight materialized in HBM) and the rescale is a cheap output-side
    multiply.  Streams 4x less weight traffic than fp32 with bf16-MXU
    compute and no activation quantization error — the right trade when
    the forward is weight-bandwidth-bound (small serving batches).
    """
    y = jax.lax.dot_general(
        x.astype(dtype), kernel_i8.astype(dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y * scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class QuantDense(nn.Module):
    """Drop-in dense with int8 weights (+ optionally dynamic int8 acts).

    mode "w8a8": dynamic per-token int8 activations, s8 x s8 -> s32 MXU.
    mode "w8a16": weight-only — bf16 MXU, int8 weight storage/streaming.
    Parameter leaves are {kernel_i8, scale, bias} — produced offline from a
    trained fp32 Dense by `quantize_dense` (see `quantize_dit_params`); the
    zero-init here only defines shapes/dtypes for `init`/`eval_shape`.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    mode: str = "w8a8"

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
        apply = {"w8a8": quant_dense_apply, "w8a16": wo_dense_apply}[self.mode]
        return apply(x, kernel, scale, bias, dtype=self.dtype)


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
