"""Scaled-dot-product attention dispatch.

Layout convention throughout the framework: (B, N, H, D) — batch, sequence,
heads, head dim. For the DiT workloads here (N = 256 tokens) XLA fuses the
einsum attention onto the MXU well; `jax.nn.dot_product_attention` is used
when available (it lowers to the fused TPU attention path), with a manual
einsum fallback. A Pallas flash-attention kernel can be slotted in behind
``impl='pallas'`` (ops/pallas_attention.py) for long-sequence workloads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Attention over (B, N, H, D) tensors; returns (B, N, H, D)."""
    if impl in ("auto", "xla") and hasattr(jax.nn, "dot_product_attention"):
        return jax.nn.dot_product_attention(q, k, v)
    if impl == "pallas":
        from .pallas_attention import flash_attention

        return flash_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)
