"""HBM preflight for the SCG sampling working set.

docs/PERF.md (round 2, session 2) documents that `make_sample_fn` happily
compiles configs whose SCG candidate decode working set exceeds device
memory, hard-faulting the chip mid-chain (ddim100 + full decoder at
k=16 x B=8; B=16 + decode_chunks=4).  This module turns that device fault
into a config error BEFORE any compilation: an analytic estimate of the
peak working set, checked against the device memory limit.

The estimate models the dominant terms of the scan body (reference cost
anatomy: gaussian_diffusion.py:509-533 — (1+k) denoiser forwards +
k·B·(latent_time/16) VAE chunk decodes per guided step, here executed in
``decode_chunks`` serialized groups):

  * resident params (fp32 master) + their bf16 compute copies,
  * the k-candidate latent tensors (candidates/flat/selected copies),
  * per-group denoiser forward live set,
  * per-group VAE decoder activations at the widest (full-resolution)
    stage — the term that actually blows up: every decoded 128x128 chunk
    keeps ~`ACT_BUFFERS` live feature maps of 128*128*ch at that stage,
  * the stacked decoded rolls that `lax.map` accumulates across groups.

``CALIBRATION`` scales the activation terms to the XLA-measured reality
(fusion temps, layout padding, fragmentation).  Calibrated against
`jax.local_devices()[0].memory_stats()` on the v5e bench chip — see
docs/PERF.md "HBM preflight calibration".
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

# Multiplier on the activation terms covering XLA fusion temps, layout
# padding and allocator fragmentation. Calibrated on-chip (docs/PERF.md).
CALIBRATION = 2.0

# Live full-resolution feature maps per decoded chunk at the widest decoder
# stage (norm input, conv input pipeline, conv output, residual skip).
ACT_BUFFERS = 6


def dit_param_count(hidden: int, depth: int, patch: int = 8,
                    in_channels: int = 4) -> int:
    """DiTRotary parameter count (dit.py:538-634 trunk): per block
    qkv 3h^2 + proj h^2 + mlp 8h^2 + adaLN 6h^2 = 18h^2."""
    block = 18 * hidden * hidden
    embed = (in_channels * patch * 256 + 256 * hidden      # x_embedder
             + 256 * hidden + hidden * hidden)             # t_embedder
    final = 2 * hidden * hidden + hidden * patch * in_channels
    return depth * block + embed + final


def vae_param_count(ch: int = 128, ch_mult: Tuple[int, ...] = (1, 2, 2, 4),
                    num_res_blocks: int = 2) -> int:
    """KL-VAE f8 parameter scaling: ~55M at ch=128 (SURVEY §2.2), conv
    params scale with ch^2."""
    return int(55e6 * (ch / 128) ** 2)


def estimate_scg_peak_bytes(
    *,
    gen_shape: Tuple[int, ...],
    k: int,
    decode_chunks: int,
    param_count: int,
    hidden: int,
    decoder_ch: int = 128,
    compute_bytes: int = 2,
    use_decode: bool = True,
) -> Dict[str, float]:
    """Estimated peak HBM bytes for one SCG guided step, by term.

    Returns a dict of term -> bytes plus "total".  ``gen_shape`` is the
    latent generation shape (B, C, latent_time, latent_pitch);
    ``param_count`` the total resident parameter count (denoiser + VAE +
    classifiers [+ scoring decoder]); ``decoder_ch`` the scoring decoder's
    base channel count (128 full / 64 light).
    """
    b, c, latent_t, latent_p = gen_shape
    latent_elems = c * latent_t * latent_p
    kb = k * b
    groups = max(int(decode_chunks), 1)
    if kb % groups != 0:
        groups = 1                       # sampling.py falls back to unchunked
    g = kb // groups
    chunks_per_excerpt = max(latent_t // 16, 1)
    roll_len = latent_t * 8

    terms: Dict[str, float] = {}
    # fp32 master params + bf16 compute copies
    terms["params"] = param_count * (4 + compute_bytes)
    # candidates + flat + selected latent copies (fp32 carries)
    terms["candidates"] = 3 * kb * latent_elems * 4
    # denoiser forward live set per group: qkv/mlp/attn buffers over
    # 256-token sequences (~16 live hidden-width maps)
    tokens = latent_t * latent_p // 8
    terms["denoiser_group"] = CALIBRATION * (
        g * tokens * hidden * 16 * compute_bytes
    )
    if use_decode:
        # widest decoder stage: full-res (128 x roll-chunk 128) feature
        # maps with `decoder_ch` channels, ACT_BUFFERS live per chunk
        per_chunk = ACT_BUFFERS * 128 * 128 * decoder_ch * compute_bytes
        terms["decode_group"] = CALIBRATION * (
            g * chunks_per_excerpt * per_chunk
        )
        # stacked decoded rolls accumulated across lax.map groups
        # (2 copies: map output + rule-scoring consumer)
        terms["stacked_rolls"] = CALIBRATION * (
            2 * kb * 3 * 128 * roll_len * compute_bytes
        )
    terms["total"] = float(sum(terms.values()))
    return terms


def device_memory_limit_bytes() -> Optional[int]:
    """The attached accelerator's memory limit, if discoverable.

    Honors RGM_HBM_BYTES (documented escape hatch / test hook); returns
    None on backends that don't report memory stats (e.g. CPU), in which
    case the preflight is skipped.
    """
    env = os.environ.get("RGM_HBM_BYTES")
    if env:
        return int(float(env))
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        return None
    return None


class HBMPreflightError(ValueError):
    """SCG config estimated to exceed device memory (raised pre-compile)."""


def preflight_scg(
    *,
    gen_shape: Tuple[int, ...],
    k: int,
    decode_chunks: int,
    param_count: int,
    hidden: int,
    decoder_ch: int = 128,
    compute_bytes: int = 2,
    use_decode: bool = True,
    limit_bytes: Optional[int] = None,
) -> Dict[str, float]:
    """Raise HBMPreflightError if the estimated SCG working set exceeds the
    device memory limit; returns the term breakdown otherwise.

    Skipped (returns estimate uncheck-ed) when no limit is discoverable or
    RGM_SKIP_HBM_PREFLIGHT=1.
    """
    terms = estimate_scg_peak_bytes(
        gen_shape=gen_shape, k=k, decode_chunks=decode_chunks,
        param_count=param_count, hidden=hidden, decoder_ch=decoder_ch,
        compute_bytes=compute_bytes, use_decode=use_decode,
    )
    if os.environ.get("RGM_SKIP_HBM_PREFLIGHT") == "1":
        return terms
    limit = limit_bytes if limit_bytes is not None \
        else device_memory_limit_bytes()
    if limit is None:
        return terms
    if terms["total"] > limit:
        b = gen_shape[0]
        kb = k * b
        breakdown = ", ".join(
            f"{name}={val/1e9:.2f}GB" for name, val in terms.items()
            if name != "total"
        )
        raise HBMPreflightError(
            f"SCG config estimated at {terms['total']/1e9:.2f} GB peak HBM "
            f"(limit {limit/1e9:.2f} GB): k={k} x batch={b} = {kb} "
            f"candidates, decode_chunks={decode_chunks}, "
            f"decoder_ch={decoder_ch}. Breakdown: {breakdown}. "
            f"Reduce batch size, raise scg.decode_chunks (serializes the "
            f"candidate decode), or use the light scoring decoder "
            f"(scoring_vae_model=..., docs/PERF.md). Set "
            f"RGM_SKIP_HBM_PREFLIGHT=1 to override."
        )
    return terms
