"""Torch checkpoint -> Flax params converters.

Imports the reference's released weights (DiTRotary .pt state dicts,
taming KL-VAE .ckpt Lightning checkpoints) into this framework's Flax trees
so pretrained models can be used and numerics validated end-to-end.

Layout conventions handled:
  * torch Linear weight (out, in)      -> flax Dense kernel (in, out)
  * torch Conv2d weight (out,in,kh,kw) -> flax Conv kernel (kh,kw,in,out)
  * torch GroupNorm/LayerNorm weight/bias -> flax scale/bias
  * qkv packing: torch rows [q;k;v] == flax output columns [q;k;v]
    (both reshape to (..., 3, heads, head_dim)), so a plain transpose works
  * rotary freqs buffers are dropped — tables are recomputed (ops/rotary.py
    matches rotary-embedding-torch's interleaved convention)

The mapping tables below are written against guided_diffusion/dit.py and
taming/modules/diffusionmodules/model.py module names.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.ckpt file into a flat {name: np.ndarray} dict."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def _linear(sd, name):
    out = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv(sd, name):
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def convert_dit_rotary(sd: Dict[str, np.ndarray], depth: int,
                       num_classes: int = 3) -> Dict[str, Any]:
    """DiTRotary torch state dict -> flax {'params': ...} tree
    (dit.py:538-634 module names)."""
    p: Dict[str, Any] = {}
    p["x_embedder"] = {
        "mlp0": _linear(sd, "x_embedder.MLP.0"),
        "mlp2": _linear(sd, "x_embedder.MLP.2"),
    }
    p["t_embedder"] = {
        "mlp0": _linear(sd, "t_embedder.mlp.0"),
        "mlp2": _linear(sd, "t_embedder.mlp.2"),
    }
    if "y_embedder.embedding_table.weight" in sd:
        p["y_embedder"] = {
            "embedding_table": sd["y_embedder.embedding_table.weight"]
        }
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "adaLN_modulation": _linear(sd, f"{b}.adaLN_modulation.1"),
            "attn": {
                "qkv": _linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        }
    p["final_layer"] = {
        "adaLN_modulation": _linear(sd, "final_layer.adaLN_modulation.1"),
        "linear": _linear(sd, "final_layer.linear"),
    }
    return {"params": p}


def convert_dit_rotary_classifier(
    sd: Dict[str, np.ndarray], depth: int, chord: bool = False
) -> Dict[str, Any]:
    """DiTRotaryClassifier torch state dict -> flax tree (dit.py:735-831)."""
    p: Dict[str, Any] = {}
    p["cls_token"] = sd["cls_token"]
    p["x_embedder"] = {
        "mlp0": _linear(sd, "x_embedder.MLP.0"),
        "mlp2": _linear(sd, "x_embedder.MLP.2"),
    }
    p["t_embedder"] = {
        "mlp0": _linear(sd, "t_embedder.mlp.0"),
        "mlp2": _linear(sd, "t_embedder.mlp.2"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "adaLN_modulation": _linear(sd, f"{b}.adaLN_modulation.1"),
            "attn": {
                "qkv": _linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            },
        }
    p["head"] = {
        "norm": _norm(sd, "norm"),
        "fc1": _linear(sd, "classifier_head.0"),
        "fc2": _linear(sd, "classifier_head.2"),
    }
    if chord:
        p["head_key"] = {
            "norm": _norm(sd, "norm_key"),
            "fc1": _linear(sd, "classifier_head_key.0"),
            "fc2": _linear(sd, "classifier_head_key.2"),
        }
    return {"params": p}


def _vae_resblock(sd, prefix):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{prefix}.nin_shortcut")
    return out


def _vae_attn(sd, prefix):
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "q": _conv(sd, f"{prefix}.q"),
        "k": _conv(sd, f"{prefix}.k"),
        "v": _conv(sd, f"{prefix}.v"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
    }


def convert_vae(
    sd: Dict[str, np.ndarray],
    ch_mult=(1, 2, 2, 4),
    num_res_blocks: int = 2,
) -> Dict[str, Any]:
    """taming AutoencoderKL Lightning state dict -> flax AutoencoderKL tree
    (klvae_pedal.py + diffusionmodules/model.py module names)."""
    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in")}
    for lvl in range(len(ch_mult)):
        for blk in range(num_res_blocks):
            enc[f"down_{lvl}_block_{blk}"] = _vae_resblock(
                sd, f"encoder.down.{lvl}.block.{blk}"
            )
        if lvl != len(ch_mult) - 1:
            enc[f"down_{lvl}_downsample"] = {
                "conv": _conv(sd, f"encoder.down.{lvl}.downsample.conv")
            }
    enc["mid_block_1"] = _vae_resblock(sd, "encoder.mid.block_1")
    enc["mid_attn_1"] = _vae_attn(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _vae_resblock(sd, "encoder.mid.block_2")
    enc["norm_out"] = _norm(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_block_1"] = _vae_resblock(sd, "decoder.mid.block_1")
    dec["mid_attn_1"] = _vae_attn(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _vae_resblock(sd, "decoder.mid.block_2")
    for lvl in range(len(ch_mult)):
        for blk in range(num_res_blocks + 1):
            dec[f"up_{lvl}_block_{blk}"] = _vae_resblock(
                sd, f"decoder.up.{lvl}.block.{blk}"
            )
        if lvl != 0:
            dec[f"up_{lvl}_upsample"] = {
                "conv": _conv(sd, f"decoder.up.{lvl}.upsample.conv")
            }
    dec["norm_out"] = _norm(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {"params": {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }}


def assert_tree_shapes_match(converted, template):
    """Raise if the converted tree's leaf shapes differ from a template."""
    import jax

    conv_flat = jax.tree_util.tree_leaves_with_path(converted)
    tmpl_flat = {tuple(str(k) for k in path): leaf.shape
                 for path, leaf in jax.tree_util.tree_leaves_with_path(template)}
    errors = []
    for path, leaf in conv_flat:
        key = tuple(str(k) for k in path)
        if key not in tmpl_flat:
            errors.append(f"unexpected param {key}")
        elif tuple(leaf.shape) != tuple(tmpl_flat[key]):
            errors.append(
                f"shape mismatch {key}: {leaf.shape} vs {tmpl_flat[key]}"
            )
    missing = set(tmpl_flat) - {tuple(str(k) for k in p) for p, _ in conv_flat}
    errors += [f"missing param {m}" for m in missing]
    if errors:
        raise ValueError("conversion mismatch:\n" + "\n".join(errors[:20]))
