"""LPIPS perceptual loss (VGG16 features + learned linear heads).

Re-architecture of taming/modules/losses/lpips.py:11 — the perceptual term
of LPIPSWithDiscriminator (contperceptual.py:7-110). The released piano-roll
VAE config trains with perceptual_weight 0, so this module exists for full
capability parity: natural-image VAE training, or ablating a perceptual
term on rolls.

Weights: the reference uses torchvision's pretrained VGG16 plus taming's
``vgg.pth`` linear heads; neither is downloadable here, so weights must be
supplied via :func:`convert_torch_lpips` from torch state dicts (same
converter conventions as models/torch_port.py). Random-init LPIPS is still
a valid smooth feature-space distance (useful for tests), just not the
calibrated human-perceptual metric.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG16 feature geometry: (convs_per_block, out_channels) per block; LPIPS
# taps the last relu of each block (relu1_2, 2_2, 3_3, 4_3, 5_3).
_VGG_BLOCKS = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]

# ImageNet normalization buffers (lpips.ScalingLayer) — inputs in [-1, 1].
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk, returning the 5 LPIPS tap activations (NHWC)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        for bi, (n_convs, ch) in enumerate(_VGG_BLOCKS):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{bi + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            taps.append(x)
            if bi < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


def _unit_normalize(x, eps=1e-10):
    return x / (jnp.sqrt((x**2).sum(axis=-1, keepdims=True)) + eps)


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg'): unit-normalized feature diffs -> 1x1 linear
    heads -> spatial mean -> sum over the 5 taps. NCHW [-1, 1] inputs."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT).reshape(1, 1, 1, 3)
        scale = jnp.asarray(_SCALE).reshape(1, 1, 1, 3)
        vgg = VGG16Features(dtype=self.dtype, name="net")

        def prep(a):
            a = jnp.transpose(a, (0, 2, 3, 1))
            if a.shape[-1] == 1:
                a = jnp.tile(a, (1, 1, 1, 3))
            return (a - shift) / scale

        taps_x = vgg(prep(x))
        taps_y = vgg(prep(y))
        total = 0.0
        for i, (fx, fy) in enumerate(zip(taps_x, taps_y)):
            diff = (_unit_normalize(fx) - _unit_normalize(fy)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"lin{i}")
            total = total + lin(diff).mean(axis=(1, 2, 3))
        return total  # (B,)


def convert_torch_lpips(
    vgg_features_sd: Dict[str, np.ndarray],
    lins_sd: Dict[str, np.ndarray],
) -> Dict[str, Any]:
    """torchvision vgg16().features + taming vgg.pth lins -> flax LPIPS tree.

    ``vgg_features_sd``: keys like '0.weight', '2.weight', ... (torchvision
    feature indices); ``lins_sd``: keys like 'lin0.model.1.weight'.
    """
    # torchvision VGG16 conv indices per block
    idx = iter([0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28])
    net: Dict[str, Any] = {}
    for bi, (n_convs, _) in enumerate(_VGG_BLOCKS):
        for ci in range(n_convs):
            i = next(idx)
            net[f"conv{bi + 1}_{ci + 1}"] = {
                "kernel": np.transpose(
                    vgg_features_sd[f"{i}.weight"], (2, 3, 1, 0)
                ),
                "bias": vgg_features_sd[f"{i}.bias"],
            }
    params: Dict[str, Any] = {"net": net}
    for li in range(5):
        key = f"lin{li}.model.1.weight"
        if key not in lins_sd:
            key = f"lins.{li}.model.1.weight"
        params[f"lin{li}"] = {
            "kernel": np.transpose(lins_sd[key], (2, 3, 1, 0))
        }
    return {"params": params}
