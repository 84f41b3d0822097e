"""Rule and loss registries — the SCG selection / reporting contract.

Mirrors music_rule_guidance/rule_maps.py:5-38 name-for-name so YAML configs
from the reference work unchanged.  All rule functions are batched
(B, C, 128, L) -> (B, D) and run on device (including chords — see chord.py).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from . import chord, tensor_rules

FUNC_DICT = {
    "pitch_hist": tensor_rules.total_pitch_class_histogram,
    "note_density": tensor_rules.note_density,
    "note_density_hr_1": partial(tensor_rules.note_density, horizontal_scale=1.0),
    "note_density_hr_2": partial(tensor_rules.note_density, horizontal_scale=2.0),
    "note_density_class": tensor_rules.note_density_class,
    "chord_progression": chord.get_chords,
    # lower time resolution (pixel-space, fs=12.5) variants
    "note_density_pixel": partial(tensor_rules.note_density, interval=16),
    "chord_progression_pixel": partial(chord.get_chords, fs=12.5, window_size=1.28),
    # differentiable surrogates for DPS-through-rule guidance
    "note_density_soft": tensor_rules.soft_note_density,
    "pitch_hist_soft": tensor_rules.soft_pitch_histogram,
}


def mse_loss_mean(gen_rule: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((gen_rule.astype(jnp.float32) - target.astype(jnp.float32)) ** 2).mean(
        axis=-1
    )


def zero_one_loss_mean(gen_rule: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return (gen_rule != target).astype(jnp.float32).mean(axis=-1)


def zero_one_loss_sum(gen_rule: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return (gen_rule != target).astype(jnp.float32).sum(axis=-1)


LOSS_DICT = {
    "pitch_hist": mse_loss_mean,
    "note_density": mse_loss_mean,
    "note_density_hr_1": mse_loss_mean,
    "note_density_hr_2": mse_loss_mean,
    "note_density_class": zero_one_loss_mean,
    "chord_progression": zero_one_loss_mean,
    "note_density_pixel": mse_loss_mean,
    "chord_progression_pixel": zero_one_loss_mean,
    "note_density_soft": mse_loss_mean,
    "pitch_hist_soft": mse_loss_mean,
}


def extract_rule(rule_name: str, pred_xstart: jnp.ndarray) -> jnp.ndarray:
    """Dispatch a rule program on a batch of decoded rolls.

    The reference's `_extract_rule` (gaussian_diffusion.py:1361-1379) ships
    chord batches to a host multiprocessing pool; here every rule — chords
    included — is a device tensor program, so this is a plain dispatch.
    """
    return FUNC_DICT[rule_name](pred_xstart)
