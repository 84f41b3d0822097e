"""On-device musical rule programs: pitch-class histogram and note density.

JAX re-expressions of music_rule_guidance/music_rules.py:23-94 with identical
numerics, designed to run *inside* the SCG scan body over a (K*B) candidate
batch — no host sync, fully vectorized.

All functions take normalized piano rolls shaped (B, C, 128, L) with values
in [-1, 1] (background == -1) and return per-example rule vectors (B, D).
Unlike the reference, batch dims are never squeezed — vmap-friendliness wins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import BACKGROUND_THRESHOLD, MAX_PIANO, MIN_PIANO, OFF

# Bounds/centers for note-density class editing
# (reference: music_rule_guidance/music_rules.py:16-19).
VERTICAL_ND_BOUNDS = [1.29, 2.7578125, 3.61, 4.4921875, 5.28125, 6.1171875, 7.22]
VERTICAL_ND_CENTER = [0.56, 2.0239, 3.1839, 4.0511, 4.8867, 5.6992, 6.6686, 7.77]
HORIZONTAL_ND_BOUNDS = [1.8, 2.6, 3.2, 3.6, 4.4, 4.8, 5.8]
HORIZONTAL_ND_CENTER = [1.4, 2.2000, 2.9, 3.4, 4.0, 4.6, 5.3, 6.3]


def piano_like(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp pitches outside the 88-key piano range to background (OFF).

    Reference: music_rules.py:23-26 (in-place there; functional here).
    """
    pitch_axis = -2
    n_pitch = x.shape[pitch_axis]
    pitch_idx = jnp.arange(n_pitch)
    in_range = (pitch_idx >= MIN_PIANO) & (pitch_idx <= MAX_PIANO)
    shape = [1] * x.ndim
    shape[pitch_axis] = n_pitch
    return jnp.where(in_range.reshape(shape), x, OFF)


def total_pitch_class_histogram(piano_roll: jnp.ndarray) -> jnp.ndarray:
    """Normalized 12-bin pitch-class histogram of channel 0.

    Reference: music_rules.py:29-43 — time-reduce then fold pitches mod 12
    via the (11, 12) reshape trick; we fold directly with a mod-12 segment
    sum (identical math, no padding needed).
    """
    roll = piano_roll[:, 0, :, :]                        # (B, 128, L)
    roll = piano_like(roll[:, None])[:, 0]
    roll = (roll + 1.0) / 2.0                            # [0, 1]
    reduce_time = roll.sum(axis=-1)                      # (B, 128)
    pc = jnp.arange(128) % 12
    hist = jax.vmap(
        lambda v: jax.ops.segment_sum(v, pc, num_segments=12)
    )(reduce_time)                                       # (B, 12)
    return hist / (hist.sum(axis=-1, keepdims=True) + 1e-12)


def _nearest_resize_time(roll: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Nearest-neighbor resize along the last (time) axis, matching
    torch.nn.functional.interpolate(mode='nearest') index semantics."""
    old_len = roll.shape[-1]
    idx = (jnp.arange(new_len) * old_len // new_len).astype(jnp.int32)
    return roll[..., idx]


def note_density(
    piano_roll: jnp.ndarray,
    interval: int = 128,
    quantize_factor: int = 1,
    horizontal_scale: float = 5.0,
) -> jnp.ndarray:
    """Vertical + horizontal note density per `interval`-column window.

    Vertical density: mean simultaneous-note count per column in the window.
    Horizontal density: number of columns containing any onset, / scale.
    Reference: music_rules.py:46-83 (incl. the pad/diff onset detection).
    Returns (B, 2 * L/interval).
    """
    roll = piano_roll[:, :1, :, :]
    if quantize_factor != 1:
        roll = _nearest_resize_time(roll, roll.shape[-1] // quantize_factor)
        interval = interval // quantize_factor
    roll = piano_like(roll)

    roll = jnp.where(roll < BACKGROUND_THRESHOLD, OFF, roll)
    roll = (roll + 1.0) / 2.0
    binary = jnp.where(roll >= 1e-2, 1.0, 0.0)           # (B,1,128,L)

    batch = binary.shape[0]
    vertical_per_col = binary.sum(axis=2)                # (B,1,L)

    padded = jnp.pad(binary, ((0, 0), (0, 0), (0, 0), (1, 1)))
    diff = jnp.diff(padded, axis=-1)                     # (B,1,128,L+1)
    diff = jnp.maximum(diff, 0.0)
    horizontal_per_col = diff.sum(axis=2)[:, :, :-1]     # (B,1,L)
    horizontal_per_col = jnp.where(horizontal_per_col != 0.0, 1.0, 0.0)

    vertical = vertical_per_col.reshape(batch, 1, -1, interval).mean(axis=-1)
    horizontal = (
        horizontal_per_col.reshape(batch, 1, -1, interval).sum(axis=-1)
        / horizontal_scale
    )
    return jnp.concatenate([vertical, horizontal], axis=-1)[:, 0, :]


def note_density_class(
    piano_roll: jnp.ndarray,
    interval: int = 128,
    quantize_factor: int = 1,
    horizontal_scale: float = 1.0,
) -> jnp.ndarray:
    """Bucketized note-density classes (8 bins each axis).

    Reference: music_rules.py:86-94; torch.bucketize(right=False) ==
    jnp.searchsorted(side='left').
    """
    vt_bounds = jnp.asarray(VERTICAL_ND_BOUNDS)
    hr_bounds = jnp.asarray(HORIZONTAL_ND_BOUNDS) / horizontal_scale
    nd = note_density(
        piano_roll,
        interval=interval,
        quantize_factor=quantize_factor,
        horizontal_scale=horizontal_scale,
    )
    half = nd.shape[-1] // 2
    vt_cls = jnp.searchsorted(vt_bounds, nd[:, :half], side="left")
    hr_cls = jnp.searchsorted(hr_bounds, nd[:, half:], side="left")
    return jnp.concatenate([vt_cls, hr_cls], axis=-1)


# ---------------------------------------------------------------------------
# Differentiable (soft) rule variants
# ---------------------------------------------------------------------------
#
# The hard thresholds above have zero gradient, so DPS-style guidance through
# rule(decode(x̂0)) needs smooth surrogates (the reference carries these as
# mgeval/core_diff.py and the unused ``soft`` flag of rule_x0_mse,
# condition_functions.py:133-138). Sigmoid relaxations with temperature
# ``sharpness`` replace every step function; as sharpness -> inf they
# converge to the hard rules.


def soft_note_density(
    piano_roll: jnp.ndarray,
    interval: int = 128,
    horizontal_scale: float = 5.0,
    threshold: float = 0.05,
    sharpness: float = 200.0,
) -> jnp.ndarray:
    """Differentiable note density: sigmoids replace the background
    threshold, binarization, and onset detection.

    ``threshold``/``sharpness`` place the sigmoid so background cells (p=0)
    map to ~5e-5 while active cells saturate to 1; gradients flow in a band
    around the threshold.
    """
    roll = piano_roll[:, :1, :, :]
    roll = piano_like(roll)
    batch = roll.shape[0]
    active = jax.nn.sigmoid(((roll + 1.0) / 2.0 - threshold) * sharpness)
    vertical_per_col = active.sum(axis=2)                     # (B,1,L)
    padded = jnp.pad(active, ((0, 0), (0, 0), (0, 0), (1, 1)))
    diff = jnp.diff(padded, axis=-1)
    onset_strength = jax.nn.relu(diff).sum(axis=2)[:, :, :-1]
    horizontal_per_col = jnp.tanh(onset_strength * 2.0)       # soft "any onset"
    vertical = vertical_per_col.reshape(batch, 1, -1, interval).mean(axis=-1)
    horizontal = (
        horizontal_per_col.reshape(batch, 1, -1, interval).sum(axis=-1)
        / horizontal_scale
    )
    return jnp.concatenate([vertical, horizontal], axis=-1)[:, 0, :]


def soft_pitch_histogram(piano_roll: jnp.ndarray,
                         threshold: float = 0.05,
                         sharpness: float = 200.0) -> jnp.ndarray:
    """Differentiable pitch-class histogram weighting cells by a soft
    active-note indicator instead of raw velocity mass."""
    roll = piano_roll[:, 0, :, :]
    roll = piano_like(roll[:, None])[:, 0]
    active = jax.nn.sigmoid(((roll + 1.0) / 2.0 - threshold) * sharpness)
    reduce_time = active.sum(axis=-1)
    pc = jnp.arange(128) % 12
    hist = jax.vmap(
        lambda v: jax.ops.segment_sum(v, pc, num_segments=12)
    )(reduce_time)
    return hist / (hist.sum(axis=-1, keepdims=True) + 1e-12)
