"""Rule-feature head: predict SCG rule features directly from latents.

Third-generation scoring lever (after the light scoring decoder and the
light rollout denoiser, docs/PERF.md).  SCG spends ~75% of a guided step
decoding k*B candidate latents through the VAE **only to evaluate three
rule programs on the decoded rolls and rank the candidates**
(reference: gaussian_diffusion.py:518-560 decodes every candidate at
:1347-1358 and ships it through `_extract_rule` :1361-1379).  The decoded
roll itself is thrown away after `FUNC_DICT` runs.

This head skips the roll entirely: a small conv trunk over the latent
image predicts each rule's feature vector in the exact output contract of
``rules.registry.FUNC_DICT``:

  * ``pitch_hist``        -> (B, 12) normalized histogram (softmax),
  * ``note_density``      -> (B, 2*w) positive floats
                             (vertical then horizontal, softplus),
  * ``chord_progression`` -> (B, w) int tags in [0, 8) via per-window
                             argmax over chord-tag logits.

With ch=64 the trunk costs ~1.2 GFLOP per candidate vs ~600 GFLOP for a
full ch=128 decode (~500x), so candidate ranking stops being the
bottleneck of the guided step.  Like the other light-scoring paths this
is SELECTION-ONLY: the sampled trajectory and the final decode always use
the full models; the head only ranks the k candidates.  Quality is gated
by the same end-to-end protocol (docs/PERF.md round-3 gate;
scripts/distill_scoring_features.py, tests/test_light_scoring_gate.py).

Input convention: the head consumes the same tensor ``make_decode_fn``
feeds the decoder — x0 / scale_factor — so distillation and deployment
share one operating point (the round-2 lesson from the light decoder).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

#: latent-time columns per 1.28 s rule window (16 latent cols = one
#: 128-column pixel window, diffusion/latent.py chunking)
WINDOW_COLS = 16

#: chord-tag vocabulary: 0 = null, 1..7 = scale degree (rules/chord.py)
NUM_CHORD_TAGS = 8


class RuleFeatureHead(nn.Module):
    """Conv trunk + per-window heads predicting SCG rule features.

    ``__call__`` returns the raw prediction dict (chord as logits, for
    the distillation loss); ``features`` returns FUNC_DICT-contract
    outputs (chord as argmax int tags) for use inside the sampler.
    """

    ch: int = 64
    depth: int = 4
    n_chord_tags: int = NUM_CHORD_TAGS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        b, c, t, p = z.shape
        w = t // WINDOW_COLS
        h = jnp.transpose(z, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        for i in range(self.depth):
            h = nn.Conv(self.ch, (3, 3), dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.swish(h)
            if i == 0:
                skip = h
        h = h + skip                                  # cheap residual trunk
        # per-window pooled embedding: (B, w, WINDOW_COLS, P, ch) -> (B, w, ch)
        h = h.reshape(b, w, WINDOW_COLS, p, self.ch).mean(axis=(2, 3))
        h = nn.swish(nn.Dense(self.ch, dtype=self.dtype, name="win_fc")(h))

        nd = nn.Dense(2, dtype=self.dtype, name="nd_head")(h)    # (B, w, 2)
        nd = nn.softplus(nd.astype(jnp.float32))
        note_density = jnp.concatenate([nd[..., 0], nd[..., 1]], axis=-1)

        chord_logits = nn.Dense(self.n_chord_tags, dtype=self.dtype,
                                name="chord_head")(h)            # (B, w, 8)

        g = h.mean(axis=1)                                       # (B, ch)
        g = nn.swish(nn.Dense(self.ch, dtype=self.dtype, name="ph_fc")(g))
        ph = nn.Dense(12, dtype=self.dtype, name="ph_head")(g)
        pitch_hist = nn.softmax(ph.astype(jnp.float32), axis=-1)

        return {
            "pitch_hist": pitch_hist,
            "note_density": note_density,
            "chord_logits": chord_logits.astype(jnp.float32),
        }

    def features(self, z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """FUNC_DICT-contract features for SCG ranking."""
        out = self(z)
        return {
            "pitch_hist": out["pitch_hist"],
            "note_density": out["note_density"],
            "chord_progression": jnp.argmax(
                out["chord_logits"], axis=-1).astype(jnp.int32),
        }
