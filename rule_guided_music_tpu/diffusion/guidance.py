"""Guidance condition functions: classifier gradients, DPS values, rules.

JAX re-architecture of guided_diffusion/condition_functions.py — the
reference's ``th.enable_grad``/``autograd.grad`` closures become ``jax.grad``
over pure functions.  Two kinds of cond_fn, matching the two guidance
families in the sampler:

  * grad-type (classic classifier guidance, Sohl-Dickstein mean shift):
      cond_fn(x_t, t_model, rules) -> gradient, same shape as x_t
  * value-type (DPS): cond_fn(x0_or_decoded, t_model, rules) -> log-probs (B,)
      — the sampler differentiates through the denoiser (and optionally the
      VAE decoder) itself.

``rules`` is a dict rule_name -> (B, D) target.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..rules.registry import FUNC_DICT


def _mse_logprob(logits, target):
    return -((logits - target) ** 2).sum(axis=-1)


def _xent_logprob(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


# ---------------------------------------------------------------------------
# Per-rule log-prob programs (value functions); gradients fall out of jax.grad
# ---------------------------------------------------------------------------


def nn_zt_mse_logprob(classifier, x, t, rule):
    """log p from an MSE regressor head (cond ref :58-64), per-example."""
    logits = classifier(x, t)
    return _mse_logprob(logits, rule)


def nn_zt_xentropy_logprob(classifier, x, t, rule):
    """Cross-entropy head; reference zeroes t here (cond ref :46-55)."""
    logits = classifier(x, jnp.zeros_like(t))
    return _xent_logprob(logits, rule.reshape(-1).astype(jnp.int32))


def nn_zt_chord_logprob(classifier, x, t, rule, both: bool = False):
    """Dual key+chord classifier (cond ref :67-85)."""
    key_logits, chord_logits = classifier(x, t)
    if both:
        rule_key = rule[:, 0].astype(jnp.int32)
        rule_chord = rule[:, 1:].astype(jnp.int32)
        key_lp = _xent_logprob(key_logits, rule_key)
        chord_lp = _xent_logprob(chord_logits, rule_chord).mean(axis=-1)
        return key_lp + chord_lp
    rule_chord = rule.astype(jnp.int32)
    return _xent_logprob(chord_logits, rule_chord).mean(axis=-1)


def nn_z0_mse_logprob(classifier, x, t, rule):
    """DPS classifier at t=0 (cond ref :109-115)."""
    logits = classifier(x, jnp.zeros((x.shape[0],), dtype=jnp.float32))
    return _mse_logprob(logits, rule)


def nn_z0_chord_logprob(classifier, x, t, rule, both: bool = False):
    t0 = jnp.zeros((x.shape[0],), dtype=jnp.float32)
    key_logits, chord_logits = classifier(x, t0)
    if both:
        rule_key = rule[:, 0].astype(jnp.int32)
        rule_chord = rule[:, 1:].astype(jnp.int32)
        key_lp = _xent_logprob(key_logits, rule_key)
        chord_lp = _xent_logprob(chord_logits, rule_chord).mean(axis=-1)
        return key_lp + chord_lp
    return _xent_logprob(chord_logits, rule.astype(jnp.int32)).mean(axis=-1)


def rule_x0_mse_logprob(rule_name, x, t, rule):
    """Differentiable-surrogate rule on decoded x0 (cond ref :126-138)."""
    logits = FUNC_DICT[rule_name](x)
    return _mse_logprob(logits, rule)


# Supported cond_fn names from the YAML schema (reference
# condition_functions.py function_map :149-158) — CondFnSpec.logprob
# dispatches on exactly this set.
COND_FN_NAMES = (
    "grad_nn_zt_mse", "grad_nn_zt_xentropy", "grad_nn_zt_chord",
    "nn_z0_mse_dummy", "nn_z0_chord_dummy", "nn_z0_mse",
    "rule_x0_mse_dummy", "rule_x0_mse",
)


@dataclass(frozen=True)
class CondFnSpec:
    """One term of a composite cond_fn (one row of the YAML cond_fn block)."""

    fn: str                       # reference function name
    rule_name: str
    scale: float = 1.0
    classifier: Optional[Callable] = None   # (x, t) -> logits (or tuple)

    def logprob(self, x, t, rules) -> jnp.ndarray:
        rule = rules[self.rule_name]
        if self.fn == "grad_nn_zt_mse":
            return nn_zt_mse_logprob(self.classifier, x, t, rule) * self.scale
        if self.fn == "grad_nn_zt_xentropy":
            return nn_zt_xentropy_logprob(self.classifier, x, t, rule)
        if self.fn == "grad_nn_zt_chord":
            return nn_zt_chord_logprob(self.classifier, x, t, rule) * self.scale
        if self.fn == "nn_z0_mse_dummy":
            return nn_z0_mse_logprob(self.classifier, x, t, rule) * self.scale
        if self.fn == "nn_z0_chord_dummy":
            return nn_z0_chord_logprob(self.classifier, x, t, rule) * self.scale
        if self.fn == "nn_z0_mse":
            return nn_z0_mse_logprob(self.classifier, x, t, rule) * self.scale
        if self.fn in ("rule_x0_mse_dummy", "rule_x0_mse"):
            return rule_x0_mse_logprob(self.rule_name, x, t, rule) * self.scale
        raise NotImplementedError(self.fn)


def make_grad_cond_fn(specs: Sequence[CondFnSpec]) -> Callable:
    """Composite classifier-guidance cond_fn: sum of per-spec log-prob
    gradients w.r.t. x (cond ref composite_nn_zt :161-167)."""

    def total_logprob(x, t, rules):
        return sum(spec.logprob(x, t, rules) for spec in specs).sum()

    def cond_fn(x, t, rules):
        return jax.grad(total_logprob, argnums=0)(x, t, rules)

    return cond_fn


def make_value_cond_fn(specs: Sequence[CondFnSpec]) -> Callable:
    """Composite DPS cond_fn: per-example summed log-probs (B,)
    (cond ref composite_rule :170-174 / nn_z0_* family)."""

    def cond_fn(x, t, rules):
        return sum(spec.logprob(x, t, rules) for spec in specs)

    return cond_fn


def make_model_fn(
    model_apply: Callable,
    num_classes: int,
    class_cond: bool = True,
    cfg: bool = False,
    w: float = 0.0,
) -> Callable:
    """Class-conditional denoiser closure with optional CFG
    ``(1+w) eps_c - w eps_null`` (cond ref model_fn :17-27).

    ``model_apply(x, t, y)`` is the raw network. The null class id is
    ``num_classes`` (the extra CFG-dropout row).
    """

    def model_fn(x, t, y=None):
        y_null = jnp.full((x.shape[0],), num_classes, dtype=jnp.int32)
        if not class_cond or y is None:
            return model_apply(x, t, y_null)
        if cfg:
            # One batched call for cond + uncond halves (TPU-friendly).
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            y2 = jnp.concatenate([y.astype(jnp.int32), y_null], axis=0)
            eps2 = model_apply(x2, t2, y2)
            eps_c, eps_u = jnp.split(eps2, 2, axis=0)
            return (1 + w) * eps_c - w * eps_u
        return model_apply(x, t, y)

    return model_fn


def guide_schedule_mask(t, t_start: int, t_end: int, interval: int):
    """Traced guidance-schedule predicate (ref gaussian_diffusion.py:1398-1400)."""
    return (t < t_start) & (t >= t_end) & ((t + 1) % interval == 0)
