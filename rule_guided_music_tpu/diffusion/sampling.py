"""Whole-chain on-device samplers: DDPM / DDIM / DPM-Solver++ / SCG / edit
in one scan.

The reference runs its reverse chain as a host-side Python loop calling
p_sample 1000 times (gaussian_diffusion.py:809-879), with SCG branching,
classifier guidance and chord scoring crossing the host boundary every step.
Here the ENTIRE chain — including the k-candidate SCG search and on-device
rule scoring — compiles to a single ``jax.lax.scan``:

  * per-step constants are table gathers (schedule.py), so DDPM, DDIM and
    any respacing share one scan body;
  * SCG (gaussian_diffusion.py:491-633) becomes a leading candidate axis of
    size k: one (k*B)-batched denoiser call, one batched VAE decode, one
    batched rule evaluation, one argmax — no host sync anywhere;
  * classifier guidance / DPS (condition_mean :387-465, condition_score
    :467-489) are jax.grad through classifiers / the denoiser+decoder;
  * the guidance schedule (guide_schedule :1398-1400) is a traced predicate
    driving ``lax.cond`` so unguided steps skip the SCG branch entirely;
  * replacement-based editing (p_mean_variance :293-298, loop init
    :841-852) is a masked x0 substitution + noised-gt chain start.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from ..rules.registry import FUNC_DICT, LOSS_DICT
from . import gaussian as gd
from .guidance import guide_schedule_mask
from .schedule import Tables


@dataclass(frozen=True)
class GuidanceConfig:
    """YAML ``guidance:`` block (scripts/configs/**) minus the cond_fn spec."""

    method: str = "no_guidance"     # classifier_guidance | dps | no_guidance
    schedule: bool = False
    t_start: int = 750
    t_end: int = 0
    interval: int = 1
    step_size: float = 1.0          # DPS step size
    nn: bool = False                # DPS: cond_fn sees latents (True) or decoded rolls
    vae: bool = True                # decode x0 before rule/DPS scoring


@dataclass(frozen=True)
class SCGConfig:
    """YAML ``scg:`` block: branching factor + per-rule selection weights."""

    num_samples: int = 16
    weights: Tuple[Tuple[str, float], ...] = ()
    dc_base: int = 0                # windowed selection base (latent cols); 0 = off
    decode_chunks: int = 1          # serialize the candidate decode+scoring in
                                    # this many groups (lax.map) to cap HBM use
    # Hybrid "trust-but-verify" selection: the rule-feature head ranks all
    # k candidates (decode-free), then only the top `prefilter` survivors
    # are decoded and re-ranked by the real rule programs.  Caps the
    # decode bill at prefilter/k of full SCG while anchoring the final
    # pick on decoded evidence — a pure feature-head argmin at k=16 lets
    # selection pressure exploit head errors (measured: all-rules nd loss
    # 9.99 vs 3.61 unguided, docs/allrules_gate_study.json), which the
    # decode re-rank removes.  0 = off.  Requires BOTH scoring_feature_fn
    # and a decode path; incompatible with dc_base windowed selection.
    prefilter: int = 0

    def weight(self, rule_name: str) -> float:
        return dict(self.weights).get(rule_name, 1.0)


@dataclass(frozen=True)
class EditConfig:
    """YAML ``edit:`` block: replacement-based excerpt editing."""

    noise_level: int = 500
    l_start: int = 0                # editable latent-time slice [l_start, l_end)
    l_end: int = 128


@dataclass(frozen=True)
class SamplerConfig:
    sampler: str = "ddpm"           # ddpm | ddim | dpmpp
    eta: float = 1.0                # DDIM eta (reference uses eta=1)
    # dpmpp = DPM-Solver++ multistep (data-prediction, arXiv 2211.01095),
    # a beyond-reference deterministic ODE sampler: order 1 is analytically
    # DDIM(eta=0); order 2 (the "2M" scheme) reuses the previous step's x̂0
    # through the scan carry for a second-order update at the same model
    # cost per step — 10-20 steps match many-step DDIM trajectories on the
    # probability-flow ODE. Deterministic, so incompatible with SCG (all k
    # candidates would coincide) unless dpmpp_sde below is set; classifier
    # guidance applies in eps space exactly as in the DDIM branch.
    dpmpp_order: int = 2            # 1 | 2 (sampler == "dpmpp" only)
    # SDE-DPM-Solver++ (arXiv 2211.01095 app. SDE variant; diffusers'
    # "sde-dpmsolver++"): the same exponential integrator in x̂0 space but
    # discretizing the reverse-time SDE instead of the probability-flow
    # ODE — the drift contracts x_t by e^{−h} and each step injects fresh
    # noise with σ_{t-1}·sqrt(1 − e^{−2h}), preserving the exact reverse
    # marginals (pinned distributionally in tests/test_dpmpp_sde.py). The
    # stochastic step makes the k SCG candidates genuinely diverge, so
    # rule-guided SCG selection works on a 10-20 step chain — the
    # reference's SCG exists only on 1000/100-step ancestral chains
    # (gaussian_diffusion.py:491-592).
    dpmpp_sde: bool = False
    mean_type: gd.ModelMeanType = gd.ModelMeanType.EPSILON
    var_type: gd.ModelVarType = gd.ModelVarType.FIXED_LARGE
    clip_denoised: bool = False
    t_end: int = 0                  # early stop (sampling.t_end)
    guidance: Optional[GuidanceConfig] = None
    scg: Optional[SCGConfig] = None
    edit: Optional[EditConfig] = None
    # Cross-step model-output reuse (SmoothCache/FORA-family accelerator,
    # PAPERS.md arXiv 2411.10510): recompute the TRAJECTORY denoiser output
    # only every `reuse_interval` steps and reuse the cached output on the
    # steps in between (eps varies slowly along the chain). 0/1 = off.
    # Approximation of the trajectory — NOT selection-only like the scoring
    # substitutes — so it is opt-in and quality-gated on the learned fixture
    # (tests/test_reuse.py). The SCG rollout, rule scoring and guidance
    # gradients always run fresh every step; the first executed step always
    # refreshes. Incompatible with segmented chains (t_begin/t_stop): the
    # cache cannot cross dispatch boundaries.
    reuse_interval: int = 0
    # Reuse is only sound where the chain is FINE-GRAINED in noise level:
    # x̂0 = (x - sqrt(1-ᾱ)·eps)/sqrt(ᾱ) amplifies a stale eps by 1/sqrt(ᾱ_t),
    # which explodes at high t (measured: reuse_interval=2 on a 16-step
    # ancestral chain is 6x WORSE than no guidance — docs/PERF.md round-3
    # envelope). Steps with t >= reuse_t_max therefore always refresh;
    # -1 disables the window (reuse everywhere — only for chains whose
    # step spacing is already fine, e.g. >= 100 steps).
    reuse_t_max: int = -1
    record: bool = False
    # Also stack per-step sampler states x_{t-1} into the record (memory:
    # steps x B x C x H x W) — the reference --record's intermediate
    # piano-roll dumps (gaussian_diffusion.py:594-632); decode host-side.
    record_states: bool = False


def _split_eps(model_output: jnp.ndarray, var_type: gd.ModelVarType) -> jnp.ndarray:
    """The epsilon half of the model output when variance is learned."""
    if var_type in (gd.ModelVarType.LEARNED, gd.ModelVarType.LEARNED_RANGE):
        return jnp.split(model_output, 2, axis=1)[0]
    return model_output


def _bcast(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def _tile(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Repeat batch k times with candidate-major order (012012...), matching
    the reference's expand/repeat pairing (gaussian_diffusion.py:509-517)."""
    return jnp.concatenate([a] * k, axis=0)


def _scg_select(
    config: SamplerConfig,
    tables: Tables,
    model_fn: Callable,
    decode_fn: Optional[Callable],
    rules: Mapping[str, jnp.ndarray],
    rng: jnp.ndarray,
    mean: jnp.ndarray,
    g_coeff: jnp.ndarray,
    t: jnp.ndarray,
    y: Optional[jnp.ndarray],
    scoring_model_fn: Optional[Callable] = None,
    scoring_feature_fn: Optional[Callable] = None,
):
    """One SCG search step: sample k candidates, one-step rollout, score,
    argmax (gaussian_diffusion.py:491-592).

    ``scoring_model_fn``: optional cheaper denoiser for the k-candidate
    rollout — the rollout exists only to RANK candidates (its x̂0 estimate
    never enters the trajectory; the selected candidate itself came from
    the full model's mean/σ), so like the light scoring decoder this is a
    selection-only substitution (reference semantics:
    gaussian_diffusion.py:518-524 uses one model for both, but only
    selection is throughput-critical).

    ``scoring_feature_fn``: optional rule-feature head (models/scoring_head
    .py): maps x̂0 latents directly to a {rule_name: feature} dict in the
    FUNC_DICT output contract, skipping the candidate VAE decode entirely.
    Selection-only like the other scoring substitutes.
    """
    scg = config.scg
    k = scg.num_samples
    b = mean.shape[0]
    rollout_fn = scoring_model_fn if scoring_model_fn is not None else model_fn
    noise = jax.random.normal(rng, (k,) + mean.shape, dtype=mean.dtype)
    candidates = mean[None] + g_coeff[None] * noise          # (k, B, C, T, P)
    flat = candidates.reshape((k * b,) + mean.shape[1:])

    t_k = _tile(t, k)
    y_k = _tile(y, k) if y is not None else None
    has_y = y_k is not None

    def rollout_and_decode(args):
        flat_g, t_g, y_g = args
        model_out = rollout_fn(flat_g, tables.model_t[t_g],
                               y_g if has_y else None)
        eps = _split_eps(model_out, config.var_type)
        x0 = gd.predict_xstart_from_eps(tables, flat_g, t_g, eps)
        if config.edit is not None:
            x0 = x0[:, :, config.edit.l_start:config.edit.l_end, :]
        if scoring_feature_fn is not None:
            return scoring_feature_fn(x0)        # {rule: (g, D)} — no decode
        if decode_fn is not None:
            x0 = decode_fn(x0)                               # (g, 3, 128, L)
        return x0

    # Serialize the one-step rollout + decode over candidate groups
    # (lax.map): the 512-chunk decode working set otherwise spills HBM.
    # Measured (docs/PERF.md): grouping rollout+decode together beats both
    # the unchunked path and decode-only chunking — small interleaved
    # model+decode groups pipeline better than one giant decode buffer
    # (0.582 unchunked -> 0.712 at 32 groups; decode-only chunking 0.66).
    n_chunks = max(int(config.scg.decode_chunks), 1)

    m = int(scg.prefilter or 0)
    if (m > 0 and scoring_feature_fn is not None and decode_fn is not None
            and scg.dc_base <= 0):
        return _scg_select_prefilter(
            config, tables, rollout_fn, decode_fn, scoring_feature_fn,
            rules, candidates, flat, t_k, y_k, has_y, n_chunks, k, b,
            min(m, k))
    if n_chunks > 1 and (k * b) % n_chunks == 0:
        g = k * b // n_chunks
        grouped = (
            flat.reshape(n_chunks, g, *flat.shape[1:]),
            t_k.reshape(n_chunks, g),
            (y_k.reshape(n_chunks, g) if has_y else
             jnp.zeros((n_chunks, g), dtype=jnp.int32)),
        )
        pred_xstart = jax.lax.map(rollout_and_decode, grouped)
        pred_xstart = jax.tree_util.tree_map(
            lambda a: a.reshape(k * b, *a.shape[2:]), pred_xstart)
    else:
        pred_xstart = rollout_and_decode((flat, t_k, y_k))

    record: Dict[str, jnp.ndarray] = {}

    if scg.dc_base <= 0:
        total_log_prob = 0.0
        for rule_name, target in rules.items():
            if scoring_feature_fn is not None:
                gen_rule = pred_xstart[rule_name]
            else:
                gen_rule = FUNC_DICT[rule_name](pred_xstart)
            target_k = _tile(target, k)
            log_prob = -LOSS_DICT[rule_name](gen_rule, target_k)
            if config.record:
                record[f"loss/{rule_name}"] = (
                    -log_prob.reshape(k, b).max(axis=0).mean()
                )
            total_log_prob = total_log_prob + log_prob * scg.weight(rule_name)
        total_log_prob = total_log_prob.reshape(k, b)
        max_ind = jnp.argmax(total_log_prob, axis=0)         # (B,)
        selected = candidates[max_ind, jnp.arange(b)]
        if config.record:
            best = jnp.take_along_axis(total_log_prob, max_ind[None], axis=0)[0]
            record["log_prob"] = best.mean()
            record["loss_std"] = total_log_prob.std()
            record["loss_range"] = jnp.abs(
                best.mean() - total_log_prob.min()
            )
            # full per-candidate matrix: the reference's per-step candidate
            # loss bar charts (gaussian_diffusion.py:622-632)
            record["candidate_log_prob"] = total_log_prob
    else:
        # Windowed selection for DiffCollage long scores: argmax per
        # dc_base-sized window (gaussian_diffusion.py:562-592).
        total_length = pred_xstart.shape[-1]
        base_pix = scg.dc_base * 8
        rule_base = scg.dc_base // 16     # 1.28 s windows per base
        sub_samples = []
        for i, start in enumerate(range(0, total_length, base_pix)):
            end = min(start + base_pix, total_length)
            window = pred_xstart[:, :, :, start:end]
            total_log_prob = 0.0
            for rule_name, target in rules.items():
                if rule_name.startswith("note_density"):
                    half = target.shape[-1] // 2
                    vt = target[:, :half][:, i * rule_base:min((i + 1) * rule_base, half)]
                    hr = target[:, half:][:, i * rule_base:min((i + 1) * rule_base, half)]
                    target_w = jnp.concatenate([vt, hr], axis=-1)
                elif "chord" in rule_name:
                    rl = target.shape[-1]
                    target_w = target[:, i * rule_base:min((i + 1) * rule_base, rl)]
                else:
                    target_w = target
                gen_rule = FUNC_DICT[rule_name](window)
                log_prob = -LOSS_DICT[rule_name](gen_rule, _tile(target_w, k))
                total_log_prob = total_log_prob + log_prob * scg.weight(rule_name)
            total_log_prob = total_log_prob.reshape(k, b)
            max_ind = jnp.argmax(total_log_prob, axis=0)
            sub = candidates[max_ind, jnp.arange(b), :, start // 8:end // 8, :]
            sub_samples.append(sub)
        selected = jnp.concatenate(sub_samples, axis=-2)
        if config.record:
            record["log_prob"] = total_log_prob.max(axis=0).mean()
            record["loss_std"] = total_log_prob.std()
            record["loss_range"] = jnp.abs(
                total_log_prob.max() - total_log_prob.min()
            )

    return selected, record


def _scg_select_prefilter(
    config: SamplerConfig,
    tables: Tables,
    rollout_fn: Callable,
    decode_fn: Callable,
    scoring_feature_fn: Callable,
    rules: Mapping[str, jnp.ndarray],
    candidates: jnp.ndarray,
    flat: jnp.ndarray,
    t_k: jnp.ndarray,
    y_k: Optional[jnp.ndarray],
    has_y: bool,
    n_chunks: int,
    k: int,
    b: int,
    m: int,
):
    """Hybrid SCG selection (SCGConfig.prefilter): the rule-feature head
    scores all k candidate rollouts decode-free, the top-m survivors are
    decoded and re-ranked by the real FUNC_DICT/LOSS_DICT programs, and
    the final pick is the decode-ranked best.

    Rationale: a pure head argmin is adversarial to its own errors — the
    argmin over k perturbations lands exactly where the head UNDER-
    predicts loss, so head noise becomes selection bias (Goodhart).  The
    decode re-rank bounds that failure: the worst case is a top-m set
    that misses the global-best candidate, never an actively bad pick.
    Decode cost drops from k to m per step.  Selection-only, like every
    scoring substitute (reference semantics: gaussian_diffusion.py:518-560
    always decodes all k)."""
    scg = config.scg

    def rollout_x0(args):
        flat_g, t_g, y_g = args
        model_out = rollout_fn(flat_g, tables.model_t[t_g],
                               y_g if has_y else None)
        eps = _split_eps(model_out, config.var_type)
        x0 = gd.predict_xstart_from_eps(tables, flat_g, t_g, eps)
        if config.edit is not None:
            x0 = x0[:, :, config.edit.l_start:config.edit.l_end, :]
        return x0

    if n_chunks > 1 and (k * b) % n_chunks == 0:
        g = k * b // n_chunks
        grouped = (
            flat.reshape(n_chunks, g, *flat.shape[1:]),
            t_k.reshape(n_chunks, g),
            (y_k.reshape(n_chunks, g) if has_y else
             jnp.zeros((n_chunks, g), dtype=jnp.int32)),
        )
        x0_all = jax.lax.map(rollout_x0, grouped)
        x0_all = x0_all.reshape(k * b, *x0_all.shape[2:])
    else:
        x0_all = rollout_x0((flat, t_k, y_k))

    feats = scoring_feature_fn(x0_all)
    head_lp = 0.0
    for rule_name, target in rules.items():
        head_lp = head_lp + (
            -LOSS_DICT[rule_name](feats[rule_name], _tile(target, k))
            * scg.weight(rule_name))
    head_lp = head_lp.reshape(k, b)

    top = jax.lax.top_k(head_lp.T, m)[1].T                    # (m, B)
    x0_kb = x0_all.reshape(k, b, *x0_all.shape[1:])
    idx = top.reshape(m, b, *([1] * (x0_all.ndim - 1)))
    x0_top = jnp.take_along_axis(x0_kb, idx, axis=0).reshape(
        m * b, *x0_all.shape[1:])

    dec_chunks = n_chunks if (n_chunks > 1 and (m * b) % n_chunks == 0) else 1
    if dec_chunks > 1:
        gsz = m * b // dec_chunks
        decoded = jax.lax.map(
            decode_fn, x0_top.reshape(dec_chunks, gsz, *x0_top.shape[1:]))
        decoded = decoded.reshape(m * b, *decoded.shape[2:])
    else:
        decoded = decode_fn(x0_top)

    record: Dict[str, jnp.ndarray] = {}
    full_lp = 0.0
    for rule_name, target in rules.items():
        gen_rule = FUNC_DICT[rule_name](decoded)
        lp = -LOSS_DICT[rule_name](gen_rule, _tile(target, m))
        if config.record:
            record[f"loss/{rule_name}"] = -lp.reshape(m, b).max(axis=0).mean()
        full_lp = full_lp + lp * scg.weight(rule_name)
    full_lp = full_lp.reshape(m, b)

    sel = jnp.argmax(full_lp, axis=0)                         # (B,)
    max_ind = jnp.take_along_axis(top, sel[None], axis=0)[0]  # (B,)
    selected = candidates[max_ind, jnp.arange(b)]
    if config.record:
        best = jnp.take_along_axis(full_lp, sel[None], axis=0)[0]
        record["log_prob"] = best.mean()
        record["loss_std"] = head_lp.std()
        record["loss_range"] = jnp.abs(best.mean() - head_lp.min())
        record["candidate_log_prob"] = head_lp
    return selected, record


def _empty_record(config: SamplerConfig, rules: Mapping[str, jnp.ndarray],
                  b: int = 0):
    rec = {}
    if not config.record:
        return rec
    rec["log_prob"] = jnp.float32(0)
    rec["loss_std"] = jnp.float32(0)
    rec["loss_range"] = jnp.float32(0)
    if config.scg is not None and config.scg.dc_base <= 0:
        for rule_name in rules:
            rec[f"loss/{rule_name}"] = jnp.float32(0)
        rec["candidate_log_prob"] = jnp.zeros(
            (config.scg.num_samples, b), dtype=jnp.float32
        )
    return rec


def _dps_mean_shift(
    config: SamplerConfig,
    tables: Tables,
    model_fn: Callable,
    decode_fn: Optional[Callable],
    cond_fn: Callable,
    rules,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y,
    pmv: gd.PMeanVar,
):
    """DPS guidance: differentiate log p(y | x̂0(x_t)) through the denoiser
    (and optionally the VAE decoder), 1/sqrt(-logp) normalization
    (gaussian_diffusion.py:415-463)."""
    g = config.guidance
    model_t = tables.model_t[t]

    def logp_sum(xin):
        model_out = model_fn(xin, model_t, y)
        eps = _split_eps(model_out, config.var_type)
        x0 = gd.predict_xstart_from_eps(tables, xin, t, eps)
        if decode_fn is not None and not g.nn:
            x0 = decode_fn(x0)
        if config.edit is not None:
            x0 = x0[:, :, config.edit.l_start:config.edit.l_end, :]
        lp = cond_fn(x0, model_t, rules)
        return lp.sum(), lp

    gradient, log_probs = jax.grad(logp_sum, has_aux=True)(x)
    gradient = gradient / jnp.sqrt(
        _bcast(-log_probs, x.ndim) + 1e-12
    )
    if config.edit is None:
        return pmv.mean + g.step_size * gradient
    sl = slice(config.edit.l_start, config.edit.l_end)
    return pmv.mean.at[:, :, sl, :].add(g.step_size * gradient[:, :, sl, :])


def _classifier_mean_shift(
    config: SamplerConfig,
    tables: Tables,
    cond_fn: Callable,
    rules,
    x: jnp.ndarray,
    t: jnp.ndarray,
    pmv: gd.PMeanVar,
):
    """Sohl-Dickstein mean shift: mean + variance * grad log p(y|x_t)
    (gaussian_diffusion.py:401-414)."""
    model_t = tables.model_t[t]
    if config.edit is None:
        gradient = cond_fn(x, model_t, rules)
        return pmv.mean + pmv.variance * gradient
    sl = slice(config.edit.l_start, config.edit.l_end)
    gradient = cond_fn(x[:, :, sl, :], model_t, rules)
    return pmv.mean.at[:, :, sl, :].add(pmv.variance[:, :, sl, :] * gradient)


def sample_loop(
    rng: jnp.ndarray,
    model_fn: Callable,
    shape: Tuple[int, ...],
    tables: Tables,
    config: SamplerConfig,
    *,
    y: Optional[jnp.ndarray] = None,
    rules: Optional[Mapping[str, jnp.ndarray]] = None,
    cond_fn: Optional[Callable] = None,
    decode_fn: Optional[Callable] = None,
    edit_gt: Optional[jnp.ndarray] = None,
    edit_mask: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
    scoring_model_fn: Optional[Callable] = None,
    scoring_feature_fn: Optional[Callable] = None,
    t_begin: Optional[int] = None,
    t_stop: Optional[int] = None,
):
    """Run the full reverse chain; returns (sample, record_dict).

    ``model_fn(x, model_t, y)`` is the (possibly CFG/DiffCollage-wrapped)
    denoiser closure. Everything is jit-compatible; wrap in jax.jit with this
    function closed over static config.

    ``t_begin``/``t_stop`` (static ints) bound the scan to the segment of
    steps [t_begin-1 .. t_stop]; pass the previous segment's output as
    ``noise`` to continue a chain across multiple dispatches (resumable /
    streaming sampling; also keeps any single device dispatch under RPC
    deadlines on remote-attached accelerators).  Unlike ``config.t_end``
    they do NOT change the noise/SCG boundary masks, so a segmented chain
    runs the same per-step program as a contiguous one.
    """
    if (scoring_feature_fn is not None and config.scg is not None
            and config.scg.dc_base > 0):
        raise ValueError(
            "scoring_feature_fn is incompatible with windowed SCG selection "
            "(scg.dc_base > 0): the feature head pools fixed 16-col windows; "
            "use the decode path for DiffCollage windowed selection"
        )
    rules = dict(rules or {})
    b = shape[0]
    num_steps = tables.num_timesteps
    g = config.guidance
    reuse_n = int(config.reuse_interval or 0)
    if reuse_n > 1 and (t_begin is not None or t_stop is not None):
        raise ValueError(
            "reuse_interval > 1 is incompatible with segmented chains "
            "(t_begin/t_stop): the model-output cache cannot cross dispatch "
            "boundaries; run the chain contiguously or disable reuse"
        )
    if config.sampler not in ("ddpm", "ddim", "dpmpp"):
        raise ValueError(f"unknown sampler {config.sampler!r}")
    if (config.sampler == "dpmpp" and config.scg is not None
            and not config.dpmpp_sde):
        raise ValueError(
            "SCG requires a stochastic sampler (ddpm, ddim with eta > 0, or "
            "dpmpp with dpmpp_sde=True): the deterministic DPM-Solver++ ODE "
            "makes all k SCG candidates coincide; set dpmpp_sde=True for "
            "few-step rule-guided SCG chains"
        )
    if config.dpmpp_sde and config.sampler != "dpmpp":
        raise ValueError(
            "dpmpp_sde=True only applies to sampler='dpmpp' "
            f"(got sampler={config.sampler!r})"
        )
    if config.sampler == "dpmpp" and config.dpmpp_order not in (1, 2):
        raise ValueError(
            f"dpmpp_order must be 1 or 2, got {config.dpmpp_order} "
            "(only the 2M multistep scheme is implemented)"
        )
    # 2M multistep state (previous step's x̂0 + λ) rides the scan carry;
    # like the reuse cache it cannot cross segmented-dispatch boundaries.
    dpmpp_multistep = config.sampler == "dpmpp" and config.dpmpp_order >= 2
    if dpmpp_multistep and (t_begin is not None or t_stop is not None):
        raise ValueError(
            "dpmpp order 2 is incompatible with segmented chains "
            "(t_begin/t_stop): the multistep x̂0 history cannot cross "
            "dispatch boundaries; use dpmpp_order=1 or run contiguously"
        )

    rng, init_rng = jax.random.split(rng)
    if noise is not None:
        x_init = noise
        start_t = (t_begin - 1) if t_begin is not None else num_steps - 1
    elif config.edit is not None:
        nl = config.edit.noise_level
        t0 = jnp.full((b,), nl - 1, dtype=jnp.int32)
        acp = gd._extract(tables.alphas_cumprod, t0, len(shape))
        x_init = jnp.sqrt(acp) * edit_gt + jnp.sqrt(1 - acp) * jax.random.normal(
            init_rng, shape
        )
        start_t = nl - 1
    else:
        x_init = jax.random.normal(init_rng, shape)
        start_t = num_steps - 1

    scan_end = t_stop if t_stop is not None else config.t_end
    ts = jnp.arange(start_t, scan_end - 1, -1)

    def step(carry, t_scalar):
        x, rng = carry["x"], carry["rng"]
        cached_out = carry.get("cache")
        rng, noise_rng, scg_rng = jax.random.split(rng, 3)
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        model_t = tables.model_t[t]
        pos = start_t - t_scalar

        if reuse_n > 1:
            # SmoothCache/FORA-style trajectory reuse: recompute every
            # reuse_n-th executed step (position counted from the chain
            # start, so the first step ALWAYS refreshes — the cache is
            # never consumed uninitialized), reuse the cached output
            # otherwise. fp32 cache keeps the cond branches dtype-matched.
            refresh = (pos % reuse_n) == 0
            if config.reuse_t_max >= 0:
                # high-t guard: stale-eps amplification by 1/sqrt(ᾱ_t)
                refresh = refresh | (t_scalar >= config.reuse_t_max)
            model_out = jax.lax.cond(
                refresh,
                lambda xx: model_fn(xx, model_t, y).astype(jnp.float32),
                lambda xx: cached_out,
                x,
            )
            cached_out = model_out
        else:
            model_out = model_fn(x, model_t, y)
        pmv = gd.p_mean_variance(
            tables, model_out, x, t,
            mean_type=config.mean_type, var_type=config.var_type,
            clip_denoised=config.clip_denoised,
            edit_mask=edit_mask, edit_gt=edit_gt,
        )

        if g is not None and g.schedule:
            use_guidance = guide_schedule_mask(
                t_scalar, g.t_start, g.t_end, g.interval
            )
        elif g is not None:
            use_guidance = jnp.bool_(True)
        else:
            use_guidance = jnp.bool_(False)

        # --- guided mean (classifier / DPS) -------------------------------
        mean = pmv.mean
        if cond_fn is not None and g is not None and config.sampler == "ddpm":
            # With SCG active, classifier guidance applies on every step; the
            # schedule gates only the SCG search (p_sample :691-696).
            if g.method == "dps":
                guided_mean = _dps_mean_shift(
                    config, tables, model_fn, decode_fn, cond_fn, rules,
                    x, t, y, pmv,
                )
            else:
                guided_mean = _classifier_mean_shift(
                    config, tables, cond_fn, rules, x, t, pmv
                )
            if config.scg is not None:
                mean = guided_mean
            else:
                mean = jnp.where(use_guidance, guided_mean, pmv.mean)
            pmv = pmv._replace(mean=mean)

        dpmpp_state = None
        if config.sampler == "ddpm":
            g_coeff = jnp.exp(0.5 * pmv.log_variance)
            base_mean = pmv.mean
        else:
            # DDIM / DPM-Solver++: condition_score guidance in eps space
            # (ddim_sample :924-925) applies identically to both.
            pred_xstart = pmv.pred_xstart
            eps = pmv.eps
            if cond_fn is not None and g is not None and g.method != "dps":
                acp_t = gd._extract(tables.alphas_cumprod, t, x.ndim)
                grad = cond_fn(x, model_t, rules)
                eps_g = eps - jnp.sqrt(1 - acp_t) * grad
                x0_g = gd.predict_xstart_from_eps(tables, x, t, eps_g)
                take = use_guidance
                eps = jnp.where(take, eps_g, eps)
                pred_xstart = jnp.where(take, x0_g, pred_xstart)
            acp = gd._extract(tables.alphas_cumprod, t, x.ndim)
            acp_prev = gd._extract(tables.alphas_cumprod_prev, t, x.ndim)
            if config.sampler == "ddim":
                sigma = (
                    config.eta
                    * jnp.sqrt((1 - acp_prev) / (1 - acp))
                    * jnp.sqrt(1 - acp / acp_prev)
                )
                base_mean = (
                    pred_xstart * jnp.sqrt(acp_prev)
                    + jnp.sqrt(jnp.maximum(1 - acp_prev - sigma**2, 0.0)) * eps
                )
                g_coeff = sigma
            else:
                # DPM-Solver++ (data prediction, arXiv 2211.01095 eq. 4.8):
                # exponential-integrator update in λ = log(α/σ) space,
                #   x_{t-1} = (σ_{t-1}/σ_t)·x_t − α_{t-1}·(e^{−h} − 1)·D,
                # h = λ_{t-1} − λ_t. Order 1 (D = x̂0_t) is analytically
                # DDIM(eta=0); the 2M scheme extrapolates D from the
                # previous step's x̂0 carried through the scan:
                #   D = (1 + 1/(2r))·x̂0_t − (1/(2r))·x̂0_prev, r = h_prev/h.
                # σ_{t-1} is clamped away from 0 so the final step reduces
                # smoothly to x = α_0·D (e^{−h} → 0 as λ_{t-1} → ∞).
                alpha_t = jnp.sqrt(acp)
                sigma_t = jnp.sqrt(1.0 - acp)
                alpha_p = jnp.sqrt(acp_prev)
                sigma_p = jnp.sqrt(jnp.maximum(1.0 - acp_prev, 1e-24))
                lam_t = jnp.log(alpha_t) - jnp.log(sigma_t)
                lam_p = jnp.log(alpha_p) - jnp.log(sigma_p)
                h = lam_p - lam_t
                d_bar = pred_xstart
                if dpmpp_multistep:
                    h_prev = lam_t - carry["prev_lam"]
                    # first executed step has no history -> order-1 update;
                    # the where() also masks the then-meaningless r.
                    # FINAL step also drops to order 1 (diffusers
                    # lower_order_final): there λ_{t-1} -> ∞ exists only
                    # through the σ clamp, so the 2M coefficient
                    # 1/(2r) = h/(2·h_prev) would amplify the last x̂0 jump
                    # by an arbitrary clamp-determined factor (~4x at
                    # N=20); order 1 at σ=0 is exactly x = α_0·x̂0.
                    r = h_prev / h
                    corr = 1.0 / (2.0 * r)
                    d2 = (1.0 + corr) * pred_xstart - corr * carry["prev_x0"]
                    use2 = (pos > 0) & (t_scalar != scan_end)
                    d_bar = jnp.where(use2, d2, pred_xstart)
                if config.dpmpp_sde:
                    # SDE-DPM-Solver++: same exponential integrator applied
                    # to the reverse SDE — the x_t term contracts by e^{−h}
                    # and the matching fresh-noise scale σ_{t-1}·√(1−e^{−2h})
                    # keeps the per-step transition kernel exact for linear
                    # (constant-x̂0) models. Note 1−e^{−2h} = −expm1(−2h).
                    one_m_e2h = -jnp.expm1(-2.0 * h)
                    base_mean = ((sigma_p / sigma_t) * jnp.exp(-h) * x
                                 + alpha_p * one_m_e2h * d_bar)
                    g_coeff = sigma_p * jnp.sqrt(one_m_e2h)
                else:
                    base_mean = ((sigma_p / sigma_t) * x
                                 - alpha_p * jnp.expm1(-h) * d_bar)
                    g_coeff = jnp.zeros_like(sigma_p)
                dpmpp_state = (pred_xstart.astype(x.dtype),
                               lam_t.astype(jnp.float32))

        # --- next-state sampling (plain vs SCG search) --------------------
        if config.sampler == "dpmpp" and not config.dpmpp_sde:
            # deterministic ODE step: g_coeff is structurally zero — skip
            # the full-state normal sample (XLA won't fold x*0 to 0)
            plain_sample = base_mean
        else:
            plain_noise = jax.random.normal(noise_rng, x.shape, dtype=x.dtype)
            if config.sampler == "ddpm":
                nonzero = (t_scalar > config.t_end).astype(x.dtype)
            else:
                # ddim / sde-dpmpp: at the boundary step the bare mean is
                # returned (for sde-dpmpp the σ_p clamp already drives
                # g_coeff to ~1e-12 there; the mask makes it exact).
                nonzero = (t_scalar != config.t_end).astype(x.dtype)
            plain_sample = base_mean + nonzero * g_coeff * plain_noise

        if config.scg is not None:
            def scg_branch(args):
                rng_, mean_, coeff_ = args
                sel, rec = _scg_select(
                    config, tables, model_fn, decode_fn, rules,
                    rng_, mean_, coeff_, t, y,
                    scoring_model_fn=scoring_model_fn,
                    scoring_feature_fn=scoring_feature_fn,
                )
                return sel, rec

            def plain_branch(args):
                rng_, mean_, coeff_ = args
                nz = (t_scalar > config.t_end).astype(x.dtype)
                n = jax.random.normal(rng_, mean_.shape, dtype=mean_.dtype)
                return mean_ + nz * coeff_ * n, _empty_record(config, rules, b)

            # At t == t_end the reference returns the bare mean (p_sample
            # :732-733); fold that in by zeroing noise inside plain_branch
            # and masking the SCG branch off at the boundary.
            do_scg = use_guidance & (t_scalar > config.t_end)
            sample, record = jax.lax.cond(
                do_scg, scg_branch, plain_branch, (scg_rng, base_mean, g_coeff)
            )
        else:
            sample, record = plain_sample, _empty_record(config, rules, b)

        if config.record and config.record_states:
            record = dict(record)
            record["state"] = sample
        new_carry = {"x": sample, "rng": rng}
        if reuse_n > 1:
            new_carry["cache"] = cached_out
        if dpmpp_multistep:
            new_carry["prev_x0"], new_carry["prev_lam"] = dpmpp_state
        return new_carry, record

    carry0 = {"x": x_init, "rng": rng}
    if reuse_n > 1:
        out_ch = shape[1]
        if config.var_type in (gd.ModelVarType.LEARNED,
                               gd.ModelVarType.LEARNED_RANGE):
            out_ch *= 2
        carry0["cache"] = jnp.zeros((b, out_ch) + tuple(shape[2:]),
                                    dtype=jnp.float32)
    if dpmpp_multistep:
        carry0["prev_x0"] = jnp.zeros_like(x_init)
        carry0["prev_lam"] = jnp.zeros((b,) + (1,) * (x_init.ndim - 1),
                                       dtype=jnp.float32)
    final_carry, records = jax.lax.scan(step, carry0, ts)
    return final_carry["x"], records


def ddim_reverse_loop(
    rng: jnp.ndarray,
    model_fn: Callable,
    x0: jnp.ndarray,
    tables: Tables,
    *,
    y: Optional[jnp.ndarray] = None,
    var_type: gd.ModelVarType = gd.ModelVarType.FIXED_LARGE,
    t_stop: Optional[int] = None,
):
    """Deterministic DDIM reverse ODE: encode x0 up the chain
    (gaussian_diffusion.py:978-1014). Returns x_{t_stop} (default x_T)."""
    del rng  # deterministic; kept for API symmetry
    b = x0.shape[0]
    num_steps = t_stop if t_stop is not None else tables.num_timesteps

    def step(x, t_scalar):
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        model_out = model_fn(x, tables.model_t[t], y)
        pmv = gd.p_mean_variance(
            tables, model_out, x, t, var_type=var_type, clip_denoised=False
        )
        eps = gd.predict_eps_from_xstart(tables, x, t, pmv.pred_xstart)
        acp_next = gd._extract(tables.alphas_cumprod_next, t, x.ndim)
        x_next = (
            pmv.pred_xstart * jnp.sqrt(acp_next)
            + jnp.sqrt(jnp.maximum(1 - acp_next, 0.0)) * eps
        )
        return x_next, None

    x, _ = jax.lax.scan(step, x0, jnp.arange(num_steps))
    return x
