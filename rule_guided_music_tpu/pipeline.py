"""High-level assembly: models + guidance + sampler from args/YAML configs.

This is the glue the reference spreads across scripts/sample_rule.py:40-230
and scripts/edit.py — shared here so every CLI stays thin and the whole
pipeline is reusable as a library.

IMPORTANT (TPU environment constraint): parameters must flow through jit
boundaries as ARGUMENTS, never as Python closures — closed-over arrays are
baked into the HLO as constants, which bloats programs by gigabytes and is
rejected by the remote-compile service. ``make_sample_fn`` below builds the
jitted generation function with an explicit params bundle argument.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from types import SimpleNamespace
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constants import DEFAULT_SCALE_FACTOR, NUM_CLASSES
from .diffusion.guidance import (
    CondFnSpec,
    make_grad_cond_fn,
    make_model_fn,
    make_value_cond_fn,
)
from .diffusion.latent import make_decode_fn, make_encode_fn
from .diffusion.sampling import SamplerConfig, sample_loop
from .models import AutoencoderKL, DiT_models
from .rules.registry import FUNC_DICT, LOSS_DICT
from .rules import chord as chord_mod
from .utils import logger



def _init_on_host(init_fn, *args, **kwargs):
    """Run a Flax init on the CPU backend and transfer to the default device.

    On this environment, init graphs compile slowly through the remote TPU
    compiler; CPU init + one bulk transfer is much faster.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_args = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, cpu) if hasattr(a, "dtype") else a, args
        )
        params = init_fn(*host_args, **kwargs)
    return jax.device_put(params, jax.devices()[0])


def load_checkpoint_params(path: str, target=None):
    """Load a params pytree saved by Orbax (or .npz fallback)."""
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=True))
        import flax.traverse_util as tu

        return {"params": tu.unflatten_dict(
            {tuple(k.split("/")): v for k, v in flat.items()}
        )}
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


@dataclass
class DenoiserBundle:
    model: Any
    params: Any
    apply_fn: Callable     # (x, t, y) -> raw output

    @classmethod
    def create(
        cls,
        name: str,
        *,
        input_size=(128, 16),
        in_channels: int = 4,
        num_classes: int = NUM_CLASSES,
        learn_sigma: bool = False,
        model_path: str = "",
        dtype=jnp.bfloat16,
        seed: int = 0,
        quant=False,  # False | True ("w8a8") | "w8a8" | "w8a16"
    ) -> "DenoiserBundle":
        kwargs = dict(
            input_size=tuple(input_size), in_channels=in_channels,
            num_classes=num_classes, learn_sigma=learn_sigma, dtype=dtype,
        )
        model = DiT_models[name](**kwargs)
        x = jnp.zeros((1, in_channels, *input_size))
        t = jnp.zeros((1,))
        y = jnp.zeros((1,), dtype=jnp.int32) if num_classes else None
        params = _init_on_host(model.init, jax.random.PRNGKey(seed), x, t, y)
        if model_path:
            params = load_checkpoint_params(model_path, target=params)
            logger.log(f"loaded denoiser weights from {model_path}")
        else:
            logger.log("WARNING: no model_path given — random denoiser weights")
        from .ops.quant import normalize_quant_mode, quantize_dit_params

        mode = normalize_quant_mode(quant)
        if mode:
            # fold fp weights to int8 on host, swap in the quantized model
            params = quantize_dit_params(params)
            model = DiT_models[name](**kwargs, quant=mode)
            logger.log(f"denoiser trunk quantized to int8 ({mode} serving)")
        return cls(model, params, lambda x, t, y: model.apply(params, x, t, y))


@dataclass
class VAEBundle:
    model: AutoencoderKL
    params: Any
    decode: Callable          # latent image -> long roll (scale handled)
    encode: Callable          # long roll -> latent image
    raw_decode: Callable      # chunk-level decode
    raw_encode_moments: Callable

    @classmethod
    def create(
        cls, vae_path: str = "", scale_factor: float = DEFAULT_SCALE_FACTOR,
        dtype=jnp.bfloat16, seed: int = 1, arch: Optional[Dict[str, Any]] = None,
    ) -> "VAEBundle":
        """``arch`` overrides AutoencoderKL constructor fields (ch, ch_mult,
        num_res_blocks, ...) — the reference selects VAE geometry through an
        OmegaConf yaml named by ``--vae`` (load_utils.py:20-31); here the
        default IS the production f8 config and ``arch`` is the override
        hook (CLIs expose it as ``--vae_arch`` JSON)."""
        arch = dict(arch or {})
        if "ch_mult" in arch:
            arch["ch_mult"] = tuple(arch["ch_mult"])
        vae = AutoencoderKL(dtype=dtype, **arch)
        params = _init_on_host(
            vae.init, jax.random.PRNGKey(seed), jnp.zeros((1, 3, 128, 128)),
            rng=jax.random.PRNGKey(seed + 1),
        )
        if vae_path:
            params = load_checkpoint_params(vae_path, target=params)
            logger.log(f"loaded VAE weights from {vae_path}")
        else:
            logger.log("WARNING: no vae_path given — random VAE weights")

        def raw_decode(z):
            return vae.apply(params, z, method=AutoencoderKL.decode)

        def raw_encode_moments(x):
            return vae.apply(params, x, method=AutoencoderKL.encode_moments)

        return cls(
            model=vae,
            params=params,
            decode=make_decode_fn(raw_decode, scale_factor=scale_factor),
            encode=make_encode_fn(raw_encode_moments, scale_factor=scale_factor),
            raw_decode=raw_decode,
            raw_encode_moments=raw_encode_moments,
        )


def build_classifier_bundles(
    classifier_config: SimpleNamespace,
    *,
    input_size=(128, 16),
    in_channels: int = 4,
    dtype=jnp.bfloat16,
) -> List[tuple]:
    """Instantiate YAML classifiers as (model, params) pairs so params can be
    threaded through jit explicitly."""
    bundles = []
    for i, name in enumerate(classifier_config.names):
        num_classes = classifier_config.num_classes[i]
        model = DiT_models[name](
            input_size=tuple(input_size), in_channels=in_channels,
            num_classes=num_classes, dtype=dtype,
        )
        x = jnp.zeros((1, in_channels, *input_size))
        t = jnp.zeros((1,))
        params = _init_on_host(model.init, jax.random.PRNGKey(100 + i), x, t)
        path = classifier_config.paths[i]
        if path and os.path.exists(path):
            params = load_checkpoint_params(path, target=params)
            logger.log(f"loaded classifier {name} from {path}")
        else:
            logger.log(f"WARNING: classifier {name}: no weights at '{path}'")
        bundles.append((model, params))
    return bundles


@dataclass
class ScoringBundle:
    """Opt-in light-scoring levers for SCG candidate ranking, loaded from
    the distill-script artifacts (docs/PERF.md).  All are SELECTION-ONLY:
    the sampled trajectory and the final decode always use the full models
    (reference semantics gaussian_diffusion.py:524,1347-1358).

    ``model_kwargs`` feed ``make_sample_fn`` and ``params`` merges into its
    params bundle, so CLIs stay thin:

        scoring = ScoringBundle.create(features_path=..., ...)
        generate = make_sample_fn(..., **scoring.model_kwargs)
        bundle.update(scoring.params)
    """

    model_kwargs: Dict[str, Any]
    params: Dict[str, Any]
    agreements: Dict[str, float]

    @classmethod
    def create(
        cls,
        *,
        decoder_path: str = "",
        features_path: str = "",
        rollout: str = "",
        rollout_path: str = "",
        input_size=(128, 16),
        in_channels: int = 4,
        num_classes: int = NUM_CLASSES,
        learn_sigma: bool = False,
        decoder_ch: int = 64,
        feature_ch: int = 64,
        feature_depth: int = 4,
        dtype=jnp.bfloat16,
    ) -> "ScoringBundle":
        from .models import RuleFeatureHead, ScoringDecoder

        model_kwargs: Dict[str, Any] = {}
        params: Dict[str, Any] = {}
        agreements: Dict[str, float] = {}
        if decoder_path:
            tree, meta = _load_scoring_npz(decoder_path)
            model_kwargs["scoring_vae_model"] = ScoringDecoder(
                ch=decoder_ch, dtype=dtype)
            params["scoring_vae"] = tree
            agreements["scoring_decoder"] = meta.get("agreement", float("nan"))
            logger.log(f"light scoring decoder (ch={decoder_ch}) from "
                       f"{decoder_path} "
                       f"(distill agreement={agreements['scoring_decoder']:.3f})")
        if features_path:
            tree, meta = _load_scoring_npz(features_path)
            model_kwargs["scoring_feature_model"] = RuleFeatureHead(
                ch=feature_ch, depth=feature_depth, dtype=dtype)
            params["scoring_features"] = tree
            agreements["scoring_features"] = meta.get("agreement",
                                                      float("nan"))
            logger.log(f"rule-feature head (ch={feature_ch}) from "
                       f"{features_path} "
                       f"(distill agreement={agreements['scoring_features']:.3f})")
        if rollout:
            model = DiT_models[rollout](
                input_size=tuple(input_size), in_channels=in_channels,
                num_classes=num_classes, learn_sigma=learn_sigma,
                dtype=dtype,
            )
            if not rollout_path:
                raise ValueError(
                    "scoring rollout model given without weights — pass "
                    "rollout_path (scripts/distill_scoring_rollout.py output)")
            tree, meta = _load_scoring_npz(rollout_path)
            model_kwargs["scoring_denoiser_model"] = model
            params["scoring_denoiser"] = tree
            agreements["scoring_rollout"] = meta.get("agreement",
                                                     float("nan"))
            logger.log(f"light rollout denoiser {rollout} from "
                       f"{rollout_path} "
                       f"(distill agreement={agreements['scoring_rollout']:.3f})")
        return cls(model_kwargs, params, agreements)


def _load_scoring_npz(path: str):
    """Distill-script artifact: flat '/'-keyed param tree + scalar metadata
    (e.g. ``agreement``) in one npz."""
    from .utils.fixtures import unflatten_tree

    data = np.load(path)
    meta = {k: float(data[k]) for k in data.files if "/" not in k}
    tree = unflatten_tree({
        k: np.asarray(data[k], dtype=np.float32)
        for k in data.files if "/" in k
    })
    return tree, meta


def resolve_given_targets(
    target_rules: Dict[str, Any], batch_size: int
) -> Dict[str, jnp.ndarray]:
    """Normalize YAML-given targets: merge vertical/horizontal nd, rescale
    pitch_hist, broadcast to the batch (sample_rule.py:170-193)."""
    target_rules = dict(target_rules)
    for key in list(target_rules.keys()):
        if "vertical_nd" in key:
            if "_hr_" in key:
                hr_scale = int(key.split("_hr_")[-1])
                hr_key = key.replace("vertical", "horizontal")
                nd_name = f"note_density_hr_{hr_scale}"
            else:
                hr_scale = 5
                hr_key = "horizontal_nd"
                nd_name = "note_density"
            horizontal = [x / hr_scale for x in target_rules[hr_key]]
            target_rules[nd_name] = list(target_rules[key]) + horizontal
            target_rules.pop(key)
            target_rules.pop(hr_key)
            break
    out = {}
    for key, val in target_rules.items():
        arr = jnp.asarray(val, dtype=jnp.int32 if "chord" in key else jnp.float32)
        if key == "pitch_hist":
            arr = arr / (arr.sum() + 1e-12)
        out[key] = jnp.tile(arr[None], (batch_size, 1))
    return out


def extract_targets_from_rolls(
    rule_names, rolls: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Extract target rules from dataset excerpts (sample_rule.py:147-168)."""
    out = {}
    for name in rule_names:
        out[name] = FUNC_DICT[name](rolls)
    return out


def eval_rule_loss(generated: jnp.ndarray, target_rules: Dict[str, jnp.ndarray]):
    """Per-sample rule values + losses as a DataFrame
    (guided_diffusion/midi_util.py:96-124 contract: columns
    <rule>.target_rule / .gen_rule / .loss, plus key info for chords)."""
    import pandas as pd

    results = {}
    for rule_name, rule_target in target_rules.items():
        results[rule_name + ".target_rule"] = np.asarray(rule_target).tolist()
        if "chord" in rule_name:
            gen_rule, key_idx, corr = FUNC_DICT[rule_name](
                generated, return_key=True
            )
            results[rule_name + ".key_str"] = [
                chord_mod.IND2KEY[int(k)] for k in np.asarray(key_idx)
            ]
            results[rule_name + ".key_corr"] = np.asarray(corr).tolist()
        else:
            gen_rule = FUNC_DICT[rule_name](generated)
        loss = LOSS_DICT[rule_name](gen_rule, jnp.asarray(rule_target))
        results[rule_name + ".gen_rule"] = np.asarray(gen_rule).tolist()
        results[rule_name + ".loss"] = np.asarray(loss).tolist()
    return pd.DataFrame(results)


@dataclass
class ClassifierSpecMeta:
    """Static metadata for one cond_fn term (model is static; params live in
    the params bundle)."""

    fn: str
    rule_name: str
    scale: float
    model: Any = None          # nn.Module or None for rule-based fns


def make_sample_fn(
    *,
    denoiser_model,
    tables,
    sampler_config: SamplerConfig,
    gen_shape,
    vae_model=None,
    classifier_metas: Optional[List[ClassifierSpecMeta]] = None,
    guidance_method: str = "no_guidance",
    use_decode: bool = True,
    scale_factor: float = DEFAULT_SCALE_FACTOR,
    num_classes: int = NUM_CLASSES,
    class_cond: bool = True,
    cfg: bool = False,
    w: float = 0.0,
    collage: Optional[dict] = None,
    mesh=None,
    scoring_vae_model=None,
    scoring_denoiser_model=None,
    scoring_feature_model=None,
    t_begin=None,
    t_stop=None,
):
    """Build a jitted ``generate(rng, params, rules, y[, edit])`` function.

    ``params`` is a bundle {"denoiser": ..., "vae": ..., "classifiers":
    (...,)} passed explicitly so jit treats weights as arguments.
    ``collage``: optional dict(num_img=, overlap=, circle=) to wrap the
    denoiser in the DiffCollage stitched-epsilon closure.
    ``mesh``: optional ``jax.sharding.Mesh`` from ``parallel.make_mesh``;
    batch-bearing inputs (labels, per-example rule targets, edit arrays)
    are sharded over data x fsdp and the weight bundle is replicated, so
    the whole reverse chain — including SCG's k·B candidate axis, which
    inherits the batch sharding through the scan — runs SPMD across the
    mesh with GSPMD-inserted collectives.
    """
    classifier_metas = classifier_metas or []

    # HBM preflight: configs whose SCG candidate-decode working set exceeds
    # device memory used to compile fine and hard-fault the chip mid-chain
    # (docs/PERF.md round-2 fault rows). Estimate and fail BEFORE compiling.
    scg = sampler_config.scg
    hidden = getattr(denoiser_model, "hidden_size", None)
    if (scg is not None and use_decode and hidden is not None
            and (vae_model is not None or scoring_vae_model is not None)):
        from .diffusion.memory import (
            dit_param_count,
            preflight_scg,
            vae_param_count,
        )

        param_count = dit_param_count(
            hidden, denoiser_model.depth,
            patch=getattr(denoiser_model, "patch_size", 8),
        )
        for meta in classifier_metas:
            if meta.model is not None and hasattr(meta.model, "hidden_size"):
                param_count += dit_param_count(
                    meta.model.hidden_size, meta.model.depth,
                    patch=getattr(meta.model, "patch_size", 8),
                )
        decoder_ch = 128
        if vae_model is not None:
            decoder_ch = vae_model.ch
            param_count += vae_param_count(vae_model.ch)
        if scoring_vae_model is not None:
            decoder_ch = scoring_vae_model.ch
            # decoder-only module: roughly half an AutoencoderKL
            param_count += vae_param_count(scoring_vae_model.ch) // 2
        # with a rule-feature head the candidate decode disappears from the
        # SCG loop entirely (head activations are negligible next to it) —
        # unless prefilter re-ranking decodes the top-m survivors, which we
        # model conservatively as a full-k decode (true cost: m/k of that)
        scg_uses_decode = (scoring_feature_model is None
                           or scg.prefilter > 0)
        rollout_hidden = hidden
        if (scoring_denoiser_model is not None
                and hasattr(scoring_denoiser_model, "hidden_size")):
            rollout_hidden = scoring_denoiser_model.hidden_size
            param_count += dit_param_count(
                rollout_hidden, scoring_denoiser_model.depth,
                patch=getattr(scoring_denoiser_model, "patch_size", 8),
            )
        preflight_scg(
            gen_shape=tuple(gen_shape), k=scg.num_samples,
            decode_chunks=scg.decode_chunks, param_count=param_count,
            hidden=rollout_hidden, decoder_ch=decoder_ch,
            compute_bytes=2 if denoiser_model.dtype == jnp.bfloat16 else 4,
            use_decode=scg_uses_decode,
        )

    def generate(rng, params, rules, y=None, edit_gt=None, edit_mask=None,
                 noise=None):
        def wrap_model(apply):
            fn = make_model_fn(
                apply, num_classes=num_classes, class_cond=class_cond,
                cfg=cfg, w=w,
            )
            if collage:
                from .diffusion.collage import make_cond_ind_eps_fn

                fn = make_cond_ind_eps_fn(
                    fn, collage["num_img"], collage["overlap"],
                    circle=collage.get("circle", False),
                )
            return fn

        model_fn = wrap_model(
            lambda x, t, yy: denoiser_model.apply(params["denoiser"], x, t, yy)
        )

        scoring_model_fn = None
        if scoring_denoiser_model is not None:
            # opt-in light rollout denoiser: SCG candidate *ranking* only —
            # the one-step x̂0 rollout never enters the trajectory, so this
            # is the denoiser analog of the light scoring decoder (expects
            # params["scoring_denoiser"], e.g. from
            # scripts/distill_scoring_rollout.py). Gets the same CFG /
            # DiffCollage wrapping as the main closure.
            scoring_model_fn = wrap_model(
                lambda x, t, yy: scoring_denoiser_model.apply(
                    params["scoring_denoiser"], x, t, yy
                )
            )

        scoring_feature_fn = None
        if scoring_feature_model is not None:
            # opt-in rule-feature head: predicts FUNC_DICT-contract rule
            # features straight from x̂0 latents, removing the candidate
            # decode from SCG ranking entirely (selection only — the final
            # decode and the trajectory stay full; models/scoring_head.py).
            # Same operating point as make_decode_fn: input is
            # x0 / scale_factor. Expects params["scoring_features"] from
            # scripts/distill_scoring_features.py.
            scoring_feature_fn = lambda z: scoring_feature_model.apply(
                params["scoring_features"], z / scale_factor,
                method=type(scoring_feature_model).features,
            )

        decode_fn = None
        if scoring_vae_model is not None and use_decode:
            # opt-in light decoder: SCG candidate *scoring* only (final
            # decode elsewhere stays full — reference semantics, selection
            # is the throughput-critical path). Expects a
            # params["scoring_vae"] tree from distill_scoring_decoder.py.
            decode_fn = make_decode_fn(
                lambda z: scoring_vae_model.apply(
                    params["scoring_vae"], z,
                    method=type(scoring_vae_model).decode,
                ),
                scale_factor=scale_factor,
            )
        elif vae_model is not None and use_decode:
            decode_fn = make_decode_fn(
                lambda z: vae_model.apply(
                    params["vae"], z, method=type(vae_model).decode
                ),
                scale_factor=scale_factor,
            )

        cond_fn = None
        if classifier_metas:
            specs = []
            for i, meta in enumerate(classifier_metas):
                classifier = None
                if meta.model is not None:
                    classifier = (
                        lambda m, idx: lambda x, t: m.apply(
                            params["classifiers"][idx], x, t
                        )
                    )(meta.model, i)
                specs.append(
                    CondFnSpec(fn=meta.fn, rule_name=meta.rule_name,
                               scale=meta.scale, classifier=classifier)
                )
            if guidance_method == "dps":
                cond_fn = make_value_cond_fn(specs)
            else:
                cond_fn = make_grad_cond_fn(specs)

        return sample_loop(
            rng, model_fn, tuple(gen_shape), tables, sampler_config,
            y=y, rules=rules, cond_fn=cond_fn, decode_fn=decode_fn,
            edit_gt=edit_gt, edit_mask=edit_mask, noise=noise,
            scoring_model_fn=scoring_model_fn,
            scoring_feature_fn=scoring_feature_fn,
            t_begin=t_begin, t_stop=t_stop,
        )

    jitted = jax.jit(generate)
    if mesh is None:
        return jitted

    from .parallel.mesh import batch_sharding, replicated

    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def put_batch(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), bs), tree
        )

    def generate_sharded(rng, params, rules, y=None, edit_gt=None,
                         edit_mask=None, noise=None):
        params = jax.device_put(params, rep)
        rules = put_batch(rules) if rules else rules
        y = put_batch(y) if y is not None else None
        edit_gt = put_batch(edit_gt) if edit_gt is not None else None
        edit_mask = put_batch(edit_mask) if edit_mask is not None else None
        noise = put_batch(noise) if noise is not None else None
        return jitted(rng, params, rules, y, edit_gt, edit_mask, noise)

    return generate_sharded


def make_decode_rolls_fn(vae_model, scale_factor: float = DEFAULT_SCALE_FACTOR):
    """Jitted latent->roll decoder with explicit VAE params argument."""

    def decode(vae_params, latents):
        fn = make_decode_fn(
            lambda z: vae_model.apply(
                vae_params, z, method=type(vae_model).decode
            ),
            scale_factor=scale_factor,
        )
        return fn(latents)

    return jax.jit(decode)


def summarize_losses(all_results) -> "Any":
    """summary.csv: mean/std of each .loss column (sample_rule.py:251-258)."""
    import pandas as pd

    rows = []
    for col in [c for c in all_results.columns if ".loss" in c]:
        rows.append({"Attr": col, "Mean": all_results[col].mean(),
                     "Std": all_results[col].std()})
    return pd.DataFrame(rows, columns=["Attr", "Mean", "Std"])
