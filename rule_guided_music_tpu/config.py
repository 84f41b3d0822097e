"""Config system: YAML guidance configs + argparse defaults.

Preserves the reference's three-layer user surface (SURVEY.md §5 config):
  1. argparse flags with typed defaults (guided_diffusion/script_util.py:
     503-531, incl. nargs image_size and str2bool);
  2. the YAML guidance-config schema {target_rules, guidance{cond_fn{...}},
     scg, sampling, dc, edit} parsed into a recursive namespace
     (guided_diffusion/midi_util.py:26-39) — reference YAML files work
     unchanged;
  3. translation of that schema into the framework's typed sampler configs.
"""

from __future__ import annotations

import argparse
from types import SimpleNamespace
from typing import Any, Dict

import yaml

from .diffusion.sampling import EditConfig, GuidanceConfig, SCGConfig, SamplerConfig


def dict_to_obj(d):
    if isinstance(d, list):
        return [dict_to_obj(x) if isinstance(x, dict) else x for x in d]
    if not isinstance(d, dict):
        return d
    return SimpleNamespace(**{k: dict_to_obj(v) for k, v in d.items()})


def load_config(filename: str) -> SimpleNamespace:
    with open(filename, "r") as f:
        return dict_to_obj(yaml.safe_load(f))


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def add_dict_to_argparser(parser: argparse.ArgumentParser, default_dict: Dict[str, Any]):
    for k, v in default_dict.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        if k == "image_size":
            parser.add_argument(f"--{k}", nargs="+", default=v, type=int)
        else:
            parser.add_argument(f"--{k}", default=v, type=v_type)


def args_to_dict(args, keys):
    return {k: getattr(args, k) for k in keys}


def diffusion_defaults() -> Dict[str, Any]:
    """script_util.py:13-26 parity."""
    return dict(
        learn_sigma=False,
        diffusion_steps=1000,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
    )


def model_and_diffusion_defaults() -> Dict[str, Any]:
    """script_util.py:74-97 parity (piano-roll training defaults)."""
    res = dict(
        image_size=[128, 16],
        in_channels=4,
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        num_heads_upsample=-1,
        num_head_channels=-1,
        attention_resolutions="32,16,8",
        channel_mult="",
        dropout=0.0,
        class_cond=False,
        use_checkpoint=False,
        use_scale_shift_norm=True,
        resblock_updown=False,
        use_fp16=False,
        use_new_attention_order=False,
    )
    res.update(diffusion_defaults())
    return res


def _ns_get(ns, key, default=None):
    return getattr(ns, key, default) if ns is not None else default


def sampler_config_from_yaml(
    config: SimpleNamespace,
    *,
    learn_sigma: bool = False,
    record: bool = False,
    record_states: bool = False,
    rule_names=(),
) -> SamplerConfig:
    """Translate a reference guidance YAML tree into a SamplerConfig."""
    import rule_guided_music_tpu.diffusion.gaussian as gd

    guidance_ns = _ns_get(config, "guidance")
    scg_on = bool(_ns_get(guidance_ns, "scg", False))
    sampling_ns = _ns_get(config, "sampling")
    dc_ns = _ns_get(config, "dc")
    edit_ns = _ns_get(config, "edit")

    guidance = None
    if guidance_ns is not None:
        guidance = GuidanceConfig(
            method=_ns_get(guidance_ns, "method", "no_guidance"),
            schedule=bool(_ns_get(guidance_ns, "schedule", False)),
            t_start=int(_ns_get(guidance_ns, "t_start", 750)),
            t_end=int(_ns_get(guidance_ns, "t_end", 0)),
            interval=int(_ns_get(guidance_ns, "interval", 1)),
            step_size=float(_ns_get(guidance_ns, "step_size", 1.0)),
            nn=bool(_ns_get(guidance_ns, "nn", False)),
            vae=bool(_ns_get(guidance_ns, "vae", True)),
        )

    scg = None
    if scg_on:
        scg_ns = _ns_get(config, "scg")
        weights = tuple(
            (name, float(getattr(scg_ns, name)))
            for name in rule_names
            if hasattr(scg_ns, name)
        )
        # windowed-SCG base: the reference reads guidance.dc.base
        # (configs/cond_demo/demo2.yml); fall back to top-level dc.base
        dc_base = int(_ns_get(_ns_get(guidance_ns, "dc"), "base", 0) or 0)
        if not dc_base and dc_ns is not None and \
                bool(_ns_get(sampling_ns, "diff_collage", False)):
            dc_base = int(_ns_get(dc_ns, "base", 0) or 0)
        scg = SCGConfig(
            num_samples=int(_ns_get(scg_ns, "num_samples", 16)),
            weights=weights,
            dc_base=dc_base,
            # beyond-reference hybrid selection: feature head ranks all k,
            # the real decoder re-ranks the top-m (scg.prefilter in YAML)
            prefilter=int(_ns_get(scg_ns, "prefilter", 0) or 0),
        )

    edit = None
    if edit_ns is not None:
        edit = EditConfig(
            noise_level=int(_ns_get(edit_ns, "noise_level", 500)),
            l_start=int(_ns_get(edit_ns, "l_start", 0)),
            l_end=int(_ns_get(edit_ns, "l_end", 128)),
        )

    use_ddim = bool(_ns_get(sampling_ns, "use_ddim", False))
    # beyond-reference: sampling.sampler overrides use_ddim ("dpmpp" selects
    # the deterministic DPM-Solver++ multistep ODE sampler; docs/PERF.md)
    sampler = str(_ns_get(sampling_ns, "sampler", "") or
                  ("ddim" if use_ddim else "ddpm"))
    # empty YAML values parse to None — fall back like the absent-key case
    dpmpp_order = _ns_get(sampling_ns, "dpmpp_order", 2)
    reuse_t_max = _ns_get(sampling_ns, "reuse_t_max", -1)
    return SamplerConfig(
        sampler=sampler,
        eta=1.0,
        dpmpp_order=int(2 if dpmpp_order is None else dpmpp_order),
        # beyond-reference: stochastic SDE-DPM-Solver++ — enables SCG on
        # 10-20 step chains (sampling.dpmpp_sde in the YAML; docs/PERF.md)
        dpmpp_sde=bool(_ns_get(sampling_ns, "dpmpp_sde", False)),
        var_type=(gd.ModelVarType.LEARNED_RANGE if learn_sigma
                  else gd.ModelVarType.FIXED_LARGE),
        clip_denoised=False,
        t_end=int(_ns_get(sampling_ns, "t_end", 0)),
        # beyond-reference: cross-step trajectory-output reuse
        # (sampling.reuse_interval in the YAML; 0/1 = off; docs/PERF.md)
        reuse_interval=int(_ns_get(sampling_ns, "reuse_interval", 0) or 0),
        reuse_t_max=int(-1 if reuse_t_max is None else reuse_t_max),
        guidance=guidance,
        scg=scg,
        edit=edit,
        record=record,
        # opt-in separately: the state stack costs steps x B x C x H x W
        record_states=record and record_states,
    )
