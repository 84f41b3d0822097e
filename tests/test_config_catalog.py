"""Config catalog sweep: every shipped YAML must parse through the
reference-schema loader and translate into a valid SamplerConfig
(VERDICT r1 item 4; reference scripts/configs/** is the public interface)."""

import glob
import os

import pytest

from rule_guided_music_tpu.config import load_config, sampler_config_from_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CATALOG = sorted(
    glob.glob(os.path.join(REPO, "scripts", "configs", "**", "*.yml"),
              recursive=True)
)

RULE_NAMES = (
    "pitch_hist", "note_density", "chord_progression",
    "note_density_hr_2", "note_density_pixel", "chord_progression_pixel",
)


def test_catalog_is_complete():
    """62 configs, mirroring the reference tree file-for-file."""
    assert len(CATALOG) == 62
    rel = {os.path.relpath(p, os.path.join(REPO, "scripts", "configs"))
           for p in CATALOG}
    for expected in [
        "cond_demo/demo1.yml", "cond_demo/demo2.yml", "cond_demo/demo3.yml",
        "cond_table/abla/sampling/ddim/ddim25.yml",
        "cond_table/abla/sampling/ddim/ddim50.yml",
        "cond_table/abla/sampling/ddim/ddim100.yml",
        "cond_table/abla/sampling/ddpmes/s750_400.yml",
        "cond_table/abla/num_samples/nd_scg_num4.yml",
        "cond_table/abla/combine/nd_scg_cls_num16.yml",
        "cond_table/all/weights/scg_classifier_all_bf4_40_1_4.yml",
        "cond_table/single/dps_nn/chord.yml",
        "cond_table/abla/latent/dps_rule/pitch_step_0_1.yml",
        "edit/chord.yml", "edit/nd_scg_given_target.yml",
    ]:
        assert expected in rel, f"missing {expected}"


@pytest.mark.parametrize(
    "path", CATALOG, ids=[os.path.relpath(p, REPO) for p in CATALOG]
)
def test_config_translates(path):
    config = load_config(path)
    sampler = sampler_config_from_yaml(config, rule_names=RULE_NAMES)
    assert sampler.sampler in ("ddpm", "ddim")
    g = config.guidance
    # SCG on in YAML <=> SCGConfig produced
    if getattr(g, "scg", False):
        assert sampler.scg is not None
        assert sampler.scg.num_samples in (4, 8, 16)
    else:
        assert sampler.scg is None
    # classifier/DPS configs must name resolvable cond fns
    cond = getattr(g, "cond_fn", None)
    if cond is not None:
        from rule_guided_music_tpu.diffusion.guidance import COND_FN_NAMES

        for fn in cond.fns:
            assert fn in COND_FN_NAMES, fn
        assert len(cond.fns) == len(cond.rule_names)
        assert len(cond.classifier_scales) == len(cond.rule_names)
    # edit configs carry a complete edit block
    if "edit/" in path.replace(os.sep, "/"):
        assert sampler.edit is not None
        assert 0 <= sampler.edit.l_start < sampler.edit.l_end


def test_ddim_configs_carry_respacing():
    for n in (25, 50, 100):
        cfg = load_config(os.path.join(
            REPO, "scripts", "configs",
            "cond_table", "abla", "sampling", "ddim", f"ddim{n}.yml"))
        assert cfg.sampling.use_ddim is True
        assert cfg.sampling.timestep_respacing == f"ddim{n}"


def test_demo2_windowed_scg_base():
    cfg = load_config(os.path.join(
        REPO, "scripts", "configs", "cond_demo", "demo2.yml"))
    sampler = sampler_config_from_yaml(cfg, rule_names=RULE_NAMES)
    assert sampler.scg.dc_base == 128
