"""The beyond-reference serving config family (scripts/configs_serving/)
parses through the same YAML → SamplerConfig path sample_rule.py uses and
lands on the measured operating points of docs/PERF.md "Round 5".

Kept OUTSIDE scripts/configs/ because that tree mirrors the reference
file-for-file (tests/test_config_catalog.py pins the 62-file contract).
"""

import glob
import os

from rule_guided_music_tpu.config import load_config, sampler_config_from_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SERVING = os.path.join(REPO, "scripts", "configs_serving")


RULES = ("pitch_hist", "note_density", "chord_progression")


def _sampler_cfg(name):
    config = load_config(os.path.join(SERVING, name))
    # sample_rule.py passes the active rule names (from target_rules);
    # mirror the all-rules deployment here
    return config, sampler_config_from_yaml(
        config, learn_sigma=True, rule_names=RULES)


def test_family_is_nonempty_and_parses():
    files = sorted(glob.glob(os.path.join(SERVING, "*.yml")))
    assert len(files) >= 3
    for p in files:
        config, cfg = _sampler_cfg(os.path.basename(p))
        assert cfg.sampler in ("ddpm", "ddim", "dpmpp")


def test_fast_pre4_operating_point():
    config, cfg = _sampler_cfg("scg_fast_pre4.yml")
    assert cfg.sampler == "ddim"
    assert cfg.scg is not None and cfg.scg.num_samples == 16
    assert cfg.scg.prefilter == 4
    assert dict(cfg.scg.weights) == {
        "pitch_hist": 40.0, "note_density": 1.0, "chord_progression": 1.0}
    assert config.sampling.timestep_respacing == "ddim100"


def test_sde20_operating_point():
    config, cfg = _sampler_cfg("scg_sde20_pre4.yml")
    assert cfg.sampler == "dpmpp" and cfg.dpmpp_sde is True
    assert cfg.scg is not None and cfg.scg.prefilter == 4
    assert str(config.sampling.timestep_respacing) == "20"


def test_unguided_reuse2_operating_point():
    _, cfg = _sampler_cfg("unguided_reuse2.yml")
    assert cfg.sampler == "ddim" and cfg.scg is None
    assert cfg.reuse_interval == 2


def test_sample_rule_adopts_yaml_respacing_for_dpmpp():
    """sample_rule.py only adopted YAML timestep_respacing for use_ddim
    configs (the reference's behavior); the dpmpp serving configs carry
    their few-step budget the same way and must win over the CLI default.
    Source-level pin (main() needs a full CLI environment to drive)."""
    with open(os.path.join(REPO, "scripts", "sample_rule.py")) as f:
        src = f.read()
    assert '== "dpmpp"' in src.split("creating model and diffusion")[0], (
        "dpmpp YAML-respacing adoption removed from sample_rule.py "
        "preamble — scg_sde20_pre4.yml would silently run 1000 steps")
