"""HBM preflight estimator (diffusion/memory.py) + make_sample_fn gating.

Converts the docs/PERF.md round-2 fault rows (ddim100 + full decoder at
k=16 x B=8 hard-faults the chip) into a caught config error.
"""

import jax.numpy as jnp
import pytest

from rule_guided_music_tpu.diffusion.memory import (
    HBMPreflightError,
    dit_param_count,
    estimate_scg_peak_bytes,
    preflight_scg,
)
from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import AutoencoderKL, DiT_models
from rule_guided_music_tpu.pipeline import make_sample_fn

XL = dict(param_count=int(790e6), hidden=1152)


def _est(b=4, k=16, chunks=32, decoder_ch=128, **kw):
    args = dict(gen_shape=(b, 4, 128, 16), k=k, decode_chunks=chunks,
                decoder_ch=decoder_ch, **XL)
    args.update(kw)
    return estimate_scg_peak_bytes(**args)["total"]


def test_dit_param_count_matches_known_xl():
    # DiTRotary_XL_8 is ~675M params (SURVEY §2.2)
    n = dit_param_count(1152, 28)
    assert abs(n - 675e6) / 675e6 < 0.05


def test_estimate_monotonic_in_batch_and_k():
    assert _est(b=8) > _est(b=4)
    assert _est(k=16) > _est(k=8)


def test_estimate_decreases_with_decode_chunks():
    assert _est(chunks=4) > _est(chunks=16) > _est(chunks=32)


def test_light_decoder_shrinks_working_set():
    assert _est(decoder_ch=64) < _est(decoder_ch=128)


def test_preflight_raises_with_actionable_message():
    with pytest.raises(HBMPreflightError) as exc:
        preflight_scg(gen_shape=(8, 4, 128, 16), k=16, decode_chunks=32,
                      decoder_ch=128, limit_bytes=int(2e9), **XL)
    msg = str(exc.value)
    assert "decode_chunks" in msg
    assert "light scoring decoder" in msg
    assert "RGM_SKIP_HBM_PREFLIGHT" in msg


def test_preflight_passes_under_limit_and_returns_terms():
    terms = preflight_scg(gen_shape=(4, 4, 128, 16), k=16, decode_chunks=32,
                          decoder_ch=128, limit_bytes=int(64e9), **XL)
    assert terms["total"] > 0
    assert {"params", "candidates", "decode_group",
            "stacked_rolls"} <= set(terms)


def test_preflight_env_override_skips(monkeypatch):
    monkeypatch.setenv("RGM_SKIP_HBM_PREFLIGHT", "1")
    terms = preflight_scg(gen_shape=(64, 4, 128, 16), k=16, decode_chunks=1,
                          decoder_ch=128, limit_bytes=int(1e9), **XL)
    assert terms["total"] > 1e9          # would have raised


def _build_sample_fn(batch, limit_env, monkeypatch):
    monkeypatch.setenv("RGM_HBM_BYTES", limit_env)
    model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3,
        learn_sigma=False, dtype=jnp.bfloat16,
    )
    # XS is tiny; spoof flagship scale through the registry attributes is
    # not possible on a frozen module, so use XL geometry via the real
    # flagship module (constructor only — never initialized or compiled)
    xl = DiT_models["DiTRotary_XL_8"](
        input_size=(128, 16), in_channels=4, num_classes=3,
        learn_sigma=False, dtype=jnp.bfloat16,
    )
    tables = make_schedule("linear", 1000, timestep_respacing="4").tables()
    config = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="classifier_guidance", schedule=True,
                                t_start=3, t_end=0, interval=1),
        scg=SCGConfig(num_samples=16, decode_chunks=32),
    )
    return make_sample_fn(
        denoiser_model=xl, tables=tables, sampler_config=config,
        gen_shape=(batch, 4, 128, 16), vae_model=AutoencoderKL(),
        use_decode=True,
    )


# The synthetic limit sits between the B=4 (known-good) and B=8 (documented
# fault) estimates; the absolute scale is calibrated against on-chip
# memory_stats() (docs/PERF.md "HBM preflight calibration").
_LIMIT = str(int(6.0e9))


def test_make_sample_fn_preflight_blocks_fault_config(monkeypatch):
    with pytest.raises(HBMPreflightError):
        _build_sample_fn(8, _LIMIT, monkeypatch)


def test_make_sample_fn_preflight_allows_good_config(monkeypatch):
    fn = _build_sample_fn(4, _LIMIT, monkeypatch)
    assert callable(fn)
