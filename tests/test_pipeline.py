"""Integration tests: pipeline assembly (make_sample_fn) end-to-end on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu import pipeline
from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import AutoencoderKL, DiT_models


@pytest.fixture(scope="module")
def tiny_world():
    """A tiny denoiser + tiny VAE + tiny classifier, CPU-initialized."""
    denoiser = DiT_models["DiTRotary_XS_8"](
        input_size=(16, 16), in_channels=4, num_classes=3, learn_sigma=False,
    )
    x = jnp.zeros((1, 4, 16, 16))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), dtype=jnp.int32)
    d_params = denoiser.init(jax.random.PRNGKey(0), x, t, y)

    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
    v_params = vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 3, 128, 128)),
        rng=jax.random.PRNGKey(2),
    )

    from rule_guided_music_tpu.models import DiTRotaryClassifier

    classifier = DiTRotaryClassifier(
        input_size=(16, 16), in_channels=4, num_classes=12,
        depth=1, hidden_size=32, num_heads=2,
    )
    c_params = classifier.init(jax.random.PRNGKey(3), x, t)
    return denoiser, d_params, vae, v_params, classifier, c_params


def test_make_sample_fn_unguided(tiny_world):
    denoiser, d_params, vae, v_params, _, _ = tiny_world
    tables = make_schedule("linear", 1000, timestep_respacing="5").tables()
    cfg = SamplerConfig(sampler="ddpm")
    generate = pipeline.make_sample_fn(
        denoiser_model=denoiser, tables=tables, sampler_config=cfg,
        gen_shape=(2, 4, 16, 16), vae_model=None, use_decode=False,
        num_classes=3,
    )
    bundle = {"denoiser": d_params, "vae": None, "classifiers": ()}
    y = jnp.zeros((2,), dtype=jnp.int32)
    latents, _ = generate(jax.random.PRNGKey(0), bundle, {}, y)
    assert latents.shape == (2, 4, 16, 16)
    assert bool(jnp.isfinite(latents).all())


def test_make_sample_fn_scg_with_vae_and_classifier(tiny_world):
    """The full flagship wiring at toy scale: SCG + classifier guidance +
    VAE decode inside the scan."""
    denoiser, d_params, vae, v_params, classifier, c_params = tiny_world
    tables = make_schedule("linear", 1000, timestep_respacing="4").tables()
    cfg = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="classifier_guidance", schedule=True,
                                t_start=4, t_end=0, interval=1),
        scg=SCGConfig(num_samples=2, weights=(("pitch_hist", 1.0),)),
    )
    metas = [pipeline.ClassifierSpecMeta(
        fn="grad_nn_zt_mse", rule_name="pitch_hist", scale=1.0,
        model=classifier,
    )]
    generate = pipeline.make_sample_fn(
        denoiser_model=denoiser, tables=tables, sampler_config=cfg,
        gen_shape=(1, 4, 16, 16), vae_model=vae, classifier_metas=metas,
        guidance_method="classifier_guidance", use_decode=True,
        scale_factor=1.25, num_classes=3,
    )
    bundle = {
        "denoiser": d_params, "vae": v_params, "classifiers": (c_params,),
    }
    rules = {"pitch_hist": jnp.ones((1, 12)) / 12.0}
    y = jnp.zeros((1,), dtype=jnp.int32)
    latents, _ = generate(jax.random.PRNGKey(0), bundle, rules, y)
    assert latents.shape == (1, 4, 16, 16)
    assert bool(jnp.isfinite(latents).all())


def test_make_sample_fn_collage(tiny_world):
    denoiser, d_params, vae, v_params, _, _ = tiny_world
    tables = make_schedule("linear", 1000, timestep_respacing="3").tables()
    cfg = SamplerConfig(sampler="ddpm")
    # windows are 128 latent cols in the collage contract; our tiny model
    # accepts any T so use base windows directly
    from rule_guided_music_tpu.diffusion.collage import linear_length

    t_long = linear_length(2, 64)
    generate = pipeline.make_sample_fn(
        denoiser_model=denoiser, tables=tables, sampler_config=cfg,
        gen_shape=(1, 4, t_long, 16), use_decode=False, num_classes=3,
        collage=dict(num_img=2, overlap=64, circle=False),
    )
    bundle = {"denoiser": d_params, "vae": None, "classifiers": ()}
    y = jnp.zeros((1,), dtype=jnp.int32)
    latents, _ = generate(jax.random.PRNGKey(0), bundle, {}, y)
    assert latents.shape == (1, 4, t_long, 16)
    assert bool(jnp.isfinite(latents).all())


def test_resolve_given_targets():
    targets = {
        "pitch_hist": [2.0, 0, 0, 0, 2.0, 0, 0, 0, 0, 0, 0, 0],
        "vertical_nd": [1.0, 2.0],
        "horizontal_nd": [5.0, 10.0],
        "chord_progression": [1, 4, 5, 1],
    }
    out = pipeline.resolve_given_targets(targets, batch_size=3)
    assert set(out) == {"pitch_hist", "note_density", "chord_progression"}
    np.testing.assert_allclose(np.asarray(out["pitch_hist"][0]).sum(), 1.0)
    # horizontal nd divided by default scale 5 and concatenated
    np.testing.assert_allclose(np.asarray(out["note_density"][0]),
                               [1.0, 2.0, 1.0, 2.0])
    assert out["chord_progression"].shape == (3, 4)
    assert out["chord_progression"].dtype == jnp.int32


def test_resolve_given_targets_hr_scale():
    targets = {
        "vertical_nd_hr_2": [1.0],
        "horizontal_nd_hr_2": [4.0],
    }
    out = pipeline.resolve_given_targets(targets, batch_size=1)
    np.testing.assert_allclose(np.asarray(out["note_density_hr_2"][0]),
                               [1.0, 2.0])


def test_eval_rule_loss_dataframe():
    roll = np.full((2, 1, 128, 1024), -1.0, dtype=np.float32)
    roll[:, 0, 60, :] = 0.5
    roll[:, 0, 64, :] = 0.5
    roll[:, 0, 67, :] = 0.5
    generated = jnp.asarray(roll)
    from rule_guided_music_tpu.rules.registry import FUNC_DICT

    targets = {
        "pitch_hist": FUNC_DICT["pitch_hist"](generated),
        "chord_progression": FUNC_DICT["chord_progression"](generated),
    }
    df = pipeline.eval_rule_loss(generated, targets)
    assert len(df) == 2
    assert "pitch_hist.loss" in df.columns
    assert "chord_progression.key_str" in df.columns
    np.testing.assert_allclose(df["pitch_hist.loss"], 0.0, atol=1e-10)
    np.testing.assert_allclose(df["chord_progression.loss"], 0.0)
    summary = pipeline.summarize_losses(df)
    assert set(summary["Attr"]) == {"pitch_hist.loss", "chord_progression.loss"}


def test_sampler_config_from_yaml(tmp_path):
    import yaml

    from rule_guided_music_tpu.config import load_config, sampler_config_from_yaml

    cfg_yaml = {
        "target_rules": {"pitch_hist": None},
        "guidance": {
            "vae": True, "nn": False, "scg": True,
            "method": "no_guidance", "cond_fn": None,
            "schedule": True, "t_start": 750, "t_end": 0, "interval": 1,
        },
        "scg": {"num_samples": 16, "pitch_hist": 40.0},
        "sampling": {"use_ddim": False, "diff_collage": False, "t_end": 0},
    }
    path = tmp_path / "cfg.yml"
    path.write_text(yaml.dump(cfg_yaml))
    config = load_config(str(path))
    sc = sampler_config_from_yaml(config, rule_names=["pitch_hist"])
    assert sc.sampler == "ddpm"
    assert sc.scg is not None and sc.scg.num_samples == 16
    assert dict(sc.scg.weights)["pitch_hist"] == 40.0
    assert sc.guidance.t_start == 750 and sc.guidance.schedule


def test_checkpoint_roundtrip(tmp_path, tiny_world):
    denoiser, d_params, *_ = tiny_world
    import orbax.checkpoint as ocp

    path = str(tmp_path / "ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(d_params))
    ckptr.wait_until_finished()  # orbax saves are async
    restored = pipeline.load_checkpoint_params(path, target=jax.device_get(d_params))
    for a, b in zip(jax.tree_util.tree_leaves(d_params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_make_sample_fn_collage_with_windowed_scg(tiny_world):
    """demo1.yml-style wiring: circular DiffCollage + windowed SCG."""
    denoiser, d_params, vae, v_params, _, _ = tiny_world
    from rule_guided_music_tpu.diffusion.collage import circle_length

    tables = make_schedule("linear", 1000, timestep_respacing="3").tables()
    num_img, overlap = 1, 64
    t_long = circle_length(num_img, overlap)  # 128
    cfg = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=3, t_end=0, interval=1),
        scg=SCGConfig(num_samples=2, dc_base=16,
                      weights=(("pitch_hist", 40.0),
                               ("chord_progression", 2.0))),
    )
    generate = pipeline.make_sample_fn(
        denoiser_model=denoiser, tables=tables, sampler_config=cfg,
        gen_shape=(1, 4, t_long, 16), vae_model=vae, use_decode=True,
        scale_factor=1.25, num_classes=3,
        collage=dict(num_img=num_img, overlap=overlap, circle=True),
    )
    bundle = {"denoiser": d_params, "vae": v_params, "classifiers": ()}
    n_chord_windows = t_long * 8 // 128
    rules = {
        "pitch_hist": jnp.ones((1, 12)) / 12.0,
        "chord_progression": jnp.ones((1, n_chord_windows), dtype=jnp.int32),
    }
    y = jnp.zeros((1,), dtype=jnp.int32)
    latents, _ = generate(jax.random.PRNGKey(0), bundle, rules, y)
    assert latents.shape == (1, 4, t_long, 16)
    assert bool(jnp.isfinite(latents).all())


def test_make_sample_fn_mesh_matches_single_device(tiny_world):
    """mesh= shards inputs over data x fsdp; SPMD output must match the
    single-device program bit-for-bit (value semantics)."""
    from rule_guided_music_tpu.parallel.mesh import make_mesh

    denoiser, d_params, vae, v_params, _, _ = tiny_world
    tables = make_schedule("linear", 1000, timestep_respacing="4").tables()
    cfg = SamplerConfig(
        sampler="ddpm",
        scg=SCGConfig(num_samples=2, weights=(("pitch_hist", 1.0),)),
    )
    mesh = make_mesh(dp=4, fsdp=2, tp=1)
    common = dict(
        denoiser_model=denoiser, tables=tables, sampler_config=cfg,
        gen_shape=(8, 4, 16, 16), vae_model=vae, use_decode=True,
        num_classes=3,
    )
    gen_single = pipeline.make_sample_fn(**common)
    gen_mesh = pipeline.make_sample_fn(**common, mesh=mesh)
    bundle = {"denoiser": d_params, "vae": v_params, "classifiers": ()}
    rules = {"pitch_hist": jnp.ones((8, 12)) / 12.0}
    y = jnp.arange(8, dtype=jnp.int32) % 3

    out_s, _ = gen_single(jax.random.PRNGKey(3), bundle, rules, y)
    out_m, _ = gen_mesh(jax.random.PRNGKey(3), bundle, rules, y)
    assert out_m.shape == (8, 4, 16, 16)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               atol=1e-5, rtol=1e-5)


def test_make_sample_fn_scg_with_light_scoring_decoder(tiny_world):
    """Opt-in ScoringDecoder routes SCG candidate ranking through the light
    decoder (bundle['scoring_vae']) while the full VAE stays untouched."""
    from rule_guided_music_tpu.models import ScoringDecoder

    denoiser, d_params, vae, v_params, _, _ = tiny_world
    light = ScoringDecoder(ch=16, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
    l_params = light.init(jax.random.PRNGKey(9), jnp.zeros((1, 4, 2, 2)))

    tables = make_schedule("linear", 1000, timestep_respacing="4").tables()
    cfg = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=4, t_end=0, interval=1),
        scg=SCGConfig(num_samples=2, weights=(("pitch_hist", 1.0),)),
    )
    generate = pipeline.make_sample_fn(
        denoiser_model=denoiser, tables=tables, sampler_config=cfg,
        gen_shape=(1, 4, 16, 16), vae_model=vae,
        use_decode=True, scale_factor=1.25, num_classes=3,
        scoring_vae_model=light,
    )
    bundle = {
        "denoiser": d_params, "vae": v_params, "classifiers": (),
        "scoring_vae": l_params,
    }
    rules = {"pitch_hist": jnp.ones((1, 12)) / 12.0}
    y = jnp.zeros((1,), dtype=jnp.int32)
    latents, _ = generate(jax.random.PRNGKey(0), bundle, rules, y)
    assert latents.shape == (1, 4, 16, 16)
    assert bool(jnp.isfinite(latents).all())
