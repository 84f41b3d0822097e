"""Training runtime tests: train step, EMA, recombination, resamplers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.training.resample import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)
from rule_guided_music_tpu.training.train_loop import (
    TrainConfig,
    get_kl_input,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def tables():
    return make_schedule("linear", 100).tables()


def _tiny_model():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, t, y=None):
            b, c, h, w = x.shape
            flat = x.reshape(b, -1)
            temb = t[:, None] / 100.0
            out = nn.Dense(64)(jnp.concatenate([flat, temb], axis=-1))
            out = nn.silu(out)
            out = nn.Dense(c * h * w)(out)
            return out.reshape(b, c, h, w)

    return Tiny()


def test_train_step_reduces_loss(tables):
    model = _tiny_model()
    x = jnp.zeros((8, 1, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((8,)))
    config = TrainConfig(lr=1e-2, ema_rate=0.9)
    optimizer = make_optimizer(config)

    def model_apply(p, x, model_t, y, rng):
        return model.apply(p, x, model_t, y)

    step_fn = jax.jit(make_train_step(model_apply, tables, optimizer, config))
    state = {
        "params": params,
        "ema_params": params,
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    # A fixed dataset: x0 constant; the model should learn to predict noise
    # poorly at first, loss should drop over steps.
    rng = jax.random.PRNGKey(1)
    x0 = jnp.full((8, 1, 4, 4), 0.5)
    losses = []
    for i in range(30):
        rng, s1, s2 = jax.random.split(rng, 3)
        t = jax.random.randint(s1, (8,), 0, 100)
        state, metrics = step_fn(state, x0, t, jnp.ones((8,)), None, s2)
        losses.append(float(metrics["loss"]))
    assert int(state["step"]) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ema_update_moves_toward_params(tables):
    model = _tiny_model()
    x = jnp.zeros((2, 1, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    config = TrainConfig(lr=1e-2, ema_rate=0.5)
    optimizer = make_optimizer(config)

    def model_apply(p, x, model_t, y, rng):
        return model.apply(p, x, model_t, y)

    step_fn = jax.jit(make_train_step(model_apply, tables, optimizer, config))
    state = {
        "params": params,
        "ema_params": jax.tree_util.tree_map(jnp.zeros_like, params),
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    state, _ = step_fn(
        state, jnp.ones((2, 1, 4, 4)), jnp.array([5, 50]), jnp.ones((2,)),
        None, jax.random.PRNGKey(2),
    )
    # ema = 0.5*0 + 0.5*params_new: roughly half of params
    p_leaf = jax.tree_util.tree_leaves(state["params"])[0]
    e_leaf = jax.tree_util.tree_leaves(state["ema_params"])[0]
    np.testing.assert_allclose(np.asarray(e_leaf), np.asarray(p_leaf) / 2,
                               atol=1e-4)


def test_microbatch_accumulation_matches_full_batch(tables):
    model = _tiny_model()
    x = jnp.zeros((8, 1, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((8,)))

    def model_apply(p, x, model_t, y, rng):
        return model.apply(p, x, model_t, y)

    def run(microbatch):
        config = TrainConfig(lr=1e-3, ema_rate=0.99, microbatch=microbatch)
        optimizer = make_optimizer(config)
        step_fn = jax.jit(
            make_train_step(model_apply, tables, optimizer, config)
        )
        state = {
            "params": params,
            "ema_params": params,
            "opt_state": optimizer.init(params),
            "step": jnp.zeros((), jnp.int32),
        }
        x0 = jnp.linspace(-1, 1, 8 * 16).reshape(8, 1, 4, 4)
        t = jnp.arange(8) * 10
        state, metrics = step_fn(
            state, x0, t, jnp.ones((8,)), None, jax.random.PRNGKey(7)
        )
        return state, metrics

    # NOTE: microbatched and full-batch paths consume rngs differently, so
    # exact equality isn't expected — but shapes/finite-ness must hold and
    # per-example losses must cover the full batch.
    state_m, metrics_m = run(microbatch=4)
    assert metrics_m["per_example_loss"].shape == (8,)
    assert bool(jnp.isfinite(metrics_m["per_example_loss"]).all())
    state_f, metrics_f = run(microbatch=-1)
    assert metrics_f["per_example_loss"].shape == (8,)


def test_get_kl_input_geometry():
    """Shifted-window recombination: 20-chunk roll -> 4 overlapping excerpts
    (train_util.py:403-429 geometry with encode_rep=4)."""

    def fake_encode(chunks):
        # (N, 3, 128, 128) -> (N, 8, 16, 16) moments; mean half encodes the
        # chunk index stored in the roll so we can check window placement.
        n = chunks.shape[0]
        val = chunks[:, 0, 0, 0]
        mean = jnp.ones((n, 4, 16, 16)) * val[:, None, None, None]
        logvar = jnp.zeros((n, 4, 16, 16))
        return jnp.concatenate([mean, logvar], axis=1)

    batch = jnp.zeros((2, 3, 128, 20 * 128))
    for i in range(20):
        batch = batch.at[:, 0, 0, i * 128].set(float(i))
    out = get_kl_input(fake_encode, batch, scale_factor=2.0, shift_size=4)
    assert out.shape == (8, 4, 128, 16)  # 2 * 4 windows
    # window w of example b starts at chunk 4*w: latent rows [0:16) carry
    # chunk (4w) value * scale_factor
    out = np.asarray(out)
    assert out[0, 0, 0, 0] == pytest.approx(0.0 * 2)
    assert out[1, 0, 0, 0] == pytest.approx(4.0 * 2)
    assert out[2, 0, 0, 0] == pytest.approx(8.0 * 2)
    # second example's windows follow
    assert out[4, 0, 0, 0] == pytest.approx(0.0 * 2)


def test_uniform_sampler():
    s = UniformSampler(100)
    rng = np.random.default_rng(0)
    t, w = s.sample(512, rng)
    assert t.shape == (512,) and w.shape == (512,)
    assert t.min() >= 0 and t.max() < 100
    np.testing.assert_allclose(w, 1.0)


def test_loss_second_moment_resampler_warmup_and_weighting():
    s = LossSecondMomentResampler(10, history_per_term=2, uniform_prob=0.0)
    # before warmup: uniform
    np.testing.assert_allclose(s.weights(), 1.0)
    # feed losses: timestep 3 has much higher loss
    for _ in range(2):
        s.update_with_all_losses(list(range(10)), [1.0] * 10)
    s._loss_history[3, :] = 10.0
    w = s.weights()
    assert w[3] > w[0]
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)


def test_loss_second_moment_ring_matches_sequential_semantics():
    """Property test pinning the vectorized ring buffer: after any update
    stream, weights equal sqrt(mean of the squares of the most recent
    ``history_per_term`` losses per t), mixed with a uniform floor."""
    n, h, u = 7, 3, 0.01
    s = LossSecondMomentResampler(n, history_per_term=h, uniform_prob=u)
    rng = np.random.default_rng(7)
    seen = {t: [] for t in range(n)}   # naive sequential model
    for _ in range(20):
        batch = rng.integers(0, n, size=rng.integers(1, 12))
        losses = rng.uniform(0.1, 5.0, size=batch.size)
        s.update_with_all_losses(batch, losses)
        for t, lo in zip(batch.tolist(), losses.tolist()):
            seen[t].append(lo)
        if all(len(v) >= h for v in seen.values()):
            expected_rms = np.array(
                [np.sqrt(np.mean(np.square(seen[t][-h:]))) for t in range(n)]
            )
            p = expected_rms / expected_rms.sum()
            np.testing.assert_allclose(
                s.weights(), (1 - u) * p + u / n, rtol=1e-12)
        else:
            np.testing.assert_allclose(s.weights(), 1.0)


def test_loss_second_moment_repeated_t_in_one_batch():
    """A single batch with > history_per_term observations of one t keeps
    only the most recent h of them (in-batch overwrite wraps the ring)."""
    h = 2
    s = LossSecondMomentResampler(4, history_per_term=h, uniform_prob=0.0)
    # warm every t, then flood t=1 with 5 observations in one call
    s.update_with_all_losses([0, 1, 2, 3, 0, 1, 2, 3], [1.0] * 8)
    s.update_with_all_losses([1] * 5, [10.0, 20.0, 30.0, 4.0, 3.0])
    w = s.weights()
    expected_rms = np.array(
        [1.0, np.sqrt((4.0**2 + 3.0**2) / 2), 1.0, 1.0])
    np.testing.assert_allclose(w, expected_rms / expected_rms.sum(),
                               rtol=1e-12)


def test_create_named_schedule_sampler():
    assert isinstance(create_named_schedule_sampler("uniform", 10),
                      UniformSampler)
    assert isinstance(
        create_named_schedule_sampler("loss-second-moment", 10),
        LossSecondMomentResampler,
    )
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("bogus", 10)


def test_make_eval_sampling_fn_writes_midi(tmp_path, monkeypatch):
    """The training-time eval hook samples with EMA params and writes MIDI."""
    import flax.linen as nn

    from rule_guided_music_tpu.diffusion.schedule import make_schedule
    from rule_guided_music_tpu.training.train_loop import make_eval_sampling_fn
    from rule_guided_music_tpu.utils import logger

    monkeypatch.chdir(tmp_path)
    logger.configure(dir=str(tmp_path / "run"), format_strs=[])

    class TinyDenoiser(nn.Module):
        @nn.compact
        def __call__(self, x, t, y=None):
            b, c, h, w = x.shape
            out = nn.Dense(c * h * w)(x.reshape(b, -1))
            return out.reshape(b, c, h, w)

    model = TinyDenoiser()
    x = jnp.zeros((2, 3, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    tables = make_schedule("linear", 1000, timestep_respacing="4").tables()

    eval_fn = make_eval_sampling_fn(
        lambda p, x, t, y: model.apply(p, x, t, y),
        tables,
        vae_model=None,
        sample_batch_size=2,
        num_classes=2,
        in_channels=3,
        image_size=(16, 4),
    )

    class FakeLoop:
        step = 7
        resume_step = 0
        state = {"ema_params": params}
        vae_params = None

    eval_fn(FakeLoop())
    sample_dir = tmp_path / "run" / "samples" / "iter_7"
    midis = list(sample_dir.glob("*.midi"))
    assert len(midis) == 2
    logger.get_current().close()


def test_checkpoint_schema_and_retention(tmp_path, tables):
    """save() stamps a schema marker, restore() validates it, and
    keep_checkpoints prunes old step dirs."""
    import flax.linen as nn

    from rule_guided_music_tpu.training.train_loop import TrainLoop

    model = _tiny_model()
    x = jnp.zeros((2, 1, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))

    def model_apply(p, x, model_t, y, rng):
        return model.apply(p, x, model_t, y)

    config = TrainConfig(lr=1e-3, ema_rate=0.9, keep_checkpoints=2)
    loop = TrainLoop(
        model_apply=model_apply, init_params=params, tables=tables,
        data=None, config=config, checkpoint_dir=str(tmp_path),
    )
    for step in (1, 2, 3):
        loop.step = step
        loop.save()
    dirs = sorted(d for d in (p.name for p in tmp_path.iterdir())
                  if d.startswith("step_"))
    assert dirs == ["step_000002", "step_000003"]
    assert (tmp_path / "step_000003" / "SCHEMA").read_text().strip() \
        == TrainLoop.CKPT_SCHEMA

    # restore round-trips through the schema check
    loop2 = TrainLoop(
        model_apply=model_apply, init_params=params, tables=tables,
        data=None, config=config, checkpoint_dir=str(tmp_path),
    )
    loop2.restore(str(tmp_path / "step_000003"))
    assert loop2.resume_step == 3

    # a mismatched schema is rejected
    (tmp_path / "step_000003" / "SCHEMA").write_text("other/v9\n")
    with pytest.raises(ValueError, match="schema"):
        loop2.restore(str(tmp_path / "step_000003"))


def test_train_loop_mesh_sharding_applied(tables):
    """VERDICT r1 item 5: TrainLoop(mesh=...) must actually shard the train
    state — params, EMA, and optimizer moments carry the dit_param_spec
    NamedShardings after a real run_step, and the step stays donation-safe."""
    from jax.sharding import PartitionSpec as P

    from rule_guided_music_tpu.models import DiT_models
    from rule_guided_music_tpu.parallel.mesh import make_mesh
    from rule_guided_music_tpu.training.train_loop import TrainLoop

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    model = DiT_models["DiTRotary_XS_8"](
        input_size=(32, 16), in_channels=4, num_classes=3, learn_sigma=False,
    )
    x = jnp.zeros((8, 4, 32, 16))
    t0 = jnp.zeros((8,))
    y0 = jnp.zeros((8,), dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "label_dropout": jax.random.PRNGKey(1)},
        x, t0, y0, train=True,
    )

    def model_apply(p, xx, tt, yy, rng):
        return model.apply(p, xx, tt, yy, train=True,
                           rngs={"label_dropout": rng})

    loop = TrainLoop(
        model_apply=model_apply, init_params=params, tables=tables,
        data=None, config=TrainConfig(lr=1e-3, ema_rate=0.99), mesh=mesh,
    )
    for _ in range(2):
        metrics = loop.run_step(
            np.random.default_rng(0).normal(size=(8, 4, 32, 16)).astype(
                np.float32),
            {"y": np.zeros((8,), np.int64)},
        )
    assert np.isfinite(float(metrics["loss"]))
    assert int(loop.state["step"]) == 2

    qkv = loop.state["params"]["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P("fsdp", "model"), qkv.sharding
    ema_qkv = loop.state["ema_params"]["params"]["blocks_0"]["attn"]["qkv"][
        "kernel"]
    assert ema_qkv.sharding.spec == P("fsdp", "model")
    # optimizer moments inherit the param shardings (FSDP'd optimizer state)
    mu_qkv = loop.state["opt_state"][0].mu["params"]["blocks_0"]["attn"][
        "qkv"]["kernel"]
    assert mu_qkv.sharding.spec == P("fsdp", "model"), mu_qkv.sharding
    # the state is actually distributed: each shard holds 1/4 of the leaf
    shard = qkv.addressable_shards[0].data
    assert shard.shape == (qkv.shape[0] // 2, qkv.shape[1] // 2)


def test_train_loop_restore_preserves_sharding(tmp_path, tables):
    """Orbax resume on a mesh TrainLoop must re-establish the pre-restore
    NamedShardings: a bare device_put would commit every leaf to the default
    device, silently un-FSDPing the run (ref parity: train_util.py:150-189
    resume path under DDP keeps per-rank placement)."""
    from jax.sharding import PartitionSpec as P

    from rule_guided_music_tpu.models import DiT_models
    from rule_guided_music_tpu.parallel.mesh import make_mesh
    from rule_guided_music_tpu.training.train_loop import TrainLoop

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    model = DiT_models["DiTRotary_XS_8"](
        input_size=(32, 16), in_channels=4, num_classes=3, learn_sigma=False,
    )
    x = jnp.zeros((8, 4, 32, 16))
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "label_dropout": jax.random.PRNGKey(1)},
        x, jnp.zeros((8,)), jnp.zeros((8,), dtype=jnp.int32), train=True,
    )

    def model_apply(p, xx, tt, yy, rng):
        return model.apply(p, xx, tt, yy, train=True,
                           rngs={"label_dropout": rng})

    def make_loop():
        return TrainLoop(
            model_apply=model_apply, init_params=params, tables=tables,
            data=None, config=TrainConfig(lr=1e-3, ema_rate=0.99),
            mesh=mesh, checkpoint_dir=str(tmp_path),
        )

    batch = np.random.default_rng(0).normal(size=(8, 4, 32, 16)).astype(
        np.float32)
    cond = {"y": np.zeros((8,), np.int64)}
    loop = make_loop()
    loop.run_step(batch, cond)
    loop.step = 1
    loop.save()

    loop2 = make_loop()
    loop2.restore(str(tmp_path / "step_000001"))
    qkv = loop2.state["params"]["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P("fsdp", "model"), qkv.sharding
    mu = loop2.state["opt_state"][0].mu["params"]["blocks_0"]["attn"]["qkv"][
        "kernel"]
    assert mu.sharding.spec == P("fsdp", "model"), mu.sharding
    # shards are truly distributed, and the restored state still steps
    assert qkv.addressable_shards[0].data.shape == (
        qkv.shape[0] // 2, qkv.shape[1] // 2)
    metrics = loop2.run_step(batch, cond)
    assert np.isfinite(float(metrics["loss"]))
    assert int(loop2.state["step"]) == 2  # restored at 1, stepped once
    assert loop2.resume_step == 1


def test_build_mesh_cli_helper(monkeypatch):
    """scripts/train_dit.build_mesh: default single-axis absorption, the
    divisibility guard, and the single-device fast path."""
    import argparse

    from scripts.train_dit import build_mesh

    ns = argparse.Namespace(dp=0, fsdp=2, tp=2, batch_size=8)
    mesh = build_mesh(ns)
    assert mesh.shape["data"] * mesh.shape["fsdp"] * mesh.shape["model"] \
        == jax.device_count()
    assert mesh.shape["fsdp"] == 2 and mesh.shape["model"] == 2

    ns_bad = argparse.Namespace(dp=0, fsdp=8, tp=1, batch_size=4)
    with pytest.raises(AssertionError, match="divisible"):
        build_mesh(ns_bad)


def test_lpips_module_and_converter():
    """Perceptual LPIPS (VERDICT r1 row 40): self-distance is zero, it
    responds to perturbations, and the torch-layout converter produces the
    exact flax tree."""
    from rule_guided_music_tpu.training.perceptual import (
        _VGG_BLOCKS,
        LPIPS,
        convert_torch_lpips,
    )

    lpips = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 64, 64)).astype(np.float32) * 0.3)
    params = lpips.init(jax.random.PRNGKey(0), x, x)
    d_self = lpips.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d_self), 0.0, atol=1e-6)
    d_pert = lpips.apply(params, x, x + 0.2)
    assert float(jnp.abs(d_pert).sum()) > 0

    # converter round trip from synthetic torch-layout state dicts
    rng = np.random.default_rng(1)
    vgg_sd, lins_sd = {}, {}
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    cin = 3
    k = 0
    for n_convs, ch in _VGG_BLOCKS:
        for _ in range(n_convs):
            i = tv_idx[k]
            vgg_sd[f"{i}.weight"] = rng.normal(
                size=(ch, cin, 3, 3)).astype(np.float32) * 0.02
            vgg_sd[f"{i}.bias"] = np.zeros(ch, np.float32)
            cin = ch
            k += 1
    for li, (_, ch) in enumerate(_VGG_BLOCKS):
        lins_sd[f"lin{li}.model.1.weight"] = np.abs(rng.normal(
            size=(1, ch, 1, 1))).astype(np.float32)
    converted = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_lpips(vgg_sd, lins_sd))
    out = lpips.apply(converted, x, x + 0.1)
    assert out.shape == (2,)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_vae_train_step_with_perceptual_term():
    from rule_guided_music_tpu.models import AutoencoderKL
    from rule_guided_music_tpu.training.perceptual import LPIPS
    from rule_guided_music_tpu.training.vae_train import (
        VAETrainConfig,
        make_vae_train_steps,
    )

    vae = AutoencoderKL(ch=8, ch_mult=(1, 2), num_res_blocks=1)
    x = jnp.zeros((2, 3, 32, 32))
    params = vae.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    lpips = LPIPS()
    lp = lpips.init(jax.random.PRNGKey(2), x, x)
    config = VAETrainConfig(lr=1e-4, perceptual_weight=0.5)
    ae_opt, _, ae_step, _ = make_vae_train_steps(vae, config, lpips=lpips)
    opt_state = ae_opt.init(params)
    params, opt_state, aux = ae_step(
        params, opt_state, None, x + 0.1, jax.random.PRNGKey(3),
        jnp.int32(0), lp,
    )
    assert np.isfinite(float(aux["aeloss"]))
    assert float(aux["rec_loss"]) > 0


def test_nan_step_is_skipped(tables):
    """A batch that produces non-finite grads must leave params, EMA, and
    optimizer state untouched (reference fp16 overflow-skip semantics,
    fp16_util.py:193-197) and flag metrics['skipped']."""
    model = _tiny_model()
    x = jnp.zeros((4, 1, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((4,)))
    config = TrainConfig(lr=1e-2, ema_rate=0.9)
    optimizer = make_optimizer(config)

    def model_apply(p, xx, tt, y, rng):
        return model.apply(p, xx, tt, y)

    step_fn = jax.jit(make_train_step(model_apply, tables, optimizer, config))
    state = {
        "params": params,
        "ema_params": jax.tree_util.tree_map(jnp.copy, params),
        "opt_state": optimizer.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    bad = jnp.full((4, 1, 4, 4), jnp.nan)
    t = jnp.zeros((4,), jnp.int32) + 3
    before = jax.device_get(state["params"])
    state, metrics = step_fn(state, bad, t, jnp.ones((4,)), None,
                             jax.random.PRNGKey(1))
    assert float(metrics["skipped"]) == 1.0
    after = jax.device_get(state["params"])
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert int(state["step"]) == 1  # the step counter still advances

    # a good batch afterwards trains normally
    state, metrics = step_fn(state, jnp.zeros_like(bad), t, jnp.ones((4,)),
                             None, jax.random.PRNGKey(2))
    assert float(metrics["skipped"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))
