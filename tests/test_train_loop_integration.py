"""Production TrainLoop integration: eval-set loss hook + kill/resume soak.

Covers the two round-3 verdict gaps in the training runtime:
  * eval-set loss with EMA params logged as ``eval_*`` quartile keys every
    eval_interval (reference train_util.py:222-254 run_step_eval semantics,
    log_loss_dict :469-475);
  * a sustained run of the real TrainLoop with the loss-aware sampler
    updating, periodic Orbax saves, a mid-run "kill" (fresh TrainLoop
    object), and a resume that continues step counting and training
    (reference resume flow train_util.py:150-189).
"""

import csv
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.training.resample import LossSecondMomentResampler
from rule_guided_music_tpu.training.train_loop import (
    TrainConfig,
    TrainLoop,
    make_eval_loss_step,
)
from rule_guided_music_tpu.utils import logger


def _tiny_model():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, t, y=None):
            b, c, h, w = x.shape
            flat = x.reshape(b, -1)
            temb = t[:, None] / 100.0
            out = nn.Dense(32)(jnp.concatenate([flat, temb], axis=-1))
            out = nn.silu(out)
            out = nn.Dense(c * h * w)(out)
            return out.reshape(b, c, h, w)

    return Tiny()


def _data_iter(seed, batch=8):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
    while True:
        noise = rng.normal(scale=0.05, size=(batch, 1, 4, 4))
        yield (base + noise).astype(np.float32), {}


def _make_loop(tmp_path, *, eval_data=None, sampler=None, seed=0,
               save_interval=50, eval_interval=-1, timesteps=100):
    model = _tiny_model()
    x = jnp.zeros((8, 1, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((8,)))
    tables = make_schedule(
        "linear", 1000, timestep_respacing=str(timesteps)).tables()
    config = TrainConfig(
        lr=1e-2, ema_rate=0.9, log_interval=10,
        save_interval=save_interval, eval_interval=eval_interval,
    )

    def model_apply(p, x, model_t, y, rng):
        return model.apply(p, x, model_t, y)

    return TrainLoop(
        model_apply=model_apply,
        init_params=params,
        tables=tables,
        data=_data_iter(seed),
        config=config,
        schedule_sampler=sampler,
        checkpoint_dir=str(tmp_path / "checkpoints"),
        eval_data=eval_data,
        seed=seed,
    )


def test_eval_loss_hook_logs_eval_keys(tmp_path):
    logger.configure(dir=str(tmp_path / "run"), format_strs=["csv"])
    loop = _make_loop(tmp_path, eval_data=_data_iter(99), eval_interval=2,
                      save_interval=1000)
    assert loop.eval_loss_fn is not None
    loop.run_loop(max_steps=5)
    logger.get_current().close()

    with open(osp.join(str(tmp_path / "run"), "progress.csv")) as f:
        rows = list(csv.DictReader(f))
    header = rows[0].keys()
    assert "eval_loss" in header
    assert any(k.startswith("eval_loss_q") for k in header)
    # train loss is logged alongside, distinct key
    assert "loss" in header
    eval_vals = [float(r["eval_loss"]) for r in rows if r.get("eval_loss")]
    assert eval_vals and all(np.isfinite(v) for v in eval_vals)


def test_eval_loss_uses_ema_params(tmp_path):
    """The eval loss must be computed under EMA params, not live params —
    zeroing the EMA tree must change the reported terms."""
    logger.configure(dir=str(tmp_path / "run2"), format_strs=[])
    loop = _make_loop(tmp_path, eval_data=_data_iter(7), eval_interval=1,
                      save_interval=1000)
    loop.run_loop(max_steps=3)
    batch, cond = next(loop.eval_data)
    loop.jax_rng = jax.random.PRNGKey(0)
    t1 = loop.run_step_eval(batch, cond)
    # same rng stream, EMA replaced -> different loss
    loop.state = dict(
        loop.state,
        ema_params=jax.tree_util.tree_map(
            jnp.zeros_like, loop.state["ema_params"]),
    )
    loop.jax_rng = jax.random.PRNGKey(0)
    t2 = loop.run_step_eval(batch, cond)
    assert not np.allclose(np.asarray(t1["loss"]), np.asarray(t2["loss"]))


def test_make_eval_loss_step_no_param_update():
    """Forward-only: calling the eval step must not touch params."""
    model = _tiny_model()
    x = jnp.ones((4, 1, 4, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((4,)))
    tables = make_schedule("linear", 100).tables()

    def model_apply(p, xx, tt, y, rng):
        return model.apply(p, xx, tt, y)

    fn = jax.jit(make_eval_loss_step(model_apply, tables, TrainConfig()))
    terms = fn(params, x, jnp.array([0, 10, 50, 99]), None,
               jax.random.PRNGKey(1))
    assert terms["loss"].shape == (4,)
    assert bool(jnp.isfinite(terms["loss"]).all())


@pytest.mark.slow
def test_sustained_run_with_kill_and_resume(tmp_path):
    """Mini-soak of the production loop: loss-aware sampler active, Orbax
    saves firing, a mid-run kill, resume continuity, decreasing loss."""
    logger.configure(dir=str(tmp_path / "soak"), format_strs=[])
    # 20 timestep bins: 90 steps x batch 8 = 720 draws fills every
    # 4-deep history with overwhelming probability (mean 36/bin)
    sampler = LossSecondMomentResampler(20, history_per_term=4)
    loop = _make_loop(tmp_path, sampler=sampler, save_interval=40,
                      seed=3, timesteps=20)
    first_losses = []
    orig = loop.run_step

    def run_step(batch, cond):
        m = orig(batch, cond)
        first_losses.append(float(m["loss"]))
        return m

    loop.run_step = run_step
    loop.run_loop(max_steps=90)          # saves at 40, 80, and final 90
    assert sampler._warmed_up()          # loss-aware history filled
    w = sampler.weights()
    assert not np.allclose(w, w[0])      # importance weights differentiated

    latest = TrainLoop.latest_checkpoint(str(tmp_path / "checkpoints"))
    assert latest is not None and latest.endswith("step_000090")

    # "kill": a brand-new loop object (fresh rngs/opt), resume from disk
    loop2 = _make_loop(tmp_path, sampler=LossSecondMomentResampler(
        20, history_per_term=4), save_interval=40, seed=4, timesteps=20)
    loop2.restore(latest)
    assert loop2.resume_step == 90
    second_losses = []
    orig2 = loop2.run_step

    def run_step2(batch, cond):
        m = orig2(batch, cond)
        second_losses.append(float(m["loss"]))
        return m

    loop2.run_step = run_step2
    loop2.run_loop(max_steps=60)
    # in-tree step counter continues from the restored value
    assert int(loop2.state["step"]) == 150
    # next save lands at global step 130 / 150 (40-interval continuity)
    ckpts = sorted(
        d for d in
        __import__("os").listdir(str(tmp_path / "checkpoints"))
        if d.startswith("step_")
    )
    assert "step_000130" in ckpts and "step_000150" in ckpts
    # training still converging across the kill: late loss < early loss
    assert np.mean(second_losses[-20:]) < np.mean(first_losses[:20])
    assert all(np.isfinite(first_losses + second_losses))
