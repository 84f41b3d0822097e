"""Segmented (resumable) sampling: sample_loop(t_begin/t_stop).

Splitting the reverse chain into bounded dispatches with carried state
serves two needs: streaming/resumable generation, and keeping any single
device dispatch under RPC deadlines on remote-attached accelerators (the
true 1000-step DDPM bench measurement).  Unlike ``config.t_end`` the
segment bounds do NOT move the noise/SCG boundary masks, so the per-step
program is identical to the contiguous chain — proven bitwise here on the
deterministic DDIM eta=0 path (no stochastic draws after init, so rng
re-seeding between segments is immaterial).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
    sample_loop,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models

SHAPE = (2, 4, 128, 16)


def _model_fn():
    model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False,
    )
    p = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 128, 16)),
                   jnp.zeros((1,)))
    p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                               a.shape, a.dtype), p)
    return lambda x, t, y=None: model.apply(p, x, t)


def test_ddim_eta0_segments_match_contiguous():
    model_fn = _model_fn()
    tables = make_schedule("linear", 1000, timestep_respacing="12").tables()
    config = SamplerConfig(sampler="ddim", eta=0.0)

    x_T = jax.random.normal(jax.random.PRNGKey(2), SHAPE)

    run = jax.jit(lambda n: sample_loop(
        jax.random.PRNGKey(3), model_fn, SHAPE, tables, config, noise=n)[0])
    contiguous = np.asarray(run(x_T))

    seg = lambda hi, lo: jax.jit(lambda n: sample_loop(
        jax.random.PRNGKey(4), model_fn, SHAPE, tables, config, noise=n,
        t_begin=hi, t_stop=lo)[0])
    mid = seg(12, 6)(x_T)
    final = seg(6, 0)(mid)
    np.testing.assert_array_equal(contiguous, np.asarray(final))


def test_ddpm_scg_segments_run_and_guide_across_boundary():
    """DDPM+SCG segmented chain stays finite and the boundary step keeps
    its noise (the t_end mask is untouched by t_stop)."""
    model_fn = _model_fn()
    tables = make_schedule("linear", 1000, timestep_respacing="8").tables()
    config = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=8, t_end=0),
        scg=SCGConfig(num_samples=2, weights=(("pitch_hist", 1.0),)),
    )
    rules = {"pitch_hist": jnp.ones((SHAPE[0], 12)) / 12.0}

    x_T = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    seg = lambda hi, lo, r: jax.jit(lambda n: sample_loop(
        jax.random.PRNGKey(r), model_fn, SHAPE, tables, config,
        rules=rules, noise=n, t_begin=hi, t_stop=lo)[0])
    mid = seg(8, 4, 6)(x_T)
    out = np.asarray(seg(4, 0, 7)(mid))
    assert out.shape == SHAPE
    assert np.isfinite(out).all()

    # The boundary step (t=4, last of segment 1) must keep its noise and
    # its SCG search: t_stop=4 runs the same steps (7..4) as config
    # t_end=4 but WITHOUT the t_end boundary masks, so with the same rng
    # the two must differ exactly at the boundary handling.
    import dataclasses
    cfg_tend = dataclasses.replace(config, t_end=4)
    masked = jax.jit(lambda n: sample_loop(
        jax.random.PRNGKey(6), model_fn, SHAPE, tables, cfg_tend,
        rules=rules, noise=n, t_begin=8)[0])(x_T)
    unmasked = jax.jit(lambda n: sample_loop(
        jax.random.PRNGKey(6), model_fn, SHAPE, tables, config,
        rules=rules, noise=n, t_begin=8, t_stop=4)[0])(x_T)
    assert not np.array_equal(np.asarray(masked), np.asarray(unmasked))
