"""Cross-step model-output reuse (SamplerConfig.reuse_interval).

SmoothCache/FORA-family accelerator (PAPERS.md arXiv 2411.10510): the
trajectory denoiser output is recomputed only every N-th step and reused in
between.  Unlike the scoring substitutes this approximates the TRAJECTORY,
so it ships opt-in with (a) exactness when disabled, (b) structural
correctness (first-step refresh, segment rejection), and (c) an end-to-end
quality gate on the learned fixture in the slow tier.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.diffusion.sampling import (
    EditConfig,
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
    sample_loop,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule

SHAPE = (2, 4, 32, 16)


def _model_fn(x, model_t, y=None):
    # smooth, t-dependent pseudo-denoiser (deterministic, cheap)
    return 0.1 * x + 0.01 * model_t.reshape(-1, 1, 1, 1).astype(x.dtype)


def _counting_model_fn(counter):
    def fn(x, model_t, y=None):
        counter.append(1)
        return _model_fn(x, model_t, y)

    return fn


def _tables(n="8"):
    return make_schedule("linear", 1000, timestep_respacing=n).tables()


def test_reuse_off_and_one_match_baseline_bitwise():
    tables = _tables()
    rng = jax.random.PRNGKey(0)
    base = sample_loop(rng, _model_fn, SHAPE, tables, SamplerConfig())[0]
    for n in (0, 1):
        out = sample_loop(
            rng, _model_fn, SHAPE, tables,
            SamplerConfig(reuse_interval=n))[0]
        np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


def test_reuse_two_runs_and_differs():
    tables = _tables()
    rng = jax.random.PRNGKey(0)
    base = sample_loop(rng, _model_fn, SHAPE, tables, SamplerConfig())[0]
    out = sample_loop(
        rng, _model_fn, SHAPE, tables, SamplerConfig(reuse_interval=2))[0]
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_reuse_matches_manual_cached_chain():
    """reuse_interval=2 must equal a hand-rolled chain that recomputes the
    model on even positions and reuses the previous output on odd ones."""
    from rule_guided_music_tpu.diffusion import gaussian as gd

    tables = _tables("6")
    cfg = SamplerConfig(reuse_interval=2)
    rng = jax.random.PRNGKey(3)
    out = sample_loop(rng, _model_fn, SHAPE, tables, cfg)[0]

    # manual replica of the scan (ddpm, no guidance)
    rng2, init_rng = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(init_rng, SHAPE)
    start_t = tables.num_timesteps - 1
    cached = None
    for pos, t_scalar in enumerate(range(start_t, -1, -1)):
        rng2, noise_rng, _ = jax.random.split(rng2, 3)
        t = jnp.full((SHAPE[0],), t_scalar, dtype=jnp.int32)
        if pos % 2 == 0:
            cached = _model_fn(x, tables.model_t[t]).astype(jnp.float32)
        pmv = gd.p_mean_variance(tables, cached, x, t)
        noise = jax.random.normal(noise_rng, x.shape, dtype=x.dtype)
        nz = jnp.asarray(t_scalar > 0, dtype=x.dtype)
        x = pmv.mean + nz * jnp.exp(0.5 * pmv.log_variance) * noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_reuse_only_refresh_steps_reach_the_model():
    """The final sample must depend ONLY on the model's behavior at refresh
    steps: two models that differ exclusively at non-refresh timesteps give
    identical chains under reuse (i.e. the cond truly skips the compute —
    semantically, not just by branch structure)."""
    tables = _tables("9")   # 9 steps, reuse 3 -> refreshes at t = 8, 5, 2
    refresh_model_ts = jnp.asarray(
        [int(tables.model_t[t]) for t in (8, 5, 2)], dtype=jnp.float32)

    def make_marked(delta_on_non_refresh):
        def fn(x, model_t, y=None):
            base = _model_fn(x, model_t, y)
            is_refresh = jnp.any(
                jnp.abs(model_t[0] - refresh_model_ts) < 0.5)
            return jnp.where(is_refresh, base, base + delta_on_non_refresh)

        return fn

    a = sample_loop(jax.random.PRNGKey(1), make_marked(0.0), SHAPE, tables,
                    SamplerConfig(reuse_interval=3))[0]
    b_ = sample_loop(jax.random.PRNGKey(1), make_marked(123.0), SHAPE,
                     tables, SamplerConfig(reuse_interval=3))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
    # and without reuse the marked models DO diverge (the marker is live)
    c = sample_loop(jax.random.PRNGKey(1), make_marked(123.0), SHAPE,
                    tables, SamplerConfig())[0]
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_reuse_t_max_window_semantics():
    """With reuse_t_max = m, steps at t >= m ALWAYS refresh; reuse happens
    only below m. Verified the same way as the refresh-position test: two
    models differing exclusively at (t < m, odd-position) steps must agree."""
    tables = _tables("9")
    m = 5
    # positions 0..8 map to t 8..0; refresh set = {pos even} U {t >= m}
    refresh_ts = sorted({8 - p for p in range(9) if p % 2 == 0}
                        | {t for t in range(9) if t >= m})
    refresh_model_ts = jnp.asarray(
        [int(tables.model_t[t]) for t in refresh_ts], dtype=jnp.float32)

    def make_marked(delta):
        def fn(x, model_t, y=None):
            base = _model_fn(x, model_t, y)
            is_refresh = jnp.any(
                jnp.abs(model_t[0] - refresh_model_ts) < 0.5)
            return jnp.where(is_refresh, base, base + delta)

        return fn

    cfg = SamplerConfig(reuse_interval=2, reuse_t_max=m)
    a = sample_loop(jax.random.PRNGKey(1), make_marked(0.0), SHAPE, _tables("9"),
                    cfg)[0]
    b_ = sample_loop(jax.random.PRNGKey(1), make_marked(123.0), SHAPE,
                     _tables("9"), cfg)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
    # sanity: the marker mechanism is live — a NO-reuse chain calls the
    # model at every t including the marked (non-refresh) ones {1, 3}, so
    # the marked model must diverge from the unmarked windowed run
    c = sample_loop(jax.random.PRNGKey(1), make_marked(123.0), SHAPE,
                    _tables("9"), SamplerConfig())[0]
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_reuse_first_step_refreshes_on_edit_chain():
    """Edit chains start mid-schedule (start_t = noise_level - 1); the
    position is counted from the chain start so the first executed step
    must refresh — the zero-initialized cache is never consumed."""
    tables = _tables("8")
    cfg = SamplerConfig(
        reuse_interval=2, edit=EditConfig(noise_level=5, l_start=0, l_end=16),
    )
    gt = jnp.ones(SHAPE) * 100.0   # a poisoned cache would leak zeros/huge x
    mask = jnp.zeros(SHAPE).at[:, :, :8, :].set(1.0)
    out = sample_loop(
        jax.random.PRNGKey(2), _model_fn, SHAPE, tables, cfg,
        edit_gt=gt, edit_mask=mask)[0]
    assert np.isfinite(np.asarray(out)).all()
    # masked region is replaced by (scaled) gt through the posterior — if
    # the first step had consumed the zero cache the magnitudes would be
    # wildly off; sanity-bound them instead of exact values
    assert np.abs(np.asarray(out)).max() < 1e4


def test_reuse_rejects_segmented_chains():
    tables = _tables("8")
    with pytest.raises(ValueError, match="segmented"):
        sample_loop(
            jax.random.PRNGKey(0), _model_fn, SHAPE, tables,
            SamplerConfig(reuse_interval=2), t_begin=8, t_stop=4)


def test_reuse_with_scg_runs():
    """SCG search stays fresh every step; only the trajectory output is
    cached. ddim eta=1 + SCG mirrors the production fast path."""
    tables = _tables("8")
    cfg = SamplerConfig(
        sampler="ddim", eta=1.0, reuse_interval=2,
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=8, t_end=0),
        scg=SCGConfig(num_samples=2, weights=(("pitch_hist", 1.0),)),
    )
    rules = {"pitch_hist": jnp.ones((SHAPE[0], 12)) / 12.0}

    def decode_fn(z):
        roll = jnp.transpose(z.mean(axis=1, keepdims=True), (0, 1, 3, 2))
        return jnp.tile(roll, (1, 1, 8, 1))

    out = sample_loop(
        jax.random.PRNGKey(4), _model_fn, SHAPE, tables, cfg,
        rules=rules, decode_fn=decode_fn)[0]
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# end-to-end quality gate on the learned fixture (slow tier)

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
QUALITY = os.path.join(_DIR, "quality_tiny.npz")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(QUALITY),
                    reason="learned fixture missing")
def test_reuse_quality_gate_on_learned_fixture():
    """WINDOWED trajectory reuse must keep most of SCG's benefit on the
    learned model even in the hostile coarse-chain regime (same thresholds
    as the scoring substitutes: <= 0.8 x no-guidance and <= 1.6 x exact).

    The 16-step chain is deliberately the WORST case: the round-3 envelope
    (docs/PERF.md) measured UNwindowed reuse2 here at 6.3x worse than no
    guidance (stale-eps 1/sqrt(ᾱ) amplification), while 32+ steps pass
    comfortably. The reuse_t_max high-t guard is what this test gates."""
    from rule_guided_music_tpu.diffusion.latent import (
        make_decode_fn,
        make_encode_fn,
    )
    from rule_guided_music_tpu.models import AutoencoderKL, DiT_models
    from rule_guided_music_tpu.rules.registry import FUNC_DICT
    from rule_guided_music_tpu.utils.fixtures import load_fixture_npz, make_rolls

    fx = load_fixture_npz(QUALITY)
    scale = fx["scale"]
    shape = (4, 4, 128, 16)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    dit = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0, learn_sigma=False)
    tables = make_schedule("linear", 1000, timestep_respacing="16").tables()
    decode = make_decode_fn(
        lambda c: vae.apply(fx["vae"], c, method=AutoencoderKL.decode),
        scale_factor=scale)
    encode = make_encode_fn(
        lambda x: vae.apply(fx["vae"], x,
                            method=AutoencoderKL.encode_moments),
        scale_factor=scale)
    model_fn = lambda x, t, y=None: dit.apply(fx["dit"], x, t)

    train = jnp.asarray(make_rolls(8, seed=21))
    rec = decode(encode(train))
    nds = np.asarray(FUNC_DICT["note_density"](rec))
    sparse = nds[np.argsort(nds[:, :8].mean(axis=1))[0]]
    target = jnp.asarray(np.tile(sparse[None], (shape[0], 1)))
    rules = {"note_density": target}

    def run(cfg):
        fn = jax.jit(lambda r: sample_loop(
            r, model_fn, shape, tables, cfg, rules=rules,
            decode_fn=decode)[0])
        total = 0.0
        for seed in (0, 1):
            nd = FUNC_DICT["note_density"](decode(fn(jax.random.PRNGKey(seed))))
            total += float(((nd - target) ** 2).mean())
        return total

    scg = SCGConfig(num_samples=8, weights=(("note_density", 1.0),))
    guid = GuidanceConfig(method="no_guidance", schedule=True,
                          t_start=tables.num_timesteps, t_end=0)
    plain = run(SamplerConfig(sampler="ddpm"))
    full = run(SamplerConfig(sampler="ddpm", guidance=guid, scg=scg))
    reuse = run(SamplerConfig(sampler="ddpm", guidance=guid, scg=scg,
                              reuse_interval=2,
                              reuse_t_max=tables.num_timesteps // 4))
    assert reuse < 0.8 * plain, (plain, full, reuse)
    assert reuse < 1.6 * full, (plain, full, reuse)
