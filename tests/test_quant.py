"""W8A8 int8 serving path (ops/quant.py) — numerics + quality envelope.

Fast tier: kernel/layer-level parity against fp denses and param-tree
structure agreement between `quantize_dit_params` and the quant model's
own init. Slow tier: eps-prediction error and end-to-end DDIM trajectory
divergence on the LEARNED fixture (tests/fixtures/quality_tiny.npz), the
same instrument every other quality gate in this repo uses.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.models import DiT_models
from rule_guided_music_tpu.ops.quant import (
    QuantDense,
    normalize_quant_mode,
    quant_dense_apply,
    quantize_dense,
    quantize_dit_params,
    wo_dense_apply,
)

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "quality_tiny.npz")


def test_quantize_dense_roundtrip_error():
    rng = np.random.RandomState(0)
    k = rng.randn(128, 256).astype(np.float32) * 0.05
    q, s = quantize_dense(k)
    assert q.dtype == np.int8 and s.shape == (256,)
    deq = q.astype(np.float32) * s
    # uniform step = amax/127; for Gaussian cols (amax ~ 3.5 sigma at
    # n=128) expected relative RMS ~ 3.5/(127*sqrt(12)) ~ 0.8%
    rms = np.sqrt(np.mean((deq - k) ** 2)) / np.sqrt(np.mean(k ** 2))
    assert rms < 1e-2


@pytest.mark.parametrize("apply_fn,tol", [
    (quant_dense_apply, 0.02),   # weight + activation quant error
    (wo_dense_apply, 0.015),     # weight-only: no activation error
])
def test_quant_dense_apply_matches_fp(apply_fn, tol):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 32, 96).astype(np.float32))
    k = rng.randn(96, 192).astype(np.float32) * 0.1
    b = rng.randn(192).astype(np.float32) * 0.1
    ref = jnp.einsum("bnd,df->bnf", x, k,
                     precision=jax.lax.Precision.HIGHEST) + b
    q, s = quantize_dense(k)
    out = apply_fn(x, jnp.asarray(q), jnp.asarray(s), jnp.asarray(b),
                   dtype=jnp.float32)
    rel = jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
    assert float(rel) < tol, float(rel)


def test_normalize_quant_mode():
    assert normalize_quant_mode(False) == ""
    assert normalize_quant_mode("") == ""
    assert normalize_quant_mode("False") == ""
    assert normalize_quant_mode(True) == "w8a8"
    assert normalize_quant_mode("True") == "w8a8"
    assert normalize_quant_mode("W8A16") == "w8a16"
    with pytest.raises(ValueError):
        normalize_quant_mode("int4")


def test_quant_dense_module_params_and_apply():
    x = jnp.ones((2, 8, 16))
    mod = QuantDense(24, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    leaves = params["params"]
    assert leaves["kernel_i8"].dtype == jnp.int8
    assert leaves["scale"].shape == (24,)
    out = mod.apply(params, x)
    assert out.shape == (2, 8, 24)


@pytest.mark.parametrize("mode", ["w8a8", "w8a16"])
def test_quantize_dit_params_matches_quant_init_structure(mode):
    fp_model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3)
    q_model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3, quant=mode)
    x = jnp.zeros((1, 4, 128, 16))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), dtype=jnp.int32)
    fp_params = fp_model.init(jax.random.PRNGKey(0), x, t, y)
    q_init = q_model.init(jax.random.PRNGKey(0), x, t, y)
    converted = quantize_dit_params(fp_params)
    flat_c = jax.tree_util.tree_flatten_with_path(converted)[0]
    flat_q = jax.tree_util.tree_flatten_with_path(q_init)[0]
    assert [p for p, _ in flat_c] == [p for p, _ in flat_q]
    for (path, a), (_, b) in zip(flat_c, flat_q):
        assert a.shape == b.shape, path
        assert jnp.asarray(a).dtype == b.dtype, path
    # and the quant model runs with the converted tree
    out = q_model.apply(converted, x, t, y)
    assert out.shape == (1, 4, 128, 16)


@pytest.mark.slow
@pytest.mark.parametrize("mode,eps_tol,traj_tol", [
    ("w8a8", 0.05, 0.15),
    ("w8a16", 0.04, 0.12),   # no activation error -> tighter envelope
])
@pytest.mark.skipif(not os.path.exists(FIXTURE),
                    reason="quality fixture missing")
def test_quant_quality_envelope_on_learned_fixture(mode, eps_tol, traj_tol):
    """eps error and DDIM trajectory divergence of int8 vs fp serving."""
    from rule_guided_music_tpu.diffusion.sampling import (
        SamplerConfig, sample_loop)
    from rule_guided_music_tpu.diffusion.schedule import make_schedule
    from rule_guided_music_tpu.utils.fixtures import load_fixture_npz

    fx = load_fixture_npz(FIXTURE)
    fp = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False)
    qm = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False, quant=mode)
    q_params = quantize_dit_params(fx["dit"])

    # 1. pointwise eps-prediction error across the chain
    tables = make_schedule("linear", 1000, timestep_respacing="16").tables()
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (4, 4, 128, 16))
    rels = []
    for t_val in (2, 7, 12, 15):
        t = jnp.full((4,), t_val, dtype=jnp.int32)
        e_fp = fp.apply(fx["dit"], x, t)
        e_q = qm.apply(q_params, x, t)
        rels.append(float(jnp.linalg.norm(e_q - e_fp)
                          / jnp.linalg.norm(e_fp)))
    assert max(rels) < eps_tol, rels

    # 2. end-to-end deterministic DDIM chain: final samples stay close
    cfg = SamplerConfig(sampler="ddim", eta=0.0)
    outs = {}
    for tag, model, params in (("fp", fp, fx["dit"]), ("q", qm, q_params)):
        sample, _ = sample_loop(
            jax.random.PRNGKey(3),
            lambda xx, tt, yy=None, _m=model, _p=params: _m.apply(_p, xx, tt),
            (4, 4, 128, 16), tables, cfg,
        )
        outs[tag] = sample
    num = jnp.linalg.norm(outs["q"] - outs["fp"])
    den = jnp.linalg.norm(outs["fp"])
    assert float(num / den) < traj_tol, float(num / den)
