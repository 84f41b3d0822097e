"""Model family shape/behavior tests (SURVEY.md §4 fixture (e) groundwork)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.models import (
    AutoencoderKL,
    DiagonalGaussian,
    DiT_models,
)
from rule_guided_music_tpu.ops.rotary import apply_rotary, make_rotary_table


def small_rotary(**kw):
    return DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3, **kw
    )


def test_rotary_table_convention():
    table = make_rotary_table(4, 8)
    assert table.cos.shape == (4, 8)
    # position 0 -> identity rotation
    np.testing.assert_allclose(table.cos[0], 1.0)
    np.testing.assert_allclose(table.sin[0], 0.0)
    # interleaved duplication: cos[:, 0] == cos[:, 1]
    np.testing.assert_allclose(table.cos[:, 0], table.cos[:, 1])
    # frequency of pair i is 10000^(-2i/dim)
    np.testing.assert_allclose(float(table.sin[1, 0]), np.sin(1.0), rtol=1e-6)
    np.testing.assert_allclose(
        float(table.sin[1, 2]), np.sin(10000 ** (-2 / 8)), rtol=1e-5
    )


def test_rotary_preserves_norm_and_passthrough():
    table = make_rotary_table(16, 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 8))
    out = apply_rotary(x, table)
    # rotation preserves norms of the rotated pairs
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[..., :4]), axis=-1),
        np.linalg.norm(np.asarray(x[..., :4]), axis=-1),
        rtol=1e-5,
    )
    # dims beyond rot_dim pass through
    np.testing.assert_array_equal(np.asarray(out[..., 4:]), np.asarray(x[..., 4:]))


def test_rotary_relative_property():
    # <R(p)q, R(p+k)v> depends only on offset k: shift both positions.
    table = make_rotary_table(32, 8)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 32, 8))
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 32, 8))
    hp = jax.lax.Precision.HIGHEST  # einsum defaults to bf16-like on TPU/CPU
    rq, rk = apply_rotary(q, table), apply_rotary(k, table)
    scores = np.asarray(jnp.einsum("bhnd,bhmd->bhnm", rq, rk, precision=hp))[0, 0]
    # compare (i, i+4) vs (i+8, i+12) with identical content:
    q2 = jnp.roll(q, 8, axis=2)
    k2 = jnp.roll(k, 8, axis=2)
    scores2 = np.asarray(
        jnp.einsum(
            "bhnd,bhmd->bhnm", apply_rotary(q2, table), apply_rotary(k2, table),
            precision=hp,
        )
    )[0, 0]
    np.testing.assert_allclose(scores[3, 7], scores2[11, 15], rtol=1e-4)


def test_dit_rotary_shapes_and_init():
    model = small_rotary()
    x = jnp.zeros((2, 4, 128, 16))
    t = jnp.array([0.0, 10.0])
    y = jnp.array([0, 2])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 4, 128, 16)
    # adaLN-Zero: zero input + zero-init final layer -> output identically 0
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_dit_rotary_learn_sigma_channels():
    model = small_rotary(learn_sigma=True)
    x = jnp.zeros((1, 4, 128, 16))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([5.0]), jnp.array([1]))
    out = model.apply(params, x, jnp.array([5.0]), jnp.array([1]))
    assert out.shape == (1, 8, 128, 16)


def test_dit_rotary_class_conditioning_changes_output():
    model = small_rotary()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 128, 16))
    t = jnp.array([100.0])
    params = model.init(jax.random.PRNGKey(0), x, t, jnp.array([0]))
    # adaLN-Zero makes the conditioning path a no-op at init; perturb all
    # params (as training would) so the class signal can reach the output.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    leaves = [
        l + 0.02 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    out0 = model.apply(params, x, t, jnp.array([0]))
    out1 = model.apply(params, x, t, jnp.array([2]))
    assert float(jnp.abs(out0 - out1).max()) > 1e-6


def test_dit_rotary_null_class_row_exists():
    """CFG needs num_classes as a valid (null) label index."""
    model = small_rotary()
    x = jnp.zeros((1, 4, 128, 16))
    t = jnp.array([0.0])
    params = model.init(jax.random.PRNGKey(0), x, t, jnp.array([0]))
    out = model.apply(params, x, t, jnp.array([3]))  # null label == num_classes
    assert out.shape == (1, 4, 128, 16)


def test_dit_2d_shapes():
    model = DiT_models["DiT-S/2"](
        input_size=(16, 16), in_channels=4, num_classes=3
    )
    x = jnp.zeros((2, 4, 16, 16))
    t = jnp.array([0.0, 1.0])
    y = jnp.array([0, 1])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 4, 16, 16)


def test_classifier_shapes():
    model = DiT_models["DiTRotary-XS/8-cls"](
        input_size=(128, 16), in_channels=4, num_classes=16
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 128, 16))
    t = jnp.array([10.0, 20.0])
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (2, 16)


def test_chord_classifier_dual_heads():
    from rule_guided_music_tpu.models import DiTRotaryClassifier

    model = DiTRotaryClassifier(
        input_size=(128, 16), in_channels=4, num_classes=8, depth=2,
        hidden_size=64, num_heads=2, chord=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 128, 16))
    t = jnp.array([0.0, 0.0])
    params = model.init(jax.random.PRNGKey(0), x, t)
    key_logits, chord_logits = model.apply(params, x, t)
    assert key_logits.shape == (2, 25)
    assert chord_logits.shape == (2, 8, 8)  # 8 windows (128/16), 8 classes


def test_label_dropout_applied_in_training():
    from rule_guided_music_tpu.models.layers import LabelEmbedder

    emb = LabelEmbedder(num_classes=3, hidden_size=16, dropout_prob=0.5)
    y = jnp.zeros((64,), dtype=jnp.int32)
    params = emb.init(
        {"params": jax.random.PRNGKey(0), "label_dropout": jax.random.PRNGKey(1)},
        y, train=True,
    )
    out_train = emb.apply(
        params, y, train=True, rngs={"label_dropout": jax.random.PRNGKey(7)}
    )
    out_eval = emb.apply(params, y, train=False)
    # roughly half the rows swap to the null-label embedding in training
    diff_rows = jnp.abs(out_train - out_eval).max(axis=-1) > 1e-6
    n_dropped = int(diff_rows.sum())
    assert 10 < n_dropped < 54
    # eval path never drops
    out_eval2 = emb.apply(params, y, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))


@pytest.mark.slow
def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(ch=16, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 64, 64))
    params = vae.init(jax.random.PRNGKey(1), x, rng=jax.random.PRNGKey(2))
    moments = vae.apply(params, x, method=AutoencoderKL.encode_moments)
    assert moments.shape == (2, 8, 8, 8)  # f8, double_z -> 2*embed_dim
    post = DiagonalGaussian(moments)
    z = post.mode()
    assert z.shape == (2, 4, 8, 8)
    rec = vae.apply(params, z, method=AutoencoderKL.decode)
    assert rec.shape == (2, 3, 64, 64)


def test_diagonal_gaussian_stats():
    rng = jax.random.PRNGKey(0)
    mean = jnp.full((1, 2, 4, 4), 0.3)
    logvar = jnp.full((1, 2, 4, 4), -2.0)
    post = DiagonalGaussian(jnp.concatenate([mean, logvar], axis=1))
    np.testing.assert_allclose(post.mode(), 0.3)
    samples = jax.vmap(post.sample)(jax.random.split(rng, 2000))
    np.testing.assert_allclose(samples.mean(), 0.3, atol=0.01)
    np.testing.assert_allclose(samples.std(), np.exp(-1.0), rtol=0.05)
    # KL(N(0,1) || N(0,1)) == 0
    zero = DiagonalGaussian(jnp.zeros((1, 4, 2, 2)))
    np.testing.assert_allclose(zero.kl(), 0.0, atol=1e-6)


def test_registry_names_match_reference():
    expected = {
        "DiT-XL/2", "DiT-XL/4", "DiT-XL/8", "DiT-L/2", "DiT-L/4", "DiT-L/8",
        "DiT-B/2", "DiT-B/4", "DiT-B/8", "DiT-S/2", "DiT-S/4", "DiT-S/8",
        "DiTRotary_B_16", "DiTRotary_B_8", "DiTRotary_XL_16", "DiTRotary_XL_8",
        "DiT-B/4-cls", "DiT-B/8-cls", "DiT-S/4-cls", "DiT-S/2-cls",
        "DiT-XS/2-cls", "DiTRotary-XS/8-cls", "DiTRotary-S/8-cls",
        "DiTRotary-S/8-chord-cls", "DiTRotary-B/8-cls",
    }
    assert expected.issubset(set(DiT_models.keys()))


@pytest.mark.slow
def test_vae_fused_gn_param_tree_and_equivalence():
    """fused_gn=True/False share the parameter tree and match numerically
    (fused path runs the Pallas kernel in interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    vae_ref = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    vae_fused = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                              fused_gn=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32))
    params = vae_ref.init(jax.random.PRNGKey(1), x, rng=jax.random.PRNGKey(2))
    with pltpu.force_tpu_interpret_mode():
        params_fused = vae_fused.init(
            jax.random.PRNGKey(1), x, rng=jax.random.PRNGKey(2)
        )
        paths_a = {"/".join(str(k) for k in p)
                   for p, _ in jax.tree_util.tree_leaves_with_path(params)}
        paths_b = {"/".join(str(k) for k in p)
                   for p, _ in jax.tree_util.tree_leaves_with_path(params_fused)}
        assert paths_a == paths_b
        z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 4))
        out_ref = vae_ref.apply(params, z, method=AutoencoderKL.decode)
        out_fused = vae_fused.apply(params, z, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_dit_rotary_remat_matches_plain():
    """remat=True must change nothing but memory: same param tree, same
    forward, same gradients (jax.checkpoint per block)."""
    from rule_guided_music_tpu.models import DiT_models

    m0 = DiT_models["DiTRotary_XS_8"](
        input_size=(32, 16), in_channels=4, num_classes=3, learn_sigma=False)
    m1 = DiT_models["DiTRotary_XS_8"](
        input_size=(32, 16), in_channels=4, num_classes=3, learn_sigma=False,
        remat=True)
    x = jnp.full((2, 4, 32, 16), 0.1)
    t = jnp.full((2,), 3.0)
    y = jnp.zeros((2,), jnp.int32)
    p = m0.init(jax.random.PRNGKey(0), x, t, y)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(m1.init(jax.random.PRNGKey(0),
                                                    x, t, y)))
    np.testing.assert_allclose(np.asarray(m0.apply(p, x, t, y)),
                               np.asarray(m1.apply(p, x, t, y)), atol=1e-6)
    g0 = jax.grad(lambda q: jnp.sum(m0.apply(q, x, t, y) ** 2))(p)
    g1 = jax.grad(lambda q: jnp.sum(m1.apply(q, x, t, y) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
