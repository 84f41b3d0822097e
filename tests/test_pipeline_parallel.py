"""Pipeline parallelism (GPipe over a 'stage' mesh axis) + sequence
parallelism (token_spec sharding constraint) on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rule_guided_music_tpu.parallel.pipeline import (
    gpipe_apply,
    pipelined_dit_rotary_apply,
    stack_block_params,
    unstack_block_params,
)


def stage_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("stage",))


def test_gpipe_matches_sequential():
    mesh = stage_mesh(4)
    n_blocks, d, batch = 8, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(0), n_blocks + 1)
    stacked = jnp.stack(
        [jax.random.normal(k, (d, d)) * 0.3 for k in ks[:-1]]
    )
    x = jax.random.normal(ks[-1], (batch, d))

    def block_fn(p, carry):
        return jnp.tanh(carry @ p)

    ref = x
    for i in range(n_blocks):
        ref = block_fn(stacked[i], ref)

    out = jax.jit(
        lambda s, xx: gpipe_apply(block_fn, s, xx, mesh=mesh, n_micro=4)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_gpipe_pytree_carry_and_micro_gt_stages():
    """Carry can be a pytree; n_micro larger than the stage count."""
    mesh = stage_mesh(2)
    n_blocks, d, batch = 4, 8, 12

    ks = jax.random.split(jax.random.PRNGKey(1), n_blocks + 2)
    stacked = {"w": jnp.stack([jax.random.normal(k, (d, d)) * 0.2
                               for k in ks[:n_blocks]])}
    x = jax.random.normal(ks[-2], (batch, d))
    c = jax.random.normal(ks[-1], (batch, d))

    def block_fn(p, carry):
        xt, cc = carry
        return (jnp.tanh(xt @ p["w"]) + cc, cc)

    ref = x
    for i in range(n_blocks):
        ref, _ = block_fn({"w": stacked["w"][i]}, (ref, c))

    out, c_out = jax.jit(
        lambda s, xx, cc: gpipe_apply(block_fn, s, (xx, cc), mesh=mesh,
                                      n_micro=6)
    )(stacked, x, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out), np.asarray(c), atol=1e-7)


def test_gpipe_differentiable():
    """Grad flows through ppermute/scan (training through the pipeline)."""
    mesh = stage_mesh(4)
    n_blocks, d, batch = 4, 8, 8
    ks = jax.random.split(jax.random.PRNGKey(2), n_blocks + 1)
    stacked = jnp.stack([jax.random.normal(k, (d, d)) * 0.3
                         for k in ks[:-1]])
    x = jax.random.normal(ks[-1], (batch, d))

    def block_fn(p, carry):
        return jnp.tanh(carry @ p)

    def loss_pp(s):
        return (gpipe_apply(block_fn, s, x, mesh=mesh) ** 2).sum()

    def loss_ref(s):
        h = x
        for i in range(n_blocks):
            h = block_fn(s[i], h)
        return (h ** 2).sum()

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_ref = jax.grad(loss_ref)(stacked)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def _xs_model(**kw):
    from rule_guided_music_tpu.models import DiT_models

    return DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3, **kw
    )


def test_stack_unstack_roundtrip():
    model = _xs_model()
    x = jnp.zeros((1, 4, 128, 16))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))
    stacked, rest = stack_block_params(params, model.depth)
    rebuilt = unstack_block_params(stacked, rest)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(rebuilt),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_dit_rotary_matches_apply():
    mesh = stage_mesh(2)  # XS depth=2 -> one block per stage
    model = _xs_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 128, 16))
    t = jnp.linspace(0.0, 100.0, 8)
    y = jnp.arange(8) % 3
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    # perturb so adaLN-Zero isn't the zero map
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape)
         for l, k in zip(leaves, keys)],
    )
    ref = model.apply(params, x, t, y)
    out = jax.jit(
        lambda p, xx, tt, yy: pipelined_dit_rotary_apply(
            model, p, xx, tt, yy, mesh=mesh, n_micro=4
        )
    )(params, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_token_spec_sequence_parallel_matches_unsharded():
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "seq"))
    model_sp = _xs_model(
        token_spec=NamedSharding(mesh, P("data", "seq", None))
    )
    model = _xs_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 128, 16))
    t = jnp.array([5.0, 50.0])
    y = jnp.array([0, 2])
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape)
         for l, k in zip(leaves, keys)],
    )
    ref = model.apply(params, x, t, y)
    out = jax.jit(lambda p, xx: model_sp.apply(p, xx, t, y))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_circular_schedule_matches_sequential():
    """The interleaved/circular schedule (stage s owns blocks r*S+s) must be
    numerically identical to applying the L blocks in order."""
    import numpy as np
    from jax.sharding import Mesh

    from rule_guided_music_tpu.parallel.pipeline import (
        circular_pipeline_apply,
    )

    S, v, d = 4, 3, 8
    L = S * v
    rng = np.random.default_rng(0)
    stacked = {
        "w": jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.normal(size=(L, d)).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.normal(size=(S * 2, d)).astype(np.float32))

    def block_fn(p, carry):
        return jnp.tanh(carry @ p["w"] + p["b"])

    want = x
    for i in range(L):
        want = block_fn(
            jax.tree_util.tree_map(lambda a, i=i: a[i], stacked), want
        )

    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    got = circular_pipeline_apply(block_fn, stacked, x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_circular_schedule_differentiable():
    import numpy as np
    from jax.sharding import Mesh

    from rule_guided_music_tpu.parallel.pipeline import (
        circular_pipeline_apply,
    )

    S, v, d = 2, 2, 4
    L = S * v
    rng = np.random.default_rng(1)
    stacked = {
        "w": jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.3),
    }
    x = jnp.asarray(rng.normal(size=(S, d)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))

    def block_fn(p, carry):
        return jnp.tanh(carry @ p["w"])

    def loss(params, xx):
        return jnp.mean(
            circular_pipeline_apply(block_fn, params, xx, mesh=mesh) ** 2
        )

    val, grads = jax.value_and_grad(loss)(stacked, x)
    assert np.isfinite(float(val))
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )
    # gradient must match the sequential formulation
    def loss_seq(params, xx):
        h = xx
        for i in range(L):
            h = block_fn(
                jax.tree_util.tree_map(lambda a, i=i: a[i], params), h
            )
        return jnp.mean(h ** 2)

    val2, grads2 = jax.value_and_grad(loss_seq)(stacked, x)
    np.testing.assert_allclose(float(val), float(val2), rtol=1e-5)
    for g1, g2 in zip(jax.tree_util.tree_leaves(grads),
                      jax.tree_util.tree_leaves(grads2)):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-4, atol=2e-5)
