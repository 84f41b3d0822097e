"""XL-geometry sharding audit — no compilation, eval_shape only.

Round-2 multichip validation ran tiny shapes only (DiTRotary_XS_8 in
__graft_entry__); the flagship geometry's divisibility story (hidden 1152,
heads 16, depth 28, VAE channel widths) was asserted by name-based rules
but never instantiated.  This audit builds the REAL DiTRotary_XL_8 /
f8-VAE / chord-classifier param trees abstractly (jax.eval_shape — no
weights, no compile) and checks, over representative meshes, that:

  * every resolved sharding's partitioned axes divide the leaf shape,
  * no hot DiT leaf (qkv/proj/fc1/fc2/adaLN kernels, all 28 blocks) is
    silently degraded to replication by the divisibility fallback,
  * FSDP actually distributes the parameter mass (>=95% of DiT bytes,
    >=90% of VAE bytes sharded over 'fsdp' when fsdp >= 2).

Reference scaling contract: SURVEY.md §2.9 (TP/FSDP headroom beyond the
reference's DDP-only story).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.models import AutoencoderKL, DiT_models
from rule_guided_music_tpu.parallel import make_mesh, shard_params
from rule_guided_music_tpu.parallel.mesh import _path_str, dit_param_spec

MESH_FACTORS = [
    (2, 2, 2),     # dp x fsdp x tp
    (1, 4, 2),
    (1, 8, 1),
    (1, 1, 8),
]

HOT_LEAF = re.compile(
    r"blocks_\d+/(attn/(qkv|proj)|mlp/fc[12]|adaLN_modulation)/kernel$"
)


@pytest.fixture(scope="module")
def xl_template():
    model = DiT_models["DiTRotary_XL_8"](
        input_size=(128, 16), in_channels=4, num_classes=3,
        learn_sigma=False, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 4, 128, 16))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), dtype=jnp.int32)
    return jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, y)


@pytest.fixture(scope="module")
def vae_template():
    vae = AutoencoderKL()          # f8: ch=128, mult (1,2,2,4), z=4
    return jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 128, 128)),
        rng=jax.random.PRNGKey(1),
    )


@pytest.fixture(scope="module")
def chord_cls_template():
    model = DiT_models["DiTRotary-S/8-chord-cls"](
        input_size=(128, 16), in_channels=4, num_classes=8,
    )
    x = jnp.zeros((1, 4, 128, 16))
    t = jnp.zeros((1,))
    return jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)


def _axis_sizes(mesh):
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def _check_divisible(template, shardings, mesh):
    sizes = _axis_sizes(mesh)
    flat_t = jax.tree_util.tree_leaves_with_path(template)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(shardings))
    for path, leaf in flat_t:
        spec = flat_s[path].spec
        for axis, name in enumerate(spec):
            if name is None:
                continue
            names = name if isinstance(name, tuple) else (name,)
            total = int(np.prod([sizes[n] for n in names]))
            assert leaf.shape[axis] % total == 0, (
                f"{_path_str(path)} axis {axis} ({leaf.shape}) not divisible "
                f"by {total}"
            )


def _fsdp_sharded_fraction(template, shardings):
    flat_t = jax.tree_util.tree_leaves_with_path(template)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(shardings))
    total = sharded = 0
    for path, leaf in flat_t:
        n = int(np.prod(leaf.shape))
        total += n
        spec = flat_s[path].spec
        names = [
            nm for entry in spec if entry is not None
            for nm in (entry if isinstance(entry, tuple) else (entry,))
        ]
        if "fsdp" in names:
            sharded += n
    return sharded / total


@pytest.mark.parametrize("factors", MESH_FACTORS)
def test_xl_every_leaf_divisible(xl_template, factors):
    mesh = make_mesh(*factors)
    shardings = shard_params(xl_template, mesh)
    _check_divisible(xl_template, shardings, mesh)


@pytest.mark.parametrize("factors", MESH_FACTORS)
def test_xl_hot_leaves_not_degraded(xl_template, factors):
    """The TP/FSDP rules must apply verbatim at flagship geometry — the
    replication fallback must never fire on a block kernel."""
    mesh = make_mesh(*factors)
    shardings = shard_params(xl_template, mesh)
    flat_t = jax.tree_util.tree_leaves_with_path(xl_template)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(shardings))
    n_hot = 0
    for path, leaf in flat_t:
        p = _path_str(path)
        if not HOT_LEAF.search(p):
            continue
        n_hot += 1
        intended = dit_param_spec(p, leaf.shape)
        assert flat_s[path].spec == intended, (
            f"{p}: degraded to {flat_s[path].spec} from {intended}"
        )
    assert n_hot == 28 * 5        # 5 hot kernels per block, depth 28


@pytest.mark.parametrize("factors", [(2, 2, 2), (1, 4, 2), (1, 8, 1)])
def test_xl_fsdp_distributes_param_mass(xl_template, factors):
    mesh = make_mesh(*factors)
    shardings = shard_params(xl_template, mesh)
    frac = _fsdp_sharded_fraction(xl_template, shardings)
    assert frac >= 0.95, f"only {frac:.3f} of XL params fsdp-sharded"


@pytest.mark.parametrize("factors", MESH_FACTORS)
def test_vae_every_leaf_divisible(vae_template, factors):
    mesh = make_mesh(*factors)
    shardings = shard_params(vae_template, mesh)
    _check_divisible(vae_template, shardings, mesh)


@pytest.mark.parametrize("factors", [(2, 2, 2), (1, 8, 1)])
def test_vae_fsdp_distributes_param_mass(vae_template, factors):
    """Conv kernels shard their output-channel axis; without the rank-4
    rule the whole 55M f8-VAE silently replicated."""
    mesh = make_mesh(*factors)
    shardings = shard_params(vae_template, mesh)
    frac = _fsdp_sharded_fraction(vae_template, shardings)
    assert frac >= 0.90, f"only {frac:.3f} of VAE params fsdp-sharded"


@pytest.mark.parametrize("factors", MESH_FACTORS)
def test_chord_classifier_divisible(chord_cls_template, factors):
    mesh = make_mesh(*factors)
    shardings = shard_params(chord_cls_template, mesh)
    _check_divisible(chord_cls_template, shardings, mesh)
