"""Logger and parallel-mesh utility tests."""

import os

import jax
import numpy as np
import pytest

from rule_guided_music_tpu.utils import logger as lg


def test_logger_kv_and_csv(tmp_path):
    log = lg.configure(dir=str(tmp_path), format_strs=["csv", "json", "log"])
    lg.logkv("loss", 1.5)
    lg.logkv_mean("acc", 1.0)
    lg.logkv_mean("acc", 0.0)
    out = lg.dumpkvs()
    assert out["loss"] == 1.5
    assert out["acc"] == 0.5
    lg.logkv("loss", 2.5)
    lg.logkv("new_key", 7)
    lg.dumpkvs()
    csv_path = tmp_path / "progress.csv"
    lines = csv_path.read_text().strip().split("\n")
    assert "loss" in lines[0] and "new_key" in lines[0]
    assert len(lines) == 3  # header + 2 dumps
    log.close()


def test_logger_profile_kv(tmp_path):
    lg.configure(dir=str(tmp_path), format_strs=[])
    with lg.profile_kv("encode"):
        pass
    assert "wait_encode" in lg.get_current().name2val
    lg.get_current().close()


def test_logger_run_dir_convention(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    class Args:
        dir = "cond_demo/test_run"

    log = lg.configure(args=Args())
    assert log.get_dir().endswith(os.path.join("loggings", "cond_demo",
                                               "test_run"))
    assert os.path.isdir(log.get_dir())
    log.close()


def test_make_mesh_axes():
    from rule_guided_music_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(devices=jax.devices()[:8], fsdp=2, tp=2)
    assert mesh.axis_names == ("data", "fsdp", "model")
    assert mesh.devices.shape == (2, 2, 2)
    mesh2 = make_mesh(devices=jax.devices()[:8])
    assert mesh2.devices.shape == (8, 1, 1)


def test_shard_params_specs():
    from jax.sharding import PartitionSpec as P

    from rule_guided_music_tpu.parallel.mesh import dit_param_spec

    assert dit_param_spec("blocks_0/attn/qkv/kernel", (64, 192)) == P("fsdp", "model")
    assert dit_param_spec("blocks_0/attn/proj/kernel", (64, 64)) == P("model", "fsdp")
    assert dit_param_spec("blocks_3/mlp/fc1/kernel", (64, 256)) == P("fsdp", "model")
    assert dit_param_spec("blocks_3/mlp/fc2/kernel", (256, 64)) == P("model", "fsdp")
    assert dit_param_spec("y_embedder/embedding_table", (4, 64)) == P(None, "fsdp")
    # norms replicate
    assert dit_param_spec("blocks_0/norm1/scale", (64,)) == P()


def test_shard_params_degrades_on_indivisible():
    import jax.numpy as jnp

    from rule_guided_music_tpu.parallel.mesh import make_mesh, shard_params

    mesh = make_mesh(devices=jax.devices()[:8], fsdp=2, tp=2)
    params = {"blocks_0": {"attn": {"qkv": {
        "kernel": jnp.zeros((7, 9))  # indivisible by 2 on both axes
    }}}}
    shardings = shard_params(params, mesh)
    leaf = jax.tree_util.tree_leaves(shardings)[0]
    assert leaf.spec == jax.sharding.PartitionSpec(None, None)


def test_sharded_forward_runs_on_mesh():
    """A DiT forward with TP-sharded params must produce identical results
    to the replicated run."""
    import jax.numpy as jnp

    from rule_guided_music_tpu.models import DiT_models
    from rule_guided_music_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_params,
    )

    model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=3, learn_sigma=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 128, 16))
    t = jnp.zeros((8,))
    y = jnp.zeros((8,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t, y)
    ref = model.apply(params, x, t, y)

    mesh = make_mesh(devices=jax.devices()[:8], fsdp=2, tp=2)
    sharded_params = jax.device_put(params, shard_params(params, mesh))
    xs = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(model.apply)(sharded_params, xs, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
