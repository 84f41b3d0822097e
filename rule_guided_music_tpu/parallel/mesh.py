"""Device mesh + sharding rules: DP / FSDP / TP over ICI.

The reference scales with NCCL DDP only (SURVEY.md §2.9); here parallelism
is declarative: a ``Mesh(('data', 'fsdp', 'model'))`` plus PartitionSpec
rules, and XLA GSPMD inserts the collectives (psum for grads over data+fsdp,
all-gathers for fsdp params, TP reduce-scatters inside blocks).

Strategy mapping:
  * data    — batch dimension (DDP equivalent; mandatory strategy)
  * fsdp    — parameters sharded along their largest axis (ZeRO-3 analog)
  * model   — tensor parallelism over attention heads / MLP hidden dim
SCG's k-candidate axis and DiffCollage's window axis both fold into batch,
so they shard over 'data' for free.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None, fsdp: int = 1, tp: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'fsdp', 'model') mesh over the available devices.

    ``dp=None`` absorbs all remaining devices into the data axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % (fsdp * tp) != 0 or (dp is not None and dp * fsdp * tp != n):
        raise ValueError(
            f"make_mesh: cannot factor {n} device(s) as "
            f"dp={dp if dp is not None else '?'} x fsdp={fsdp} x tp={tp}. "
            f"Pass factors that multiply to len(devices), or provision more "
            f"devices first (e.g. a virtual CPU mesh via "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N with "
            f"JAX_PLATFORMS=cpu, set before jax initializes)."
        )
    if dp is None:
        dp = n // (fsdp * tp)
    arr = np.array(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, ("data", "fsdp", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over data+fsdp."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Parameter sharding rules (path-regex -> PartitionSpec)
# ---------------------------------------------------------------------------

# DiT tensor-parallel rules: column-parallel into attention/MLP, row-parallel
# out of them; everything else replicated over 'model'. FSDP shards the
# largest axis of every big tensor over 'fsdp'.
_DIT_TP_RULES = [
    (r"attn/qkv/kernel$", P("fsdp", "model")),
    (r"attn/proj/kernel$", P("model", "fsdp")),
    (r"mlp/fc1/kernel$", P("fsdp", "model")),
    (r"mlp/fc2/kernel$", P("model", "fsdp")),
    (r"adaLN_modulation/kernel$", P("fsdp", "model")),
    (r"adaLN_modulation/bias$", P("model")),
    (r"attn/qkv/bias$", P("model")),
    (r"mlp/fc1/bias$", P("model")),
    # conv kernels (VAE enc/dec, flax layout (kh, kw, in, out)): shard the
    # output-channel axis — without this the whole 55M f8-VAE replicated
    # (the generic kernel rule would land 'fsdp' on kh=3 and degrade)
    (r"kernel$", P(None, None, None, "fsdp")),
    # embedders / heads: fsdp only
    (r"kernel$", P("fsdp", None)),
    (r"embedding_table$", P(None, "fsdp")),
]


def dit_param_spec(path: str, shape) -> P:
    """PartitionSpec for a DiT parameter given its flattened path.

    Only rank is checked here (a rule longer than the tensor's rank cannot
    apply); divisibility of each axis by its mesh-axis size is validated —
    with per-axis replication fallback — in :func:`shard_params`.
    """
    for pattern, spec in _DIT_TP_RULES:
        if re.search(pattern, path) and len(spec) <= len(shape):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def shard_params(params, mesh: Mesh, spec_fn=dit_param_spec):
    """Produce a NamedSharding pytree for a param tree; axes that don't
    divide evenly by their mesh axis fall back to replication."""

    def one(path, leaf):
        spec = spec_fn(_path_str(path), leaf.shape)
        # validate divisibility; degrade to replicated on mismatch
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        parts = []
        for axis, name in enumerate(spec):
            if name is None:
                parts.append(None)
                continue
            names = name if isinstance(name, tuple) else (name,)
            total = int(np.prod([sizes[n] for n in names]))
            if axis < leaf.ndim and leaf.shape[axis] % total == 0:
                parts.append(name)
            else:
                parts.append(None)
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map_with_path(one, params)


def maybe_init_distributed():
    """Initialize the JAX multi-host runtime when launched as a pod job.

    The reference launches with mpiexec + NCCL (dist_util.py:21-53); on TPU
    pods the equivalent is ``jax.distributed.initialize()`` before first
    jax use — auto-detecting coordinator/topology from the pod metadata.
    Opt-in via ``RGM_MULTIHOST=1`` so single-host runs (the common case in
    this environment) never touch the coordinator path. Call it at the top
    of every training/sampling entry point; after it, ``jax.devices()``
    spans the slice and the Mesh/GSPMD code in this module works unchanged
    (each host feeds its ``jax.process_index()`` data shard).
    """
    import os as _os

    if _os.environ.get("RGM_MULTIHOST", "0") not in ("", "0"):
        import jax as _jax

        _jax.distributed.initialize()
