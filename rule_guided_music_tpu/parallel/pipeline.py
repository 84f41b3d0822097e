"""GPipe-style pipeline parallelism over a 'stage' mesh axis.

The reference scales with NCCL data parallelism only (SURVEY.md §2.9); this
module adds the TPU-native pipeline axis: DiT blocks are stacked on a
leading axis, sharded over ``stage``, and microbatches flow stage-to-stage
with ``jax.lax.ppermute`` inside ``shard_map`` — the standard JAX SPMD
pipelining recipe (collectives ride ICI; XLA overlaps the permute with the
next tick's compute). Differentiable end to end (``ppermute`` transposes to
the reverse permutation), so the same wrapper serves training.

Schedule: plain GPipe. With S stages and M microbatches the loop runs
``M + S - 1`` ticks; stage s computes microbatch ``t - s`` at tick t (junk
ticks at fill/drain are computed but never collected). Bubble fraction is
``(S-1)/(M+S-1)`` — callers pick ``n_micro >= 4*S`` for real runs.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_params(params, n_blocks: int, prefix: str = "blocks_"):
    """Split a Flax param tree into (stacked block params, the rest).

    ``params['params'][f'{prefix}{i}']`` for i in [0, n_blocks) are stacked
    leaf-wise on a new leading axis (all DiT blocks share one structure);
    the remaining top-level collections (embedders, final layer) are
    returned unstacked.
    """
    inner = params["params"]
    blocks = [inner[f"{prefix}{i}"] for i in range(n_blocks)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in inner.items() if not k.startswith(prefix)}
    return stacked, {"params": rest}


def unstack_block_params(stacked, rest, prefix: str = "blocks_"):
    """Inverse of :func:`stack_block_params`."""
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    inner = dict(rest["params"])
    for i in range(n):
        inner[f"{prefix}{i}"] = jax.tree_util.tree_map(
            lambda a, i=i: a[i], stacked
        )
    return {"params": inner}


def gpipe_apply(
    block_fn: Callable[[Any, Any], Any],
    stacked_params,
    x,
    *,
    mesh: Mesh,
    axis: str = "stage",
    n_micro: Optional[int] = None,
):
    """Apply a stack of identical blocks, pipelined over ``mesh[axis]``.

    Args:
      block_fn: ``(one_block_params, carry) -> carry`` for a SINGLE block.
        ``carry`` is an arbitrary pytree whose leaves all have a leading
        microbatch dimension (e.g. ``(tokens, conditioning)``).
      stacked_params: pytree with leading axis L (the block stack); L must
        divide evenly by the number of stages. Device placement is handled
        here (resharded to ``P(axis)`` on axis 0).
      x: carry pytree with leading BATCH axis B on every leaf.
      n_micro: number of microbatches (defaults to the stage count; B must
        divide evenly).

    Returns the carry pytree after all L blocks, batch axis restored.
    """
    n_stages = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    n_blocks = leaves[0].shape[0]
    assert n_blocks % n_stages == 0, (n_blocks, n_stages)
    batch = jax.tree_util.tree_leaves(x)[0].shape[0]
    n_micro = n_micro or n_stages
    assert batch % n_micro == 0, (batch, n_micro)
    mb = batch // n_micro

    x_mb = jax.tree_util.tree_map(
        lambda a: a.reshape((n_micro, mb) + a.shape[1:]), x
    )
    stacked_params = jax.device_put(
        stacked_params, NamedSharding(mesh, P(axis))
    )

    def worker(stacked_local, x_all):
        s = jax.lax.axis_index(axis)
        is_last = s == n_stages - 1

        def apply_stage(carry):
            def one_block(c, p):
                return block_fn(p, c), None

            out, _ = jax.lax.scan(one_block, carry, stacked_local)
            return out

        carry0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), x_all
        )
        out0 = jax.tree_util.tree_map(jnp.zeros_like, x_all)

        def tick(state, t):
            carry, out_buf = state
            inject = jax.tree_util.tree_map(
                lambda a: a[jnp.clip(t, 0, n_micro - 1)], x_all
            )
            cur = jax.tree_util.tree_map(
                lambda i, c: jnp.where(s == 0, i, c), inject, carry
            )
            y = apply_stage(cur)
            # last stage collects microbatch t-(S-1) when it's in range
            idx = t - (n_stages - 1)
            valid = (idx >= 0) & (idx < n_micro) & is_last
            idxc = jnp.clip(idx, 0, n_micro - 1)
            out_buf = jax.tree_util.tree_map(
                lambda ob, yy: jax.lax.dynamic_update_index_in_dim(
                    ob,
                    jnp.where(
                        valid, yy,
                        jax.lax.dynamic_index_in_dim(ob, idxc, 0,
                                                     keepdims=False),
                    ),
                    idxc, 0,
                ),
                out_buf, y,
            )
            nxt = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(
                    a, axis, [(i, i + 1) for i in range(n_stages - 1)]
                ),
                y,
            )
            return (nxt, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (carry0, out0), jnp.arange(n_micro + n_stages - 1)
        )
        # replicate the result from the last stage to every stage
        return jax.tree_util.tree_map(
            lambda o: jax.lax.psum(
                jnp.where(is_last, o, jnp.zeros_like(o)), axis
            ),
            out_buf,
        )

    spec_stacked = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    spec_x = jax.tree_util.tree_map(lambda _: P(), x_mb)
    out = shard_map(
        worker, mesh=mesh,
        in_specs=(spec_stacked, spec_x),
        out_specs=spec_x,
        check_vma=False,
    )(stacked_params, x_mb)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((batch,) + a.shape[2:]), out
    )


def pipelined_dit_rotary_apply(
    model, params, x, t, y=None, *, mesh: Mesh, axis: str = "stage",
    n_micro: Optional[int] = None, schedule: str = "gpipe",
):
    """DiTRotary forward with its block stack pipelined over ``mesh[axis]``.

    Embedders / final layer run replicated (they are a negligible FLOP
    fraction); the depth-L block stack runs under :func:`gpipe_apply`
    (``schedule="gpipe"``) or the lower-bubble interleaved
    :func:`circular_pipeline_apply` (``schedule="circular"``; batch must be
    a multiple of the stage count). Numerically identical to
    ``model.apply`` (eval path, no label dropout).
    """
    from ..models.dit import _as_hw
    from ..models.layers import (
        DiTBlock,
        FinalLayer,
        FlattenPatchify1D,
        LabelEmbedder,
        TimestepEmbedder,
    )
    from ..ops.rotary import make_rotary_table

    p = params["params"]
    h, w = _as_hw(model.input_size)
    b = x.shape[0]
    seq_len = x.shape[2] * x.shape[3] // model.patch_size

    tokens = FlattenPatchify1D(
        model.in_channels, model.hidden_size, model.patch_size,
        dtype=model.dtype,
    ).apply({"params": p["x_embedder"]}, x)
    c = TimestepEmbedder(model.hidden_size, dtype=model.dtype).apply(
        {"params": p["t_embedder"]}, t
    )
    if model.num_classes and y is not None:
        c = c + LabelEmbedder(
            model.num_classes, model.hidden_size, model.class_dropout_prob,
            dtype=model.dtype,
        ).apply({"params": p["y_embedder"]}, y, train=False)

    head_dim = model.hidden_size // model.num_heads
    rotary = make_rotary_table(seq_len, int(head_dim * 0.5))
    block = DiTBlock(model.hidden_size, model.num_heads, model.mlp_ratio,
                     dtype=model.dtype, attn_impl=model.attn_impl)

    def block_fn(block_params, carry):
        xt, cc = carry
        xt = block.apply({"params": block_params}, xt, cc, rotary=rotary)
        return (xt, cc)

    stacked, _rest = stack_block_params(params, model.depth)
    if schedule == "circular":
        tokens, _ = circular_pipeline_apply(
            block_fn, stacked, (tokens, c), mesh=mesh, axis=axis,
        )
    else:
        tokens, _ = gpipe_apply(
            block_fn, stacked, (tokens, c), mesh=mesh, axis=axis,
            n_micro=n_micro,
        )

    out = FinalLayer(
        model.hidden_size, model.patch_size * model.out_channels,
        dtype=model.dtype,
    ).apply({"params": p["final_layer"]}, tokens, c)
    out = out.reshape(b, -1, w, model.out_channels)
    return jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.float32)


def circular_pipeline_apply(
    block_fn: Callable[[Any, Any], Any],
    stacked_params,
    x,
    *,
    mesh: Mesh,
    axis: str = "stage",
):
    """Interleaved ("circular" / looping) pipeline schedule.

    Each stage holds ``v = L / S`` NON-contiguous block chunks (stage s owns
    global chunks ``r*S + s`` for r in [0, v)); microbatches (fixed at
    ``M = S``) make v passes around the stage ring, so every tick moves one
    single-chunk unit of work. Against GPipe over the same L blocks this
    cuts the schedule from ``(M + S - 1) * v`` chunk-ticks to
    ``S*v + S - 1`` — at DiT-XL geometry (L=28 blocks, S=4 stages, v=7)
    that is 49 -> 31 ticks, a 37% bubble-time reduction. Differentiable
    (ring ppermute transposes to the reverse ring).
    """
    n_stages = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    n_blocks = leaves[0].shape[0]
    assert n_blocks % n_stages == 0, (n_blocks, n_stages)
    v = n_blocks // n_stages
    batch = jax.tree_util.tree_leaves(x)[0].shape[0]
    n_micro = n_stages                      # the circular schedule invariant
    assert batch % n_micro == 0, (batch, n_micro)
    mb = batch // n_micro

    x_mb = jax.tree_util.tree_map(
        lambda a: a.reshape((n_micro, mb) + a.shape[1:]), x
    )
    # chunk-major restack: leading axis (v, S) so index [r] under a
    # stage-sharded [S] view selects stage s's r-th chunk == global r*S + s
    restacked = jax.tree_util.tree_map(
        lambda a: a.reshape((v, n_stages) + a.shape[1:])
                   .swapaxes(0, 1)
                   .reshape((n_stages * v,) + a.shape[1:]),
        stacked_params,
    )
    restacked = jax.device_put(restacked, NamedSharding(mesh, P(axis)))

    def worker(stacked_local, x_all):
        # stacked_local: (v, ...) — this stage's chunks, round-major
        s = jax.lax.axis_index(axis)
        is_last = s == n_stages - 1
        total_ticks = v * n_stages + n_stages - 1

        carry0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), x_all
        )
        out0 = jax.tree_util.tree_map(jnp.zeros_like, x_all)

        def tick(state, t):
            carry, out_buf = state
            # microbatch age at this stage: entered at tick t - s
            age = t - s
            r = jnp.clip(age // n_stages, 0, v - 1)      # round = chunk idx
            # stage 0 injects fresh microbatches during round 0 only
            inject = jax.tree_util.tree_map(
                lambda a: a[jnp.clip(t, 0, n_micro - 1)], x_all
            )
            take_inject = (s == 0) & (t < n_micro)
            cur = jax.tree_util.tree_map(
                lambda i, c: jnp.where(take_inject, i, c), inject, carry
            )
            chunk = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, r, 0,
                                                       keepdims=False),
                stacked_local,
            )
            y = block_fn(chunk, cur)
            # the last stage in the last round emits microbatch
            # m = t - (S-1) - (v-1)*S
            idx = t - (n_stages - 1) - (v - 1) * n_stages
            valid = (idx >= 0) & (idx < n_micro) & is_last
            idxc = jnp.clip(idx, 0, n_micro - 1)
            out_buf = jax.tree_util.tree_map(
                lambda ob, yy: jax.lax.dynamic_update_index_in_dim(
                    ob,
                    jnp.where(
                        valid, yy,
                        jax.lax.dynamic_index_in_dim(ob, idxc, 0,
                                                     keepdims=False),
                    ),
                    idxc, 0,
                ),
                out_buf, y,
            )
            # full ring: the last stage wraps carries back to stage 0
            nxt = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(
                    a, axis,
                    [(i, (i + 1) % n_stages) for i in range(n_stages)],
                ),
                y,
            )
            return (nxt, out_buf), None

        (_, out_buf), _ = jax.lax.scan(
            tick, (carry0, out0), jnp.arange(total_ticks)
        )
        return jax.tree_util.tree_map(
            lambda o: jax.lax.psum(
                jnp.where(is_last, o, jnp.zeros_like(o)), axis
            ),
            out_buf,
        )

    spec_stacked = jax.tree_util.tree_map(lambda _: P(axis), restacked)
    spec_x = jax.tree_util.tree_map(lambda _: P(), x_mb)
    out = shard_map(
        worker, mesh=mesh,
        in_specs=(spec_stacked, spec_x),
        out_specs=spec_x,
        check_vma=False,
    )(restacked, x_mb)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((batch,) + a.shape[2:]), out
    )
