"""Diffusion training runtime: pjit train step, EMA, latent recombination.

Re-architecture of guided_diffusion/train_util.py (TrainLoop :27-400):

  * the hand-rolled fp16 master-param machinery (fp16_util.py) disappears —
    TPUs train in bf16 compute with fp32 params, no loss scaling;
  * DDP/no_sync/microbatching becomes one jit'd step over the global batch
    with grad accumulation via ``lax.scan`` when microbatching is requested;
    gradient psum over the mesh comes from GSPMD, not NCCL;
  * on-the-fly VAE encoding with shifted-window recombination (get_kl_input,
    train_util.py:403-429) is a jit'd preprocessing step: encode 1.28 s
    chunks once, unfold into ``encode_rep`` overlapping 10.24 s latent
    excerpts (effective batch x encode_rep);
  * checkpoints are Orbax (params / EMA / opt state / step in one tree).
"""

from __future__ import annotations

import os
import os.path as osp
import re
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..constants import LATENT_CH, LATENT_PITCH
from ..diffusion import gaussian as gd
from ..diffusion.schedule import Tables
from ..utils import logger
from .resample import LossAwareSampler, ScheduleSampler, UniformSampler


def get_kl_input(
    vae_encode: Callable,
    batch: jnp.ndarray,
    scale_factor: float = 1.0,
    shift_size: int = 4,
    recombine: bool = True,
) -> jnp.ndarray:
    """Encode a long roll batch and unfold into overlapping latent excerpts.

    batch: (B, 3, 128, L) with L a multiple of 128. Returns
    (B * encode_rep, 4, 128, 16) latents where encode_rep is determined by
    the unfold geometry (train_util.py:403-429).
    """
    b, c, h, length = batch.shape
    seq_len = length // h
    # chunk order: 1st chunk for all batch, 2nd chunk for all batch, ...
    chunks = batch.reshape(b, c, h, seq_len, h)
    chunks = jnp.transpose(chunks, (3, 0, 1, 2, 4)).reshape(seq_len * b, c, h, h)
    moments = vae_encode(chunks)                       # (seq*B, 8, 16, 16)
    z = jnp.split(moments, 2, axis=1)[0]               # posterior mode
    p = z.shape[-1]
    z = z.reshape(seq_len, b, LATENT_CH, p, p)
    z = jnp.transpose(z, (1, 2, 3, 0, 4)).reshape(b, LATENT_CH, p, seq_len * p)
    z = jnp.transpose(z, (0, 1, 3, 2))                 # (B, 4, seq*16, 16)
    if recombine:
        window = 8 * 16
        step = 16 * shift_size
        total = z.shape[2]
        n_windows = (total - window) // step + 1
        wins = jnp.stack(
            [z[:, :, i * step:i * step + window, :] for i in range(n_windows)],
            axis=1,
        )                                              # (B, n, 4, 128, 16)
        z = wins.reshape(b * n_windows, LATENT_CH, window, LATENT_PITCH)
    return z * scale_factor


@dataclass
class TrainConfig:
    lr: float = 1e-4
    optimizer: str = "adamw"       # adamw | adafactor (factored 2nd moments:
                                   # ~0 optimizer HBM vs adam's 2x params —
                                   # what makes single-chip XL training fit)
    weight_decay: float = 0.0
    lr_anneal_steps: int = 0
    ema_rate: float = 0.9999
    microbatch: int = -1           # per-step microbatch (post encode_rep)
    encode_rep: int = 4
    shift_size: int = 4
    scale_factor: float = 1.0
    log_interval: int = 10
    save_interval: int = 10000
    keep_checkpoints: int = 0      # retain only the newest K step_* dirs (0 = all)
    eval_interval: int = -1
    profile_step: int = -1         # jax.profiler-trace this one step (-1 = off)
    skip_nan_steps: bool = True    # drop updates with non-finite grads
    ema_dtype: str = "float32"     # bfloat16 halves the EMA copy's HBM
    mean_type: gd.ModelMeanType = gd.ModelMeanType.EPSILON
    var_type: gd.ModelVarType = gd.ModelVarType.FIXED_LARGE
    loss_type: gd.LossType = gd.LossType.MSE


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """AdamW (reference parity, train_util.py:365-371) or adafactor (the
    low-memory option that fits XL training on one 16 GB chip), both with
    the reference's linear LR anneal."""
    if config.lr_anneal_steps:
        schedule = optax.linear_schedule(
            init_value=config.lr, end_value=0.0,
            transition_steps=config.lr_anneal_steps,
        )
    else:
        schedule = config.lr
    opt = getattr(config, "optimizer", "adamw")
    if opt == "adafactor":
        return optax.adafactor(
            learning_rate=schedule,
            weight_decay_rate=(config.weight_decay or None),
        )
    return optax.adamw(schedule, weight_decay=config.weight_decay)


def make_train_step(
    model_apply: Callable,
    tables: Tables,
    optimizer: optax.GradientTransformation,
    config: TrainConfig,
):
    """Build the jit-able train step over the (global) batch.

    ``model_apply(params, x, t, y, rng)`` returns the raw model output.
    Returns ``step_fn(state_tree, latents, t, weights, cond, rngs) ->
    (state_tree, metrics)`` where metrics includes per-example loss for the
    loss-aware sampler.
    """

    def loss_fn(params, latents, t, weights, y, rng):
        noise_rng, dropout_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_rng, latents.shape, latents.dtype)

        def model_fn(x, model_t, **kw):
            return model_apply(params, x, model_t, y, dropout_rng)

        terms = gd.training_losses(
            tables, model_fn, latents, t, noise,
            mean_type=config.mean_type, var_type=config.var_type,
            loss_type=config.loss_type,
        )
        loss = (terms["loss"] * weights).mean()
        return loss, terms

    def microbatches(x, n):
        return x.reshape((n, x.shape[0] // n) + x.shape[1:])

    def step_fn(state_tree, latents, t, weights, y, rng):
        params = state_tree["params"]
        n_micro = (
            max(latents.shape[0] // config.microbatch, 1)
            if config.microbatch > 0 else 1
        )
        if n_micro > 1:
            lat_m = microbatches(latents, n_micro)
            t_m = microbatches(t, n_micro)
            w_m = microbatches(weights, n_micro)
            y_m = microbatches(y, n_micro) if y is not None else None
            rngs = jax.random.split(rng, n_micro)

            def micro(carry, xs):
                grads_acc, loss_acc = carry
                lat_i, t_i, w_i, y_i, rng_i = xs
                (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, lat_i, t_i, w_i, y_i, rng_i
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss), terms

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            xs = (lat_m, t_m, w_m, y_m, rngs)
            (grads, loss_sum), terms = jax.lax.scan(micro, (zero_grads, 0.0), xs)
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
            loss = loss_sum / n_micro
            terms = jax.tree_util.tree_map(lambda a: a.reshape(-1), terms)
        else:
            (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, latents, t, weights, y, rng
            )

        # bf16 needs no loss scaling, but a non-finite batch (bad data, a
        # numerics bug) must not poison the params — mirror the reference's
        # overflow behavior of skipping the step (fp16_util.py:193-197)
        grad_norm = optax.global_norm(grads)
        if config.skip_nan_steps:
            ok = jnp.isfinite(grad_norm)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
            )
        else:
            ok = jnp.bool_(True)
        updates, opt_state = optimizer.update(
            grads, state_tree["opt_state"], params
        )
        # on a skipped step the optimizer state must not advance either
        opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o),
            opt_state, state_tree["opt_state"],
        )
        new_params = optax.apply_updates(params, updates)
        params = jax.tree_util.tree_map(
            lambda n, p: jnp.where(ok, n, p), new_params, params
        )
        rate = config.ema_rate
        ema_dtype = jnp.dtype(getattr(config, "ema_dtype", "float32"))
        ema_params = jax.tree_util.tree_map(
            lambda e, p: jnp.where(
                ok, (e.astype(jnp.float32) * rate
                     + p.astype(jnp.float32) * (1 - rate)).astype(ema_dtype),
                e,
            ),
            state_tree["ema_params"], params,
        )
        new_state = {
            "params": params,
            "ema_params": ema_params,
            "opt_state": opt_state,
            "step": state_tree["step"] + 1,
        }
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "param_norm": optax.global_norm(params),
            "skipped": (~ok).astype(jnp.float32),
            "per_example_loss": terms["loss"],
            "per_example_mse": terms.get("mse", terms["loss"]),
        }
        if "vb" in terms:
            metrics["vb"] = terms["vb"].mean()
        return new_state, metrics

    return step_fn


def make_eval_loss_step(
    model_apply: Callable,
    tables: Tables,
    config: TrainConfig,
):
    """Forward-only diffusion loss on a held-out batch under EMA params.

    The quantitative overfitting signal of the reference's run_step_eval
    (train_util.py:222-254): same ``training_losses`` as the train step, no
    gradient, logged under ``eval_*`` keys.  Returned fn:
    ``(ema_params, latents, t, y, rng) -> terms`` with per-example arrays.
    """

    def eval_fn(ema_params, latents, t, y, rng):
        noise_rng, dropout_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_rng, latents.shape, latents.dtype)

        def model_fn(x, model_t, **kw):
            return model_apply(ema_params, x, model_t, y, dropout_rng)

        return gd.training_losses(
            tables, model_fn, latents, t, noise,
            mean_type=config.mean_type, var_type=config.var_type,
            loss_type=config.loss_type,
        )

    return eval_fn


def log_loss_dict(num_timesteps: int, ts: np.ndarray, losses: Dict[str, np.ndarray]):
    """Quartile-binned loss logging (train_util.py:469-475)."""
    for key, values in losses.items():
        values = np.asarray(values)
        logger.logkv_mean(key, float(values.mean()))
        for sub_t, sub_loss in zip(np.asarray(ts), values):
            quartile = int(4 * sub_t / num_timesteps)
            logger.logkv_mean(f"{key}_q{quartile}", float(sub_loss))


class TrainLoop:
    """Host-side orchestration: data, t-sampling, logging, checkpointing.

    Single-controller JAX: every process runs the same loop; jit handles
    cross-device collectives; only process 0 writes checkpoints/logs.
    """

    def __init__(
        self,
        *,
        model_apply: Callable,
        init_params,
        tables: Tables,
        data,
        config: TrainConfig,
        vae_encode: Optional[Callable] = None,   # (vae_params, chunks) -> moments
        vae_params=None,
        schedule_sampler: Optional[ScheduleSampler] = None,
        checkpoint_dir: Optional[str] = None,
        eval_fn: Optional[Callable] = None,
        eval_data=None,
        mesh=None,
        seed: int = 0,
    ):
        self.tables = tables
        self.data = data
        self.config = config
        self.vae_encode = vae_encode
        self.schedule_sampler = schedule_sampler or UniformSampler(
            tables.num_timesteps
        )
        self.checkpoint_dir = checkpoint_dir
        self.eval_fn = eval_fn
        self.eval_data = eval_data
        self.rng = np.random.default_rng(seed)
        self.jax_rng = jax.random.PRNGKey(seed)

        optimizer = make_optimizer(config)
        step_fn = make_train_step(model_apply, tables, optimizer, config)
        self.eval_loss_fn = (
            jax.jit(make_eval_loss_step(model_apply, tables, config))
            if eval_data is not None else None
        )
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated, shard_params

            ema_dtype = jnp.dtype(getattr(config, "ema_dtype", "float32"))
            param_shardings = shard_params(init_params, mesh)
            host_params = jax.device_get(init_params)
            # two device_puts of the same host tree: distinct buffers, so
            # the donated step never aliases params with ema_params
            params = jax.device_put(host_params, param_shardings)
            ema_params = jax.device_put(
                jax.tree_util.tree_map(
                    lambda a: np.asarray(a, dtype=ema_dtype), host_params
                ),
                param_shardings,
            )
            # FSDP the optimizer moments like their params: optax state
            # sub-trees (mu/nu) embed the param tree, so an opt-state leaf
            # whose path ends with a param path takes that param's sharding;
            # everything else (adam's count, empty states) is replicated.
            from ..parallel.mesh import _path_str

            pmap = {
                _path_str(path): s
                for path, s in jax.tree_util.tree_leaves_with_path(
                    param_shardings
                )
            }
            rep = replicated(mesh)

            def _opt_shard(path, leaf):
                ps = _path_str(path)
                for k, s in pmap.items():
                    if ps.endswith(k):
                        return s
                return rep

            opt_state = jax.tree_util.tree_map_with_path(
                lambda p, a: jax.device_put(a, _opt_shard(p, a)),
                jax.jit(optimizer.init)(params),
            )
            self.state = {
                "params": params,
                "ema_params": ema_params,
                "opt_state": opt_state,
                "step": jax.device_put(
                    jnp.zeros((), dtype=jnp.int32), replicated(mesh)
                ),
            }
            state_shardings = jax.tree_util.tree_map(
                lambda a: a.sharding, self.state
            )
            # pin the output state to the input shardings (donation-safe,
            # no silent re-layout drift step over step); metrics unpinned
            self.step_fn = jax.jit(
                step_fn, donate_argnums=(0,),
                out_shardings=(state_shardings, None),
            )
            self._batch_sharding = batch_sharding(mesh)
        else:
            ema_dtype = jnp.dtype(getattr(config, "ema_dtype", "float32"))
            self.state = {
                "params": init_params,
                # distinct buffers: the step donates the state, and aliased
                # params/ema leaves would trip XLA's donation checker
                # (jnp.asarray is a no-op when the dtype already matches —
                # copy=True forces fresh buffers)
                "ema_params": jax.tree_util.tree_map(
                    lambda a: jnp.array(a, dtype=ema_dtype, copy=True),
                    init_params
                ),
                "opt_state": optimizer.init(init_params),
                "step": jnp.zeros((), dtype=jnp.int32),
            }
            self.step_fn = jax.jit(step_fn, donate_argnums=(0,))
        self.vae_params = vae_params
        if vae_encode is not None:
            # vae params are an explicit jit argument (no giant HLO constants)
            self._encode = jax.jit(
                lambda vp, batch: get_kl_input(
                    lambda chunks: vae_encode(vp, chunks), batch,
                    scale_factor=config.scale_factor,
                    shift_size=config.shift_size,
                )
            )
        self.step = 0
        self.resume_step = 0

    # -- checkpointing ------------------------------------------------------

    def save(self):
        if self.checkpoint_dir is None or jax.process_index() != 0:
            return
        import orbax.checkpoint as ocp

        step = self.step + self.resume_step
        path = osp.join(osp.abspath(self.checkpoint_dir), f"step_{step:06d}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(self.state), force=True)
        ckptr.wait_until_finished()
        # schema marker: lets future readers validate layout before restore
        with open(osp.join(path, "SCHEMA"), "w") as f:
            f.write(f"{self.CKPT_SCHEMA}\n")
        logger.log(f"saved checkpoint {path}")
        self._prune_checkpoints()

    # Checkpoint tree layout version. v1: {params, ema_params, opt_state,
    # step} saved as one Orbax StandardCheckpointer tree under step_NNNNNN.
    CKPT_SCHEMA = "rule-guided-music-tpu/v1"

    def _prune_checkpoints(self):
        keep = getattr(self.config, "keep_checkpoints", 0)
        if not keep or self.checkpoint_dir is None:
            return
        import shutil

        base = osp.abspath(self.checkpoint_dir)
        ckpts = sorted(
            d for d in os.listdir(base) if d.startswith("step_")
        )
        for d in ckpts[:-keep]:
            shutil.rmtree(osp.join(base, d), ignore_errors=True)
            logger.log(f"pruned old checkpoint {d}")

    def restore(self, path: str):
        import orbax.checkpoint as ocp

        schema_file = osp.join(path, "SCHEMA")
        if osp.exists(schema_file):
            schema = open(schema_file).read().strip()
            if schema != self.CKPT_SCHEMA:
                raise ValueError(
                    f"checkpoint schema {schema!r} != {self.CKPT_SCHEMA!r}"
                )
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, target=jax.device_get(self.state))
        # re-establish the pre-restore shardings: a bare device_put would
        # commit every leaf to the default device, silently un-FSDPing a
        # mesh run on resume (and failing outright on multihost, where a
        # global array cannot live on one local device)
        shardings = jax.tree_util.tree_map(lambda a: a.sharding, self.state)
        self.state = jax.device_put(restored, shardings)
        self.resume_step = int(restored["step"])
        m = re.search(r"step_(\d+)", path)
        if m:
            self.resume_step = int(m.group(1))
        logger.log(f"resumed from {path} at step {self.resume_step}")

    @staticmethod
    def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
        if not osp.isdir(checkpoint_dir):
            return None
        ckpts = sorted(
            d for d in os.listdir(checkpoint_dir) if d.startswith("step_")
        )
        return osp.join(osp.abspath(checkpoint_dir), ckpts[-1]) if ckpts else None

    # -- main loop ----------------------------------------------------------

    def _prepare_batch(self, batch: np.ndarray, cond: Dict[str, np.ndarray]):
        """Shared train/eval preprocessing: VAE-encode + recombine, repeat
        labels by encode_rep, sample (t, weights), shard onto the mesh."""
        batch = jnp.asarray(batch)
        if self.vae_encode is not None:
            latents = self._encode(self.vae_params, batch)
            rep = latents.shape[0] // batch.shape[0]
        else:
            latents = batch
            rep = 1
        y = cond.get("y")
        if y is not None:
            y = jnp.asarray(np.repeat(np.asarray(y), rep))
        t_np, w_np = self.schedule_sampler.sample(latents.shape[0], self.rng)
        t, w = jnp.asarray(t_np), jnp.asarray(w_np)
        if self._batch_sharding is not None:
            bs = self._batch_sharding
            latents, t, w = (jax.device_put(a, bs) for a in (latents, t, w))
            if y is not None:
                y = jax.device_put(y, bs)
        return latents, t_np, t, w_np, w, y

    def run_step(self, batch: np.ndarray, cond: Dict[str, np.ndarray]):
        latents, t_np, t, w_np, w, y = self._prepare_batch(batch, cond)
        self.jax_rng, step_rng = jax.random.split(self.jax_rng)
        self.state, metrics = self.step_fn(
            self.state, latents, t, w, y, step_rng
        )
        if isinstance(self.schedule_sampler, LossAwareSampler):
            self.schedule_sampler.update_with_all_losses(
                t_np, np.asarray(metrics["per_example_loss"])
            )
        log_loss_dict(
            self.tables.num_timesteps, t_np,
            {"loss": np.asarray(metrics["per_example_loss"]) * w_np,
             "mse": np.asarray(metrics["per_example_mse"]) * w_np},
        )
        logger.logkv("grad_norm", float(metrics["grad_norm"]))
        logger.logkv("param_norm", float(metrics["param_norm"]))
        return metrics

    def run_step_eval(self, batch: np.ndarray, cond: Dict[str, np.ndarray]):
        """Held-out batch loss under EMA params, logged as ``eval_*``
        quartile keys (reference run_step_eval, train_util.py:222-254)."""
        latents, t_np, t, w_np, _, y = self._prepare_batch(batch, cond)
        self.jax_rng, eval_rng = jax.random.split(self.jax_rng)
        terms = self.eval_loss_fn(
            self.state["ema_params"], latents, t, y, eval_rng
        )
        log_loss_dict(
            self.tables.num_timesteps, t_np,
            {f"eval_{k}": np.asarray(v) * w_np for k, v in terms.items()},
        )
        return terms

    def run_loop(self, max_steps: Optional[int] = None):
        cfg = self.config
        while (
            (not cfg.lr_anneal_steps or
             self.step + self.resume_step < cfg.lr_anneal_steps)
            and (max_steps is None or self.step < max_steps)
        ):
            batch, cond = next(self.data)
            if self.step == cfg.profile_step:
                with logger.jax_trace():
                    self.run_step(batch, cond)
            else:
                self.run_step(batch, cond)
            if self.eval_data is not None and self.eval_loss_fn is not None \
                    and cfg.eval_interval > 0 \
                    and self.step % cfg.eval_interval == 0:
                batch_eval, cond_eval = next(self.eval_data)
                self.run_step_eval(batch_eval, cond_eval)
            if self.eval_fn is not None and cfg.eval_interval > 0 and \
                    self.step % cfg.eval_interval == 0:
                self.eval_fn(self)
            if self.step % cfg.log_interval == 0:
                logger.logkv("step", self.step + self.resume_step)
                logger.dumpkvs()
            if self.step % cfg.save_interval == 0 and self.step != 0:
                self.save()
                if os.environ.get("DIFFUSION_TRAINING_TEST", "") and self.step > 0:
                    return
            self.step += 1
        if (self.step - 1) % cfg.save_interval != 0:
            self.save()


def make_eval_sampling_fn(
    model_apply_eval: Callable,
    tables: Tables,
    *,
    vae_model=None,
    sample_batch_size: int = 16,
    num_classes: int = 0,
    in_channels: int = 4,
    image_size=(128, 16),
    use_ddim: bool = True,
    fs: int = 100,
    scale_factor: float = 1.0,
):
    """Training-time eval hook: sample with EMA params, decode, save MIDI
    under <logdir>/samples/iter_<step> (train_util.py:222-317).

    ``model_apply_eval(params, x, t, y)`` is the eval-mode denoiser.
    Class-balanced labels mirror the reference's per-rank balancing.
    """
    from ..constants import BACKGROUND_THRESHOLD
    from ..data.pianoroll import finalize_decoded_sample, save_piano_roll_midi
    from ..diffusion.sampling import SamplerConfig, sample_loop

    config = SamplerConfig(sampler="ddim" if use_ddim else "ddpm", eta=1.0)
    shape = (sample_batch_size, in_channels, *image_size)

    def generate(rng, params, y):
        model_fn = lambda x, t, yy: model_apply_eval(params, x, t, yy)
        return sample_loop(rng, model_fn, shape, tables, config, y=y)[0]

    generate = jax.jit(generate)

    def eval_fn(loop: "TrainLoop"):
        rng = jax.random.PRNGKey(loop.step + 12345)
        if num_classes > 0:
            per = max(sample_batch_size // num_classes, 1)
            y = jnp.arange(sample_batch_size, dtype=jnp.int32) // per
            y = jnp.clip(y, 0, num_classes - 1)
        else:
            y = None
        latents = generate(rng, loop.state["ema_params"], y)
        if vae_model is not None and loop.vae_params is not None:
            from ..diffusion.latent import make_decode_fn

            decode = jax.jit(
                lambda vp, z: make_decode_fn(
                    lambda c: vae_model.apply(
                        vp, c, method=type(vae_model).decode
                    ),
                    scale_factor=scale_factor,
                )(z)
            )
            rolls = decode(loop.vae_params, latents)
        else:
            rolls = latents
        arr = finalize_decoded_sample(np.asarray(rolls), BACKGROUND_THRESHOLD)
        if jax.process_index() == 0:
            step = loop.step + loop.resume_step
            save_dir = osp.join(logger.get_dir(), "samples", f"iter_{step}")
            save_piano_roll_midi(
                arr, save_dir, fs,
                y=np.asarray(y) if y is not None else None,
            )
            logger.log(f"eval samples written to {save_dir}")

    return eval_fn
