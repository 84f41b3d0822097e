"""Convert a reference torch checkpoint into this framework's format.

One-command path for a user holding the released reference checkpoints
(README.md:17 — e.g. ``ema_0.9999_1200000.pt`` for the DiTRotary_XL_8
denoiser, classifier ``.pt`` files, and the Lightning ``.ckpt`` KL-VAE;
loaded in the reference by load_utils.py:20-31 / dist_util.py:65-85):

    python scripts/convert_checkpoint.py ema_0.9999_1200000.pt dit_xl.npz \
        --model DiTRotary_XL_8
    python scripts/convert_checkpoint.py kl_f8.ckpt vae_f8.npz
    python scripts/convert_checkpoint.py chord_cls.pt chord.npz \
        --model DiTRotary-S/8-chord-cls --num-classes 8

The output (.npz by default, or an Orbax directory with --format orbax) is
consumed by ``pipeline.load_checkpoint_params`` — i.e. it plugs directly
into the ``--model_path`` / ``--vae_path`` / classifier-path flags of every
sampling and training CLI in scripts/.

The checkpoint kind (denoiser / classifier / VAE) and the trunk depth are
auto-detected from the state-dict keys; pass --model to additionally
validate every converted leaf's shape against a freshly constructed Flax
template (cheap: jax.eval_shape, no weights materialized).
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from rule_guided_music_tpu.models.torch_port import (  # noqa: E402
    assert_tree_shapes_match,
    convert_dit_rotary,
    convert_dit_rotary_classifier,
    convert_vae,
    load_torch_state_dict,
)


def detect_kind(sd):
    """(kind, depth, chord) from reference state-dict key patterns."""
    if "quant_conv.weight" in sd:
        return "vae", None, False
    depths = [int(m.group(1)) for k in sd
              if (m := re.match(r"blocks\.(\d+)\.", k))]
    depth = max(depths) + 1 if depths else 0
    if "cls_token" in sd:
        return "classifier", depth, "norm_key.weight" in sd
    return "dit", depth, False


def build_template(args, kind, chord):
    """Shape-only Flax param template via eval_shape (no init compute)."""
    import jax
    import jax.numpy as jnp

    from rule_guided_music_tpu.models import DiT_models

    model = (
        DiT_models[args.model](
            input_size=tuple(args.input_size),
            in_channels=args.in_channels, num_classes=args.num_classes,
            learn_sigma=args.learn_sigma,
        )
        if kind == "dit"
        else DiT_models[args.model](
            input_size=tuple(args.input_size),
            in_channels=args.in_channels, num_classes=args.num_classes,
        )
    )
    x = jnp.zeros((1, args.in_channels, *args.input_size))
    t = jnp.zeros((1,))
    if kind == "dit":
        y = jnp.zeros((1,), dtype=jnp.int32)
        return jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, y)
    return jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)


def save_npz(converted, path):
    import flax.traverse_util as tu

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in tu.flatten_dict(converted["params"]).items()
    }
    np.savez(path, **flat)


def save_orbax(converted, path):
    import jax
    import orbax.checkpoint as ocp

    converted = jax.tree_util.tree_map(np.asarray, converted)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), converted)
    ckptr.wait_until_finished()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input", help=".pt state dict or Lightning .ckpt")
    ap.add_argument("output", help="output .npz path or Orbax directory")
    ap.add_argument("--kind", default="auto",
                    choices=["auto", "dit", "classifier", "vae"])
    ap.add_argument("--model", default="",
                    help="DiT_models registry name; enables shape validation")
    ap.add_argument("--input-size", type=int, nargs=2, default=[128, 16])
    ap.add_argument("--in-channels", type=int, default=4)
    ap.add_argument("--num-classes", type=int, default=3)
    ap.add_argument("--learn-sigma", action="store_true")
    ap.add_argument("--ch-mult", type=int, nargs="+", default=[1, 2, 2, 4],
                    help="VAE channel multipliers (f8-all-onset.yaml)")
    ap.add_argument("--num-res-blocks", type=int, default=2)
    ap.add_argument("--vae-ch", type=int, default=128,
                    help="VAE base channel count (f8-all-onset: 128)")
    ap.add_argument("--format", default="auto", choices=["auto", "npz",
                                                         "orbax"])
    args = ap.parse_args(argv)

    sd = load_torch_state_dict(args.input)
    if not sd:
        raise SystemExit(f"no tensors found in {args.input}")
    kind, depth, chord = detect_kind(sd)
    if args.kind != "auto":
        kind = args.kind
    print(f"detected kind={kind} depth={depth} chord={chord} "
          f"({len(sd)} tensors)")

    if kind == "vae":
        converted = convert_vae(sd, ch_mult=tuple(args.ch_mult),
                                num_res_blocks=args.num_res_blocks)
    elif kind == "classifier":
        converted = convert_dit_rotary_classifier(sd, depth=depth,
                                                  chord=chord)
    else:
        converted = convert_dit_rotary(sd, depth=depth,
                                       num_classes=args.num_classes)

    if kind == "vae":
        import jax

        from rule_guided_music_tpu.models import AutoencoderKL
        import jax.numpy as jnp

        vae = AutoencoderKL(ch=args.vae_ch, ch_mult=tuple(args.ch_mult),
                            num_res_blocks=args.num_res_blocks)
        template = jax.eval_shape(
            vae.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 3, 128, 128)), rng=jax.random.PRNGKey(1),
        )
        assert_tree_shapes_match(converted, template)
        print("shape validation vs AutoencoderKL template: OK")
    elif args.model:
        template = build_template(args, kind, chord)
        assert_tree_shapes_match(converted, template)
        print(f"shape validation vs {args.model} template: OK")

    fmt = args.format
    if fmt == "auto":
        fmt = "npz" if args.output.endswith(".npz") else "orbax"
    if fmt == "npz":
        save_npz(converted, args.output)
    else:
        save_orbax(converted, args.output)
    n_params = sum(
        int(np.prod(v.shape))
        for v in _leaves(converted["params"])
    )
    print(f"wrote {args.output} ({fmt}, {n_params/1e6:.1f}M params)")


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
