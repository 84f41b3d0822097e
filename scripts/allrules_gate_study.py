"""Measure the light-scoring gate at the PRODUCTION operating point:
all three rules (pitch_hist 40 / note_density 1 / chord_progression 1,
the reference's scg_classifier_all.yml weights) at k=16.

Round-3 verdict weak #2: the committed gate (tests/test_light_scoring_gate
.py) exercised note-density only at k=8; the feature head's chord-tag
argmax was never validated end-to-end.  This study runs full SCG chains on
the learned fixture for each scoring substitute and reports PER-RULE final
losses (scored through the FULL decoder) plus per-rule candidate regret,
so the committed test thresholds are measured, not guessed.

Run: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/allrules_gate_study.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the k=16 full-decode chain compiles for ~13 min on this host's single
# core — persist the compiled programs so re-runs (e.g. after a feathead
# re-distillation, which only invalidates the cheap decode-free variants)
# don't pay it again
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))

import jax
import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.latent import make_decode_fn, make_encode_fn
from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
    sample_loop,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import (
    AutoencoderKL,
    DiT_models,
    RuleFeatureHead,
    ScoringDecoder,
)
from rule_guided_music_tpu.rules.registry import FUNC_DICT, LOSS_DICT
from rule_guided_music_tpu.utils.fixtures import (
    load_fixture_npz,
    make_rolls,
    unflatten_tree,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUALITY = os.path.join(REPO, "tests", "fixtures", "quality_tiny.npz")
GATE = os.path.join(REPO, "tests", "fixtures", "light_gate_tiny.npz")

SHAPE = (4, 4, 128, 16)
K = 16
RULES = ("pitch_hist", "note_density", "chord_progression")
WEIGHTS = (("pitch_hist", 40.0), ("note_density", 1.0),
           ("chord_progression", 1.0))
SEEDS = (0, 1, 2, 3)


ALL_VARIANTS = ("plain", "full", "light_dec", "feat", "feat_roll",
                "feat_pre4_light", "feat_pre4_full", "feat_pre4_roll_light",
                # bench.py's dpmpp20_sde_feat_pre4 serving row, gated at the
                # same operating point: SDE-DPM-Solver++ chains (ancestral
                # noise keeps the k candidates distinct) with no SCG, full-
                # decoder SCG, and the production substitute stack
                "sde_plain", "sde_full", "sde_feat_pre4_roll_light")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variants", default=",".join(ALL_VARIANTS),
                        help="comma list of chain variants to (re)measure; "
                             "others are carried over from the existing "
                             "JSON (--merge)")
    parser.add_argument("--merge", action="store_true",
                        help="merge into docs/allrules_gate_study.json "
                             "instead of starting fresh")
    parser.add_argument("--skip_regret", action="store_true")
    args = parser.parse_args()
    want = [v for v in args.variants.split(",") if v]
    unknown = set(want) - set(ALL_VARIANTS)
    assert not unknown, f"unknown variants {unknown}"

    fx = load_fixture_npz(QUALITY)
    data = np.load(GATE)
    light_dec_params = unflatten_tree(
        {k[len("decoder/"):]: data[k] for k in data.files
         if k.startswith("decoder/")})
    rollout_params = unflatten_tree(
        {k[len("rollout/"):]: data[k] for k in data.files
         if k.startswith("rollout/")})
    feat_params = unflatten_tree(
        {k[len("feathead/"):]: data[k] for k in data.files
         if k.startswith("feathead/")})
    scale = fx["scale"]

    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    light = ScoringDecoder(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    dit = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0, learn_sigma=False)
    tables = make_schedule("linear", 1000, timestep_respacing="16").tables()

    decode = make_decode_fn(
        lambda c: vae.apply(fx["vae"], c, method=AutoencoderKL.decode),
        scale_factor=scale)
    light_decode = make_decode_fn(
        lambda c: light.apply(light_dec_params, c,
                              method=ScoringDecoder.decode),
        scale_factor=scale)
    encode = make_encode_fn(
        lambda x: vae.apply(fx["vae"], x, method=AutoencoderKL.encode_moments),
        scale_factor=scale)
    model_fn = lambda x, t, y=None: dit.apply(fx["dit"], x, t)
    rollout_fn = lambda x, t, y=None: dit.apply(rollout_params, x, t)
    head = RuleFeatureHead(ch=16, depth=2)
    feature_fn = lambda z: head.apply(feat_params, z / scale,
                                      method=RuleFeatureHead.features)

    # In-distribution all-rules target: the sparsest reconstruction.
    train = jnp.asarray(make_rolls(8, seed=21))
    rec = decode(encode(train))
    nds = np.asarray(FUNC_DICT["note_density"](rec))
    idx = int(np.argsort(nds[:, :8].mean(axis=1))[0])
    targets = {}
    for name in RULES:
        row = np.asarray(FUNC_DICT[name](rec))[idx]
        targets[name] = jnp.asarray(np.tile(row[None], (SHAPE[0],) + (1,) * row.ndim))
    print("targets:", {k: (v.shape, str(v.dtype)) for k, v in targets.items()},
          flush=True)

    def cfg_base(sde):
        return dict(sampler="dpmpp", dpmpp_sde=True) if sde else dict(
            sampler="ddpm")

    def cfg_plain(sde=False):
        return SamplerConfig(**cfg_base(sde))

    def cfg_scg(prefilter=0, sde=False):
        return SamplerConfig(
            **cfg_base(sde),
            guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                    t_start=tables.num_timesteps, t_end=0),
            scg=SCGConfig(num_samples=K, weights=WEIGHTS,
                          prefilter=prefilter),
        )

    def make_run(decode_fn=None, scoring_model_fn=None,
                 scoring_feature_fn=None, plain=False, prefilter=0,
                 sde=False):
        cfg = cfg_plain(sde) if plain else cfg_scg(prefilter, sde)
        return jax.jit(lambda r: sample_loop(
            r, model_fn, SHAPE, tables, cfg, rules=targets,
            decode_fn=decode_fn, scoring_model_fn=scoring_model_fn,
            scoring_feature_fn=scoring_feature_fn)[0])

    runs_all = {
        "plain": lambda: make_run(plain=True),
        "full": lambda: make_run(decode_fn=decode),
        "light_dec": lambda: make_run(decode_fn=light_decode),
        "feat": lambda: make_run(scoring_feature_fn=feature_fn),
        "feat_roll": lambda: make_run(scoring_feature_fn=feature_fn,
                                      scoring_model_fn=rollout_fn),
        # hybrid trust-but-verify (SCGConfig.prefilter): head ranks k=16,
        # a decoder re-ranks the top 4
        "feat_pre4_light": lambda: make_run(
            scoring_feature_fn=feature_fn, decode_fn=light_decode,
            prefilter=4),
        "feat_pre4_full": lambda: make_run(
            scoring_feature_fn=feature_fn, decode_fn=decode, prefilter=4),
        "feat_pre4_roll_light": lambda: make_run(
            scoring_feature_fn=feature_fn, decode_fn=light_decode,
            scoring_model_fn=rollout_fn, prefilter=4),
        "sde_plain": lambda: make_run(plain=True, sde=True),
        "sde_full": lambda: make_run(decode_fn=decode, sde=True),
        "sde_feat_pre4_roll_light": lambda: make_run(
            scoring_feature_fn=feature_fn, decode_fn=light_decode,
            scoring_model_fn=rollout_fn, prefilter=4, sde=True),
    }
    runs = {name: runs_all[name]() for name in ALL_VARIANTS if name in want}

    out_path = os.path.join(REPO, "docs", "allrules_gate_study.json")
    results = {}
    per_seed = {}
    prior = {}
    if args.merge and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        results.update(prior.get("final_losses", {}))
        per_seed.update(prior.get("per_seed", {}))
    for name, run in runs.items():
        t0 = time.perf_counter()
        per_rule = {r: 0.0 for r in RULES}
        per_seed[name] = {}
        for seed in SEEDS:
            roll = decode(run(jax.random.PRNGKey(seed)))
            seed_losses = {}
            for r in RULES:
                gen = FUNC_DICT[r](roll)
                v = float(LOSS_DICT[r](gen, targets[r]).mean())
                per_rule[r] += v
                seed_losses[r] = v
            seed_losses["weighted"] = sum(
                seed_losses[r] * dict(WEIGHTS)[r] for r in RULES)
            per_seed[name][str(seed)] = seed_losses
            print(f"  {name} seed {seed}: weighted="
                  f"{seed_losses['weighted']:.4f}", flush=True)
        per_rule = {r: v / len(SEEDS) for r, v in per_rule.items()}
        per_rule["weighted"] = sum(per_rule[r] * dict(WEIGHTS)[r]
                                   for r in RULES)
        results[name] = per_rule
        print(f"{name:>10}: " + "  ".join(
            f"{r}={per_rule[r]:.4f}" for r in list(RULES) + ["weighted"])
            + f"   ({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- per-rule candidate regret at guided steps (k=16) -----------------
    # --merge can carry over variants averaged under a DIFFERENT seed set;
    # record each variant's actual seed coverage (derived from per_seed)
    # instead of claiming the current SEEDS for all of them.
    def seeds_per_variant():
        return {name: sorted(int(s) for s in per_seed.get(name, {}))
                for name in results}

    if args.skip_regret:
        reg_summary = prior.get("norm_regret", {})
        with open(out_path, "w") as f:
            json.dump({"final_losses": results, "per_seed": per_seed,
                       "norm_regret": reg_summary,
                       "k": K, "weights": dict(WEIGHTS),
                       "seeds_this_run": list(SEEDS),
                       "seeds_per_variant": seeds_per_variant()},
                      f, indent=2)
        print(f"wrote {out_path} (regret carried over)")
        return

    gt = encode(jnp.asarray(make_rolls(SHAPE[0], seed=33)))

    @jax.jit
    def cand_losses(x_t, t, noise):
        eps = model_fn(x_t, tables.model_t[t])
        x0 = gd.predict_xstart_from_eps(tables, x_t, t, eps)
        mean, _, logvar = gd.q_posterior_mean_variance(tables, x0, x_t, t)
        cands = mean[None] + jnp.exp(0.5 * logvar)[None] * noise
        flat = cands.reshape((K * x_t.shape[0],) + x_t.shape[1:])
        t_k = jnp.concatenate([t] * K)
        eps_c = model_fn(flat, tables.model_t[t_k])
        x0_c = gd.predict_xstart_from_eps(tables, flat, t_k, eps_c)
        out = {}
        for tag, feats_of in (
            ("full", lambda z: {r: FUNC_DICT[r](decode(z)) for r in RULES}),
            ("light_dec", lambda z: {r: FUNC_DICT[r](light_decode(z))
                                     for r in RULES}),
            ("feat", feature_fn),
        ):
            feats = feats_of(x0_c)
            out[tag] = {
                r: LOSS_DICT[r](feats[r],
                                jnp.concatenate([targets[r]] * K, axis=0)
                                ).reshape(K, -1)
                for r in RULES
            }
        return out

    regret = {tag: {r: [] for r in RULES + ("weighted",)}
              for tag in ("light_dec", "feat")}
    spread = {r: [] for r in RULES + ("weighted",)}
    for i, t_scalar in enumerate((2, 5, 8, 11, 14)):
        t = jnp.full((SHAPE[0],), t_scalar, dtype=jnp.int32)
        k1, k2 = jax.random.split(jax.random.PRNGKey(100 + i))
        x_t = gd.q_sample(tables, gt, t, jax.random.normal(k1, gt.shape))
        noise = jax.random.normal(k2, (K,) + gt.shape)
        out = jax.device_get(cand_losses(x_t, t, noise))
        w = dict(WEIGHTS)
        for tag in out:
            out[tag]["weighted"] = sum(out[tag][r] * w[r] for r in RULES)
        for b in range(SHAPE[0]):
            for key in list(RULES) + ["weighted"]:
                lf = out["full"][key][:, b]
                spread_b = lf.max() - lf.min()
                if key == "weighted":
                    spread["weighted"].append(spread_b)
                else:
                    spread[key].append(spread_b)
                for tag in ("light_dec", "feat"):
                    # the substitute ranks by ITS weighted loss; regret of
                    # that pick measured in the full ranker's `key` loss
                    choice = int(out[tag]["weighted"][:, b].argmin())
                    regret[tag][key].append(lf[choice] - lf.min())

    reg_summary = {}
    for tag in regret:
        reg_summary[tag] = {}
        for key in regret[tag]:
            r = float(np.mean(regret[tag][key]))
            s = float(np.mean(spread[key])) + 1e-12
            reg_summary[tag][key] = r / s
        print(f"regret[{tag}]: " + "  ".join(
            f"{k}={v:.3f}" for k, v in reg_summary[tag].items()), flush=True)

    with open(out_path, "w") as f:
        json.dump({"final_losses": results, "per_seed": per_seed,
                   "norm_regret": reg_summary,
                   "k": K, "weights": dict(WEIGHTS),
                   "seeds_this_run": list(SEEDS),
                   "seeds_per_variant": seeds_per_variant()},
                  f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
