"""Build the light-scoring gate fixtures for tests/test_light_scoring_gate.py.

Distills, against the committed learned quality fixture
(tests/fixtures/quality_tiny.npz — ch=32 KL-VAE + tiny DiTRotary trained by
scripts/make_quality_fixture.py):

  * a ch=16 ScoringDecoder matching the fixture VAE's decode at the
    deployment operating point (x0 / scale_factor inputs),
  * a tiny DiTRotary rollout student matching the fixture denoiser's x̂0,
  * a ch=16 RuleFeatureHead predicting the fixture VAE's decode+FUNC_DICT
    rule features straight from latents (teacher features precomputed once
    on a fixed corpus, then trained for many cheap epochs).

Saves all three as tests/fixtures/light_gate_tiny.npz so the quality-gate
test (SCG full-vs-light ranking: final rule loss margin + selected-
candidate regret) runs chains only — no distillation in the test.

Run: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/make_light_gate_fixtures.py
(--only decoder|rollout|feathead re-distills one part, merging into the
existing npz.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.latent import make_decode_fn
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import (
    AutoencoderKL,
    DiT_models,
    RuleFeatureHead,
    ScoringDecoder,
)
from rule_guided_music_tpu.rules.registry import FUNC_DICT
from rule_guided_music_tpu.utils.fixtures import flatten_tree, load_fixture_npz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "quality_tiny.npz")
OUT = os.path.join(REPO, "tests", "fixtures", "light_gate_tiny.npz")

DECODER_STEPS = int(os.environ.get("GATE_DECODER_STEPS", "300"))
ROLLOUT_STEPS = int(os.environ.get("GATE_ROLLOUT_STEPS", "800"))
FEAT_STEPS = int(os.environ.get("GATE_FEAT_STEPS", "1200"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--only", default="all",
                        choices=["all", "decoder", "rollout", "feathead"])
    args = parser.parse_args()
    parts = (["decoder", "rollout", "feathead"] if args.only == "all"
             else [args.only])
    fx = load_fixture_npz(FIXTURE)
    scale = fx["scale"]
    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    dit = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False,
    )
    tables = make_schedule("linear", 1000, timestep_respacing="16").tables()

    # Realistic latent pool — the SAME distribution the students see in
    # deployment.  The round-3 session-1 fixture distilled on pure-noise
    # "clean data"; the rollout student then collapsed at the learned
    # model's actual states (rollout-ranked SCG measured WORSE than no
    # guidance, 17.4 vs 7.2 on the gate).  The teacher DiT was trained on
    # encode(make_rolls) latents (scripts/make_quality_fixture.py), so
    # distill there too.
    from rule_guided_music_tpu.diffusion.latent import make_encode_fn
    from rule_guided_music_tpu.utils.fixtures import make_rolls

    encode = jax.jit(make_encode_fn(
        lambda x: vae.apply(fx["vae"], x,
                            method=AutoencoderKL.encode_moments),
        scale_factor=scale))
    lat = np.asarray(jnp.concatenate(
        [encode(jnp.asarray(make_rolls(16, seed=s))) for s in (0, 7)]))
    print(f"latent pool: {lat.shape} std {lat.std():.3f}", flush=True)

    trees = {}

    # --- shared deployment-state corpus (decoder + feathead students) -----
    # Round-4 finding (docs/allrules_gate_study.json): students distilled
    # only on q_sample / random-normal inputs score well point-wise but
    # mis-rank the candidates produced UNDER THEIR OWN guidance — chains
    # drift off-corpus and selection amplifies the errors (feat nd loss
    # 9.99 vs 3.61 unguided; feat_pre4_light re-rank fooled the same way).
    # Both students therefore train on chain-state x̂0s.
    corpus_u = None
    if parts:        # every student trains on deployment-distribution states
        decode_long = make_decode_fn(
            lambda c: vae.apply(fx["vae"], c, method=AutoencoderKL.decode))
        rules = ("pitch_hist", "note_density", "chord_progression")

        @jax.jit
        def teacher_feats(u):
            roll = decode_long(u)
            return {name: FUNC_DICT[name](roll) for name in rules}

        teacher_x0 = jax.jit(lambda x_t, t: gd.predict_xstart_from_eps(
            tables, x_t, t,
            dit.apply(fx["dit"], x_t, tables.model_t[t])))

        # Candidate states exactly as SCG generates them: posterior mean +
        # sigma * noise at level t, then the teacher's x̂0 one level down —
        # the inputs the students score in deployment.
        @jax.jit
        def candidate_x0(x_t, t, noise_key, k=2):
            eps = dit.apply(fx["dit"], x_t, tables.model_t[t])
            x0 = gd.predict_xstart_from_eps(tables, x_t, t, eps)
            mean, _, logvar = gd.q_posterior_mean_variance(tables, x0, x_t, t)
            nz = jax.random.normal(noise_key, (k,) + x_t.shape)
            cands = (mean[None] + jnp.exp(0.5 * logvar)[None] * nz).reshape(
                (k * x_t.shape[0],) + x_t.shape[1:])
            t_dn = jnp.maximum(jnp.concatenate([t] * k) - 1, 0)
            return teacher_x0(cands, t_dn)

        # the target rows the DAgger chains steer toward (any in-
        # distribution row works; what matters is that guidance is ON so
        # states come from the guided distribution)
        tgt_feats = jax.device_get(teacher_feats(jnp.asarray(lat[:1])
                                                 / scale))

        def chain_states(run_feature_fn, seeds, batch=8):
            """Per-step sampler states x_s of full chains (record_states),
            optionally guided by a scoring substitute (DAgger collection:
            the states the head is evaluated on in deployment are the ones
            produced UNDER its own guidance).  Returns (states, levels)
            flattened over steps x batch x seeds."""
            from rule_guided_music_tpu.diffusion.sampling import (
                GuidanceConfig, SCGConfig, SamplerConfig, sample_loop)

            if run_feature_fn is None:
                cfg = SamplerConfig(sampler="ddpm", record=True,
                                    record_states=True)
            else:
                cfg = SamplerConfig(
                    sampler="ddpm",
                    guidance=GuidanceConfig(
                        method="no_guidance", schedule=True,
                        t_start=tables.num_timesteps, t_end=0),
                    scg=SCGConfig(num_samples=8, weights=(
                        ("pitch_hist", 40.0), ("note_density", 1.0),
                        ("chord_progression", 1.0))),
                    record=True, record_states=True)
            tgt_row = {
                name: jnp.tile(jnp.asarray(tgt_feats[name]),
                               (batch,) + (1,) * (tgt_feats[name].ndim - 1))
                for name in rules
            }
            run = jax.jit(lambda r: sample_loop(
                r, lambda x, t, y=None: dit.apply(fx["dit"], x, t),
                (batch, 4, 128, 16), tables, cfg, rules=tgt_row,
                scoring_feature_fn=run_feature_fn)[1]["state"])
            # record["state"][i] is the state AFTER the step at ts[i]=T-1-i,
            # i.e. at noise level ts[i]-1 (floored at 0)
            lvl = np.maximum(
                np.arange(tables.num_timesteps)[::-1] - 1, 0)
            states, levels = [], []
            for s in seeds:
                st = np.asarray(run(jax.random.PRNGKey(s)))   # (T, B, ...)
                states.append(st.reshape((-1,) + st.shape[2:]))
                levels.append(np.repeat(lvl, st.shape[1]))
            return np.concatenate(states), np.concatenate(levels)

        def states_to_x0(states_flat, levels_flat, rng_seed):
            """(state, level) pairs -> teacher x̂0 + SCG candidate x̂0 —
            the students' deployment inputs."""
            np_r = np.random.default_rng(rng_seed)
            out = []
            for start in range(0, len(states_flat), 8):
                sl = slice(start, start + 8)
                x_s = jnp.asarray(states_flat[sl])
                t_s = jnp.asarray(levels_flat[sl])
                out.append(np.asarray(teacher_x0(x_s, t_s)))
                if np_r.random() < 0.5:     # candidates on half the states
                    out.append(np.asarray(candidate_x0(
                        x_s, t_s, jax.random.PRNGKey(int(np_r.integers(
                            0, 2**31))))))
            return np.concatenate(out)

        # corpus: clean latents + q_sample x̂0 + PLAIN-chain states
        rng = jax.random.PRNGKey(2)
        u_parts = [np.asarray(lat)]
        np_rng3 = np.random.default_rng(12)
        for _ in range(8):
            rng, r1, r2 = jax.random.split(rng, 3)
            x = jnp.asarray(lat[np_rng3.integers(0, len(lat), size=8)])
            t = jax.random.randint(r1, (8,), 0, tables.num_timesteps)
            x_t = gd.q_sample(tables, x, t, jax.random.normal(r2, x.shape))
            u_parts.append(np.asarray(teacher_x0(x_t, t)))
        t0 = time.perf_counter()
        plain_states, plain_levels = chain_states(None, seeds=(101, 102))
        u_parts.append(states_to_x0(plain_states, plain_levels, rng_seed=40))
        corpus_u = np.concatenate(u_parts) / scale
        print(f"deployment-state corpus: {corpus_u.shape[0]} excerpts "
              f"(chains {time.perf_counter()-t0:.0f}s)", flush=True)

    # --- light decoder (ch=16) ------------------------------------------------
    if "decoder" in parts:
        light = ScoringDecoder(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
        lp = light.init(jax.random.PRNGKey(3), jnp.zeros((1, 4, 16, 16)))
        teacher_dec = jax.jit(
            lambda z: vae.apply(fx["vae"], z, method=AutoencoderKL.decode))
        opt = optax.adam(2e-3)
        ost = opt.init(lp)

        def dec_loss(p, z, tgt):
            return jnp.abs(
                light.apply(p, z, method=ScoringDecoder.decode) - tgt).mean()

        @jax.jit
        def dec_step(p, s, z, tgt):
            l, g = jax.value_and_grad(dec_loss)(p, z, tgt)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s, l

        # tile pool: chain-state x̂0/scale excerpts sliced into the
        # decoder's 16x16 latent tiles (the inputs it ranks in deployment),
        # mixed 50/50 with random-normal tiles for off-manifold coverage
        tiles = np.asarray(corpus_u).reshape(-1, 4, 8, 16, 16)
        tiles = np.moveaxis(tiles, 2, 1).reshape(-1, 4, 16, 16)
        np_rd = np.random.default_rng(13)
        rng = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        for i in range(DECODER_STEPS):
            rng, sub = jax.random.split(rng)
            z_rand = jax.random.normal(sub, (8, 4, 16, 16)) / scale
            z_chain = jnp.asarray(
                tiles[np_rd.integers(0, len(tiles), size=8)])
            z = jnp.concatenate([z_rand, z_chain])
            lp, ost, l = dec_step(lp, ost, z, teacher_dec(z))
            if i % 50 == 0:
                print(f"decoder distill {i}: L1 {float(l):.4f} "
                      f"({time.perf_counter()-t0:.0f}s)", flush=True)
        trees["decoder/"] = lp

    # chain-state (x_t, t) pairs for the rollout student (same
    # deployment-distribution fix as the other students)
    chain_xt = chain_lv = None
    if "rollout" in parts and corpus_u is not None:
        chain_xt, chain_lv = chain_states(None, seeds=(111, 112))

    # --- rollout student (fresh XS, same arch as the fixture teacher) --------
    if "rollout" in parts:
        student = DiT_models["DiTRotary_XS_8"](
            input_size=(128, 16), in_channels=4, num_classes=0,
            learn_sigma=False,
        )
        sp = student.init(jax.random.PRNGKey(5), jnp.zeros((1, 4, 128, 16)),
                          jnp.zeros((1,)))
        teacher_fwd = jax.jit(lambda p, x, t: dit.apply(p, x, t))
        opt2 = optax.adam(1e-3)
        ost2 = opt2.init(sp)

        def x0_from(eps, x_t, t):
            return gd.predict_xstart_from_eps(tables, x_t, t, eps)

        def roll_loss(p, x_t, t, target_x0):
            pred = x0_from(student.apply(p, x_t, tables.model_t[t]), x_t, t)
            return ((pred - target_x0) ** 2).mean()

        @jax.jit
        def roll_step(p, s, x_t, t, target_x0):
            l, g = jax.value_and_grad(roll_loss)(p, x_t, t, target_x0)
            u, s = opt2.update(g, s)
            return optax.apply_updates(p, u), s, l

        rng = jax.random.PRNGKey(1)
        np_rng2 = np.random.default_rng(11)
        t0 = time.perf_counter()
        for i in range(ROLLOUT_STEPS):
            rng, r2, r3 = jax.random.split(rng, 3)
            if chain_xt is not None and i % 2 == 1:
                # alternate: real sampler-chain states (deployment dist.)
                idx = np_rng2.integers(0, len(chain_xt), size=16)
                x_t = jnp.asarray(chain_xt[idx])
                t = jnp.asarray(chain_lv[idx])
            else:
                x = jnp.asarray(lat[np_rng2.integers(0, len(lat), size=16)])
                t = jax.random.randint(r2, (16,), 0, tables.num_timesteps)
                x_t = gd.q_sample(tables, x, t,
                                  jax.random.normal(r3, x.shape))
            target = x0_from(teacher_fwd(fx["dit"], x_t, tables.model_t[t]),
                             x_t, t)
            sp, ost2, l = roll_step(sp, ost2, x_t, t, target)
            if i % 50 == 0:
                print(f"rollout distill {i}: x0-MSE {float(l):.5f} "
                      f"({time.perf_counter()-t0:.0f}s)", flush=True)
        trees["rollout/"] = sp

    # --- rule-feature head (ch=16) -------------------------------------------
    # Teacher features (fixture-VAE decode -> FUNC_DICT) are precomputed
    # once on a fixed latent corpus; the cheap head then trains for many
    # epochs over it. Head input = x0 / scale (deployment operating point,
    # matching pipeline.make_sample_fn's z / scale_factor).
    if "feathead" in parts:
        head = RuleFeatureHead(ch=16, depth=2)
        hp = head.init(jax.random.PRNGKey(7), jnp.zeros((1, 4, 128, 16)))

        def label_and_train(hp, corpus_u, steps, lr, tag):
            n = corpus_u.shape[0]
            t0 = time.perf_counter()
            feats_list = []
            for i in range(0, n, 8):
                feats_list.append(jax.device_get(
                    teacher_feats(jnp.asarray(corpus_u[i:i + 8]))))
            corpus_feats = {
                k: np.concatenate([f[k] for f in feats_list])
                for k in feats_list[0]
            }
            print(f"  {tag}: labeled {n} ({time.perf_counter()-t0:.0f}s)",
                  flush=True)

            opt3 = optax.adam(optax.cosine_decay_schedule(lr, steps))
            ost3 = opt3.init(hp)

            def feat_loss(p, u, tgt):
                out = head.apply(p, u)
                ph = ((out["pitch_hist"] - tgt["pitch_hist"]) ** 2).mean()
                nd = ((out["note_density"]
                       - tgt["note_density"]) ** 2).mean()
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    out["chord_logits"], tgt["chord_progression"]).mean()
                return 40.0 * ph + nd + ce

            @jax.jit
            def feat_step(p, s, u, tgt):
                l, g = jax.value_and_grad(feat_loss)(p, u, tgt)
                up, s = opt3.update(g, s)
                return optax.apply_updates(p, up), s, l

            t0 = time.perf_counter()
            np_rng = np.random.default_rng(0)
            for i in range(steps):
                idx = np_rng.choice(n, 16, replace=False)
                tgt = {k: jnp.asarray(v[idx])
                       for k, v in corpus_feats.items()}
                hp, ost3, l = feat_step(
                    hp, ost3, jnp.asarray(corpus_u[idx]), tgt)
                if i % 200 == 0:
                    print(f"  {tag} {i}: loss {float(l):.4f} "
                          f"({time.perf_counter()-t0:.0f}s)", flush=True)
            return hp

        hp = label_and_train(hp, corpus_u, FEAT_STEPS, 2e-3, "phase1")

        # --- DAgger round: states from chains guided by the phase-1 head -
        # (sample_loop hands scoring_feature_fn x̂0 in SAMPLER units; the
        # head was trained at x̂0/scale — same convention as deployment)
        hp_p1 = hp
        feature_fn_p1 = lambda z: head.apply(hp_p1, z / scale,
                                             method=RuleFeatureHead.features)
        t0 = time.perf_counter()
        dagger_states, dagger_levels = chain_states(
            feature_fn_p1, seeds=(201, 202))
        dag_u = states_to_x0(dagger_states, dagger_levels, rng_seed=41) / scale
        corpus_u2 = np.concatenate([corpus_u, dag_u])
        print(f"feathead corpus phase 2: +{dag_u.shape[0]} DAgger excerpts "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
        hp = label_and_train(hp, corpus_u2, FEAT_STEPS, 5e-4, "phase2")
        trees["feathead/"] = hp

    flat = {}
    if os.path.exists(OUT) and args.only != "all":
        existing = np.load(OUT)
        done_prefixes = tuple(trees.keys())
        flat = {k: existing[k] for k in existing.files
                if not k.startswith(done_prefixes)}
    for prefix, tree in trees.items():
        for k, v in flatten_tree(jax.device_get(tree)).items():
            flat[prefix + k] = v
    np.savez_compressed(OUT, **flat)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
