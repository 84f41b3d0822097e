"""Build the light-scoring gate fixtures for tests/test_light_scoring_gate.py.

Distills, against the committed learned quality fixture
(tests/fixtures/quality_tiny.npz — ch=32 KL-VAE + tiny DiTRotary trained by
scripts/make_quality_fixture.py):

  * a ch=16 ScoringDecoder matching the fixture VAE's decode at the
    deployment operating point (x0 / scale_factor inputs), and
  * a tiny DiTRotary rollout student matching the fixture denoiser's x̂0.

Saves both as tests/fixtures/light_gate_tiny.npz so the quality-gate test
(SCG full-vs-light ranking: final rule loss margin + selected-candidate
regret) runs chains only — no distillation in the test.

Run: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/make_light_gate_fixtures.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import AutoencoderKL, DiT_models, ScoringDecoder
from rule_guided_music_tpu.utils.fixtures import flatten_tree, load_fixture_npz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "quality_tiny.npz")
OUT = os.path.join(REPO, "tests", "fixtures", "light_gate_tiny.npz")

DECODER_STEPS = int(os.environ.get("GATE_DECODER_STEPS", "300"))
ROLLOUT_STEPS = int(os.environ.get("GATE_ROLLOUT_STEPS", "400"))


def main():
    fx = load_fixture_npz(FIXTURE)
    scale = fx["scale"]
    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    dit = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0,
        learn_sigma=False,
    )
    tables = make_schedule("linear", 1000, timestep_respacing="16").tables()

    # --- light decoder (ch=16) ------------------------------------------------
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

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(DECODER_STEPS):
        rng, sub = jax.random.split(rng)
        z = jax.random.normal(sub, (16, 4, 16, 16)) / scale
        lp, ost, l = dec_step(lp, ost, z, teacher_dec(z))
        if i % 50 == 0:
            print(f"decoder distill {i}: L1 {float(l):.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- rollout student (fresh XS, same arch as the fixture teacher) --------
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

    t0 = time.perf_counter()
    for i in range(ROLLOUT_STEPS):
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        x = jax.random.normal(r1, (16, 4, 128, 16))
        t = jax.random.randint(r2, (16,), 0, tables.num_timesteps)
        x_t = gd.q_sample(tables, x, t, jax.random.normal(r3, x.shape))
        target = x0_from(teacher_fwd(fx["dit"], x_t, tables.model_t[t]),
                         x_t, t)
        sp, ost2, l = roll_step(sp, ost2, x_t, t, target)
        if i % 50 == 0:
            print(f"rollout distill {i}: x0-MSE {float(l):.5f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    flat = {}
    for prefix, tree in [("decoder/", lp), ("rollout/", sp)]:
        for k, v in flatten_tree(jax.device_get(tree)).items():
            flat[prefix + k] = v
    np.savez_compressed(OUT, **flat)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
