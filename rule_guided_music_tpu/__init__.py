"""rule_guided_music_tpu — a TPU-native framework for symbolic music generation
with non-differentiable rule-guided diffusion.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
yjhuangcd/rule-guided-music (ICML 2024, arXiv 2402.14285):

- Latent diffusion over piano-roll VAE latents with a rotary DiT denoiser.
- Stochastic Control Guidance (SCG): k-candidate branching expressed as a
  vmapped candidate axis inside a single `jax.lax.scan` reverse chain.
- Classifier / DPS / classifier-free guidance via `jax.grad`.
- DiffCollage long-form score stitching as fold/unfold XLA ops.
- On-device rule programs (pitch-class histogram, note density, chord
  progression via vectorized Krumhansl key finding + chord templates).

Everything under `jit`; whole reverse chains compile to one XLA program.
"""

__version__ = "0.1.0"
