from .dit import DiT_models, DiT, DiTRotary, DiTClassifier, DiTRotaryClassifier
from .vae import AutoencoderKL, DiagonalGaussian, ScoringDecoder
