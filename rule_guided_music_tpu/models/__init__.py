from .dit import DiT_models, DiT, DiTRotary, DiTClassifier, DiTRotaryClassifier
from .vae import AutoencoderKL, DiagonalGaussian, ScoringDecoder
from .scoring_head import RuleFeatureHead
