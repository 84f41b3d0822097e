from .registry import FUNC_DICT, LOSS_DICT, extract_rule
from . import tensor_rules, chord
