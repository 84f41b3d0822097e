from .rotary import RotaryTable, apply_rotary
from .attention import sdpa
