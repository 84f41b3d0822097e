from .schedule import (
    Schedule,
    get_named_beta_schedule,
    make_schedule,
    space_timesteps,
)
from . import gaussian
