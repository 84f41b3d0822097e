from . import mgeval
