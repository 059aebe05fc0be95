from . import cnmgp, predict  # noqa: F401
from .cnmgp import CNMGPParams, init_params  # noqa: F401
