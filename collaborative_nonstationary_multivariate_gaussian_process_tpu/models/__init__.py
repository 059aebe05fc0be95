from . import cnmgp, initialization, logdensities, predict, prediction  # noqa: F401
from .cnmgp import CNMGPParams, init_params  # noqa: F401
from . import baselines  # noqa: F401
