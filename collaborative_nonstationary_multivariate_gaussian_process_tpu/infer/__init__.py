from . import dsvi, hmc, map, nuts, smc  # noqa: F401
from .dsvi import DSVIResult, inference  # noqa: F401
from .hmc import run_hmc  # noqa: F401
from .map import run_map, run_map_scipy  # noqa: F401
from .nuts import run_nuts  # noqa: F401
from .smc import run_smc  # noqa: F401
