from . import mesh, sharded_mcmc, sharded_smc  # noqa: F401
from .mesh import make_mesh  # noqa: F401
from .sharded_smc import run_smc_sharded  # noqa: F401
