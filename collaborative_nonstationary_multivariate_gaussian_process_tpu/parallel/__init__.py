from . import mesh, sharded_mcmc  # noqa: F401
from .mesh import make_mesh  # noqa: F401
