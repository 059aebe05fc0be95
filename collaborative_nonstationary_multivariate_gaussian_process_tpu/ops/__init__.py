from . import distributions, kernels, kron, linalg  # noqa: F401
