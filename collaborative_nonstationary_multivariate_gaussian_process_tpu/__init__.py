"""CNMGP-TPU: a TPU-native probabilistic inference engine for the
Collaborative Nonstationary Multivariate Gaussian Process model family.

Built from scratch against the behavior of
Corleno/Collaborative_Nonstationary_Multivariate_Gaussian_Process
(study copy at /root/reference), re-designed for JAX/XLA/Pallas/pjit:
static-shape jitted ELBOs, vmapped predictive sampling, chain-sharded
NUTS/HMC + SMC over `jax.sharding.Mesh`, and fused Pallas kernels for the
hot covariance builds.
"""

from . import config, infer, models, ops, parallel, utils  # noqa: F401

__version__ = "0.1.0"
