"""Covariance kernels: stationary RBF and the Gibbs nonstationary kernel.

TPU-first forms of the reference's two kernel families:
  - `create_RBF` / `RBF_cov`                (code/utils.py:75-94,
                                             SIM_code/Utility/kernels.py:24-43)
  - `create_Gibbs` / `Nonstationary_RBF_cov` (code/utils.py:97-103,
                                             SIM_code/Utility/kernels.py:46-73)

Pairwise distances are expressed through a single matmul (the `x·yᵀ` term) so
the MXU does the heavy lifting; the elementwise mixing terms fuse into the
surrounding computation under XLA.  A fused Pallas variant of the Gibbs build
lives in `ops/pallas_kernels.py` for large-N tiles.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "sq_dist",
    "rbf",
    "gibbs",
    "nonstationary_rbf",
]


def _as_points(x):
    """(N,) -> (N, 1); (N, d) unchanged.  Inputs are rows of points."""
    x = jnp.asarray(x)
    return x[:, None] if x.ndim == 1 else x


def sq_dist(x1, x2):
    """Pairwise squared Euclidean distances, (N1, d) x (N2, d) -> (N1, N2).

    For low-dimensional inputs (every model in this framework: time, or
    2-3d space) the EXACT broadcast difference is used, like the reference
    (code/utils.py:75-81).  The ||a||^2 + ||b||^2 - 2 a·b expansion loses
    ~eps * ||x||^2 ABSOLUTE accuracy to cancellation; at the HCP workload's
    input scale (x up to 4800, length scale e^5) that error reaches the
    1e-4 Cholesky jitter, the stationary grams go indefinite in f32, and
    every training step NaNs (observed on both CPU f32 and TPU).  At small
    d the cross term is a thin outer product with no MXU advantage, so the
    exact form costs nothing.  For d > 4 the matmul expansion is kept,
    input-centered (subtracting the mean cuts ||x||^2, and with it the
    cancellation, by the squared data spread) and clamped at zero.
    """
    x1 = _as_points(x1)
    x2 = _as_points(x2)
    if x1.shape[-1] <= 4:
        diff = x1[:, None, :] - x2[None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    c = 0.5 * (jnp.mean(x1, axis=0) + jnp.mean(x2, axis=0))
    x1 = x1 - c
    x2 = x2 - c
    n1 = jnp.sum(x1 * x1, axis=-1)[:, None]
    n2 = jnp.sum(x2 * x2, axis=-1)[None, :]
    cross = x1 @ x2.T
    return jnp.maximum(n1 + n2 - 2.0 * cross, 0.0)


def rbf(x1, x2, scale2=1.0, length_scale=1.0):
    """K(x,x') = scale2 * exp(-0.5 ||x-x'||^2 / length_scale^2).

    Matches `create_RBF` (reference code/utils.py:91-94): inputs are divided
    by the length scale before the distance.  No diagonal jitter is added
    here — jitter policy lives at the solve sites, like the reference's
    DSVI path.
    """
    r2 = sq_dist(x1 / length_scale, x2 / length_scale)
    return scale2 * jnp.exp(-0.5 * r2)


# Auto-dispatch to the fused Pallas build above this element count on TPU
# (measured ~5x over the XLA fusion at 8192^2 on v5e; below ~1M elements the
# launch overhead eats the win).
PALLAS_MIN_ELEMENTS = 1 << 20


def _use_pallas(x1, x2):
    from ..config import is_tpu

    # NB must include the "axon" PJRT plugin backend — `default_backend()
    # == "tpu"` alone silently disabled every Pallas dispatch on this
    # image's chip (config.is_tpu covers both).
    if not is_tpu():
        return False
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    if x1.ndim != 1 or x2.ndim != 1 or x1.dtype != jnp.float32:
        return False
    return x1.shape[0] * x2.shape[0] >= PALLAS_MIN_ELEMENTS


def gibbs(x1, x2, ell1, ell2, scale2=1.0, use_pallas=None):
    """Gibbs nonstationary kernel with input-dependent lengthscale.

      k(x,x') = scale2 * sqrt(2 l(x) l(x') / (l(x)^2 + l(x')^2))
                       * exp(-||x-x'||^2 / (l(x)^2 + l(x')^2))

    Matches `create_Gibbs` (reference code/utils.py:97-103).  ell1: (N1,),
    ell2: (N2,) positive lengthscales at the two input sets.  Large f32
    builds on TPU dispatch to the fused Pallas kernel (custom VJP).
    """
    if use_pallas is None:
        use_pallas = _use_pallas(x1, x2)
    if use_pallas:
        from .pallas_kernels import gibbs_pallas

        return gibbs_pallas(
            jnp.asarray(x1), jnp.asarray(x2), ell1, ell2, jnp.asarray(scale2, jnp.float32)
        )
    r2 = sq_dist(x1, x2)
    e1sq = (ell1**2)[:, None]
    e2sq = (ell2**2)[None, :]
    denom = e1sq + e2sq
    prod = ell1[:, None] * ell2[None, :]
    pref = jnp.sqrt(2.0 * prod / denom)
    return scale2 * pref * jnp.exp(-r2 / denom)


def nonstationary_rbf(x1, x2=None, sigma1=None, ell1=None, sigma2=None, ell2=None):
    """Gibbs kernel with input-dependent *signal* magnitude as well.

      k(x,x') = s(x) s(x') sqrt(2 l(x) l(x') / (l²+l'²)) exp(-d²/(l²+l'²))

    Matches `Nonstationary_RBF_cov` (reference SIM_code/Utility/kernels.py:
    46-73) except that the reference adds `settings.jitter` on the diagonal
    when x2 is None — callers in the log-density path add that jitter
    explicitly instead, keeping this function pure.
    """
    x1 = _as_points(x1)
    n1 = x1.shape[0]
    if ell1 is None:
        ell1 = jnp.ones(n1, dtype=x1.dtype)
    if sigma1 is None:
        sigma1 = jnp.ones(n1, dtype=x1.dtype)
    if x2 is None:
        x2, sigma2, ell2 = x1, sigma1, ell1
    else:
        x2 = _as_points(x2)
        n2 = x2.shape[0]
        if ell2 is None:
            ell2 = jnp.ones(n2, dtype=x1.dtype)
        if sigma2 is None:
            sigma2 = jnp.ones(n2, dtype=x1.dtype)
    amp = sigma1[:, None] * sigma2[None, :]
    return amp * gibbs(x1, x2, ell1, ell2, scale2=1.0)
