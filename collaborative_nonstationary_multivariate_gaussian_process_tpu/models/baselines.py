"""Baseline GP models: independent GPR and the intrinsic coregionalization
model (ICM), exact inference.

The reference benchmarks CNMGP against GPy baselines in notebooks
(code/notebook/IGPR.ipynb — independent `GPRegression` per output with an
Exponential kernel; ICM.ipynb — `GPCoregionalizedRegression`).  These JAX
re-implementations reproduce that comparison natively: exact GP regression
with marginal-likelihood hyperparameter fitting by Adam on the log params.

Small-data exact inference (the sim studies are 100-200 points); everything
is one jitted loss and one jitted predict.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.kernels import rbf, sq_dist

__all__ = ["fit_igpr", "predict_igpr", "fit_icm", "predict_icm"]


def exponential_kernel(x1, x2, scale2, length_scale):
    """Exponential (Matern-1/2) kernel — GPy's `Exponential`, the kernel the
    reference's IGPR baseline uses (IGPR.ipynb)."""
    r = jnp.sqrt(sq_dist(x1, x2) + 1e-12) / length_scale
    return scale2 * jnp.exp(-r)


_KERNELS = {"exponential": exponential_kernel, "rbf": rbf}


def _nlml(theta, x, y, kernel_fn):
    """Negative log marginal likelihood of exact GPR."""
    s2, ls, noise = jnp.exp(theta)
    n = x.shape[0]
    K = kernel_fn(x, x, s2, ls) + (noise + 1e-6) * jnp.eye(n, dtype=x.dtype)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    return (
        0.5 * jnp.dot(y, alpha)
        + jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * jnp.log(2 * jnp.pi)
    )


def _fit_adam(loss_fn, theta0, steps, lr):
    opt = optax.adam(lr)

    @jax.jit
    def run(theta):
        state = opt.init(theta)

        def body(carry, _):
            th, st = carry
            l, g = jax.value_and_grad(loss_fn)(th)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            up, st = opt.update(g, st, th)
            return (optax.apply_updates(th, up), st), l

        (theta, _), losses = jax.lax.scan(body, (theta, state), None, length=steps)
        return theta, losses

    return run(theta0)


def fit_igpr(X_list, Y_list, kernel="exponential", steps=500, lr=0.05):
    """Independent exact GP per output (reference IGPR baseline).

    Returns a list of (theta, x, y) model tuples."""
    kernel_fn = _KERNELS[kernel]
    models = []
    for x, y in zip(X_list, Y_list):
        x = jnp.asarray(np.asarray(x).reshape(-1))
        y = jnp.asarray(np.asarray(y).reshape(-1))
        theta0 = jnp.zeros(3)
        theta, _ = _fit_adam(partial(_nlml, x=x, y=y, kernel_fn=kernel_fn), theta0, steps, lr)
        models.append((theta, x, y))
    return models


def predict_igpr(models, X_star_list, kernel="exponential"):
    """Predictive mean/std per output at new inputs."""
    kernel_fn = _KERNELS[kernel]
    means, stds = [], []
    for (theta, x, y), xs in zip(models, X_star_list):
        xs = jnp.asarray(np.asarray(xs).reshape(-1))
        s2, ls, noise = jnp.exp(theta)
        n = x.shape[0]
        K = kernel_fn(x, x, s2, ls) + (noise + 1e-6) * jnp.eye(n, dtype=x.dtype)
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), y)
        ks = kernel_fn(x, xs, s2, ls)
        mu = ks.T @ alpha
        v = jax.scipy.linalg.solve_triangular(L, ks, lower=True)
        var = s2 - jnp.sum(v * v, axis=0) + noise
        means.append(np.asarray(mu))
        stds.append(np.asarray(jnp.sqrt(jnp.maximum(var, 1e-10))))
    return means, stds


class ICMModel(NamedTuple):
    theta: jax.Array  # [log s2, log ls, log noise, W_vec (D*rank), log kappa (D)]
    x: jax.Array
    y: jax.Array
    idx: jax.Array
    D: int
    rank: int
    kernel: str


def _icm_cov(theta, x1, idx1, x2, idx2, D, rank, kernel_fn):
    s2, ls = jnp.exp(theta[0]), jnp.exp(theta[1])
    W = theta[3 : 3 + D * rank].reshape(D, rank)
    kappa = jnp.exp(theta[3 + D * rank : 3 + D * rank + D])
    B = W @ W.T + jnp.diag(kappa)
    Kx = kernel_fn(x1, x2, s2, ls)
    return Kx * B[idx1[:, None], idx2[None, :]]


def fit_icm(X_list, Y_list, rank=1, kernel="exponential", steps=500, lr=0.05):
    """Intrinsic coregionalization model, exact inference (reference ICM
    baseline, `GPCoregionalizedRegression`)."""
    kernel_fn = _KERNELS[kernel]
    D = len(X_list)
    x = jnp.asarray(np.concatenate([np.asarray(v).reshape(-1) for v in X_list]))
    y = jnp.asarray(np.concatenate([np.asarray(v).reshape(-1) for v in Y_list]))
    idx = jnp.asarray(
        np.concatenate(
            [np.full(len(np.asarray(v).reshape(-1)), d) for d, v in enumerate(X_list)]
        ).astype(np.int32)
    )
    n = x.shape[0]

    def loss(theta):
        noise = jnp.exp(theta[2])
        K = _icm_cov(theta, x, idx, x, idx, D, rank, kernel_fn) + (noise + 1e-6) * jnp.eye(
            n, dtype=x.dtype
        )
        L = jnp.linalg.cholesky(K)
        alpha = jax.scipy.linalg.cho_solve((L, True), y)
        return (
            0.5 * jnp.dot(y, alpha)
            + jnp.sum(jnp.log(jnp.diagonal(L)))
            + 0.5 * n * jnp.log(2 * jnp.pi)
        )

    theta0 = jnp.concatenate(
        [jnp.zeros(3), 0.5 * jnp.ones(D * rank), jnp.full((D,), -1.0)]
    )
    theta, _ = _fit_adam(loss, theta0, steps, lr)
    return ICMModel(theta, x, y, idx, D, rank, kernel)


def predict_icm(model: ICMModel, X_star_list: Sequence):
    """Predictive mean/std per output."""
    kernel_fn = _KERNELS[model.kernel]
    noise = jnp.exp(model.theta[2])
    n = model.x.shape[0]
    K = _icm_cov(
        model.theta, model.x, model.idx, model.x, model.idx, model.D, model.rank, kernel_fn
    ) + (noise + 1e-6) * jnp.eye(n, dtype=model.x.dtype)
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), model.y)
    means, stds = [], []
    for d, xs in enumerate(X_star_list):
        xs = jnp.asarray(np.asarray(xs).reshape(-1))
        idxs = jnp.full(xs.shape[0], d, jnp.int32)
        ks = _icm_cov(
            model.theta, model.x, model.idx, xs, idxs, model.D, model.rank, kernel_fn
        )
        mu = ks.T @ alpha
        v = jax.scipy.linalg.solve_triangular(L, ks, lower=True)
        prior = _icm_cov(model.theta, xs, idxs, xs, idxs, model.D, model.rank, kernel_fn)
        var = jnp.diagonal(prior) - jnp.sum(v * v, axis=0) + noise
        means.append(np.asarray(mu))
        stds.append(np.asarray(jnp.sqrt(jnp.maximum(var, 1e-10))))
    return means, stds
