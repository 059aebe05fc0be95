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

__all__ = [
    "fit_igpr",
    "predict_igpr",
    "fit_icm",
    "predict_icm",
    "fit_sgpr",
    "predict_sgpr",
    "fit_sicm",
    "predict_sicm",
]


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


# ---------------------------------------------------------------------------
# Sparse baselines (Titsias collapsed bound).  The reference's real-data
# baselines are GPy `SparseGPRegression` / `SparseGPCoregionalizedRegression`
# with 100 inducing points (code/notebook/baseline_{PM25,HCP,ECoG}.ipynb).
# ---------------------------------------------------------------------------


def _titsias_parts(Kuu, Kuf, kff_diag, y, noise, jitter=1e-4):
    """Shared Titsias-bound factorization.

    Returns (nbound, Luu, LB, c) with c = LB^{-1} A y / sigma, so both the
    collapsed negative bound and the predictive reuse one factorization.
    The 1e-4 jitter keeps the f32 Cholesky of Kuu finite when trainable
    inducing inputs drift together (1e-6 is below f32 rounding at M=100).
    """
    M = Kuu.shape[0]
    n = y.shape[0]
    sigma = jnp.sqrt(noise)
    Luu = jnp.linalg.cholesky(Kuu + jitter * jnp.eye(M, dtype=Kuu.dtype))
    A = jax.scipy.linalg.solve_triangular(Luu, Kuf, lower=True) / sigma  # (M, n)
    Bmat = jnp.eye(M, dtype=Kuu.dtype) + A @ A.T
    LB = jnp.linalg.cholesky(Bmat)
    Ay = A @ y
    c = jax.scipy.linalg.solve_triangular(LB, Ay, lower=True) / sigma
    nbound = (
        0.5 * n * jnp.log(2 * jnp.pi * noise)
        + jnp.sum(jnp.log(jnp.diagonal(LB)))
        + 0.5 * (jnp.dot(y, y) / noise - jnp.dot(c, c))
        + 0.5 / noise * (jnp.sum(kff_diag) - noise * jnp.sum(A * A))
    )
    return nbound, Luu, LB, c


def _titsias_predict(Luu, LB, c, Kus, kss_diag, noise):
    """SGPR predictive mean/var at test points given the shared factors."""
    w = jax.scipy.linalg.solve_triangular(Luu, Kus, lower=True)  # (M, n*)
    w2 = jax.scipy.linalg.solve_triangular(LB, w, lower=True)
    mu = w2.T @ c
    var = kss_diag - jnp.sum(w * w, axis=0) + jnp.sum(w2 * w2, axis=0) + noise
    return mu, jnp.maximum(var, 1e-10)


def _inducing_init(x, m):
    """Quantile-spread inducing inputs over the data range.

    A tiny arithmetic spread breaks exact ties (duplicate observed inputs
    would otherwise produce duplicate inducing points and a singular Kuu).
    """
    x = np.asarray(x, dtype=np.float64)
    qs = np.quantile(x, np.linspace(0.0, 1.0, m))
    span = max(float(x.max() - x.min()), 1.0)
    qs = qs + 1e-5 * span * np.arange(m)
    return jnp.asarray(qs)


class SGPRModel(NamedTuple):
    theta: jax.Array  # [log s2, log ls, log noise]
    Z: jax.Array  # (m,) inducing inputs
    x: jax.Array
    y: jax.Array
    kernel: str


def fit_sgpr(X_list, Y_list, num_inducing=100, kernel="exponential", steps=500, lr=0.05):
    """Independent sparse GP per output (reference `SparseGPRegression`
    baseline): Titsias collapsed bound, trainable inducing inputs.

    Returns a list of `SGPRModel`s."""
    kernel_fn = _KERNELS[kernel]
    models = []
    for x, y in zip(X_list, Y_list):
        x = jnp.asarray(np.asarray(x).reshape(-1))
        y = jnp.asarray(np.asarray(y).reshape(-1))
        m = min(num_inducing, x.shape[0])
        pars0 = jnp.concatenate([jnp.zeros(3), _inducing_init(x, m)])

        def loss(pars):
            s2, ls, noise = jnp.exp(pars[:3])
            Z = pars[3:]
            Kuu = kernel_fn(Z, Z, s2, ls)
            Kuf = kernel_fn(Z, x, s2, ls)
            kff = jnp.full(x.shape[0], s2, x.dtype)
            nbound, *_ = _titsias_parts(Kuu, Kuf, kff, y, noise + 1e-6)
            return nbound

        pars, _ = _fit_adam(loss, pars0, steps, lr)
        models.append(SGPRModel(pars[:3], pars[3:], x, y, kernel))
    return models


def predict_sgpr(models, X_star_list, kernel=None):
    """Predictive mean/std per output for `fit_sgpr` models.

    The kernel is taken from each fitted model; the `kernel` argument only
    overrides for legacy (theta, Z, x, y) tuples without one.
    """
    means, stds = [], []
    for model, xs in zip(models, X_star_list):
        theta, Z, x, y = model[:4]
        kname = model.kernel if isinstance(model, SGPRModel) else (kernel or "exponential")
        kernel_fn = _KERNELS[kname]
        xs = jnp.asarray(np.asarray(xs).reshape(-1))
        s2, ls, noise = jnp.exp(theta)
        noise = noise + 1e-6
        Kuu = kernel_fn(Z, Z, s2, ls)
        Kuf = kernel_fn(Z, x, s2, ls)
        kff = jnp.full(x.shape[0], s2, x.dtype)
        _, Luu, LB, c = _titsias_parts(Kuu, Kuf, kff, y, noise)
        Kus = kernel_fn(Z, xs, s2, ls)
        kss = jnp.full(xs.shape[0], s2, xs.dtype)
        mu, var = _titsias_predict(Luu, LB, c, Kus, kss, noise)
        means.append(np.asarray(mu))
        stds.append(np.asarray(jnp.sqrt(var)))
    return means, stds


class SICMModel(NamedTuple):
    theta: jax.Array  # [log s2, log ls, log noise, W_vec, log kappa]
    Z: jax.Array  # (M,) inducing inputs
    zidx: jax.Array  # (M,) inducing task indices
    x: jax.Array
    y: jax.Array
    idx: jax.Array
    D: int
    rank: int
    kernel: str


def _icm_diag(theta, idx, D, rank):
    """Diagonal of the ICM kernel at (x, idx) in O(N): Kx(x,x)=s2 and the
    coregionalization factor gathers as B[idx, idx]."""
    s2 = jnp.exp(theta[0])
    W = theta[3 : 3 + D * rank].reshape(D, rank)
    kappa = jnp.exp(theta[3 + D * rank : 3 + D * rank + D])
    b_diag = jnp.sum(W * W, axis=1) + kappa  # diag(W W^T + diag(kappa))
    return s2 * b_diag[idx]


def fit_sicm(
    X_list, Y_list, num_inducing=100, rank=1, kernel="exponential", steps=500, lr=0.05
):
    """Sparse coregionalized GP (reference `SparseGPCoregionalizedRegression`
    baseline): ICM kernel on the joint (x, task) space, inducing points
    spread over x with round-robin task assignment, Titsias collapsed bound
    with trainable inducing inputs."""
    kernel_fn = _KERNELS[kernel]
    D = len(X_list)
    x = jnp.asarray(np.concatenate([np.asarray(v).reshape(-1) for v in X_list]))
    y = jnp.asarray(np.concatenate([np.asarray(v).reshape(-1) for v in Y_list]))
    idx = jnp.asarray(
        np.concatenate(
            [np.full(len(np.asarray(v).reshape(-1)), d) for d, v in enumerate(X_list)]
        ).astype(np.int32)
    )
    m = min(num_inducing, x.shape[0])
    zidx = jnp.asarray(np.arange(m, dtype=np.int32) % D)
    n_hyp = 3 + D * rank + D
    pars0 = jnp.concatenate(
        [
            jnp.zeros(3),
            0.5 * jnp.ones(D * rank),
            jnp.full((D,), -1.0),
            _inducing_init(x, m),
        ]
    )

    def loss(pars):
        theta = pars[:n_hyp]
        Z = pars[n_hyp:]
        noise = jnp.exp(theta[2]) + 1e-6
        Kuu = _icm_cov(theta, Z, zidx, Z, zidx, D, rank, kernel_fn)
        Kuf = _icm_cov(theta, Z, zidx, x, idx, D, rank, kernel_fn)
        kff = _icm_diag(theta, idx, D, rank)  # O(N), never forms the N x N gram
        nbound, *_ = _titsias_parts(Kuu, Kuf, kff, y, noise)
        return nbound

    pars, _ = _fit_adam(loss, pars0, steps, lr)
    return SICMModel(pars[:n_hyp], pars[n_hyp:], zidx, x, y, idx, D, rank, kernel)


def predict_sicm(model: SICMModel, X_star_list: Sequence):
    """Predictive mean/std per output for `fit_sicm` models."""
    kernel_fn = _KERNELS[model.kernel]
    noise = jnp.exp(model.theta[2]) + 1e-6
    Kuu = _icm_cov(
        model.theta, model.Z, model.zidx, model.Z, model.zidx, model.D, model.rank, kernel_fn
    )
    Kuf = _icm_cov(
        model.theta, model.Z, model.zidx, model.x, model.idx, model.D, model.rank, kernel_fn
    )
    kff = _icm_diag(model.theta, model.idx, model.D, model.rank)
    _, Luu, LB, c = _titsias_parts(Kuu, Kuf, kff, model.y, noise)
    means, stds = [], []
    for d, xs in enumerate(X_star_list):
        xs = jnp.asarray(np.asarray(xs).reshape(-1))
        idxs = jnp.full(xs.shape[0], d, jnp.int32)
        Kus = _icm_cov(
            model.theta, model.Z, model.zidx, xs, idxs, model.D, model.rank, kernel_fn
        )
        kss = _icm_diag(model.theta, idxs, model.D, model.rank)
        mu, var = _titsias_predict(Luu, LB, c, Kus, kss, noise)
        means.append(np.asarray(mu))
        stds.append(np.asarray(jnp.sqrt(var)))
    return means, stds
