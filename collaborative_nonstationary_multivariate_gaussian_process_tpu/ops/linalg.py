"""Core linear-algebra primitives (pure, vmap-first, jit-safe).

TPU-native re-design of the reference's tensor helpers:
  - reparameterized Gaussian sampling  (reference code/utils.py:15-65)
  - lower-triangular masks / vec<->tril transforms
    (reference code/utils.py:68-72, SIM_code/Utility/utils.py:10-89)
  - sparse-GP conditioning statistics  (reference code/utils.py:106-265)
  - Gaussian KL with batched Cholesky  (reference code/utils.py:268-351)

Everything here is a pure function on jnp arrays with static shapes, designed
so a single `vmap` replaces the reference's Python loops and the MXU sees
large batched matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DSVI_JITTER

__all__ = [
    "add_jitter",
    "tril_mask",
    "psd_solve",
    "chol_with_jitter",
    "vec_to_tril",
    "tril_to_vec",
    "uvec_to_lvec",
    "lvec_to_uvec",
    "diag_indices_of_trilvec",
    "sample_full_cov",
    "tril_regularized",
    "regularized_diag",
    "sample_diag",
    "conditional_projection",
    "mgp_mean_var",
    "mgp_mean_var_tril",
    "mgp_mean_var_white",
    "kl_gaussian_white",
    "chol_tri_inv",
    "chol_tri_inv_robust",
    "tri_solve_white",
    "mgp_mean",
    "conditional_mean_cov",
    "joint_sample",
    "joint_sample_full",
    "conditional_sample",
    "kl_gaussian",
    "kl_gaussian_chol",
]


def add_jitter(K, jitter=DSVI_JITTER):
    """K + jitter*I on the last two dims."""
    n = K.shape[-1]
    return K + jitter * jnp.eye(n, dtype=K.dtype)


def tril_mask(X):
    """Zero out the strict upper triangle of the last two dims.

    Replaces `mat2ltri` (reference code/utils.py:68-72) without in-place ops.
    """
    n, m = X.shape[-2], X.shape[-1]
    return X * jnp.tril(jnp.ones((n, m), dtype=X.dtype))


def chol_with_jitter(K, jitter=DSVI_JITTER):
    return jnp.linalg.cholesky(add_jitter(K, jitter))


def psd_solve(K, B, jitter=DSVI_JITTER):
    """Solve (K + jitter I) X = B via Cholesky (PSD-safe).

    Mirrors the reference's `torch.solve(A=K22 + jitter*I, ...)` idiom
    (code/utils.py:118-119) but always through a Cholesky factorization,
    which XLA maps onto fast triangular solves.
    """
    L = chol_with_jitter(K, jitter)
    return jax.scipy.linalg.cho_solve((L, True), B)


# ---------------------------------------------------------------------------
# vec <-> lower-triangular transforms
# ---------------------------------------------------------------------------


def _tril_idx(n):
    return jnp.tril_indices(n)


def vec_to_tril(v, n):
    """Length n(n+1)/2 vector -> (n, n) lower-triangular matrix.

    Replaces `vec2lowtriangle` (reference SIM_code/Utility/utils.py:56-74).
    Row-major lower-triangle order: (0,0), (1,0), (1,1), (2,0), ...
    """
    rows, cols = _tril_idx(n)
    out = jnp.zeros(v.shape[:-1] + (n, n), dtype=v.dtype)
    return out.at[..., rows, cols].set(v)


def tril_to_vec(L, n=None):
    """Inverse of :func:`vec_to_tril` (reference utils.py:77-89)."""
    if n is None:
        n = L.shape[-1]
    rows, cols = _tril_idx(n)
    return L[..., rows, cols]


def diag_indices_of_trilvec(n):
    """Positions of the diagonal entries inside the length-n(n+1)/2 tril vec.

    Matches `np.cumsum(np.arange(1, M+1)) - 1` (reference utils.py:12).
    """
    import numpy as np

    return np.cumsum(np.arange(1, n + 1)) - 1


def uvec_to_lvec(uvec, n):
    """Unconstrained tril-vec -> constrained (exp on diagonal entries).

    Replaces `uLvec2Lvec` (reference SIM_code/Utility/utils.py:10-22).
    Supports arbitrary leading batch dims (replaces `uLvecs2Lvecs`,
    utils.py:38-46, with a single vectorized op).
    """
    didx = diag_indices_of_trilvec(n)
    mask = jnp.zeros(uvec.shape[-1], dtype=bool).at[didx].set(True)
    return jnp.where(mask, jnp.exp(uvec), uvec)


def lvec_to_uvec(lvec, n):
    """Inverse transform (log on diagonal), `Lvec2uLvec` (utils.py:24-36)."""
    didx = diag_indices_of_trilvec(n)
    mask = jnp.zeros(lvec.shape[-1], dtype=bool).at[didx].set(True)
    # guard the log for off-diagonal (unused) lanes
    safe = jnp.where(mask, jnp.maximum(lvec, 1e-300), 1.0)
    return jnp.where(mask, jnp.log(safe), lvec)


# ---------------------------------------------------------------------------
# Reparameterized sampling
# ---------------------------------------------------------------------------


def sample_diag(key, mean, var, jitter=DSVI_JITTER):
    """mean + sqrt(var + jitter) * z, elementwise.

    Mirrors `reparameterize(..., full_cov=False)` (reference utils.py:31-32),
    including the +jitter inside the square root.
    """
    z = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return mean + z * jnp.sqrt(var + jitter)


def sample_full_cov(key, mean, scale_tril, jitter=DSVI_JITTER):
    """Draw from N(mean, L Lᵀ + jitter I) without re-factorizing.

    The reference builds Sigma = L Lᵀ then Cholesky(Sigma + jitter I)
    (utils.py:40-64).  Sampling mean + L z1 + sqrt(jitter) z2 with independent
    z1, z2 has exactly that covariance and skips the O(M^3) factorization —
    one of the places the TPU design deliberately diverges in mechanism while
    matching the distribution.
    """
    k1, k2 = jax.random.split(key)
    z1 = jax.random.normal(k1, mean.shape, dtype=mean.dtype)
    out = mean + jnp.einsum("...ij,...j->...i", scale_tril, z1)
    if isinstance(jitter, float) and jitter == 0.0:
        # regularized-factor path (tril_regularized already carries the
        # jitter): skip the dead z2 draw — the key schedule is unchanged
        # (k2 is still split off) so jitter=0 draws stay reproducible
        return out
    z2 = jax.random.normal(k2, mean.shape, dtype=mean.dtype)
    return out + jnp.sqrt(jnp.asarray(jitter, mean.dtype)) * z2


# ---------------------------------------------------------------------------
# Sparse-GP conditioning
# ---------------------------------------------------------------------------


def conditional_projection(K12, K22, jitter=DSVI_JITTER):
    """P = K12 (K22 + jitter I)^{-1}, shape (N, M).

    The core projection of every MGP*/JGP* helper in the reference
    (code/utils.py:117-119 etc.).
    """
    return psd_solve(K22, K12.T, jitter).T


def mgp_mean_var(P, K12, d11, mu, Sigma):
    """Marginalized sparse-GP mean/variance given a precomputed projection.

    Y | v ~ N(P v, diag(d11 - sum(P*K12))) with v ~ N(mu, Sigma) marginalized:
      mean = P mu            (batched over leading dims of mu)
      var  = d11 - sum(P*K12, -1) + diag(P Sigma Pᵀ)

    Replaces `MGP_d` / `MGP_mu_sigma2` (reference code/utils.py:106-146); the
    reference loops this D(D+1)/2 times in Python — here `mu` and `Sigma` may
    carry arbitrary leading batch dims so one call covers all entries and the
    contraction runs on the MXU.

    P: (N, M); K12: (N, M); d11: (N,); mu: (..., M); Sigma: (..., M, M).
    Returns mean (..., N), var (..., N).
    """
    mean = jnp.einsum("nm,...m->...n", P, mu)
    # The Nystrom residual d11 - sum(P*K12) is >= 0 in exact arithmetic but
    # can cancel slightly negative in float32 at large M — clamp so the
    # downstream sqrt stays finite (the reference's +1e-4 jitter inside
    # reparameterize only absorbs errors up to 1e-4).
    base = jnp.maximum(d11 - jnp.sum(P * K12, axis=-1), 0.0)
    corr = jnp.einsum("nm,...mk,nk->...n", P, Sigma, P)
    return mean, base + corr


def mgp_mean_var_tril(P, K12, d11, mu, scale_tril):
    """`mgp_mean_var` taking the variational *factor* L (Sigma = L Lᵀ).

    diag(P Sigma Pᵀ) = rowwise ||P L||² — same flops as the Sigma form but
    skips materializing Sigma (one (…, M, M) gram per group per step) and is
    nonnegative by construction, so no clamp is needed on the q-covariance
    term.  This is the form the CNMGP ELBO uses: the variational parameters
    ARE factors (nmgp_dsvi.py:174-177).

    P: (N, M); K12: (N, M); d11: (N,); mu: (..., M);
    scale_tril: (..., M, M) lower-triangular.  Returns mean/var (..., N).
    """
    mean = jnp.einsum("nm,...m->...n", P, mu)
    base = jnp.maximum(d11 - jnp.sum(P * K12, axis=-1), 0.0)
    A = jnp.einsum("nm,...mk->...nk", P, scale_tril)
    return mean, base + jnp.sum(A * A, axis=-1)


@jax.custom_vjp
def chol_tri_inv(K):
    """Fused (L, L^{-1}) of SPD K (..., M, M): one batched Cholesky + one
    batched triangular inverse.

    The custom VJP evaluates both pullbacks purely with matmuls against the
    primal L^{-1} — the Cholesky pullback (Murray 2016) needs L^{-T}·sym·L^{-1}
    and the inverse pullback needs -L^{-T} ḡ L^{-T}, which XLA's generic
    rules would otherwise lower to sequential triangular solves.  On TPU the
    solves are latency-bound (~35 us at M=100) while the matmuls are free on
    the MXU, so the whole backward pass of the conditioning block collapses
    to matmuls.
    """
    L = jnp.linalg.cholesky(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    Linv = jax.scipy.linalg.solve_triangular(
        L, jnp.broadcast_to(eye, L.shape), lower=True
    )
    return L, Linv


def _chol_tri_inv_fwd(K):
    out = chol_tri_inv(K)
    return out, out


def _chol_tri_inv_bwd(res, cot):
    L, Linv = res
    Lbar, Linvbar = cot
    m = L.shape[-1]
    LinvT = jnp.swapaxes(Linv, -1, -2)
    # d(L^{-1}) = -L^{-1} dL L^{-1}  =>  contribution to L̄:
    Lbar_total = Lbar - LinvT @ Linvbar @ LinvT
    # Cholesky pullback: K̄ = L^{-T} (0.5 (Φ + Φᵀ)) L^{-1},
    # Φ = tril(Lᵀ L̄) with halved diagonal
    P = jnp.swapaxes(L, -1, -2) @ Lbar_total
    tri = jnp.tril(jnp.ones((m, m), L.dtype)) - 0.5 * jnp.eye(m, dtype=L.dtype)
    phi = P * tri
    sym = 0.5 * (phi + jnp.swapaxes(phi, -1, -2))
    Kbar = LinvT @ sym @ Linv
    return (Kbar,)


chol_tri_inv.defvjp(_chol_tri_inv_fwd, _chol_tri_inv_bwd)


def chol_tri_inv_robust(Ks, jitter, boost=100.0):
    """`chol_tri_inv` with a one-shot deterministic jitter-boost retry for
    batch members whose factorization went non-finite.

    An f32 Cholesky of a near-singular prior gram can produce NaN for
    extreme sampled lengthscales (observed: 1 of 200 ECoG M=200 predictive
    draws, where ell(Z) drawn ~ exp(5) makes the Gibbs gram effectively
    rank-deficient).  Failed members are refactorized with `boost * jitter`
    added to the diagonal — the same idea as the reference's jittered
    NaN-retry (distributions.py:55-96) but deterministic.  Well-conditioned
    members are bit-identical to the plain path.  Costs a second batched
    factorization, so this guards the PREDICTIVE paths only; the training
    step keeps the single-factorization fast path (its NaN protection is
    the nonfinite-grad -> 0 mask).

    `Ks` must already include the base jitter on its diagonal.
    """
    L, Linv = chol_tri_inv(Ks)
    bad = ~jnp.isfinite(jnp.sum(L, axis=(-2, -1), keepdims=True))
    eye = jnp.eye(Ks.shape[-1], dtype=Ks.dtype)
    K2 = Ks + jnp.where(bad, boost * jitter, 0.0) * eye
    L2, Linv2 = chol_tri_inv(K2)
    return jnp.where(bad, L2, L), jnp.where(bad, Linv2, Linv)


@jax.custom_vjp
def tri_solve_white(L, Linv, B):
    """A = L^{-1} B via backward-stable forward substitution, with a
    matmul-only VJP evaluated against the precomputed L^{-1}.

    The forward keeps the substitution (an explicit-inverse multiply loses
    accuracy exactly in the ill-conditioned directions that blew up the f32
    conditional moments — see tests/test_elbo.py::
    test_f32_latents_stable_at_illconditioned_init); the exact pullbacks
      B̄ = L^{-T} Ā,   L̄ = -B̄ Aᵀ
    only *evaluate* L^{-T}· as a matmul.  Linv is an auxiliary operand
    (the function value does not depend on it) — zero cotangent.
    L, Linv: (..., M, M); B: (..., M, N).
    """
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


def _tsw_fwd(L, Linv, B):
    A = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return A, (Linv, A)


def _tsw_bwd(res, Abar):
    Linv, A = res
    Bbar = jnp.swapaxes(Linv, -1, -2) @ Abar
    Lbar = -Bbar @ jnp.swapaxes(A, -1, -2)
    # L is triangular: project the cotangent onto the lower triangle
    Lbar = jnp.tril(Lbar)
    return (Lbar, jnp.zeros_like(Linv), Bbar)


tri_solve_white.defvjp(_tsw_fwd, _tsw_bwd)


def mgp_mean_var_white(A, Lp_inv, d11, mu, scale_tril):
    """Whitened marginalized sparse-GP stats — the TPU hot-path form.

    Takes the half-projection A = Lp^{-1} K12ᵀ (one forward substitution,
    half the work of the full cho_solve) and the explicit triangular inverse
    Lp_inv = Lp^{-1}; every remaining contraction is an MXU matmul:

      mean = Aᵀ (Lp_inv mu)                     (= P mu)
      var  = max(d11 - colsum(A²), 0) + rowsum((Aᵀ W)²)   (= Nystrom + PΣPᵀ)
      W    = Lp_inv @ scale_tril                (whitened variational factor)

    W is returned because KL(q‖p) needs exactly ‖W‖_F² for its trace term
    (see `kl_gaussian_white`) — computing it here dedups the two call sites.
    The explicit inverse appears only inside sums of squares and small
    vector projections (no catastrophic cancellation); the ill-conditioned
    direction — the Nystrom residual — still comes from the backward-stable
    substitution A.

    A: (M, N); Lp_inv: (M, M); d11: (N,); mu: (..., M);
    scale_tril: (..., M, M).  Returns mean (..., N), var (..., N), W.
    """
    half_mu = jnp.einsum("ab,...b->...a", Lp_inv, mu)
    mean = jnp.einsum("mn,...m->...n", A, half_mu)
    base = jnp.maximum(d11 - jnp.sum(A * A, axis=0), 0.0)
    W = _batched_mm("ab,...bc->...ac", Lp_inv, scale_tril)
    return mean, base + _quadform_diag(A, W), W


def _batched_mm(eq, a, b):
    """einsum for the large G-batched contractions, honoring the bf16
    policy (config.BF16_BATCH_MATMULS): bf16 operands, f32 accumulation —
    single-pass MXU instead of f32's bf16x3 passes, half the HBM bytes.
    Policy read at trace time; f64 inputs (oracle tests) are never cast."""
    from ..config import BF16_BATCH_MATMULS

    if BF16_BATCH_MATMULS and a.dtype == jnp.float32 and b.dtype == jnp.float32:
        return jnp.einsum(
            eq,
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(eq, a, b)


# Dispatch threshold (elements of the (G, N, M) intermediate) for routing
# the variance quadratic form to the fused Pallas kernel on TPU.  DISABLED
# by default after measurement on the real chip (2026-08-20, v5e, ECoG
# scale G=3081/M=100/N=512): XLA output-fuses the square-reduce into the
# dot epilogue, so the op is FLOP-bound, not HBM-bound — XLA 0.86 ms fwd /
# 3.56 ms fwd+bwd vs the kernel's 1.95 / 8.26 ms (the gap is the (G, M, M)
# -> (G*M, M) operand relayouts Mosaic cannot perform in-kernel; see
# docs/DESIGN.md §9).  The kernel stays validated (tests/test_pallas.py)
# for shapes where a producer can supply pre-flattened operands.
QUADFORM_PALLAS_MIN_ELEMENTS = None  # None = never dispatch


def _quadform_diag(A, W):
    """sum_k (einsum("mn,...mk->...nk", A, W))^2 over k -> (..., N), with
    auto-dispatch to the fused Pallas kernel for large f32 TPU workloads."""
    from ..config import is_tpu

    batch_shape = W.shape[:-2]
    n_batch = 1
    for s in batch_shape:
        n_batch *= s
    use_pallas = (
        QUADFORM_PALLAS_MIN_ELEMENTS is not None
        and is_tpu()
        and A.dtype == jnp.float32
        and W.dtype == jnp.float32
        and A.ndim == 2
        and len(batch_shape) >= 1
        and n_batch * A.shape[1] * W.shape[-1] >= QUADFORM_PALLAS_MIN_ELEMENTS
    )
    if use_pallas:
        from .pallas_kernels import quadform_diag_pallas

        m = W.shape[-1]
        V = quadform_diag_pallas(A, W.reshape((n_batch, m, m)))
        return V.reshape(batch_shape + (A.shape[1],))
    C = _batched_mm("mn,...mk->...nk", A, W)
    return jnp.sum(C * C, axis=-1)


def kl_gaussian_ref_compat(mu_q, scale_tril_q, Lp_diag, logdet_p, Lp_inv, jitter=DSVI_JITTER):
    """The reference's KL_Gaussian as it ACTUALLY computes, quirk included.

    The reference's trace term calls `torch.triangular_solve(input=Lq,
    A=Lp)` without `upper=False` (/root/reference/code/utils.py:345); old
    torch defaults to upper=True, which reads only the upper triangle of
    the lower-triangular prior Cholesky — i.e. its DIAGONAL.  So the
    reference optimizes

        KL_ref = (logdet_p - logdet_q)
                 + 0.5 * ( sum_ij (Lq2_ij / diag(Lp)_i)^2      <- quirk
                           + ||Lp^{-1} mu_q||^2 - M )

    with Lq2 = chol(Lq Lqᵀ + jI), instead of the true trace
    ||Lp^{-1} Lq2||_F^2.  This function exists to reproduce the reference's
    published optimization trajectory exactly (the NMGP_SIM protocol
    freezes prior length-scale logs at {0, 2, 2}, where the prior grams are
    far from diagonal and the two objectives differ substantially —
    scripts/elbo_parity.py quantifies it).  The default KL (`kl_gaussian_
    white`) is the mathematically correct one.
    """
    m = mu_q.shape[-1]
    Sigma_q = jnp.einsum("...ij,...kj->...ik", scale_tril_q, scale_tril_q)
    Lq2 = chol_with_jitter(Sigma_q, jitter)
    logdet_q = jnp.sum(jnp.log(jnp.diagonal(Lq2, axis1=-2, axis2=-1)), axis=-1)
    X = Lq2 / Lp_diag[..., :, None]
    term2 = jnp.sum(X * X, axis=(-2, -1))
    sol = jnp.einsum("ab,...b->...a", Lp_inv, mu_q)
    maha = jnp.sum(sol * sol, axis=-1)
    return (logdet_p - logdet_q) + 0.5 * (term2 + maha - m)


def tril_regularized(X, jitter=DSVI_JITTER):
    """Lower-triangular factor with a jitter-regularized diagonal:
    L̃ = tril(X) with diag d -> sign(d)·sqrt(d² + jitter).

    This is the variational-factor parameterization of the DSVI path: the
    q covariance is EXACTLY L̃ L̃ᵀ, so

      logdet(Σq) = Σ log(d² + jitter)        (exact, no Cholesky)

    and |diag(L̃)| ≥ sqrt(jitter) bounds the condition of every factor the
    way the reference's Σ + jitter·I did (utils.py:40-64).  The previous
    fast-KL approximated logdet(L Lᵀ + jI) by Σ log(d²+j) — wrong by tens
    of nats whenever |d| is small against the row norms (the jitter lifts
    ALL eigenvalues, not just the diagonal's contribution), which
    systematically over-penalized small factor diagonals and inflated the
    fitted q covariance (the +10-17% predictive-CI widths of round 3).
    Reparameterizing the family instead makes the fast formula exact while
    keeping the batched-Cholesky-free hot path.
    """
    d = jnp.diagonal(X, axis1=-2, axis2=-1)
    sign = jnp.where(d >= 0, 1.0, -1.0).astype(X.dtype)
    d_reg = sign * jnp.sqrt(d * d + jitter)
    L = tril_mask(X)
    eye = jnp.eye(X.shape[-1], dtype=bool)
    return jnp.where(eye, d_reg[..., :, None] * eye, L)


def regularized_diag(X, jitter=DSVI_JITTER):
    """|diag| of `tril_regularized(X, jitter)` without materializing the
    (…, M, M) factor: sqrt(diag(X)² + jitter).  O(M) per matrix — the KL
    logdet needs only this."""
    d = jnp.diagonal(X, axis1=-2, axis2=-1)
    return jnp.sqrt(d * d + jitter)


def kl_gaussian_white(mu_q, dq_reg, W, logdet_p, Lp_inv):
    """KL( N(mu_q, L̃ L̃ᵀ) ‖ N(0, K_p + jI) ) from whitened pieces — EXACT.

    `dq_reg` is the regularized factor diagonal (`regularized_diag`; the
    diag of `tril_regularized`, bounded away from zero, so the diag-product
    logdet is the exact logdet — no (…, M, M) re-materialization);
    W = Lp^{-1} L̃ comes free from `mgp_mean_var_white`; `logdet_p` = sum
    log diag Lp is a per-prior scalar computed once.

      KL = (logdet_p - logdet_q) + 0.5 (‖W‖_F² + ‖Lp^{-1} mu_q‖² - M)
    """
    m = mu_q.shape[-1]
    logdet_q = jnp.sum(jnp.log(jnp.abs(dq_reg)), axis=-1)
    trace = jnp.sum(W * W, axis=(-2, -1))
    sol = jnp.einsum("ab,...b->...a", Lp_inv, mu_q)
    maha = jnp.sum(sol * sol, axis=-1)
    return (logdet_p - logdet_q) + 0.5 * (trace + maha - m)


def mgp_mean(P, mu):
    """Posterior mean only (reference `MGP_mu`, code/utils.py:149-157)."""
    return jnp.einsum("nm,...m->...n", P, mu)


# ---------------------------------------------------------------------------
# Full-covariance conditioning (reference MGP / JGP / CGP)
# ---------------------------------------------------------------------------


def conditional_mean_cov(K12, K22, mu, Sigma, K11, jitter=DSVI_JITTER):
    """Full marginalized sparse-GP conditional, N(mean, cov) over N points.

    With P = K12 (K22+jI)^{-1}:
      mean = P mu
      cov  = K11 - P K12ᵀ + P Sigma Pᵀ

    Replaces the reference's full-covariance `MGP` (code/utils.py:160-186).
    `mu` (..., M) and `Sigma` (..., M, M) may carry leading batch dims.
    Returns mean (..., N), cov (..., N, N).
    """
    P = conditional_projection(K12, K22, jitter)
    mean = jnp.einsum("nm,...m->...n", P, mu)
    cov = K11 - P @ K12.T + jnp.einsum("nm,...mk,lk->...nl", P, Sigma, P)
    return mean, cov


def joint_sample(key, K12, K22, mu, scale_tril, K11_diag, jitter=DSVI_JITTER):
    """Joint draw (f(X), v): v ~ N(mu, L Lᵀ + jI), then f | v from the
    diagonal sparse-GP conditional.

    Replaces the reference's `JGP_S` (code/utils.py:216-237): sample the
    inducing values with the full-covariance reparameterization, then the
    factorized conditional with variance diag(K11) - sum(P∘K12).
    Returns (f (N,), v (M,)).
    """
    k_v, k_f = jax.random.split(key)
    v = sample_full_cov(k_v, mu, scale_tril, jitter)
    P = conditional_projection(K12, K22, jitter)
    mean = P @ v
    var = jnp.maximum(K11_diag - jnp.sum(P * K12, axis=-1), 0.0)
    f = sample_diag(k_f, mean, var, jitter)
    return f, v


def joint_sample_full(key, K12, K22, K11, mu, scale_tril, jitter=DSVI_JITTER):
    """Full-covariance joint draw (f(X), v) — the reference's `JGP`
    (code/utils.py:189-213): v ~ N(mu, L Lᵀ + jI), f | v from the FULL
    conditional N(P v, K11 - P K12ᵀ + ...) — jointly,

        [f; v] ~ N([P mu; mu], [[P Σ Pᵀ + B, P Σ], [Σ Pᵀ, Σ]]),
        B = K11 - P K12ᵀ,  P = K12 (K22 + jI)^{-1}.

    Unreachable from the reference's drivers (kept for API completeness);
    sampled here WITHOUT assembling the (N+M)² joint covariance: draw
    v = mu + L z2 (+ sqrt(j) z2'), then f = P v + chol(B + jI) z1 —
    identical joint law, one (N, N) factorization instead of (N+M, N+M).
    Returns (f (N,), v (M,)).
    """
    k_v, k_f = jax.random.split(key)
    v = sample_full_cov(k_v, mu, scale_tril, jitter)
    P = conditional_projection(K12, K22, jitter)
    B = K11 - P @ K12.T
    Lb = chol_with_jitter(0.5 * (B + B.T), jitter)
    z = jax.random.normal(k_f, (K11.shape[0],), mu.dtype)
    f = P @ v + Lb @ z
    return f, v


def conditional_sample(key, K12, K22, v, K11_diag, jitter=DSVI_JITTER):
    """Draw f | v from the factorized GP conditional given *fixed* inducing
    values v (reference `CGP`, code/utils.py:240-265)."""
    P = conditional_projection(K12, K22, jitter)
    mean = P @ v
    var = jnp.maximum(K11_diag - jnp.sum(P * K12, axis=-1), 0.0)
    return sample_diag(key, mean, var, jitter)


# ---------------------------------------------------------------------------
# Gaussian KL divergence
# ---------------------------------------------------------------------------


def kl_gaussian(mu_q, scale_tril_q, mu_p, K_p, jitter=DSVI_JITTER):
    """KL( N(mu_q, Lq Lqᵀ + jitter I) || N(mu_p, K_p + jitter I) ), batched.

    Matches `KL_Gaussian` (reference code/utils.py:332-351) including its
    jitter-on-both-sides behavior.  `mu_q`/`scale_tril_q` may have leading
    batch dims; `mu_p`/`K_p` are shared (broadcast) like the reference's
    prior arguments.

    mu_q: (..., M); scale_tril_q: (..., M, M) (lower-triangular, from the
    variational sqrt parameter); mu_p: (M,); K_p: (M, M).
    Returns KL with shape (...,).
    """
    Lp = chol_with_jitter(K_p, jitter)
    return kl_gaussian_chol(mu_q, scale_tril_q, mu_p, Lp, jitter)


def kl_gaussian_chol(mu_q, scale_tril_q, mu_p, Lp, jitter=DSVI_JITTER, exact_logdet=True):
    """`kl_gaussian` with a precomputed prior Cholesky Lp = chol(K_p + jI)
    — lets call sites batch the prior factorizations.

    The trace term tr(Kp^{-1}(Lq Lqᵀ + jI)) = ||Lp^{-1} Lq||_F^2
    + j ||Lp^{-1}||_F^2 is computed from the variational factor directly
    (exact — no re-factorization of Sigma_q needed).

    `exact_logdet=True` computes logdet(Lq Lqᵀ + jI) via a batched Cholesky,
    matching the reference's jittered KL value bit-for-bit (code/
    utils.py:332-351).  `exact_logdet=False` replaces it with
    sum(log(diag(Lq)^2 + j)) — exact only at j=0; at j>0 it can understate
    the jittered logdet by tens of nats for random factors (the jitter
    lifts ALL eigenvalues, not just the diagonal's contribution — the
    round-3 defect root-caused in round 4, PARITY.md).  The DSVI hot path
    therefore no longer uses this approximation: it evaluates the EXACT KL
    of the regularized factor family instead (`tril_regularized` +
    `kl_gaussian_white`).  The False branch remains only as a measured
    lower-cost approximation for jittered-family call sites that can
    tolerate it (deviation characterized in tests/test_linalg.py).
    """
    m = mu_q.shape[-1]
    if exact_logdet:
        Sigma_q = jnp.einsum("...ij,...kj->...ik", scale_tril_q, scale_tril_q)
        Lq = chol_with_jitter(Sigma_q, jitter)
        logdet_q = jnp.sum(jnp.log(jnp.diagonal(Lq, axis1=-2, axis2=-1)), axis=-1)
    else:
        dq = jnp.diagonal(scale_tril_q, axis1=-2, axis2=-1)
        logdet_q = 0.5 * jnp.sum(jnp.log(dq * dq + jitter), axis=-1)
    logdet_p = jnp.sum(jnp.log(jnp.diagonal(Lp, axis1=-2, axis2=-1)), axis=-1)

    # trace(Kp^{-1} (Sigma_q + jI)) — batched tri-solve against the factor
    def tri_solve(lq):
        return jax.scipy.linalg.solve_triangular(Lp, lq, lower=True)

    A = tri_solve(
        scale_tril_q.reshape((-1, m, m)).transpose(1, 0, 2).reshape(m, -1)
    )
    A = A.reshape(m, -1, m).transpose(1, 0, 2).reshape(scale_tril_q.shape)
    Lp_inv = tri_solve(jnp.eye(m, dtype=Lp.dtype))
    trace_term = jnp.sum(A**2, axis=(-2, -1)) + jitter * jnp.sum(Lp_inv**2)

    # Mahalanobis (mu_p - mu_q)ᵀ Kp^{-1} (mu_p - mu_q)
    diff = mu_p - mu_q
    sol = jax.scipy.linalg.solve_triangular(
        Lp, diff.reshape(-1, m).T, lower=True
    ).T.reshape(diff.shape)
    maha = jnp.sum(sol**2, axis=-1)

    return (logdet_p - logdet_q) + 0.5 * (trace_term + maha - m)
