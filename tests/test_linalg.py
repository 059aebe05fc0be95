"""Linear-algebra primitives vs dense NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
    conditional_projection,
    diag_indices_of_trilvec,
    kl_gaussian,
    lvec_to_uvec,
    mgp_mean_var,
    psd_solve,
    sample_full_cov,
    tril_mask,
    tril_to_vec,
    uvec_to_lvec,
    vec_to_tril,
)

RNG = np.random.default_rng(1)
JITTER = 1e-4


def rand_spd(n, scale=1.0):
    A = RNG.normal(size=(n, n))
    return scale * (A @ A.T + n * np.eye(n))


def test_vec_tril_roundtrip():
    n = 5
    v = RNG.normal(size=n * (n + 1) // 2)
    L = vec_to_tril(jnp.asarray(v), n)
    assert np.allclose(np.triu(np.asarray(L), 1), 0)
    np.testing.assert_allclose(tril_to_vec(L, n), v)


def test_uvec_lvec_roundtrip():
    n = 4
    u = RNG.normal(size=n * (n + 1) // 2)
    l = uvec_to_lvec(jnp.asarray(u), n)
    back = lvec_to_uvec(l, n)
    np.testing.assert_allclose(back, u, rtol=1e-12)
    didx = diag_indices_of_trilvec(n)
    np.testing.assert_allclose(np.asarray(l)[didx], np.exp(u[didx]))


def test_psd_solve():
    K = rand_spd(6)
    B = RNG.normal(size=(6, 3))
    X = np.asarray(psd_solve(jnp.asarray(K), jnp.asarray(B), JITTER))
    np.testing.assert_allclose((K + JITTER * np.eye(6)) @ X, B, rtol=1e-8, atol=1e-8)


def test_conditional_projection():
    K22 = rand_spd(4)
    K12 = RNG.normal(size=(7, 4))
    P = np.asarray(conditional_projection(jnp.asarray(K12), jnp.asarray(K22), JITTER))
    expected = K12 @ np.linalg.inv(K22 + JITTER * np.eye(4))
    np.testing.assert_allclose(P, expected, rtol=1e-8, atol=1e-10)


def test_mgp_mean_var_vs_naive():
    """Marginalized sparse-GP stats vs a direct computation, batched."""
    N, M, T = 6, 4, 3
    K22 = rand_spd(M)
    K12 = RNG.normal(size=(N, M))
    d11 = np.abs(RNG.normal(size=N)) + 1.0
    mu = RNG.normal(size=(T, M))
    A = RNG.normal(size=(T, M, M))
    Sigma = np.einsum("tij,tkj->tik", A, A)
    P = K12 @ np.linalg.inv(K22 + JITTER * np.eye(M))
    mean, var = mgp_mean_var(
        jnp.asarray(P), jnp.asarray(K12), jnp.asarray(d11), jnp.asarray(mu), jnp.asarray(Sigma)
    )
    exp_mean = mu @ P.T
    exp_var = np.stack(
        [d11 - np.sum(P * K12, -1) + np.diag(P @ Sigma[t] @ P.T) for t in range(T)]
    )
    np.testing.assert_allclose(mean, exp_mean, rtol=1e-8)
    np.testing.assert_allclose(var, exp_var, rtol=1e-7)


def kl_dense_oracle(mu_q, Sq, mu_p, Sp):
    """Standard closed-form KL(N_q || N_p) in plain numpy."""
    n = len(mu_q)
    iSp = np.linalg.inv(Sp)
    d = mu_p - mu_q
    return 0.5 * (
        np.log(np.linalg.det(Sp) / np.linalg.det(Sq))
        + np.trace(iSp @ Sq)
        + d @ iSp @ d
        - n
    )


def test_kl_gaussian_vs_oracle():
    M = 5
    Lq = np.tril(RNG.normal(size=(M, M)))
    mu_q = RNG.normal(size=M)
    Kp = rand_spd(M)
    mu_p = np.zeros(M)
    got = float(
        kl_gaussian(jnp.asarray(mu_q), jnp.asarray(Lq), jnp.asarray(mu_p), jnp.asarray(Kp), JITTER)
    )
    Sq = Lq @ Lq.T + JITTER * np.eye(M)
    Sp = Kp + JITTER * np.eye(M)
    np.testing.assert_allclose(got, kl_dense_oracle(mu_q, Sq, mu_p, Sp), rtol=1e-8)


def test_kl_gaussian_batched():
    M, B = 4, 3
    Lqs = np.stack([np.tril(RNG.normal(size=(M, M))) for _ in range(B)])
    mus = RNG.normal(size=(B, M))
    Kp = rand_spd(M)
    got = np.asarray(
        kl_gaussian(jnp.asarray(mus), jnp.asarray(Lqs), jnp.zeros(M), jnp.asarray(Kp), JITTER)
    )
    Sp = Kp + JITTER * np.eye(M)
    for b in range(B):
        Sq = Lqs[b] @ Lqs[b].T + JITTER * np.eye(M)
        np.testing.assert_allclose(got[b], kl_dense_oracle(mus[b], Sq, np.zeros(M), Sp), rtol=1e-8)


def test_kl_zero_when_equal():
    M = 4
    Kp = rand_spd(M)
    Lq = np.linalg.cholesky(Kp)
    got = float(kl_gaussian(jnp.zeros(M), jnp.asarray(Lq), jnp.zeros(M), jnp.asarray(Kp), JITTER))
    assert abs(got) < 1e-8


def test_sample_full_cov_moments():
    """Statistical check: sample covariance ~ L Lᵀ + jitter I."""
    M = 3
    Lq = np.tril(RNG.normal(size=(M, M))) + 2 * np.eye(M)
    mu = RNG.normal(size=M)
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    draws = jax.jit(
        jax.vmap(lambda k: sample_full_cov(k, jnp.asarray(mu), jnp.asarray(Lq), JITTER))
    )(keys)
    draws = np.asarray(draws)
    np.testing.assert_allclose(draws.mean(0), mu, atol=0.05)
    emp_cov = np.cov(draws.T)
    np.testing.assert_allclose(emp_cov, Lq @ Lq.T + JITTER * np.eye(M), atol=0.15)


def test_tril_mask():
    X = RNG.normal(size=(2, 4, 4))
    out = np.asarray(tril_mask(jnp.asarray(X)))
    assert np.allclose(np.triu(out[0], 1), 0)
    np.testing.assert_allclose(np.tril(out[1]), np.tril(X[1]))


def test_kl_fast_logdet_close_to_exact():
    """exact_logdet=False (the DSVI hot path) deviates from the jittered
    reference KL only in the q-logdet: bounded O(jitter) nats at typical
    factor scales, and identical at jitter -> 0."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        kl_gaussian_chol,
        chol_with_jitter,
    )

    M, B = 6, 4
    Kp = rand_spd(M)
    Lp = chol_with_jitter(jnp.asarray(Kp), JITTER)
    mus = jnp.asarray(RNG.normal(size=(B, M)))

    # well-conditioned factors (diag bounded away from 0, the trained-model
    # regime): deviation is O(jitter) nats
    Lq_pd = jnp.asarray(
        np.stack(
            [0.3 * np.tril(RNG.normal(size=(M, M))) + 0.5 * np.eye(M) for _ in range(B)]
        )
    )
    exact = np.asarray(
        kl_gaussian_chol(mus, Lq_pd, jnp.zeros(M), Lp, JITTER, exact_logdet=True)
    )
    fast = np.asarray(
        kl_gaussian_chol(mus, Lq_pd, jnp.zeros(M), Lp, JITTER, exact_logdet=False)
    )
    np.testing.assert_allclose(fast, exact, atol=100 * JITTER * M)

    # jitter -> 0 limit: both reduce to the same exact KL (det(LL^T)=prod d^2)
    e0 = np.asarray(kl_gaussian_chol(mus, Lq_pd, jnp.zeros(M), Lp, 1e-12, exact_logdet=True))
    f0 = np.asarray(kl_gaussian_chol(mus, Lq_pd, jnp.zeros(M), Lp, 1e-12, exact_logdet=False))
    np.testing.assert_allclose(f0, e0, rtol=1e-6)

    # ill-conditioned factors (near-zero diag, large off-diag): both forms
    # stay finite; fast penalizes degenerate diagonals at least as hard
    # (it is the j->0 exact logdet, the jittered one under-penalizes)
    Lq_ill = jnp.asarray(np.stack([np.tril(RNG.normal(size=(M, M))) for _ in range(B)]))
    e1 = np.asarray(kl_gaussian_chol(mus, Lq_ill, jnp.zeros(M), Lp, JITTER, exact_logdet=True))
    f1 = np.asarray(kl_gaussian_chol(mus, Lq_ill, jnp.zeros(M), Lp, JITTER, exact_logdet=False))
    assert np.all(np.isfinite(e1)) and np.all(np.isfinite(f1))
    assert np.all(f1 >= e1 - 1e-6)


def test_mgp_mean_var_tril_matches_sigma_form():
    """The factor form used by the ELBO equals the Sigma form exactly."""
    RNG = np.random.default_rng(101)
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        mgp_mean_var_tril,
    )

    N, M, T = 6, 4, 3
    K22 = rand_spd(M)
    K12 = RNG.normal(size=(N, M))
    d11 = np.abs(RNG.normal(size=N)) + 1.0
    mu = RNG.normal(size=(T, M))
    L = np.stack([np.tril(RNG.normal(size=(M, M))) for _ in range(T)])
    Sigma = np.einsum("tij,tkj->tik", L, L)
    P = K12 @ np.linalg.inv(K22 + JITTER * np.eye(M))
    m1, v1 = mgp_mean_var(
        jnp.asarray(P), jnp.asarray(K12), jnp.asarray(d11), jnp.asarray(mu), jnp.asarray(Sigma)
    )
    m2, v2 = mgp_mean_var_tril(
        jnp.asarray(P), jnp.asarray(K12), jnp.asarray(d11), jnp.asarray(mu), jnp.asarray(L)
    )
    np.testing.assert_allclose(m2, m1, rtol=1e-12)
    np.testing.assert_allclose(v2, v1, rtol=1e-6)


def test_conditional_mean_cov_vs_dense():
    """Full-covariance marginalized conditional (reference MGP,
    code/utils.py:160-186) vs the dense formula."""
    RNG = np.random.default_rng(102)
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        conditional_mean_cov,
    )

    N, M = 5, 4
    K22 = rand_spd(M)
    K12 = RNG.normal(size=(N, M))
    K11 = rand_spd(N)
    mu = RNG.normal(size=M)
    A = RNG.normal(size=(M, M))
    Sigma = A @ A.T
    mean, cov = conditional_mean_cov(
        jnp.asarray(K12), jnp.asarray(K22), jnp.asarray(mu), jnp.asarray(Sigma),
        jnp.asarray(K11), JITTER,
    )
    P = K12 @ np.linalg.inv(K22 + JITTER * np.eye(M))
    np.testing.assert_allclose(mean, P @ mu, rtol=1e-7)
    np.testing.assert_allclose(
        cov, K11 - P @ K12.T + P @ Sigma @ P.T, rtol=1e-6, atol=1e-8
    )


def test_joint_and_conditional_sample_moments():
    """JGP_S / CGP equivalents: empirical moments match the analytic
    conditional law (reference code/utils.py:216-265)."""
    RNG = np.random.default_rng(103)
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        conditional_sample,
        joint_sample,
    )

    N, M = 4, 3
    K22 = rand_spd(M)
    K12 = 0.3 * RNG.normal(size=(N, M))
    K11d = np.abs(RNG.normal(size=N)) + 2.0
    mu = RNG.normal(size=M)
    Lq = np.tril(RNG.normal(size=(M, M))) + np.eye(M)
    P = K12 @ np.linalg.inv(K22 + JITTER * np.eye(M))

    keys = jax.random.split(jax.random.PRNGKey(3), 20000)
    f, v = jax.jit(
        jax.vmap(
            lambda k: joint_sample(
                k, jnp.asarray(K12), jnp.asarray(K22), jnp.asarray(mu),
                jnp.asarray(Lq), jnp.asarray(K11d), JITTER,
            )
        )
    )(keys)
    f, v = np.asarray(f), np.asarray(v)
    np.testing.assert_allclose(v.mean(0), mu, atol=0.05)
    # law of total (co)variance for f: P Sigma_v Pᵀ + diag(base + jitter)
    Sigma_v = Lq @ Lq.T + JITTER * np.eye(M)
    base = np.maximum(K11d - np.sum(P * K12, -1), 0.0) + JITTER
    np.testing.assert_allclose(f.mean(0), P @ mu, atol=0.08)
    np.testing.assert_allclose(
        np.cov(f.T), P @ Sigma_v @ P.T + np.diag(base), atol=0.15
    )

    v0 = jnp.asarray(RNG.normal(size=M))
    g = np.asarray(
        jax.jit(
            jax.vmap(
                lambda k: conditional_sample(
                    k, jnp.asarray(K12), jnp.asarray(K22), v0, jnp.asarray(K11d), JITTER
                )
            )
        )(keys)
    )
    np.testing.assert_allclose(g.mean(0), P @ np.asarray(v0), atol=0.05)
    np.testing.assert_allclose(g.var(0), base, atol=0.1)


def test_mgp_mean_var_white_matches_solve_form():
    """Whitened hot-path form (A = Lp^{-1}K12ᵀ + explicit Lp_inv) equals the
    cho_solve-based Sigma form; returned W = Lp^{-1} Lq."""
    RNG = np.random.default_rng(105)
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        chol_with_jitter,
        mgp_mean_var_white,
    )
    import jax.scipy.linalg as jsl

    N, Mi, T = 6, 4, 3
    K22 = rand_spd(Mi)
    K12 = RNG.normal(size=(N, Mi))
    d11 = np.abs(RNG.normal(size=N)) + 1.0
    mu = RNG.normal(size=(T, Mi))
    L = np.stack([np.tril(RNG.normal(size=(Mi, Mi))) for _ in range(T)])
    Sigma = np.einsum("tij,tkj->tik", L, L)

    Lp = np.asarray(chol_with_jitter(jnp.asarray(K22), JITTER))
    Lp_inv = np.asarray(
        jsl.solve_triangular(jnp.asarray(Lp), jnp.eye(Mi), lower=True)
    )
    A = np.asarray(
        jsl.solve_triangular(jnp.asarray(Lp), jnp.asarray(K12.T), lower=True)
    )
    mean, var, W = mgp_mean_var_white(
        jnp.asarray(A), jnp.asarray(Lp_inv), jnp.asarray(d11), jnp.asarray(mu), jnp.asarray(L)
    )
    P = K12 @ np.linalg.inv(K22 + JITTER * np.eye(Mi))
    exp_mean = mu @ P.T
    exp_var = np.stack(
        [
            np.maximum(d11 - np.sum(P * K12, -1), 0) + np.diag(P @ Sigma[t] @ P.T)
            for t in range(T)
        ]
    )
    np.testing.assert_allclose(mean, exp_mean, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(var, exp_var, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(W, Lp_inv @ L, rtol=1e-6, atol=1e-10)


def test_kl_gaussian_white_exact_for_regularized_family():
    """kl_gaussian_white on tril_regularized factors is the EXACT KL of
    q = N(mu, L̃ L̃ᵀ) vs N(0, Kp + jI) — checked against a dense oracle.

    (The previous fast path approximated logdet(L Lᵀ + jI) by the diag
    product, wrong by tens of nats for random 0.1-scale factors — the
    regularized-family reparameterization makes the diag product exact.)"""
    RNG = np.random.default_rng(106)
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        chol_with_jitter,
        kl_gaussian_white,
        regularized_diag,
        tril_regularized,
    )
    import jax.scipy.linalg as jsl

    Mi, Bn = 5, 4
    Kp = rand_spd(Mi)
    Sp = np.asarray(Kp) + JITTER * np.eye(Mi)
    Lp = chol_with_jitter(jnp.asarray(Kp), JITTER)
    Lp_inv = jsl.solve_triangular(Lp, jnp.eye(Mi), lower=True)
    mus = jnp.asarray(RNG.normal(size=(Bn, Mi)))
    raw = jnp.asarray(RNG.normal(size=(Bn, Mi, Mi))) * 0.1
    Lt = tril_regularized(raw, JITTER)
    W = jnp.einsum("ab,tbc->tac", Lp_inv, Lt)
    logdet_p = jnp.sum(jnp.log(jnp.diagonal(Lp)))
    dq = regularized_diag(raw, JITTER)
    np.testing.assert_allclose(
        np.asarray(dq),
        np.abs(np.diagonal(np.asarray(Lt), axis1=-2, axis2=-1)),
        rtol=1e-12,
    )
    got = kl_gaussian_white(mus, dq, W, logdet_p, Lp_inv)

    Sp_inv = np.linalg.inv(Sp)
    _, logdet_Sp = np.linalg.slogdet(Sp)
    for t in range(Bn):
        Sq = np.asarray(Lt[t]) @ np.asarray(Lt[t]).T
        _, logdet_Sq = np.linalg.slogdet(Sq)
        mu = np.asarray(mus[t])
        expected = 0.5 * (
            np.trace(Sp_inv @ Sq) + mu @ Sp_inv @ mu - Mi + logdet_Sp - logdet_Sq
        )
        np.testing.assert_allclose(float(got[t]), expected, rtol=1e-8)

    # the regularized diag is bounded away from zero, sign-preserving
    d = np.diagonal(np.asarray(Lt), axis1=-2, axis2=-1)
    assert np.all(np.abs(d) >= np.sqrt(JITTER) - 1e-12)
    dr = np.diagonal(np.asarray(raw), axis1=-2, axis2=-1)
    assert np.all(np.sign(d) == np.where(dr >= 0, 1.0, -1.0))


def test_chol_tri_inv_and_solve_white_grads_match_xla():
    """Custom matmul-only VJPs of chol_tri_inv / tri_solve_white equal XLA's
    native rules (same function, different pullback evaluation)."""
    RNG = np.random.default_rng(107)
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        chol_tri_inv,
        tri_solve_white,
    )
    import jax.scipy.linalg as jsl

    Mi, Nc = 5, 3
    K = jnp.asarray(np.stack([rand_spd(Mi), rand_spd(Mi)]))
    Bm = jnp.asarray(RNG.normal(size=(2, Mi, Nc)))
    gL = jnp.asarray(RNG.normal(size=(2, Mi, Mi)))
    gI = jnp.asarray(RNG.normal(size=(2, Mi, Mi)))
    gA = jnp.asarray(RNG.normal(size=(2, Mi, Nc)))

    def f_custom(K, Bm):
        L, Linv = chol_tri_inv(K)
        A = tri_solve_white(L, Linv, Bm)
        return jnp.sum(L * gL) + jnp.sum(Linv * gI) + jnp.sum(A * gA)

    def f_xla(K, Bm):
        L = jnp.linalg.cholesky(K)
        eye = jnp.broadcast_to(jnp.eye(Mi, dtype=K.dtype), L.shape)
        Linv = jsl.solve_triangular(L, eye, lower=True)
        A = jsl.solve_triangular(L, Bm, lower=True)
        return jnp.sum(L * gL) + jnp.sum(Linv * gI) + jnp.sum(A * gA)

    v1 = float(f_custom(K, Bm))
    v2 = float(f_xla(K, Bm))
    np.testing.assert_allclose(v1, v2, rtol=1e-10)
    gK1, gB1 = jax.grad(f_custom, argnums=(0, 1))(K, Bm)
    gK2, gB2 = jax.grad(f_xla, argnums=(0, 1))(K, Bm)
    np.testing.assert_allclose(gB1, gB2, rtol=1e-8, atol=1e-10)
    # the value only depends on sym(K): compare symmetrized K-gradients
    sym = lambda g: 0.5 * (np.asarray(g) + np.asarray(g).swapaxes(-1, -2))
    np.testing.assert_allclose(sym(gK1), sym(gK2), rtol=1e-7, atol=1e-9)


def test_chol_tri_inv_robust_boost_retry():
    """A batch member with smallest eigenvalue -50*jitter makes the plain
    Cholesky non-finite; the robust path refactorizes it with +100*jitter
    (now spd) while leaving the well-conditioned member bit-identical."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        chol_tri_inv,
        chol_tri_inv_robust,
    )

    M, jitter = 16, 1e-4
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.standard_normal((M, M)))
    good = q @ np.diag(np.linspace(1.0, 2.0, M)) @ q.T
    eigs = np.linspace(1.0, 2.0, M)
    eigs[0] = -50.0 * jitter  # indefinite by more than the base jitter
    bad = q @ np.diag(eigs) @ q.T
    Ks = jnp.asarray(np.stack([good, bad]), jnp.float64) + jitter * jnp.eye(M)

    L_plain, Li_plain = chol_tri_inv(Ks)
    assert np.all(np.isfinite(np.asarray(L_plain[0])))
    assert not np.all(np.isfinite(np.asarray(L_plain[1])))

    L, Li = chol_tri_inv_robust(Ks, jitter)
    assert np.all(np.isfinite(np.asarray(L))) and np.all(np.isfinite(np.asarray(Li)))
    # untouched member is bit-identical to the plain factorization
    np.testing.assert_array_equal(np.asarray(L[0]), np.asarray(L_plain[0]))
    np.testing.assert_array_equal(np.asarray(Li[0]), np.asarray(Li_plain[0]))
    # rescued member factorizes K + (1 + 100)*jitter I
    ref = np.linalg.cholesky(np.asarray(Ks[1]) + 100.0 * jitter * np.eye(M))
    np.testing.assert_allclose(np.asarray(L[1]), ref, rtol=1e-10, atol=1e-12)


def test_bf16_batch_matmul_policy():
    """BF16_BATCH_MATMULS runs the G-batched contractions in bf16 with f32
    accumulation; values stay within bf16 tolerance of the f32 path and the
    flag never touches f64 (oracle) inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from collaborative_nonstationary_multivariate_gaussian_process_tpu import config
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops import linalg

    rng = np.random.default_rng(0)
    G, M, B = 7, 12, 9
    A = jnp.asarray(rng.standard_normal((M, B)), jnp.float32)
    Lq = jnp.tril(jnp.asarray(rng.standard_normal((G, M, M)), jnp.float32))
    Lp_inv = jnp.asarray(np.tril(rng.standard_normal((M, M))), jnp.float32)
    d11 = jnp.ones((B,), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((G, M)), jnp.float32)

    mean32, var32, W32 = linalg.mgp_mean_var_white(A, Lp_inv, d11, mu, Lq)
    old = config.BF16_BATCH_MATMULS
    try:
        config.BF16_BATCH_MATMULS = True
        mean16, var16, W16 = linalg.mgp_mean_var_white(A, Lp_inv, d11, mu, Lq)
        # f64 inputs must be untouched by the policy
        W64a = linalg._batched_mm(
            "ab,...bc->...ac", Lp_inv.astype(jnp.float64), Lq.astype(jnp.float64)
        )
    finally:
        config.BF16_BATCH_MATMULS = old

    assert W16.dtype == jnp.float32  # f32 accumulation
    assert W64a.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(W16), np.asarray(W32), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(var16), np.asarray(var32), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(mean16), np.asarray(mean32), rtol=1e-5, atol=1e-5)


def test_joint_sample_full_moments():
    """joint_sample_full (reference JGP, utils.py:189-213): the (f, v) draw
    has the exact joint mean/covariance of the full conditional — checked by
    MC against the assembled dense joint."""
    import jax
    import jax.numpy as jnp

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.kernels import rbf
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        joint_sample_full,
        tril_mask,
    )

    RNG = np.random.default_rng(42)
    Nn, Mi = 6, 4
    x = jnp.asarray(np.sort(RNG.random(Nn)))
    z = jnp.asarray(np.linspace(0, 1, Mi))
    K12 = rbf(x, z, 1.0, 0.4)
    K22 = rbf(z, z, 1.0, 0.4)
    K11 = rbf(x, x, 1.0, 0.4)
    mu = jnp.asarray(RNG.normal(size=Mi))
    Lq = tril_mask(jnp.asarray(RNG.normal(size=(Mi, Mi)) * 0.3))

    S = 40000
    keys = jax.random.split(jax.random.PRNGKey(0), S)
    f, v = jax.vmap(lambda k: joint_sample_full(k, K12, K22, K11, mu, Lq, JITTER))(keys)
    draws = np.concatenate([np.asarray(f), np.asarray(v)], axis=1)

    j = JITTER
    P = np.asarray(K12) @ np.linalg.inv(np.asarray(K22) + j * np.eye(Mi))
    Sig = np.asarray(Lq) @ np.asarray(Lq).T + j * np.eye(Mi)
    B = np.asarray(K11) - P @ np.asarray(K12).T + j * np.eye(Nn)
    mean_exp = np.concatenate([P @ np.asarray(mu), np.asarray(mu)])
    top = np.concatenate([P @ Sig @ P.T + B, P @ Sig], axis=1)
    bot = np.concatenate([Sig @ P.T, Sig], axis=1)
    cov_exp = np.concatenate([top, bot], axis=0)

    np.testing.assert_allclose(draws.mean(0), mean_exp, atol=0.03)
    np.testing.assert_allclose(np.cov(draws.T), cov_exp, atol=0.05)
