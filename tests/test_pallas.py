"""Pallas kernels vs the jnp reference implementations (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.kernels import (
    gibbs,
    rbf,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.pallas_kernels import (
    gibbs_pallas,
    rbf_pallas,
)

RNG = np.random.default_rng(5)


def test_gibbs_pallas_matches_reference():
    n, m = 200, 150  # exercises ragged tiles
    x1 = jnp.asarray(np.sort(RNG.random(n)))
    x2 = jnp.asarray(np.sort(RNG.random(m)))
    e1 = jnp.asarray(np.exp(0.3 * RNG.standard_normal(n)))
    e2 = jnp.asarray(np.exp(0.3 * RNG.standard_normal(m)))
    K_ref = gibbs(x1, x2, e1, e2, 1.7)
    K_pal = gibbs_pallas(x1, x2, e1, e2, jnp.asarray(1.7), True)
    np.testing.assert_allclose(np.asarray(K_pal), np.asarray(K_ref), rtol=1e-10)


def test_gibbs_pallas_gradients_match():
    n, m = 40, 30
    x1 = jnp.asarray(np.sort(RNG.random(n)))
    x2 = jnp.asarray(np.sort(RNG.random(m)))
    e1 = jnp.asarray(np.exp(0.2 * RNG.standard_normal(n)))
    e2 = jnp.asarray(np.exp(0.2 * RNG.standard_normal(m)))
    W = jnp.asarray(RNG.standard_normal((n, m)))

    def f_ref(e1, e2, s):
        return jnp.sum(W * gibbs(x1, x2, e1, e2, s))

    def f_pal(e1, e2, s):
        return jnp.sum(W * gibbs_pallas(x1, x2, e1, e2, s, True))

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(e1, e2, jnp.asarray(1.3))
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(e1, e2, jnp.asarray(1.3))
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_gibbs_pallas_x_gradients_match():
    n, m = 16, 16
    x1 = jnp.asarray(np.sort(RNG.random(n)))
    x2 = jnp.asarray(np.sort(RNG.random(m)))
    e1 = jnp.ones(n) * 0.5
    e2 = jnp.ones(m) * 0.7
    W = jnp.asarray(RNG.standard_normal((n, m)))
    g_ref = jax.grad(lambda a, b: jnp.sum(W * gibbs(a, b, e1, e2, 1.0)), argnums=(0, 1))(
        x1, x2
    )
    g_pal = jax.grad(
        lambda a, b: jnp.sum(W * gibbs_pallas(a, b, e1, e2, jnp.asarray(1.0), True)),
        argnums=(0, 1),
    )(x1, x2)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_rbf_pallas_matches_reference():
    n, m = 130, 260
    x1 = jnp.asarray(np.sort(RNG.random(n)))
    x2 = jnp.asarray(np.sort(RNG.random(m)))
    K_ref = rbf(x1, x2, 2.0, 0.4)
    K_pal = rbf_pallas(x1, x2, jnp.asarray(2.0), jnp.asarray(0.4), True)
    np.testing.assert_allclose(np.asarray(K_pal), np.asarray(K_ref), rtol=1e-10)


def test_rbf_pallas_gradients_match():
    n, m = 32, 20
    x1 = jnp.asarray(np.sort(RNG.random(n)))
    x2 = jnp.asarray(np.sort(RNG.random(m)))
    W = jnp.asarray(RNG.standard_normal((n, m)))
    g_ref = jax.grad(lambda s, l: jnp.sum(W * rbf(x1, x2, s, l)), argnums=(0, 1))(
        jnp.asarray(2.0), jnp.asarray(0.4)
    )
    g_pal = jax.grad(
        lambda s, l: jnp.sum(W * rbf_pallas(x1, x2, s, l, True)), argnums=(0, 1)
    )(jnp.asarray(2.0), jnp.asarray(0.4))
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_kron_mv_pallas_matches_dense():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.pallas_kernels import (
        kron_mv_pallas,
    )

    m1, m2, n1, n2 = 3, 2, 200, 150
    B = jnp.asarray(RNG.standard_normal((m1, m2)))
    K = jnp.asarray(RNG.standard_normal((n1, n2)))
    y = jnp.asarray(RNG.standard_normal(m2 * n2))
    got = np.asarray(kron_mv_pallas(B, K, y, interpret=True))
    expected = np.kron(np.asarray(B), np.asarray(K)) @ np.asarray(y)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-8)


def test_cholesky_pallas_matches_jnp():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.pallas_kernels import (
        cholesky_pallas,
    )

    batch, m = 5, 20
    A = RNG.standard_normal((batch, m, m))
    S = np.einsum("bij,bkj->bik", A, A) + m * np.eye(m)
    got = np.asarray(cholesky_pallas(jnp.asarray(S), interpret=True))
    expected = np.linalg.cholesky(S)
    np.testing.assert_allclose(got, expected, rtol=1e-8, atol=1e-10)


def test_cholesky_pallas_padded_sizes():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.pallas_kernels import (
        cholesky_pallas,
    )

    m = 13  # not a multiple of 8 — exercises the identity padding
    A = RNG.standard_normal((2, m, m))
    S = np.einsum("bij,bkj->bik", A, A) + m * np.eye(m)
    got = np.asarray(cholesky_pallas(jnp.asarray(S), interpret=True))
    np.testing.assert_allclose(got, np.linalg.cholesky(S), rtol=1e-8, atol=1e-10)


def test_cholesky_pallas_vjp_matches_jnp():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.pallas_kernels import (
        cholesky_pallas,
    )

    m = 8
    A = RNG.standard_normal((m, m))
    S = A @ A.T + m * np.eye(m)
    W = jnp.asarray(RNG.standard_normal((m, m)))

    def f_pal(S_):
        return jnp.sum(W * cholesky_pallas(S_, interpret=True))

    def f_ref(S_):
        return jnp.sum(W * jnp.linalg.cholesky(S_))

    g_pal = np.asarray(jax.grad(f_pal)(jnp.asarray(S)))
    g_ref = np.asarray(jax.grad(f_ref)(jnp.asarray(S)))
    # jax's cholesky grad returns the symmetrized gradient too
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-7, atol=1e-9)


def test_chol_inv_pallas_matches_chol_tri_inv():
    """Fused (L, L^{-1}) kernel agrees with the XLA pair, incl. non-multiple-
    of-8 sizes (identity padding must be exact for BOTH outputs)."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.pallas_kernels import (
        chol_inv_pallas,
    )

    for batch, m in [(4, 20), (2, 13), (1, 1)]:
        A = RNG.standard_normal((batch, m, m))
        S = np.einsum("bij,bkj->bik", A, A) + m * np.eye(m)
        L, Linv = chol_inv_pallas(jnp.asarray(S), interpret=True)
        L_ref = np.linalg.cholesky(S)
        np.testing.assert_allclose(np.asarray(L), L_ref, rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(Linv), np.linalg.inv(L_ref), rtol=1e-7, atol=1e-8
        )


def test_quadform_diag_pallas_matches_einsum():
    """V[g,n] = sum_k (A^T W[g])^2 — values and both gradients vs the
    einsum lowering (the op it replaces in mgp_mean_var_white), multiple
    ragged shapes including multi-tile N."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.pallas_kernels import (
        quadform_diag_pallas,
    )

    def oracle(A, W):
        C = jnp.einsum("mn,gmk->gnk", A, W)
        return jnp.sum(C * C, axis=-1)

    for M, N, G in [(24, 70, 5), (100, 512, 7), (16, 700, 3)]:
        A = jnp.asarray(RNG.standard_normal((M, N)), jnp.float32)
        W = jnp.asarray(RNG.standard_normal((G, M, M)), jnp.float32)
        V = quadform_diag_pallas(A, W, True)
        Vo = oracle(A, W)
        np.testing.assert_allclose(
            np.asarray(V), np.asarray(Vo), rtol=2e-4, atol=2e-4
        )

        def lp(a, w):
            return jnp.sum(jnp.sin(quadform_diag_pallas(a, w, True)))

        def lo(a, w):
            return jnp.sum(jnp.sin(oracle(a, w)))

        gp = jax.grad(lp, argnums=(0, 1))(A, W)
        # judge against the f64 truth: the kernel's blocked accumulation
        # order differs from the einsum's, so two f32 results legitimately
        # disagree by the f32 rounding noise of a K~G*M^2 contraction.  The
        # contract is *relative*: the kernel must be within a small factor
        # of the f32 einsum's own distance from the f64 answer.
        go32 = jax.grad(lo, argnums=(0, 1))(A, W)
        go64 = jax.grad(lo, argnums=(0, 1))(
            A.astype(jnp.float64), W.astype(jnp.float64)
        )
        for a, b32, b64 in zip(gp, go32, go64):
            scale = float(jnp.max(jnp.abs(b64))) + 1e-30
            err_pallas = float(jnp.max(jnp.abs(np.asarray(a) - b64))) / scale
            err_oracle = float(jnp.max(jnp.abs(np.asarray(b32) - b64))) / scale
            assert err_pallas <= 3.0 * err_oracle + 1e-6, (
                err_pallas,
                err_oracle,
            )


def test_quadform_dispatch_equivalence():
    """mgp_mean_var_white's variance is identical (up to f32 reassociation)
    whether the quadform goes through einsum or the Pallas kernel."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        _quadform_diag,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.pallas_kernels import (
        quadform_diag_pallas,
    )

    M, N, G = 32, 130, 6
    A = jnp.asarray(RNG.standard_normal((M, N)), jnp.float32)
    W = jnp.asarray(RNG.standard_normal((G, M, M)), jnp.float32)
    # CPU tests always take the einsum path in _quadform_diag; compare it
    # against the kernel in interpret mode directly
    v_einsum = _quadform_diag(A, W)
    v_pallas = quadform_diag_pallas(A, W, True)
    np.testing.assert_allclose(
        np.asarray(v_pallas), np.asarray(v_einsum), rtol=2e-4, atol=2e-4
    )
    # multi-batch-dim reshape path of _quadform_diag
    W4 = W.reshape(2, 3, M, M)
    v4 = _quadform_diag(A, W4)
    np.testing.assert_allclose(
        np.asarray(v4), np.asarray(v_einsum).reshape(2, 3, N), rtol=1e-6
    )


def test_quadform_dispatch_kernel_path(monkeypatch):
    """Force the production dispatch through the Pallas kernel (interpret
    mode) to cover _quadform_diag's reshape/threshold plumbing end-to-end
    through mgp_mean_var_white."""
    from jax.experimental.pallas import tpu as pltpu

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops import (
        linalg as linalg_mod,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu import (
        config as config_mod,
    )

    monkeypatch.setattr(config_mod, "is_tpu", lambda: True)
    monkeypatch.setattr(linalg_mod, "QUADFORM_PALLAS_MIN_ELEMENTS", 1)

    M, N, G = 16, 40, 4
    A = jnp.asarray(RNG.standard_normal((M, N)), jnp.float32)
    Lp_inv = jnp.asarray(np.tril(RNG.standard_normal((M, M))), jnp.float32)
    d11 = jnp.asarray(np.abs(RNG.standard_normal(N)) + 1.0, jnp.float32)
    mu = jnp.asarray(RNG.standard_normal((G, M)), jnp.float32)
    st = jnp.asarray(
        np.tril(RNG.standard_normal((G, M, M))), jnp.float32
    )

    with pltpu.force_tpu_interpret_mode():
        mean_k, var_k, W_k = linalg_mod.mgp_mean_var_white(A, Lp_inv, d11, mu, st)
    monkeypatch.setattr(linalg_mod, "QUADFORM_PALLAS_MIN_ELEMENTS", 1 << 62)
    mean_e, var_e, W_e = linalg_mod.mgp_mean_var_white(A, Lp_inv, d11, mu, st)
    np.testing.assert_allclose(np.asarray(mean_k), np.asarray(mean_e), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(var_k), np.asarray(var_e), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(W_k), np.asarray(W_e), rtol=1e-5)
