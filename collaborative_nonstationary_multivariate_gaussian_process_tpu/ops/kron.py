"""Kronecker-structured covariance algebra.

TPU-native equivalents of the reference's `kronecker_operation.py`
(SIM_code/Utility/kronecker_operation.py:5-85).  The matvec identity
(B ⊗ K) y = vec(K Y Bᵀ) is already MXU-shaped; inverses/log-dets go through
`eigh` of the two small factors rather than ever forming the MN x MN matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "kron",
    "kron_diag",
    "kron_mv",
    "kron_eigh",
    "kron_inv",
    "kron_logdet",
]


def kron(a, b):
    """Dense Kronecker product (oracle / small sizes only).

    Mirrors `kronecker_product` (reference kronecker_operation.py:5-22).
    """
    return jnp.kron(a, b)


def kron_diag(d1, d2):
    """diag(D1 ⊗ D2) from the two diagonals (kronecker_operation.py:25-33)."""
    return (d1[:, None] * d2[None, :]).reshape(-1)


def kron_mv(B, K, y):
    """(B ⊗ K) y without forming the product (kronecker_operation.py:72-85).

    B: (M1, M2), K: (N1, N2), y: (M2*N2,) ordered task-major (task blocks of
    length N2, matching the reference's `Y.t().contiguous().view(-1)` layout).
    Returns (M1*N1,).
    """
    m2 = B.shape[1]
    n2 = K.shape[1]
    Y = y.reshape(m2, n2).T  # (N2, M2)
    A = K @ Y @ B.T  # (N1, M1)
    return A.T.reshape(-1)


def kron_eigh(B, K):
    """Eigendecompositions of both Kronecker factors.

    Returns (w_B, v_B), (w_K, v_K) such that
    B ⊗ K = (v_B ⊗ v_K) diag(w_B ⊗ w_K) (v_B ⊗ v_K)ᵀ.
    """
    w_B, v_B = jnp.linalg.eigh(B)
    w_K, v_K = jnp.linalg.eigh(K)
    return (w_B, v_B), (w_K, v_K)


def kron_inv(sigma2, B, K):
    """(sigma2 I + B ⊗ K)^{-1}, dense output (oracle path).

    Mirrors `kron_inv` (kronecker_operation.py:36-54); only for tests and
    tiny problems — production code uses `kron_mv` against the eigenbasis.
    """
    (w_B, v_B), (w_K, v_K) = kron_eigh(B, K)
    U = kron(v_B, v_K)
    t = kron_diag(w_B, w_K)
    return (U * (1.0 / (t + sigma2))[None, :]) @ U.T


def kron_logdet(sigma2, B, K):
    """log det(sigma2 I + B ⊗ K) via factor eigenvalues
    (kronecker_operation.py:57-69)."""
    w_B = jnp.linalg.eigvalsh(B)
    w_K = jnp.linalg.eigvalsh(K)
    return jnp.sum(jnp.log(kron_diag(w_B, w_K) + sigma2))
