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
