"""MCMC diagnostics (ESS) + DSVI pre-estimation initializers."""

import numpy as np
import jax
import jax.numpy as jnp

from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.sharded_mcmc import (
    effective_sample_size,
    potential_scale_reduction,
)

RNG = np.random.default_rng(10)


def test_ess_iid_close_to_n():
    x = RNG.standard_normal((4, 500, 3))
    ess = np.asarray(effective_sample_size(jnp.asarray(x)))
    assert np.all(ess > 0.5 * 4 * 500)
    assert np.all(ess < 1.6 * 4 * 500)


def test_ess_correlated_much_smaller():
    # AR(1) with phi=0.95: tau = (1+phi)/(1-phi) = 39
    c, n = 4, 2000
    phi = 0.95
    x = np.zeros((c, n, 1))
    eps = RNG.standard_normal((c, n, 1))
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + eps[:, t]
    ess = float(effective_sample_size(jnp.asarray(x))[0])
    expected = c * n / 39.0
    assert 0.4 * expected < ess < 2.5 * expected


def test_rhat_detects_unmixed_chains():
    good = RNG.standard_normal((4, 400, 2))
    bad = good.copy()
    bad[0] += 5.0
    r_good = np.asarray(potential_scale_reduction(jnp.asarray(good)))
    r_bad = np.asarray(potential_scale_reduction(jnp.asarray(bad)))
    assert np.all(r_good < 1.05)
    assert np.all(r_bad > 1.5)


def test_pre_estimation_partial_recovers_scales():
    """Local Kronecker MLE should find roughly the right noise/lengthscale
    on data generated from the separable model."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models.initialization import (
        pre_estimation_partial,
        pre_initialization,
    )

    N, D = 80, 2
    x = np.sort(RNG.random(N))
    ell_true, s2e_true = 0.2, 1e-2
    d2 = (x[:, None] - x[None, :]) ** 2
    K = np.exp(-0.5 * d2 / ell_true**2)
    B = np.array([[1.0, 0.6], [0.6, 1.0]])
    cov = np.kron(K, B) + s2e_true * np.eye(N * D)
    y = RNG.multivariate_normal(np.zeros(N * D), cov)
    Y = y.reshape(N, D)
    z = np.linspace(0.1, 0.9, 4)
    v, U, s2e_logs = pre_estimation_partial(x, Y, z, P=10)
    assert v.shape == (4,)
    assert U.shape == (D, D, 4)
    assert np.all(np.isfinite(v)) and np.all(np.isfinite(s2e_logs))
    # recovered noise within a couple orders of magnitude (local windows
    # of 10 points are crude estimators; this matches reference behavior)
    assert np.all(s2e_logs < 0.0)

    mu_W, sqrt_v, sqrt_W, sqrt_U = pre_initialization(5, 3)
    assert mu_W.shape == (3, 5)
    assert sqrt_U.shape == (6, 5, 5)  # packed D(D+1)/2 layout
    np.testing.assert_allclose(sqrt_v, np.eye(5) * 1e-2)


def test_checkpoint_orbax_backend(tmp_path):
    """Orbax directory checkpoints round-trip the train state (the
    multi-host-safe production backend; pickle remains the default)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
        cnmgp,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils import (
        checkpoint as ckpt,
    )

    params = cnmgp.init_params(jax.random.PRNGKey(0), 2, 4, dtype=jnp.float32)
    opt = optax.adam(1e-2)
    ost = opt.init(params)
    path = str(tmp_path / "ckpt_orbax")
    ckpt.save_train_state(path, params, ost, epoch=7, loss=1.5, backend="orbax")

    params2 = cnmgp.init_params(jax.random.PRNGKey(1), 2, 4, dtype=jnp.float32)
    ost2 = opt.init(params2)
    p3, o3 = ckpt.load_train_state(path, params2, ost2, backend="orbax")
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(ost), jax.tree_util.tree_leaves(o3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
