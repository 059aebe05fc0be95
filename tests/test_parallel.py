"""Multi-device logic on the 8-device virtual CPU mesh.

SURVEY.md §4: multi-host logic tested on CPU via
xla_force_host_platform_device_count fake-mesh testing.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.mesh import (
    CHAIN_AXIS,
    DATA_AXIS,
    make_mesh,
)


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, chain=2)
    assert mesh.shape == {DATA_AXIS: 4, CHAIN_AXIS: 2}
    mesh = make_mesh(chain=2)
    assert mesh.shape == {DATA_AXIS: 4, CHAIN_AXIS: 2}


def test_initialize_distributed_single_process_noop():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.mesh import (
        initialize_distributed,
    )

    pid, pcount = initialize_distributed()
    assert (pid, pcount) == (0, 1)
    # idempotent
    assert initialize_distributed() == (0, 1)


def test_pod_mesh_and_host_local_data_roundtrip():
    """make_pod_mesh uses every device with an ICI-aware layout; the
    host-local loading path (process_local_slice + global_batch_from_local)
    reconstructs exactly the globally-sharded array."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.mesh import (
        global_batch_from_local,
        make_pod_mesh,
        process_local_slice,
        shard_batch,
    )

    ndev = len(jax.devices())
    mesh = make_pod_mesh(chain=2)
    assert mesh.shape == {DATA_AXIS: ndev // 2, CHAIN_AXIS: 2}

    n_rows = 4 * (ndev // 2)
    x = np.arange(n_rows * 3, dtype=np.float64).reshape(n_rows, 3)
    start, size = process_local_slice(mesh, n_rows)
    # single process owns every data coordinate
    assert (start, size) == (0, n_rows)
    g = global_batch_from_local(mesh, {"x": x[start : start + size]})["x"]
    assert g.shape == (n_rows, 3)
    assert g.sharding.spec == P(DATA_AXIS)
    ref = shard_batch(mesh, {"x": jnp.asarray(x)})["x"]
    np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))


def test_chain_sharded_hmc_runs_and_matches_target():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.sharded_mcmc import (
        run_hmc_sharded,
    )

    mesh = make_mesh(data=1, chain=8)

    def lp(q):
        return -0.5 * jnp.sum(q**2)

    n_chains, dim = 16, 3
    init = jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim))
    samples, info = run_hmc_sharded(
        lp,
        init,
        jax.random.PRNGKey(1),
        mesh,
        num_warmup=200,
        num_samples=500,
        num_steps=8,
    )
    samples = np.asarray(samples)  # (16, 500, 3)
    assert samples.shape == (n_chains, 500, dim)
    pooled = samples.reshape(-1, dim)
    np.testing.assert_allclose(pooled.mean(0), np.zeros(dim), atol=0.15)
    np.testing.assert_allclose(np.cov(pooled.T), np.eye(dim), atol=0.2)


def test_data_parallel_dsvi_step_matches_single_device():
    """The sharded DP train step must produce the same loss/params as the
    unsharded one (same inputs, same rng) — XLA SPMD is numerics-preserving
    up to reduction order."""
    import optax

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        freeze_mask,
        make_train_step,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import cnmgp

    D, M, B = 3, 6, 64
    dtype = jnp.float64
    params = cnmgp.init_params(jax.random.PRNGKey(0), D, M, dtype=dtype)
    Z = jnp.linspace(0.0, 1.0, M, dtype=dtype)
    x = jnp.linspace(0.0, 1.0, B, dtype=dtype)
    y = jnp.sin(5 * x)
    idx = jnp.asarray(np.arange(B) % D, jnp.int32)
    w = jnp.ones(B, dtype)

    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    mask = freeze_mask(params, True)
    step = make_train_step(optimizer, float(B), 1e-4)
    key = jax.random.PRNGKey(7)

    p1, o1, loss1 = step(params, opt_state, mask, Z, x, y, idx, w, key)

    mesh = make_mesh(data=8, chain=1)
    shard = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    put_b = lambda a: jax.device_put(a, shard)
    put_r = lambda t: jax.tree_util.tree_map(lambda a: jax.device_put(a, repl), t)
    p2, o2, loss2 = step(
        put_r(params),
        put_r(opt_state),
        put_r(mask),
        jax.device_put(Z, repl),
        put_b(x),
        put_b(y),
        put_b(idx),
        put_b(w),
        key,
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-8)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9)


def test_smc_runs_with_sharded_particles():
    """SMC body is pure jnp — verify it executes with particles laid out
    over the mesh (GSPMD partitions the vmapped likelihood/mutation)."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.smc import (
        run_smc,
    )

    mesh = make_mesh(data=1, chain=8)
    d = 2

    def log_prior(q):
        return -0.5 * jnp.sum(q**2) / 4.0

    def log_like(q):
        return -0.5 * jnp.sum((q - 1.0) ** 2)

    P_ = 256
    init = 2.0 * jax.random.normal(jax.random.PRNGKey(0), (P_, d))
    init = jax.device_put(init, NamedSharding(mesh, P(CHAIN_AXIS)))
    final, info = jax.jit(
        lambda q0, k: run_smc(log_prior, log_like, q0, k, num_mutations=3, num_leapfrog=8)
    )(init, jax.random.PRNGKey(1))
    assert np.isfinite(float(info["log_z"]))
    assert np.asarray(final).shape == (P_, d)


def test_inference_mesh_matches_single_device():
    """User-facing data-parallel inference(): the mesh-constrained fast path
    produces identical losses/params to the default path (same seed)."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        inference,
    )

    rng = np.random.default_rng(3)
    X_list = [np.sort(rng.random(40)), np.sort(rng.random(40))]
    Y_list = [np.sin(6 * X_list[0]), 0.5 * np.sin(6 * X_list[1])]
    z = np.linspace(0, 1, 8)
    kw = dict(
        batch_size=16,
        dim_outputs=2,
        itnum=6,
        lr=0.01,
        seed=11,
        show_ELBO=False,
        dtype=jnp.float64,
    )
    r1 = inference(X_list, Y_list, z, **kw)
    mesh = make_mesh(data=8, chain=1)
    r2 = inference(X_list, Y_list, z, mesh=mesh, **kw)
    np.testing.assert_allclose(r1.loss_list, r2.loss_list, rtol=1e-9)
    for a, b in zip(
        jax.tree_util.tree_leaves(r1.params), jax.tree_util.tree_leaves(r2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_sharded_smc_matches_analytic_log_z():
    """Particle-sharded SMC (explicit psum/all_gather collectives) recovers
    the analytic log marginal likelihood of a conjugate Gaussian model and
    agrees with the single-device sampler."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.smc import (
        run_smc,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.sharded_smc import (
        run_smc_sharded,
    )

    d, tau2, sig2 = 3, 4.0, 1.0
    y = jnp.ones((d,))

    def log_prior(q):
        return -0.5 * jnp.sum(q**2) / tau2 - 0.5 * d * jnp.log(2 * jnp.pi * tau2)

    def log_like(q):
        return -0.5 * jnp.sum((y - q) ** 2) / sig2 - 0.5 * d * jnp.log(
            2 * jnp.pi * sig2
        )

    # analytic: log Z = sum_d log N(y_i; 0, tau2 + sig2)
    log_z_true = float(
        jnp.sum(-0.5 * y**2 / (tau2 + sig2) - 0.5 * jnp.log(2 * jnp.pi * (tau2 + sig2)))
    )

    P_ = 512
    init = jnp.sqrt(tau2) * jax.random.normal(jax.random.PRNGKey(0), (P_, d))

    mesh = make_mesh(data=1, chain=8)
    pos_sh, info_sh = run_smc_sharded(
        log_prior, log_like, init, jax.random.PRNGKey(1), mesh,
        num_mutations=4, num_leapfrog=8,
    )
    assert np.asarray(pos_sh).shape == (P_, d)
    assert 1 <= int(info_sh["num_stages"]) <= 100
    assert abs(float(info_sh["log_z"]) - log_z_true) < 0.25, (
        float(info_sh["log_z"]), log_z_true,
    )

    # posterior moments: N(tau2/(tau2+sig2) * y, (1/tau2 + 1/sig2)^-1 I)
    post_mean = tau2 / (tau2 + sig2)
    post_var = 1.0 / (1.0 / tau2 + 1.0 / sig2)
    np.testing.assert_allclose(
        np.asarray(pos_sh).mean(axis=0), post_mean * np.ones(d), atol=0.15
    )
    np.testing.assert_allclose(
        np.asarray(pos_sh).var(axis=0), post_var * np.ones(d), rtol=0.35
    )

    _, info_1dev = run_smc(
        log_prior, log_like, init, jax.random.PRNGKey(1),
        num_mutations=4, num_leapfrog=8,
    )
    assert abs(float(info_1dev["log_z"]) - float(info_sh["log_z"])) < 0.3


def test_run_chees_sharded():
    """Joint chain-sharded ChEES over the virtual mesh: shapes, replicated
    adaptation scalars, finite draws."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.mesh import (
        make_mesh,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.sharded_mcmc import (
        run_chees_sharded,
    )

    ndev = len(jax.devices())
    mesh = make_mesh(data=1, chain=ndev)
    dim = 6
    A = np.random.default_rng(0).standard_normal((dim, dim))
    prec = jnp.asarray(np.linalg.inv(A @ A.T + dim * np.eye(dim)))

    def lp(q):
        return -0.5 * q @ prec @ q

    C = 2 * ndev
    init = jnp.asarray(
        np.random.default_rng(1).standard_normal((C, dim))
    )
    pos, info = run_chees_sharded(
        lp, init, jax.random.PRNGKey(0), mesh, num_warmup=80, num_samples=60
    )
    assert pos.shape == (C, 60, dim)
    assert np.all(np.isfinite(np.asarray(pos)))
    assert float(info["trajectory_length"]) > 0.0
    # chains from different shards must differ (per-shard folded keys)
    assert not np.allclose(np.asarray(pos)[0], np.asarray(pos)[2])


def test_run_chees_sharded_chunk_invariant():
    """The host-chunked shard_mapped segment loop must produce identical
    draws for any max_iters_per_dispatch (keys/Halton are precomputed)."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.sharded_mcmc import (
        run_chees_sharded,
    )

    ndev = len(jax.devices())
    mesh = make_mesh(data=1, chain=ndev)
    dim = 4
    init = jnp.asarray(np.random.default_rng(2).standard_normal((2 * ndev, dim)))

    def lp(q):
        return -0.5 * jnp.sum(q**2)

    kw = dict(num_warmup=80, num_samples=60)
    pos_a, info_a = run_chees_sharded(
        lp, init, jax.random.PRNGKey(3), mesh, max_iters_per_dispatch=1024, **kw
    )
    pos_b, info_b = run_chees_sharded(
        lp, init, jax.random.PRNGKey(3), mesh, max_iters_per_dispatch=13, **kw
    )
    np.testing.assert_array_equal(pos_a, pos_b)
    np.testing.assert_array_equal(info_a["accept_prob"], info_b["accept_prob"])
    assert float(info_a["step_size"]) == float(info_b["step_size"])
