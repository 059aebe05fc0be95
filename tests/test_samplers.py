"""Sampler correctness: HMC / NUTS / SMC on tractable targets.

Statistical validation in the reference's spirit (SURVEY.md §4.3): known
Gaussian targets give exact moments and an exact log marginal likelihood.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.hmc import (
    run_hmc,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.nuts import (
    run_nuts,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.smc import (
    run_smc,
)

DIM = 4
RNG = np.random.default_rng(4)
A = RNG.standard_normal((DIM, DIM))
COV = A @ A.T + DIM * np.eye(DIM)
MEAN = np.array([1.0, -2.0, 0.5, 3.0])
PREC = np.linalg.inv(COV)


def gauss_lp(q):
    d = q - jnp.asarray(MEAN)
    return -0.5 * d @ jnp.asarray(PREC) @ d


def _check_moments(samples, mean_tol, cov_tol):
    m = samples.mean(axis=0)
    np.testing.assert_allclose(m, MEAN, atol=mean_tol)
    c = np.cov(samples.T)
    np.testing.assert_allclose(c, COV, atol=cov_tol * np.max(np.abs(COV)))


def test_hmc_gaussian_moments():
    q0 = jnp.zeros(DIM)
    samples, info = jax.jit(
        lambda q, k: run_hmc(gauss_lp, q, k, num_warmup=400, num_samples=2000, num_steps=16)
    )(q0, jax.random.PRNGKey(0))
    samples = np.asarray(samples)
    assert 0.4 < float(np.mean(info["accept_prob"])) <= 1.0
    _check_moments(samples, mean_tol=0.4, cov_tol=0.25)


def test_nuts_gaussian_moments():
    q0 = jnp.zeros(DIM)
    samples, info = jax.jit(
        lambda q, k: run_nuts(gauss_lp, q, k, num_warmup=400, num_samples=2000, max_depth=8)
    )(q0, jax.random.PRNGKey(1))
    samples = np.asarray(samples)
    assert float(np.mean(info["diverging"])) < 0.02
    assert 0.5 < float(np.mean(info["accept_prob"])) <= 1.0
    _check_moments(samples, mean_tol=0.3, cov_tol=0.2)


def test_nuts_multi_chain_vmap():
    q0s = jnp.asarray(RNG.standard_normal((4, DIM)))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    samples, info = jax.jit(
        jax.vmap(
            lambda q, k: run_nuts(gauss_lp, q, k, num_warmup=300, num_samples=800, max_depth=8)
        )
    )(q0s, keys)
    samples = np.asarray(samples)  # (4, 800, DIM)
    pooled = samples.reshape(-1, DIM)
    _check_moments(pooled, mean_tol=0.3, cov_tol=0.2)
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.sharded_mcmc import (
        potential_scale_reduction,
    )

    rhat = np.asarray(potential_scale_reduction(jnp.asarray(samples)))
    assert np.all(rhat < 1.1), rhat


def test_smc_log_marginal_likelihood():
    """Conjugate check: prior N(0, s0 I), likelihood N(y | q, s1 I) at a
    single 'observation' y — log Z analytic."""
    s0, s1 = 2.0, 0.5
    y = jnp.asarray(np.array([0.7, -0.3]))
    d = 2

    def log_prior(q):
        return -0.5 * jnp.sum(q**2) / s0**2 - d * jnp.log(s0) - 0.5 * d * jnp.log(2 * jnp.pi)

    def log_like(q):
        return -0.5 * jnp.sum((y - q) ** 2) / s1**2 - d * jnp.log(s1) - 0.5 * d * jnp.log(
            2 * jnp.pi
        )

    # analytic evidence: y ~ N(0, (s0^2 + s1^2) I)
    var = s0**2 + s1**2
    log_z_true = float(
        -0.5 * np.sum(np.asarray(y) ** 2) / var - 0.5 * d * np.log(2 * np.pi * var)
    )

    P = 1024
    init = s0 * jax.random.normal(jax.random.PRNGKey(3), (P, d))
    final, info = jax.jit(
        lambda q0, k: run_smc(log_prior, log_like, q0, k, num_mutations=4, num_leapfrog=8)
    )(init, jax.random.PRNGKey(4))
    log_z = float(info["log_z"])
    assert abs(log_z - log_z_true) < 0.15, (log_z, log_z_true)
    # posterior mean check: mu_post = y * s0^2/(s0^2+s1^2)
    mu_post = np.asarray(y) * s0**2 / var
    np.testing.assert_allclose(np.asarray(final).mean(axis=0), mu_post, atol=0.1)


def test_hmc_on_snmgp_density_runs():
    """Smoke: short NUTS chain on the real SNMGP log-posterior."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
        logdensities as ld,
    )

    N, M = 6, 2
    x = jnp.asarray(np.sort(RNG.random(N)))
    Y = jnp.asarray(RNG.standard_normal((N, M)))
    dim = 2 * N + ld.tri_size(M) + 1

    def lp(pars):
        return ld.snmgp_log_posterior(pars, Y, x)

    q0 = jnp.asarray(0.1 * RNG.standard_normal(dim))
    samples, info = jax.jit(
        lambda q, k: run_nuts(lp, q, k, num_warmup=100, num_samples=100, max_depth=6)
    )(q0, jax.random.PRNGKey(5))
    assert np.all(np.isfinite(np.asarray(samples)))
    assert float(np.mean(info["accept_prob"])) > 0.3


def test_nuts_dense_mass_on_correlated_gaussian():
    """Dense-mass NUTS ("dense_e"): on a strongly correlated Gaussian the
    adapted dense metric must (a) recover the exact moments and (b) need
    far fewer leapfrog steps per draw than the diagonal metric."""
    rho = 0.99
    cov_c = np.array([[1.0, rho], [rho, 1.0]])
    prec_c = np.linalg.inv(cov_c)

    def lp(q):
        return -0.5 * q @ jnp.asarray(prec_c) @ q

    q0 = jnp.zeros(2)
    run = lambda dense, key: jax.jit(
        lambda q, k: run_nuts(
            lp, q, k, num_warmup=500, num_samples=1500, max_depth=10,
            dense_mass=dense,
        )
    )(q0, key)

    s_dense, i_dense = run(True, jax.random.PRNGKey(2))
    s_diag, i_diag = run(False, jax.random.PRNGKey(3))

    sd = np.asarray(s_dense)
    np.testing.assert_allclose(sd.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(sd.T), cov_c, atol=0.15)
    assert float(np.mean(np.asarray(i_dense["diverging"]))) < 0.02

    # the dense metric whitens the rho=0.99 ridge: tree sizes collapse
    steps_dense = float(np.mean(np.asarray(i_dense["num_steps"])))
    steps_diag = float(np.mean(np.asarray(i_diag["num_steps"])))
    assert steps_dense < 0.5 * steps_diag, (steps_dense, steps_diag)


def test_chees_gaussian_moments():
    """ChEES-HMC recovers the moments of a correlated Gaussian and adapts
    acceptance toward its 0.651 target."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.chees import (
        run_chees,
    )

    C = 8
    init = jnp.asarray(RNG.standard_normal((C, DIM)))
    positions, info = jax.jit(
        lambda i, k: run_chees(
            gauss_lp, i, k, num_warmup=400, num_samples=600, init_step_size=0.5
        )
    )(init, jax.random.PRNGKey(7))
    samples = np.asarray(positions).reshape(-1, DIM)
    _check_moments(samples, mean_tol=0.35, cov_tol=0.25)
    acc = float(np.mean(np.asarray(info["accept_prob"])))
    assert 0.4 < acc < 0.95, acc
    # adapted trajectory length should exceed a single step
    assert float(info["trajectory_length"]) > float(info["step_size"])


def test_chees_halton_sequence():
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.chees import (
        halton_sequence,
    )

    h = halton_sequence(8)
    np.testing.assert_allclose(
        h, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625]
    )


def test_chees_sharded_moments_and_consistency():
    """Chain-sharded ChEES (axis_name/pmean reductions, distinct per-shard
    noise): correct moments, and the adapted trajectory length is a single
    replicated value (i.e. every shard saw the same cross-chain stats)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.chees import (
        run_chees,
    )

    ndev = len(jax.devices())
    C = 2 * ndev
    init = jnp.asarray(RNG.standard_normal((C, DIM)))
    key = jax.random.PRNGKey(3)
    mesh = Mesh(np.array(jax.devices()), ("chain",))

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("chain"), P()),
        out_specs=(P(None, "chain"), P("chain")),
    )
    def sharded(i, k):
        pos, info = run_chees(
            gauss_lp, i, k, num_warmup=300, num_samples=400,
            init_step_size=0.5, axis_name="chain",
        )
        return pos, info["trajectory_length"][None]

    pos, traj = sharded(init, key)
    samples = np.asarray(pos).reshape(-1, DIM)
    _check_moments(samples, mean_tol=0.4, cov_tol=0.3)
    # per-shard adapted trajectory lengths must agree exactly (pmean'd stats)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(traj)[0], rtol=0)
    # distinct per-shard noise: shards must NOT produce identical chains
    p = np.asarray(pos)  # (S, C, DIM), chains grouped by shard
    assert not np.allclose(p[:, 0], p[:, 2])


def test_chees_streaming_matches_onecall():
    """chees_warmup + chunked chees_sample is the bounded-dispatch
    production path; with the same keys/halton offsets it must produce the
    same tuning and statistically equivalent draws as run_chees."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.chees import (
        chees_sample,
        chees_warmup,
        run_chees,
    )

    C = 6
    init = jnp.asarray(RNG.standard_normal((C, DIM)))
    key = jax.random.PRNGKey(11)
    k_w, k_m = jax.random.split(key)

    state, tuning, winfo = jax.jit(
        lambda i, k: chees_warmup(gauss_lp, i, k, num_warmup=300, init_step_size=0.5)
    )(init, k_w)
    off = int(np.asarray(winfo["halton_offset"]))  # static for jit
    # stream two chunks
    k1, k2 = jax.random.split(k_m)
    st1, pos1, _ = jax.jit(
        lambda s, t, k: chees_sample(gauss_lp, s, t, k, 200, halton_offset=off)
    )(state, tuning, k1)
    st2, pos2, _ = jax.jit(
        lambda s, t, k: chees_sample(gauss_lp, s, t, k, 200, halton_offset=off + 200)
    )(st1, tuning, k2)
    samples = np.asarray(jnp.concatenate([pos1, pos2], 0)).reshape(-1, DIM)
    _check_moments(samples, mean_tol=0.45, cov_tol=0.3)
    # tuning pytree round-trips through the checkpoint layer
    import tempfile, os

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.checkpoint import (
        load_pytree,
        save_pytree,
    )

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "tuning.pkl")
        save_pytree(p, tuning)
        t2 = load_pytree(p, tuning)
        np.testing.assert_allclose(
            float(t2.step_size), float(tuning.step_size)
        )


def test_chees_chunked_dispatch_bit_identical():
    """The bounded-dispatch segments (max_iters_per_dispatch) must be
    invisible to the math: warmup tuning AND every draw identical between a
    monolithic run and a tightly chunked one (key/Halton schedules are
    precomputed per run)."""
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.chees import (
        run_chees,
    )

    C = 6
    init = jnp.asarray(RNG.standard_normal((C, DIM)))
    key = jax.random.PRNGKey(5)
    pos_a, info_a = run_chees(
        gauss_lp, init, key, num_warmup=120, num_samples=90,
        init_step_size=0.5, max_iters_per_dispatch=None,
    )
    pos_b, info_b = run_chees(
        gauss_lp, init, key, num_warmup=120, num_samples=90,
        init_step_size=0.5, max_iters_per_dispatch=17,
    )
    np.testing.assert_array_equal(np.asarray(pos_a), np.asarray(pos_b))
    np.testing.assert_array_equal(
        np.asarray(info_a["accept_prob"]), np.asarray(info_b["accept_prob"])
    )
    np.testing.assert_allclose(
        float(info_a["step_size"]), float(info_b["step_size"]), rtol=0
    )
    np.testing.assert_allclose(
        float(info_a["trajectory_length"]), float(info_b["trajectory_length"]), rtol=0
    )


def test_run_nuts_multichain_moments_and_segment_invariance():
    """Segmented multichain NUTS: correct moments on a correlated Gaussian,
    and bit-identical results for any segment_iters (the host chunking must
    not perturb the RNG schedule or adaptation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.nuts import (
        run_nuts_multichain,
    )

    S_inv = jnp.array([[2.0, -1.0], [-1.0, 2.0]])

    def lp(q):
        return -0.5 * q @ S_inv @ q

    C = 4
    # default dtype (f64 under the test conftest's x64 mode) so the lp
    # matrix and the chain state promote identically inside scan carries
    inits = jnp.asarray(np.random.default_rng(0).standard_normal((C, 2)))
    pos, info = run_nuts_multichain(
        lp, inits, jax.random.PRNGKey(0), num_warmup=200, num_samples=300,
        max_depth=6, segment_iters=64,
    )
    assert pos.shape == (C, 300, 2)
    assert info["accept_prob"].shape == (C, 300)
    assert 0.6 < info["accept_prob"].mean() < 1.0
    target = np.linalg.inv(np.asarray(S_inv))
    emp = np.cov(pos.reshape(-1, 2).T)
    np.testing.assert_allclose(emp, target, atol=0.12)

    pos2, _ = run_nuts_multichain(
        lp, inits, jax.random.PRNGKey(0), num_warmup=200, num_samples=300,
        max_depth=6, segment_iters=77,
    )
    np.testing.assert_array_equal(pos, pos2)


def test_run_smc_staged_matches_while_loop():
    """Host-staged SMC (one dispatch per tempering stage) is bit-identical
    to the monolithic lax.while_loop version — same bodies, same RNG."""
    import jax
    import jax.numpy as jnp

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.smc import (
        run_smc,
        run_smc_staged,
    )

    def lp_prior(q):
        return -0.5 * jnp.sum(q**2)

    def lp_like(q):
        return -0.5 * jnp.sum((q - 1.0) ** 2)

    q0 = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    pos1, i1 = run_smc(lp_prior, lp_like, q0, jax.random.PRNGKey(1),
                       num_mutations=3, num_leapfrog=8)
    pos2, i2 = run_smc_staged(lp_prior, lp_like, q0, jax.random.PRNGKey(1),
                              num_mutations=3, num_leapfrog=8)
    assert float(i1["log_z"]) == float(i2["log_z"])
    assert int(i1["num_stages"]) == int(i2["num_stages"])
    import numpy as np

    np.testing.assert_array_equal(np.asarray(pos1), np.asarray(pos2))


def test_sampler_dispatch_budget_sizing():
    """The ~500k-leapfrogs-per-dispatch crash boundary (docs/DESIGN.md §13)
    is enforced in code: NUTS multichain caps segment_iters at
    budget // (chains * 2^max_depth), and the ChEES chunk sizing adapts to
    the current trajectory-length estimate."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.chees import (
        leapfrog_budget_chunk,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.nuts import (
        run_nuts_multichain,
    )

    # ChEES: ~32-step trajectories at 2048 chains -> 400000/(2*2048*32)=3,
    # floored to the power of two 2; an explicit request is capped, never
    # raised
    assert leapfrog_budget_chunk(2048, 0.1, np.log(3.2), 1024, 128) == 2
    assert leapfrog_budget_chunk(2048, 0.1, np.log(3.2), 1024, None) == 2
    # short trajectories at few chains: the request passes through
    assert leapfrog_budget_chunk(4, 0.1, np.log(0.1), 1024, 128) == 128
    # never below one iteration per dispatch
    assert leapfrog_budget_chunk(10**9, 1e-6, np.log(10.0), 1024, 128) == 1

    # NUTS: an oversized explicit segment_iters is capped to the same
    # result as the automatic sizing (and the cap is reported)
    def lp(q):
        return -0.5 * jnp.sum(q**2)

    inits = jnp.asarray(np.random.default_rng(1).standard_normal((64, 2)))
    # 64 chains * 2^10 = 65536 -> cap = 400000 // 65536 = 6
    _, info_auto = run_nuts_multichain(
        lp, inits, jax.random.PRNGKey(0), num_warmup=12, num_samples=12,
        max_depth=10,
    )
    _, info_req = run_nuts_multichain(
        lp, inits, jax.random.PRNGKey(0), num_warmup=12, num_samples=12,
        max_depth=10, segment_iters=10_000,
    )
    assert info_auto["segment_iters"] == 6
    assert info_req["segment_iters"] == 6
