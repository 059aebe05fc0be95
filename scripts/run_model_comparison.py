"""SMC model comparison: log marginal likelihoods across the model family.

The reference compares models with AIC/BIC/DIC over external sampler
histories (SIM_code/Utility/model_validation.py); here SMC gives the log
marginal likelihood directly (BASELINE.json: "SMC for model comparison").

Generates the SIM_MNTS nonstationary 2-output series and compares all three
reference variants (SIM_code/Utility/model_validation.py:9-51 scope):
  - LMC (stationary):   should lose on nonstationary data
  - SNMGP (whitened):   nonstationary lengthscale + signal-sd processes
  - SVC/GNMGP (whitened): fully varying covariance L(x)

Usage: python3 scripts/run_model_comparison.py [--N 48] [--particles 512] [--cpu]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=48)
    p.add_argument("--particles", type=int, default=512)
    p.add_argument("--mutations", type=int, default=5)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # dense-Cholesky likelihoods NaN under the TPU's default bf16-pass
    # matmuls (observed: LMC/SVC log-Z NaN at 2048 particles on chip while
    # SNMGP's Kronecker path survived); pin f32 like run_mcmc_sim does
    jax.config.update("jax_default_matmul_precision", "float32")

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.smc import (
        run_smc, run_smc_staged,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
        logdensities as ld,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.distributions import (
        inverse_gamma_logpdf,
        mvn_logpdf_kron,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.kernels import (
        nonstationary_rbf,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        uvec_to_lvec,
        vec_to_tril,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.sim import (
        sim_mnts,
    )

    N, M = args.N, 2
    T = ld.tri_size(M)
    x_np, _, _, _, Y_np = sim_mnts(M=M, N=N, seed=0)
    x = jnp.asarray(x_np)
    Y = jnp.asarray(Y_np)
    y = Y.T.reshape(-1)
    P = args.particles
    key = jax.random.PRNGKey(0)

    results = {}

    # ------------------------- LMC (stationary) ---------------------------
    # params: [tilde_l, tilde_sigma, uL(T), tilde_s2e]; priors: N(0,1),
    # N(0,1), N(0, c=10)^T, invgamma via log transform.
    c = 10.0

    def lmc_log_prior(q):
        lp = -0.5 * q[0] ** 2 - 0.5 * jnp.log(2 * jnp.pi)
        lp += -0.5 * q[1] ** 2 - 0.5 * jnp.log(2 * jnp.pi)
        lp += jnp.sum(-0.5 * (q[2 : 2 + T] / c) ** 2 - jnp.log(c) - 0.5 * jnp.log(2 * jnp.pi))
        s2e = jnp.exp(q[-1])
        lp += inverse_gamma_logpdf(s2e, 1.0, 1.0) + q[-1]
        return lp

    def lmc_log_like(q):
        p_ = ld.lmc_unflatten(q, M)
        L = vec_to_tril(uvec_to_lvec(p_.uL_vec, M), M)
        B_f = L @ L.T
        ell = jnp.exp(p_.tilde_l) * jnp.ones(N)
        sig = jnp.exp(p_.tilde_sigma) * jnp.ones(N)
        K_x = nonstationary_rbf(x, sigma1=sig, ell1=ell) + 1e-6 * jnp.eye(N)
        return mvn_logpdf_kron(y, jnp.zeros_like(y), B_f, K_x, jnp.exp(p_.tilde_sigma2_err))

    def lmc_prior_sampler(k, n):
        k1, k2, k3 = jax.random.split(k, 3)
        scal = jax.random.normal(k1, (n, 2))
        uL = c * jax.random.normal(k2, (n, T)) * 0.1  # start near 0 for stability
        # log s2e from log of inv-gamma draws
        g = jax.random.gamma(k3, 1.0, (n,))
        ts2e = jnp.log(1.0 / g)[:, None]
        return jnp.concatenate([scal, uL, ts2e], axis=1)

    t0 = time.time()
    if P > 512:
        # host-staged: one dispatch per tempering stage (dispatch budget)
        _, info = run_smc_staged(
            lmc_log_prior, lmc_log_like,
            lmc_prior_sampler(jax.random.PRNGKey(1), P), jax.random.PRNGKey(2),
            num_mutations=args.mutations, num_leapfrog=16, progress=True,
        )
    else:
        _, info = jax.jit(
            lambda q0, k: run_smc(
                lmc_log_prior, lmc_log_like, q0, k, num_mutations=args.mutations, num_leapfrog=16
            )
        )(lmc_prior_sampler(jax.random.PRNGKey(1), P), jax.random.PRNGKey(2))
    results["lmc"] = dict(
        log_z=float(info["log_z"]),
        stages=int(info["num_stages"]),
        wall_s=time.time() - t0,
    )

    # ---------------------- SNMGP (whitened) ------------------------------
    hyp = dict(mu_tilde_l=-3.0, alpha_tilde_l=3.0, beta_tilde_l=0.4,
               mu_tilde_sigma=0.0, alpha_tilde_sigma=1.0, beta_tilde_sigma=1.0)
    chol_l, chol_s = ld.snmgp_whiten_chols(
        x, hyp["alpha_tilde_l"], hyp["beta_tilde_l"],
        hyp["alpha_tilde_sigma"], hyp["beta_tilde_sigma"],
    )
    dim_w = 2 * N + T + 1

    def snmgp_log_prior(q):
        eta = q[: 2 * N]
        uL = q[2 * N : 2 * N + T]
        lp = jnp.sum(-0.5 * eta**2 - 0.5 * jnp.log(2 * jnp.pi))
        lp += jnp.sum(-0.5 * (uL / c) ** 2 - jnp.log(c) - 0.5 * jnp.log(2 * jnp.pi))
        s2e = jnp.exp(q[-1])
        lp += inverse_gamma_logpdf(s2e, 1.0, 1.0) + q[-1]
        return lp

    def snmgp_log_like(q):
        p_ = ld.snmgp_unwhiten(q, x, hyp["mu_tilde_l"], hyp["mu_tilde_sigma"], chol_l, chol_s, M)
        L = vec_to_tril(uvec_to_lvec(p_.uL_vec, M), M)
        B_f = L @ L.T
        K_x = nonstationary_rbf(
            x, sigma1=jnp.exp(p_.tilde_sigma), ell1=jnp.exp(p_.tilde_l)
        ) + 1e-6 * jnp.eye(N)
        return mvn_logpdf_kron(y, jnp.zeros_like(y), B_f, K_x, jnp.exp(p_.tilde_sigma2_err))

    def snmgp_prior_sampler(k, n):
        k1, k2, k3 = jax.random.split(k, 3)
        eta = jax.random.normal(k1, (n, 2 * N))
        uL = c * jax.random.normal(k2, (n, T)) * 0.1
        g = jax.random.gamma(k3, 1.0, (n,))
        ts2e = jnp.log(1.0 / g)[:, None]
        return jnp.concatenate([eta, uL, ts2e], axis=1)

    t0 = time.time()
    if P > 512:
        _, info = run_smc_staged(
            snmgp_log_prior, snmgp_log_like,
            snmgp_prior_sampler(jax.random.PRNGKey(3), P), jax.random.PRNGKey(4),
            num_mutations=args.mutations, num_leapfrog=16, progress=True,
        )
    else:
        _, info = jax.jit(
            lambda q0, k: run_smc(
                snmgp_log_prior, snmgp_log_like, q0, k, num_mutations=args.mutations, num_leapfrog=16
            )
        )(snmgp_prior_sampler(jax.random.PRNGKey(3), P), jax.random.PRNGKey(4))
    results["snmgp"] = dict(
        log_z=float(info["log_z"]),
        stages=int(info["num_stages"]),
        wall_s=time.time() - t0,
    )

    # ---------------------- SVC / GNMGP (whitened) -------------------------
    # params (eta space): [eta_tilde_l(N), eta_uL(N*T), tilde_s2e] — every
    # GP-distributed block whitened by its prior Cholesky (svc_unwhiten),
    # N(0, I) priors on the etas, invgamma-through-log on sigma2_err.
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.distributions import (
        mvn_logpdf_dense,
    )

    svc_mu_l, svc_mu_L = hyp["mu_tilde_l"], 0.0
    chol_l_svc, chol_L_svc = ld.svc_whiten_chols(
        x, hyp["alpha_tilde_l"], hyp["beta_tilde_l"], 1.0, 1.0
    )
    dim_svc = N + N * T + 1
    eye_nm = jnp.eye(N * M, dtype=x.dtype)

    def svc_log_prior(q):
        eta = q[:-1]
        lp = jnp.sum(-0.5 * eta**2 - 0.5 * jnp.log(2 * jnp.pi))
        s2e = jnp.exp(q[-1])
        lp += inverse_gamma_logpdf(s2e, 1.0, 1.0) + q[-1]
        return lp

    def svc_log_like(q):
        p_ = ld.svc_unwhiten(q, x, svc_mu_l, svc_mu_L, chol_l_svc, chol_L_svc, M)
        K, _ = ld.svc_covariance(p_.tilde_l, p_.uL_vecs, x)
        S = K + jnp.exp(p_.tilde_sigma2_err) * eye_nm
        return mvn_logpdf_dense(y, jnp.zeros_like(y), S)

    def svc_prior_sampler(k, n):
        k1, k2 = jax.random.split(k)
        eta = jax.random.normal(k1, (n, dim_svc - 1))
        g = jax.random.gamma(k2, 1.0, (n,))
        ts2e = jnp.log(1.0 / g)[:, None]
        return jnp.concatenate([eta, ts2e], axis=1)

    t0 = time.time()
    if P > 512:
        _, info = run_smc_staged(
            svc_log_prior, svc_log_like,
            svc_prior_sampler(jax.random.PRNGKey(5), P), jax.random.PRNGKey(6),
            num_mutations=args.mutations, num_leapfrog=16, progress=True,
        )
    else:
        _, info = jax.jit(
            lambda q0, k: run_smc(
                svc_log_prior, svc_log_like, q0, k, num_mutations=args.mutations, num_leapfrog=16
            )
        )(svc_prior_sampler(jax.random.PRNGKey(5), P), jax.random.PRNGKey(6))
    results["svc"] = dict(
        log_z=float(info["log_z"]),
        stages=int(info["num_stages"]),
        wall_s=time.time() - t0,
    )

    results["log_bayes_factor_snmgp_vs_lmc"] = (
        results["snmgp"]["log_z"] - results["lmc"]["log_z"]
    )
    results["log_bayes_factor_svc_vs_lmc"] = (
        results["svc"]["log_z"] - results["lmc"]["log_z"]
    )
    results["best_model"] = max(
        ("lmc", "snmgp", "svc"), key=lambda m: results[m]["log_z"]
    )
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
