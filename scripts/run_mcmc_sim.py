"""Fully-Bayesian synthetic-truth recovery: NUTS/HMC on the SVC density.

Reproduces the reference's simulation study (SIM_code/sim.py SIM_MNTS +
external-HMC posterior analysis + synthetic_plot.py overlays): generate the
nonstationary 2-output series with known truth (tilde_l = 3(x-1)^3 - 3,
stds 1+x^2 / 2-x^2, correlation cos(pi x)), sample the GNMGP/SVC posterior
with our native NUTS, and report recovery of the lengthscale and correlation
processes.

Usage: python3 scripts/run_mcmc_sim.py [--N 100] [--chains 4] [--samples 500]
       [--cpu]
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
    # Dense-Cholesky MCMC is precision-sensitive: TPU default matmul
    # precision (bf16 passes) destabilizes the stiff GP posteriors.
    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=100)
    p.add_argument("--chains", type=int, default=4)
    p.add_argument("--warmup", type=int, default=400)
    p.add_argument("--samples", type=int, default=400)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--segment-iters", type=int, default=None,
                   help="multichain NUTS: iterations per jitted dispatch "
                        "(default: automatic from "
                        "config.SAMPLER_LEAPFROG_BUDGET; explicit values "
                        "are still capped at the budget)")
    p.add_argument("--sampler", choices=["nuts", "hmc", "chees"], default="nuts")
    p.add_argument("--dense-mass", action="store_true",
                   help="adapt a dense mass matrix during NUTS warmup")
    p.add_argument("--centered", action="store_true",
                   help="use the centered parameterization (default: whitened)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--plots-dir", default=None,
                   help="write true-vs-inferred overlay PNGs of the "
                        "lengthscale/correlation processes here "
                        "(reference synthetic_plot.py:101-142)")
    p.add_argument(
        "--steady",
        action="store_true",
        help="run the jitted sampler twice and report steady-state "
        "samples/s from the second (compile-free) run",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.nuts import (
        run_nuts,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.hmc import (
        run_hmc,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.chees import (
        run_chees,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
        logdensities as ld,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.sim import (
        sim_mnts,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.empirical import (
        local_estimation,
        smooth,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.posterior_analysis import (
        lvecs_to_corr,
        samples2quantiles,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        lvec_to_uvec,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.sharded_mcmc import (
        effective_sample_size,
        potential_scale_reduction,
    )

    N, M = args.N, 2
    T = ld.tri_size(M)
    x, true_l, true_L_vecs, true_s2e, Y = sim_mnts(M=M, N=N, seed=args.seed)
    true_tilde_l = np.log(true_l)
    true_corr = lvecs_to_corr(true_L_vecs, N, M, constrained=True)[:, 0, 1]

    # --- empirical initialization (reference workflow: local variogram fits)
    est = local_estimation(x, Y, window_size=max(N // 6, 10))
    init_tilde_l = np.log(smooth(est["ls"], 10))
    init_uL = np.asarray(
        lvec_to_uvec(jnp.asarray(smooth(est["L_vecs"], 10)), M)
    ).reshape(-1)
    init = np.concatenate([init_tilde_l, init_uL, [np.log(true_s2e)]])
    dim = init.shape[0]

    # hyperparameters as the reference's simulation study (sim.py:208)
    hypers = dict(
        mu_tilde_l=-3.0, alpha_tilde_l=3.0, beta_tilde_l=0.4,
        mu_L=0.0, alpha_L=5.0, beta_L=1.0, a=1.0, b=1.0,
    )

    Yj = jnp.asarray(Y)
    xj = jnp.asarray(x)

    if args.centered:
        def lp(pars):
            return ld.svc_log_posterior(pars, Yj, xj, **hypers)
    else:
        # whitened (non-centered) parameterization: NUTS samples
        # eta ~ near-N(0, I); draws are mapped back afterwards
        chol_l, chol_L = ld.svc_whiten_chols(
            xj, hypers["alpha_tilde_l"], hypers["beta_tilde_l"],
            hypers["alpha_L"], hypers["beta_L"],
        )
        import jax.scipy.linalg as jsl

        eta_l = np.asarray(
            jsl.solve_triangular(
                chol_l, jnp.asarray(init_tilde_l - hypers["mu_tilde_l"]), lower=True
            )
        )
        eta_U = np.asarray(
            jsl.solve_triangular(
                chol_L,
                jnp.asarray(init_uL.reshape(N, T) - hypers["mu_L"]),
                lower=True,
            )
        )
        init = np.concatenate([eta_l, eta_U.reshape(-1), [np.log(true_s2e)]])

        def lp(pars):
            return ld.svc_log_posterior_whitened(
                pars, Yj, xj, chol_l, chol_L,
                mu_tilde_l=hypers["mu_tilde_l"], mu_L=hypers["mu_L"],
                a=hypers["a"], b=hypers["b"],
            )

    key = jax.random.PRNGKey(args.seed)
    # ChEES adapts from CROSS-CHAIN variance: near-identical inits degenerate
    # its criterion early in warmup, so overdisperse (the whitened space is
    # ~N(0, I), so 0.5 is mild).  Per-chain samplers keep the tight jitter.
    if args.sampler == "chees" and not args.centered:
        # overdispersed prior-mean start in the whitened space (eta ~ N(0,I));
        # ChEES adapts from CROSS-CHAIN variance, which near-identical
        # empirical-init chains degenerate
        inits = 0.5 * jax.random.normal(key, (args.chains, dim))
        inits = inits.at[:, -1].set(jnp.asarray(init)[-1])  # keep s2_err init
    else:
        inits = jnp.asarray(init)[None, :] + 0.01 * jax.random.normal(
            key, (args.chains, dim)
        )
    keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), args.chains)

    if args.sampler == "chees":
        # ChEES is inherently joint over chains (cross-chain adaptation) —
        # no vmap; draws stream in bounded dispatches via the
        # warmup/sample split (long single XLA dispatches have crashed
        # remote TPU workers), coming back (S, C, dim) per chunk.
        from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.chees import (
            chees_sample,
            chees_warmup,
        )

        CHUNK = 100

        def sampler(inits, ks):
            st, tuning, winfo = jax.jit(
                lambda q, k: chees_warmup(lp, q, k, num_warmup=args.warmup)
            )(inits, ks[0])
            off = int(np.asarray(winfo["halton_offset"]))
            chunks, infos = [], []
            draw = jax.jit(
                lambda s, t, k, n=CHUNK, o=0: chees_sample(
                    lp, s, t, k, n, halton_offset=o
                ),
                static_argnames=("n", "o"),
            )
            done = 0
            kk = ks[0]
            while done < args.samples:
                n = min(CHUNK, args.samples - done)
                kk = jax.random.fold_in(kk, done + 1)
                st, pos, cinfo = draw(st, tuning, kk, n=n, o=off + done)
                chunks.append(np.asarray(pos))
                infos.append(cinfo)
                done += n
            pos = np.concatenate(chunks, axis=0)
            info = {
                "accept_prob": jnp.concatenate(
                    [c["accept_prob"] for c in infos], 0
                ),
                "step_size": tuning.step_size,
                "trajectory_length": jnp.exp(tuning.log_traj_length),
            }
            return jnp.swapaxes(jnp.asarray(pos), 0, 1), info
    elif args.sampler == "nuts" and args.chains >= 16:
        # large chain counts: segmented multichain driver — one monolithic
        # vmapped scan at 64+ chains would exceed the dispatch budget and
        # risk crashing the remote TPU worker (infer/nuts.run_nuts_multichain)
        from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.nuts import (
            run_nuts_multichain,
        )

        def sampler(inits, ks):
            return run_nuts_multichain(
                lp, inits, ks[0], num_warmup=args.warmup,
                num_samples=args.samples, max_depth=args.max_depth,
                dense_mass=args.dense_mass,
                segment_iters=args.segment_iters, progress=True,
            )
    else:
        runner = run_nuts if args.sampler == "nuts" else run_hmc
        kwargs = (
            dict(num_warmup=args.warmup, num_samples=args.samples,
                 max_depth=args.max_depth, dense_mass=args.dense_mass)
            if args.sampler == "nuts"
            else dict(num_warmup=args.warmup, num_samples=args.samples, num_steps=32)
        )

        sampler = jax.jit(jax.vmap(lambda q, k: runner(lp, q, k, **kwargs)))
    t0 = time.time()
    samples, info = sampler(inits, keys)
    samples = np.asarray(samples)  # (chains, S, dim)
    wall = time.time() - t0
    total_draws = args.chains * args.samples
    steady_rate = None
    if args.steady:
        keys2 = jax.random.split(jax.random.PRNGKey(args.seed + 2), args.chains)
        t0 = time.time()
        s2, _ = sampler(inits, keys2)
        float(np.asarray(s2)[0, 0, 0])
        steady_rate = total_draws / (time.time() - t0)

    # --- recovery metrics -------------------------------------------------
    if not args.centered:
        # map whitened draws back to the centered space for analysis
        flat = samples.reshape(-1, dim)
        eta_l = flat[:, :N]
        eta_U = flat[:, N : N + N * T].reshape(-1, N, T)
        tl = hypers["mu_tilde_l"] + eta_l @ np.asarray(chol_l).T
        U = hypers["mu_L"] + np.einsum("nk,skt->snt", np.asarray(chol_L), eta_U)
        flat = np.concatenate([tl, U.reshape(-1, N * T), flat[:, -1:]], axis=1)
        samples = flat.reshape(args.chains, args.samples, dim)
    pooled = samples.reshape(-1, dim)
    tl_hist = pooled[:, :N]
    uL_hist = pooled[:, N : N + N * T]
    tl_q = samples2quantiles(tl_hist)  # (3, N)
    corr_hist = lvecs_to_corr(uL_hist, N, M)[:, :, 0, 1]  # (S, N)
    corr_q = samples2quantiles(corr_hist)

    rmse_tl = float(np.sqrt(np.mean((tl_q[1] - true_tilde_l) ** 2)))
    rmse_corr = float(np.sqrt(np.mean((corr_q[1] - true_corr) ** 2)))
    cover_tl = float(np.mean((true_tilde_l > tl_q[0]) & (true_tilde_l < tl_q[2])))
    cover_corr = float(np.mean((true_corr > corr_q[0]) & (true_corr < corr_q[2])))
    rhat = np.asarray(potential_scale_reduction(jnp.asarray(samples)))
    ess = np.asarray(effective_sample_size(jnp.asarray(samples)))

    out = dict(
        sampler=args.sampler,
        N=N,
        chains=args.chains,
        draws=total_draws,
        wall_s=wall,
        samples_per_s=total_draws / wall,
        rmse_tilde_l=rmse_tl,
        rmse_corr=rmse_corr,
        coverage_tilde_l=cover_tl,
        coverage_corr=cover_corr,
        rhat_max=float(rhat.max()),
        rhat_median=float(np.median(rhat)),
        mean_accept=float(np.mean(np.asarray(info["accept_prob"]))),
        ess_median=float(np.median(ess)),
        ess_min=float(ess.min()),
        ess_per_s=float(np.median(ess) / wall),
    )
    if steady_rate is not None:
        out["steady_samples_per_s"] = steady_rate
        # same chains re-run compile-free: median ESS over steady wall time
        out["steady_ess_per_s"] = float(np.median(ess) / (total_draws / steady_rate))
    if args.plots_dir:
        from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.visualization import (
            plot_process_overlay,
        )

        os.makedirs(args.plots_dir, exist_ok=True)
        plot_process_overlay(
            x, true_tilde_l, tl_q[1], quantiles=tl_q[[0, 2]],
            ylabel="log lengthscale",
            save_path=os.path.join(
                args.plots_dir, f"nuts_recovery_log_lengthscale_N{N}.png"
            ),
        )
        plot_process_overlay(
            x, true_corr, corr_q[1], quantiles=corr_q[[0, 2]],
            ylabel="correlation",
            save_path=os.path.join(
                args.plots_dir, f"nuts_recovery_correlation_N{N}.png"
            ),
        )
        out["plots"] = sorted(os.listdir(args.plots_dir))

    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f)


if __name__ == "__main__":
    main()
