"""Chain-parallel scaling-efficiency harness.

Measures NUTS samples/s at 1, 2, 4, ... devices with chains sharded over
the mesh "chain" axis (the BASELINE.json >=80% 1->4-host efficiency target;
real multi-host numbers require a pod slice — this harness runs identically
there via jax.distributed.initialize, and on the 8-device virtual CPU mesh
for CI).

Usage: python3 scripts/bench_scaling.py [--cpu] [--devices 1 2 4 8]
       [--chains-per-device 4]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=None)
    p.add_argument("--chains-per-device", type=int, default=4)
    p.add_argument("--N", type=int, default=24)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--out", default=None)
    p.add_argument("--sampler", choices=["nuts", "chees"], default="nuts")
    p.add_argument(
        "--strong",
        action="store_true",
        help="fixed TOTAL chains across device counts (strong scaling). "
        "On the oversubscribed virtual CPU mesh this is the probative "
        "mode: total compute and silicon are constant, so ideal time is "
        "flat and any slowdown vs 1 device is pure sharding/collective "
        "overhead (the quantity that limits real pod scaling).",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
        logdensities as ld,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.mesh import (
        make_mesh,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.parallel.sharded_mcmc import (
        run_chees_sharded,
        run_nuts_sharded,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.sim import (
        sim_mnts,
    )

    # Attach to the backend FIRST with a trivial op: on the axon TPU a cold
    # grant has been measured taking ~850 s — timing it inside first_call_s
    # would misattribute it to compile (round-2 postmortem, docs/DESIGN.md §7).
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    attach_s = time.time() - t0

    n_avail = jax.device_count()
    device_counts = args.devices or [d for d in (1, 2, 4, 8) if d <= n_avail]

    N, M = args.N, 2
    T = ld.tri_size(M)
    x_np, _, _, _, Y_np = sim_mnts(M=M, N=N, seed=0)
    x = jnp.asarray(x_np)
    Y = jnp.asarray(Y_np)
    chol_l, chol_s = ld.snmgp_whiten_chols(x, 3.0, 0.4, 1.0, 1.0)
    dim = 2 * N + T + 1

    def lp(q):
        return ld.snmgp_log_posterior_whitened(q, Y, x, chol_l, chol_s, mu_tilde_l=-3.0)

    results = []
    base_rate = None
    base_time = None
    total_chains_strong = max(device_counts) * args.chains_per_device
    for nd in device_counts:
        mesh = make_mesh(data=1, chain=nd)
        n_chains = total_chains_strong if args.strong else nd * args.chains_per_device
        init = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim))
        def go(seed):
            if args.sampler == "chees":
                return run_chees_sharded(
                    lp, init, jax.random.PRNGKey(seed), mesh,
                    num_warmup=args.warmup, num_samples=args.samples,
                )
            return run_nuts_sharded(
                lp, init, jax.random.PRNGKey(seed), mesh,
                num_warmup=args.warmup, num_samples=args.samples, max_depth=7,
            )

        # compile + run once (warm), then time
        t0 = time.time()
        pos, info = go(1)
        float(np.asarray(pos)[0, 0, 0])
        compile_and_run = time.time() - t0
        t0 = time.time()
        pos, info = go(2)
        float(np.asarray(pos)[0, 0, 0])
        dt = time.time() - t0
        total_draws = n_chains * args.samples
        rate = total_draws / dt
        if base_rate is None:
            base_rate = rate / nd  # per-device baseline at 1 device
            base_time = dt
        row = dict(sampler=args.sampler, devices=nd, chains=n_chains,
                   draws=total_draws, wall_s=dt, samples_per_s=rate,
                   first_call_s=compile_and_run, attach_s=attach_s)
        if args.strong:
            # fixed total work on fixed silicon: slowdown vs 1 device is
            # pure sharding/collective overhead
            row["sharding_overhead"] = dt / base_time - 1.0
        else:
            row["efficiency"] = rate / (nd * base_rate)
        results.append(row)
        print(json.dumps(row))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f)


if __name__ == "__main__":
    main()
