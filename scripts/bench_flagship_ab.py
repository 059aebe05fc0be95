"""Flagship-step A/B: isolate the round-4 ~3% regression (VERDICT r4 weak #7).

Times the exact bench.py harness (D=6, M=100, B=2000, N=28768, 80-epoch
dispatches) for:
  - kl_mode="true"        (the r4+ default: tril_regularized factors + exact KL)
  - kl_mode="ref_compat"  (raw-tril factors + the reference's KL — the same
                           factor-op profile as the round-3 fast-KL path)

If the two tie, the regression was not the regularized-factor ops (run-to-
run noise / environment); if ref_compat is faster, the delta IS the factor
ops and the fusion lead (round4-state memory #1) is worth pursuing.

Run on chip: python scripts/bench_flagship_ab.py
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        freeze_mask,
        make_scan_epochs,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (
        cnmgp,
    )

    D, M, B, N = 6, 100, 2000, 28768
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.random(N)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, D, N).astype(np.int32))
    y = jnp.asarray(
        (np.sin(7 * np.asarray(x)) + 0.1 * rng.standard_normal(N)).astype(np.float32)
    )
    Z = jnp.linspace(0.0, 1.0, M, dtype=dtype)
    params = cnmgp.init_params(jax.random.PRNGKey(0), D, M, dtype=dtype)
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(params)
    grad_mask = freeze_mask(params, fix_hyperpars=True)
    num_batches = -(-N // B)
    n_epochs = 80
    steps = n_epochs * num_batches

    out = {}
    for mode in ("true", "ref_compat"):
        run = make_scan_epochs(
            optimizer, float(N), 1e-4, num_batches, B, kl_mode=mode
        )
        r = run(params, opt_state, grad_mask, Z, x, y, idx, jax.random.PRNGKey(1), n_epochs)
        assert np.isfinite(float(r[2][-1]))
        rates = []
        for i in range(3):
            t0 = time.time()
            r = run(params, opt_state, grad_mask, Z, x, y, idx,
                    jax.random.PRNGKey(2 + i), n_epochs)
            float(r[2][-1])
            rates.append(steps / (time.time() - t0))
        out[mode] = dict(steps_per_s=float(np.median(rates)),
                         rates=[float(v) for v in rates])
        print(json.dumps({mode: out[mode]}))

    out["ratio_true_over_refcompat"] = (
        out["true"]["steps_per_s"] / out["ref_compat"]["steps_per_s"]
    )
    print(json.dumps(out))
    with open("results/bench_flagship_ab_r5.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
