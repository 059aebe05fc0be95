"""ECoG-scale DSVI throughput: D=78 outputs, the reference's largest model.

The per-step cost is dominated by the D^2 coefficient-process conditioning
(Sigma_U einsum: D^2 M^2-blocks) — the workload where the TPU MXU shines
over the reference's D^2 Python solve loop.

Usage: python3 scripts/bench_ecog.py [--M 100] [--B 512] [--cpu]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

import json, time
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=100)
    p.add_argument("--B", type=int, default=512)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 G-batched matmuls w/ f32 accumulate "
                        "(config.BF16_BATCH_MATMULS)")
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "adafactor", "adam_bf16"],
                   help="adafactor: factored second moment; adam_bf16: both "
                        "Adam moments stored bf16, f32 compute — the "
                        "(G, M, M) parameter tables make Adam's "
                        "optimizer-state HBM traffic ~38%% of the step at "
                        "D=78 (docs/DESIGN.md §14)")
    a = p.parse_args()

    import jax, jax.numpy as jnp, optax
    from collaborative_nonstationary_multivariate_gaussian_process_tpu import config
    if a.bf16:
        config.BF16_BATCH_MATMULS = True
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import cnmgp
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        freeze_mask, make_scan_epochs)

    D, N = 78, 62400
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.tile(np.arange(800.0), 78).astype(np.float32))
    y = jnp.asarray(np.sin(x / 40).astype(np.float32))
    idx = jnp.asarray(np.repeat(np.arange(78), 800).astype(np.int32))
    Z = jnp.linspace(0, 800.0, a.M, dtype=jnp.float32)
    params = cnmgp.init_params(jax.random.PRNGKey(0), D, a.M, dtype=jnp.float32)
    if a.optimizer == "adafactor":
        opt = optax.adafactor(learning_rate=0.005)
    elif a.optimizer == "adam_bf16":
        from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.optimizers import (
            adam_bf16_moments,
        )

        opt = adam_bf16_moments(0.005)
    else:
        opt = optax.adam(0.005)
    st = opt.init(params)
    mask = freeze_mask(params, True)
    nb = -(-N // a.B)
    run = make_scan_epochs(opt, float(N), 1e-4, nb, a.B)
    # warmup with the SAME n_epochs: it is a static arg, a different value
    # would recompile inside the timed region
    r = run(params, st, mask, Z, x, y, idx, jax.random.PRNGKey(1), a.epochs)
    assert np.isfinite(float(r[2][-1])), "nonfinite loss"
    steps = a.epochs * nb
    rates = []
    for i in range(3):
        t0 = time.time()
        r = run(params, st, mask, Z, x, y, idx, jax.random.PRNGKey(2 + i), a.epochs)
        float(r[2][-1])
        rates.append(steps / (time.time() - t0))
    rate = float(np.median(rates))
    out = dict(workload="ecog_synthetic", D=D, N=N, M=a.M, B=a.B,
               bf16=bool(a.bf16), optimizer=a.optimizer,
               steps=steps, steps_per_s=rate, step_ms=1000 / rate,
               final_loss=float(r[2][-1]))

    # FLOPs/MFU: cost-analyze ONE train step (XLA counts loop bodies once,
    # so the epoch scan can't be analyzed) x measured steps/s vs chip peak.
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        make_train_step)
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.utils.profiling import (
        flops_of_jitted, peak_flops_per_s)

    step_fn = make_train_step(opt, float(N), 1e-4)
    fl = flops_of_jitted(step_fn, params, st, mask, Z, x[: a.B], y[: a.B],
                         idx[: a.B], jnp.ones(a.B, jnp.float32),
                         jax.random.PRNGKey(9))
    if np.isfinite(fl):
        out["flops_per_step"] = round(fl)
        out["achieved_tflops_per_s"] = round(fl * rate / 1e12, 4)
        peak = peak_flops_per_s()
        if peak:
            out["mfu"] = round(fl * rate / peak, 5)
            out["mfu_note"] = ("bf16" if a.bf16 else "f32") + " compute vs bf16 dense peak per chip"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
