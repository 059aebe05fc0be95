"""ECoG-scale step decomposition: where the 7.8 ms goes (MFU writeup).

Times the training-step components separately on the same shapes as
scripts/bench_ecog.py (D=78, M=100/128, B=512) so the residual between
achieved and peak FLOP/s is attributed, not guessed:

  - full train step (fwd+bwd+Adam)
  - negative_selbo forward only
  - the (G, B, M) variance quadform fwd and fwd+bwd
  - the (G, M, M) whitening matmuls fwd
  - the 4x batched (M, M) Cholesky + triangular inverse
  - the Adam update alone (optimizer HBM traffic)

Each timed region is a jitted function executed `reps` times with a host
fetch (axon dispatch+fetch overhead ~24 ms amortizes over reps).

Usage: python scripts/bench_ecog_profile.py [--M 100] [--B 512] [--cpu]
Writes results/ecog_step_profile.json.
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


def timeit(fn, *args, reps=30):
    """Median wall time of fn(*args) with a forced host fetch."""
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        times.append((time.time() - t0) / reps)
    return float(np.median(times))


def main():
    global jax
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=100)
    p.add_argument("--B", type=int, default=512)
    p.add_argument("--out", default="results/ecog_step_profile.json")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from collaborative_nonstationary_multivariate_gaussian_process_tpu.infer.dsvi import (
        freeze_mask,
        make_train_step,
    )
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import cnmgp
    from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.linalg import (
        _quadform_diag,
        chol_tri_inv,
    )

    D, N = 78, 62400
    M, B = a.M, a.B
    G = D * (D + 1) // 2
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    x = jnp.asarray(np.tile(np.arange(800.0), D)[:B].astype(np.float32))
    y = jnp.sin(x / 40)
    idx = jnp.asarray((np.arange(B) % D).astype(np.int32))
    w = jnp.ones(B, dtype)
    Z = jnp.linspace(0, 800.0, M, dtype=dtype)
    params = cnmgp.init_params(jax.random.PRNGKey(0), D, M, dtype=dtype)
    opt = optax.adam(0.005)
    st = opt.init(params)
    mask = freeze_mask(params, True)
    key = jax.random.PRNGKey(1)

    res = {"D": D, "M": M, "B": B, "G": G}

    step = make_train_step(opt, float(N), 1e-4)
    res["full_step_ms"] = timeit(
        lambda: step(params, st, mask, Z, x, y, idx, w, key)
    ) * 1e3

    fwd = jax.jit(
        lambda p: cnmgp.negative_selbo(p, Z, x, y, idx, w, float(N), key, 1e-4)
    )
    res["forward_only_ms"] = timeit(fwd, params) * 1e3

    A = jnp.asarray(rng.standard_normal((M, B)), dtype)
    W = jnp.asarray(rng.standard_normal((G, M, M)), dtype)
    qf = jax.jit(lambda A, W: _quadform_diag(A, W))
    res["quadform_fwd_ms"] = timeit(qf, A, W) * 1e3
    qfg = jax.jit(jax.grad(lambda A, W: jnp.sum(_quadform_diag(A, W)), argnums=(0, 1)))
    res["quadform_fwdbwd_ms"] = timeit(qfg, A, W) * 1e3

    Lp_inv = jnp.asarray(np.tril(rng.standard_normal((M, M))), dtype)
    wh = jax.jit(lambda a, b: jnp.einsum("ab,gbc->gac", a, b))
    res["whiten_matmul_fwd_ms"] = timeit(wh, Lp_inv, W) * 1e3

    Ks = jnp.asarray(
        np.stack([np.eye(M) * 2.0 + 0.1 * np.ones((M, M)) for _ in range(4)]), dtype
    )
    ci = jax.jit(chol_tri_inv)
    res["chol_tri_inv_4xMxM_ms"] = timeit(ci, Ks) * 1e3

    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def adam_only(p, s, g):
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s

    res["adam_update_ms"] = timeit(adam_only, params, st, grads) * 1e3

    # parameter + moment bytes moved per Adam step (read p,m,v + grads, write 3)
    n_par = sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(params))
    res["param_count"] = n_par
    res["adam_bytes_moved_est"] = n_par * 4 * 7

    print(json.dumps(res))
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
