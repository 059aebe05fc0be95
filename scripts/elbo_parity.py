"""Torch-oracle ELBO equivalence check (VERDICT r3, Missing #1 / Next #2).

Loads the reference implementation (/root/reference/code/nmgp_dsvi.py,
NMGP.forward at :157-301) with old-torch API shims, sets IDENTICAL
parameters on the reference model and on our `cnmgp` pytree, and compares
the training objective term by term:

  - KL_v, KL_U   : deterministic given params -> compared exactly
  - KL_W, recon  : depend on per-step latent draws -> MC-converged means
  - total -SELBO : MC mean comparison

Root-cause instrument: the reference's `KL_Gaussian` trace term calls
`torch.triangular_solve(input=scale_tril_X, A=scale_tril_X2)` WITHOUT
`upper=False` (/root/reference/code/utils.py:345).  Old torch defaults to
`upper=True`, which reads only the upper triangle of the lower-triangular
prior Cholesky — i.e. its DIAGONAL — so the reference computes

    trace_ref = || diag(Lp)^{-1} chol(Sigma_q + jI) ||_F^2

instead of the true  trace = || Lp^{-1} chol(Sigma_q + jI) ||_F^2.
The two agree only when the prior gram is (near-)diagonal.  Under the
NMGP_SIM protocol the length-scale logs are frozen at {te:0, L0:2, L1:2}
(notebook/NMGP_SIM.ipynb), making K_L0/K_L1 near-rank-1 — the regime of
maximal disagreement.  This script quantifies the gap and verifies that
patching `upper=False` into the reference KL makes it agree with our
(true-KL) implementation to float64 precision.

Run:  JAX_PLATFORMS=cpu python scripts/elbo_parity.py
Writes results/elbo_parity.json.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

# force CPU + x64 in-process: the image's sitecustomize registers the axon
# TPU plugin at startup and pins JAX_PLATFORMS=axon, so env vars do NOT
# stick (and this host-side oracle must never claim the chip)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import matplotlib

matplotlib.use("Agg")

import torch

# ---------------------------------------------------------------------------
# Old-torch API shims (the reference targets torch ~1.x).  These REPLICATE
# old semantics exactly — including triangular_solve's upper=True default —
# so the oracle is the reference as it actually ran, bugs and all.
# ---------------------------------------------------------------------------


def _shim_solve(input=None, A=None):
    # old torch.solve(B, A) solves A X = B, returns (X, LU)
    return torch.linalg.solve(A, input), A


def _shim_cholesky(a, upper=False):
    L = torch.linalg.cholesky(a)
    return L.mT if upper else L


def _shim_triangular_solve(input=None, A=None, upper=True, transpose=False,
                           unitriangular=False):
    # old torch.triangular_solve(b, A): solves A x = b reading only the
    # `upper` triangle of A; default upper=True (the reference relies on
    # this default at utils.py:345)
    X = torch.linalg.solve_triangular(
        A.mT if transpose else A,
        input,
        upper=upper != transpose,
        unitriangular=unitriangular,
    )
    return X, A


torch.solve = _shim_solve
torch.cholesky = _shim_cholesky
torch.triangular_solve = _shim_triangular_solve

sys.path.insert(0, "/root/reference/code")
import nmgp_dsvi as ref  # noqa: E402  (the oracle)
import utils as ref_utils  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from collaborative_nonstationary_multivariate_gaussian_process_tpu.models import (  # noqa: E402
    cnmgp,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops import (  # noqa: E402
    linalg as ops_linalg,
)
from collaborative_nonstationary_multivariate_gaussian_process_tpu.ops.kernels import (  # noqa: E402
    gibbs,
    rbf,
)

# ---------------------------------------------------------------------------
# Problem setup: NMGP_SIM protocol shapes/hyperpars at a post-init-like point
# ---------------------------------------------------------------------------

D, M, B, N_TOTAL = 2, 20, 200, 200
SEED = 22
JITTER = 1e-4  # reference tridiagonal_jitter, utils.py:7
HYPERPARS = {  # NMGP_SIM.ipynb frozen length scales
    "sigma2_L0_log": 0.0,
    "length_scales_L0_log": 2.0,
    "sigma2_L1_log": 0.0,
    "length_scales_L1_log": 2.0,
    "sigma2_tildeell_log": 0.0,
    "length_scales_tildeell_log": 0.0,
    "sigma2_err_log": -2.0,
}


def build_reference_model(x_np):
    Z = torch.from_numpy(np.linspace(0, 1, M)).type(ref.TensorType).unsqueeze(1)
    model = ref.NMGP(
        number_observations=N_TOTAL, dim_outputs=D, Z=Z, minibatch_size=B,
        seed=SEED,
    )
    for name, val in HYPERPARS.items():
        # NB: we set each attr directly — the reference's own override has a
        # copy-paste bug writing sigma2_L1_log into sigma2_L0_log
        # (nmgp_dsvi.py:784-785); param equality is what matters here.
        getattr(model, name).data.fill_(val)
    return model


def params_from_reference(model) -> cnmgp.CNMGPParams:
    g = lambda t: jnp.asarray(t.detach().numpy(), jnp.float64)
    return cnmgp.CNMGPParams(
        mu_v=g(model.mu_v),
        sqrt_v=g(model.sqrt_v),
        mu_W=g(model.mu_W),
        sqrt_W=g(model.sqrt_W),
        mu_U=cnmgp.pack_U(g(model.mu_U)),
        sqrt_U=cnmgp.pack_U(g(model.sqrt_U)),
        sigma2_tildeell_log=g(model.sigma2_tildeell_log),
        length_scales_tildeell_log=g(model.length_scales_tildeell_log),
        sigma2_L0_log=g(model.sigma2_L0_log),
        length_scales_L0_log=g(model.length_scales_L0_log),
        sigma2_L1_log=g(model.sigma2_L1_log),
        length_scales_L1_log=g(model.length_scales_L1_log),
        sigma2_err_log=g(model.sigma2_err_log),
    )


class KLRecorder:
    """Wraps the reference KL_Gaussian; records each call's summed value."""

    def __init__(self, fn):
        self.fn = fn
        self.calls = []

    def __call__(self, *a, **k):
        out = self.fn(*a, **k)
        self.calls.append(float(out.sum()))
        return out


def reference_terms(model, X_list, Y_list, n_samples, corrected_kl=False):
    """Run the reference forward n_samples times; return per-term arrays.

    corrected_kl=True patches KL_Gaussian's trace term to use the full
    lower-triangular prior Cholesky (upper=False) — the mathematically
    correct KL — leaving everything else reference-verbatim.
    """
    orig_kl = ref_utils.KL_Gaussian

    if corrected_kl:
        def kl_fixed(X_mu, X_Sigma, X2_mu, X2_Sigma, device0=None):
            tt = ref.TensorType
            j = ref_utils.tridiagonal_jitter
            Sq = X_Sigma + torch.eye(X_Sigma.shape[-1]).type(tt) * j
            Sp = X2_Sigma + torch.eye(X2_Sigma.shape[-1]).type(tt) * j
            n = X_mu.shape[-1]
            Lq = torch.linalg.cholesky(Sq)
            Lp = torch.linalg.cholesky(Sp)
            half1 = Lp.diagonal(dim1=-2, dim2=-1).log().sum(-1) - Lq.diagonal(
                dim1=-2, dim2=-1
            ).log().sum(-1)
            A = torch.linalg.solve_triangular(Lp, Lq, upper=False)
            term2 = A.pow(2).sum((-2, -1))
            sol = torch.linalg.solve_triangular(
                Lp, (X2_mu - X_mu).unsqueeze(-1), upper=False
            )
            term3 = sol.pow(2).sum((-2, -1))
            return half1 + 0.5 * (term2 + term3 - n)

        rec = KLRecorder(kl_fixed)
    else:
        rec = KLRecorder(orig_kl)

    ref.KL_Gaussian = rec

    losses, recons, kl_Ws, kl_vs, kl_Us = [], [], [], [], []
    try:
        for _ in range(n_samples):
            rec.calls = []
            with torch.no_grad():
                loss = model.forward(X_list, Y_list)
            kl_W, kl_v, kl_U1, kl_U0 = rec.calls  # call order: W, v, U1, U0
            kl_U = kl_U1 + kl_U0
            losses.append(float(loss))
            kl_Ws.append(kl_W)
            kl_vs.append(kl_v)
            kl_Us.append(kl_U)
            # recon (SELBO_R) back-solved from the total:
            # loss = -(N/B * SELBO_R - KL_W - KL_v - KL_U)
            n_over_b = N_TOTAL / sum(int(x.shape[0]) for x in X_list)
            recons.append((-float(loss) + kl_W + kl_v + kl_U) / n_over_b)
    finally:
        ref.KL_Gaussian = orig_kl
    return {
        "loss": np.array(losses),
        "recon": np.array(recons),
        "kl_W": np.array(kl_Ws),
        "kl_v": np.array(kl_vs),
        "kl_U": np.array(kl_Us),
    }


def ours_terms(params, Z, x, y, idx, n_samples, key, kl_mode="true"):
    """Per-term arrays from our implementation (production path)."""
    w = jnp.ones_like(y)

    def one(k):
        lat = cnmgp._sample_latents(params, Z, x, k, JITTER, kl_mode=kl_mode)
        recon = cnmgp._reconstruction(params, lat, y, idx, w)
        kl_W, kl_v, kl_U = cnmgp._kl_terms(params, lat, JITTER, kl_mode)
        loss = -(N_TOTAL / x.shape[0] * recon - kl_W - kl_v - kl_U)
        return loss, recon, kl_W, kl_v, kl_U

    outs = jax.vmap(one)(jax.random.split(key, n_samples))
    names = ["loss", "recon", "kl_W", "kl_v", "kl_U"]
    return {n: np.asarray(v) for n, v in zip(names, outs)}


def ours_exact_kl(params, Z):
    """Our deterministic KLs via the exact-logdet oracle path
    (kl_gaussian: jitter both sides, exact chol(Sigma_q + jI) logdet) —
    bitwise-comparable to the corrected reference KL."""
    s2_te = float(jnp.exp(params.sigma2_tildeell_log))
    ls_te = float(jnp.exp(params.length_scales_tildeell_log))
    s2_L0 = float(jnp.exp(params.sigma2_L0_log))
    ls_L0 = float(jnp.exp(params.length_scales_L0_log))
    s2_L1 = float(jnp.exp(params.sigma2_L1_log))
    ls_L1 = float(jnp.exp(params.length_scales_L1_log))
    K_te = rbf(Z, Z, s2_te, ls_te)
    K_L0 = rbf(Z, Z, s2_L0, ls_L0)
    K_L1 = rbf(Z, Z, s2_L1, ls_L1)
    zM = jnp.zeros(M, jnp.float64)
    tril = ops_linalg.tril_mask
    kl_v = float(
        ops_linalg.kl_gaussian(params.mu_v, tril(params.sqrt_v), zM, K_te, JITTER)
    )
    T0 = D * (D - 1) // 2
    sq = tril(params.sqrt_U)
    kl_U = float(
        jnp.sum(ops_linalg.kl_gaussian(params.mu_U[T0:], sq[T0:], zM, K_L1, JITTER))
    ) + float(
        jnp.sum(ops_linalg.kl_gaussian(params.mu_U[:T0], sq[:T0], zM, K_L0, JITTER))
    )
    return kl_v, kl_U


def mc_compare(name, a, b):
    """Two-sample z-statistic between MC means."""
    ma, mb = a.mean(), b.mean()
    se = math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    z = (ma - mb) / se if se > 0 else 0.0
    return {
        "term": name,
        "ref_mean": ma,
        "ours_mean": mb,
        "rel_diff": abs(ma - mb) / max(abs(ma), 1e-12),
        "z": z,
        "se": se,
    }


def main():
    rng = np.random.default_rng(0)
    x_np = np.sort(rng.random(N_TOTAL // D))
    y_np = [np.sin(6 * x_np) + 0.3 * rng.standard_normal(x_np.shape) for _ in range(D)]

    model = build_reference_model(x_np)
    X_list = [torch.from_numpy(x_np).type(ref.TensorType) for _ in range(D)]
    Y_list = [torch.from_numpy(y).type(ref.TensorType) for y in y_np]

    params = params_from_reference(model)
    Z = jnp.asarray(np.linspace(0, 1, M), jnp.float64)
    x = jnp.asarray(np.concatenate([x_np] * D))
    y = jnp.asarray(np.concatenate(y_np))
    idx = jnp.asarray(np.concatenate([np.full_like(x_np, i) for i in range(D)]).astype(np.int32))

    report = {"setup": {"D": D, "M": M, "N": N_TOTAL, "hyperpars": HYPERPARS}}

    # ---- deterministic KLs: raw reference vs corrected vs ours -----------
    torch.random.manual_seed(0)
    raw1 = reference_terms(model, X_list, Y_list, 1, corrected_kl=False)
    torch.random.manual_seed(0)
    fix1 = reference_terms(model, X_list, Y_list, 1, corrected_kl=True)
    kl_v_exact, kl_U_exact = ours_exact_kl(params, Z)
    o1 = ours_terms(params, Z, x, y, idx, 1, jax.random.PRNGKey(0))

    # our ref_compat mode must match the RAW reference exactly (the quirk
    # reproduced bit-for-bit on the deterministic KLs)
    oc1 = ours_terms(params, Z, x, y, idx, 1, jax.random.PRNGKey(0), kl_mode="ref_compat")
    compat = {"kl_v": float(oc1["kl_v"][0]), "kl_U": float(oc1["kl_U"][0])}

    report["deterministic_kl"] = {
        "kl_v": {
            "reference_raw": raw1["kl_v"][0],
            "reference_corrected": fix1["kl_v"][0],
            "ours_exact_oracle": kl_v_exact,
            "ours_production": float(o1["kl_v"][0]),
            "corrected_vs_ours_exact_relerr": abs(fix1["kl_v"][0] - kl_v_exact)
            / max(abs(kl_v_exact), 1e-12),
            "raw_vs_true_ratio": raw1["kl_v"][0] / fix1["kl_v"][0],
            "ours_ref_compat": compat["kl_v"],
            "raw_vs_ours_ref_compat_relerr": abs(raw1["kl_v"][0] - compat["kl_v"])
            / max(abs(compat["kl_v"]), 1e-12),
        },
        "kl_U": {
            "reference_raw": raw1["kl_U"][0],
            "reference_corrected": fix1["kl_U"][0],
            "ours_exact_oracle": kl_U_exact,
            "ours_production": float(o1["kl_U"][0]),
            "corrected_vs_ours_exact_relerr": abs(fix1["kl_U"][0] - kl_U_exact)
            / max(abs(kl_U_exact), 1e-12),
            "raw_vs_true_ratio": raw1["kl_U"][0] / fix1["kl_U"][0],
            "ours_ref_compat": compat["kl_U"],
            "raw_vs_ours_ref_compat_relerr": abs(raw1["kl_U"][0] - compat["kl_U"])
            / max(abs(compat["kl_U"]), 1e-12),
        },
    }

    # ---- stochastic terms: MC-converged means ----------------------------
    # Headline: our ref_compat objective == the reference\'s ACTUAL objective
    # (quirk included), MC-verified on every stochastic term.  The default
    # (true/exact-KL) mode is also reported with its deltas — its recon term
    # must agree (same sampling distribution up to the factor-family choice),
    # its KLs differ by the documented exact-vs-jittered-family gap.
    S_REF, S_OURS = 1500, 20000
    torch.random.manual_seed(1)
    rr = reference_terms(model, X_list, Y_list, S_REF, corrected_kl=False)
    oc = ours_terms(params, Z, x, y, idx, S_OURS, jax.random.PRNGKey(1),
                    kl_mode="ref_compat")
    report["stochastic_raw_ref_vs_ours_ref_compat"] = [
        mc_compare(t, rr[t], oc[t]) for t in ("recon", "kl_W", "loss")
    ]
    o = ours_terms(params, Z, x, y, idx, S_OURS, jax.random.PRNGKey(1))
    report["stochastic_raw_ref_vs_ours_true"] = [
        mc_compare(t, rr[t], o[t]) for t in ("recon", "kl_W", "loss")
    ]
    torch.random.manual_seed(1)
    r = reference_terms(model, X_list, Y_list, S_REF, corrected_kl=True)
    report["stochastic_corrected_ref_vs_ours_true"] = [
        mc_compare(t, r[t], o[t]) for t in ("recon", "kl_W", "loss")
    ]

    # ---- gradient check: RAW reference vs our ref_compat mode ------------
    # (trajectory parity: same objective ⇒ same MC-mean gradients)
    S_G = 400
    torch.random.manual_seed(2)
    model.zero_grad()
    total = 0.0
    for _ in range(S_G):
        total = total + model.forward(X_list, Y_list)
    (total / S_G).backward()
    g_ref = {
        "sigma2_err_log": float(model.sigma2_err_log.grad),
        "mu_v_norm": float(model.mu_v.grad.norm()),
        "mu_W_norm": float(model.mu_W.grad.norm()),
    }

    def mean_loss(p, key):
        def one(k):
            lat = cnmgp._sample_latents(p, Z, x, k, JITTER, kl_mode="ref_compat")
            recon = cnmgp._reconstruction(p, lat, y, idx, jnp.ones_like(y))
            kls = cnmgp._kl_terms(p, lat, JITTER, "ref_compat")
            return -(N_TOTAL / x.shape[0] * recon - sum(kls))

        return jnp.mean(jax.vmap(one)(jax.random.split(key, S_G)))

    g_ours_tree = jax.grad(mean_loss)(params, jax.random.PRNGKey(7))
    g_ours = {
        "sigma2_err_log": float(g_ours_tree.sigma2_err_log),
        "mu_v_norm": float(jnp.linalg.norm(g_ours_tree.mu_v)),
        "mu_W_norm": float(jnp.linalg.norm(g_ours_tree.mu_W)),
    }
    report["gradients_raw_ref_vs_ours_ref_compat_MC"] = {
        "S": S_G,
        "reference": g_ref,
        "ours": g_ours,
        "note": "MC means over independent draws; agreement expected to a few %",
    }

    os.makedirs("results", exist_ok=True)
    with open("results/elbo_parity.json", "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps(report, indent=2, default=float))


if __name__ == "__main__":
    main()
