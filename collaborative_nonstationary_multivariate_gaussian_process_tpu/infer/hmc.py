"""Hamiltonian Monte Carlo with window adaptation (step size + diagonal mass).

The reference ships log-posteriors intended for an *external* HMC sampler
(SURVEY.md §0: `posterior_analysis.py` plots `pars_hist` from HMC runs that
are not in the repo).  This module supplies that sampler natively, TPU-first:

  - the transition kernel is a pure function (state, key) -> state, so
    `vmap` gives many chains per chip and `shard_map` shards chains across
    a device mesh (see parallel/);
  - leapfrog runs under `lax.scan` with static trajectory length;
  - warmup uses Stan-style dual averaging for the step size and a diagonal
    mass matrix from warmup sample variances, with cross-chain statistics
    reduced by `psum` when run inside `shard_map` (parallel/sharded_mcmc.py).

NUTS (dynamic trajectories) lives in infer/nuts.py; this fixed-length HMC is
the cheap workhorse and the mutation kernel for SMC.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "HMCState",
    "DualAveragingState",
    "WarmupState",
    "hmc_init",
    "hmc_kernel",
    "run_hmc",
    "find_reasonable_step_size",
]


class HMCState(NamedTuple):
    position: jax.Array  # (dim,)
    log_prob: jax.Array  # ()
    grad: jax.Array  # (dim,)


class DualAveragingState(NamedTuple):
    """Nesterov dual averaging targeting `target_accept` (Hoffman & Gelman
    2014, Algorithm 5)."""

    log_eps: jax.Array
    log_eps_bar: jax.Array
    h_bar: jax.Array
    mu: jax.Array
    step: jax.Array


def da_init(eps0):
    log_eps = jnp.log(eps0)
    return DualAveragingState(
        log_eps=log_eps,
        log_eps_bar=jnp.zeros_like(log_eps),
        h_bar=jnp.zeros_like(log_eps),
        mu=jnp.log(10.0) + log_eps,
        step=jnp.zeros_like(log_eps),
    )


def da_update(state: DualAveragingState, accept_prob, target=0.8):
    t0, gamma, kappa = 10.0, 0.05, 0.75
    step = state.step + 1.0
    eta_h = 1.0 / (step + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target - accept_prob)
    log_eps = state.mu - jnp.sqrt(step) / gamma * h_bar
    eta = step**-kappa
    log_eps_bar = eta * log_eps + (1.0 - eta) * state.log_eps_bar
    return DualAveragingState(log_eps, log_eps_bar, h_bar, state.mu, step)


def hmc_init(log_prob_fn: Callable, position) -> HMCState:
    lp, g = jax.value_and_grad(log_prob_fn)(position)
    return HMCState(position, lp, g)


def _leapfrog(log_prob_fn, state: HMCState, momentum, eps, inv_mass, num_steps):
    """Static-length leapfrog under lax.scan (MXU/VPU friendly)."""

    def body(carry, _):
        q, p, g = carry
        p_half = p + 0.5 * eps * g
        q_new = q + eps * inv_mass * p_half
        lp, g_new = jax.value_and_grad(log_prob_fn)(q_new)
        p_new = p_half + 0.5 * eps * g_new
        return (q_new, p_new, g_new), lp

    (q, p, g), lps = jax.lax.scan(
        body, (state.position, momentum, state.grad), None, length=num_steps
    )
    return q, p, g, lps[-1]


def hmc_kernel(
    log_prob_fn: Callable,
    state: HMCState,
    key,
    step_size,
    inv_mass,
    num_steps: int,
):
    """One Metropolis-adjusted HMC transition.  Returns (state, accept_prob)."""
    k_mom, k_acc = jax.random.split(key)
    # momentum ~ N(0, M) with M = 1/inv_mass (diagonal)
    sd = jnp.sqrt(1.0 / inv_mass)
    p0 = sd * jax.random.normal(k_mom, state.position.shape, state.position.dtype)

    q_new, p_new, g_new, lp_new = _leapfrog(
        log_prob_fn, state, p0, step_size, inv_mass, num_steps
    )
    ke0 = 0.5 * jnp.sum(inv_mass * p0**2)
    ke1 = 0.5 * jnp.sum(inv_mass * p_new**2)
    log_ratio = (lp_new - ke1) - (state.log_prob - ke0)
    log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_ratio))
    accept = jax.random.uniform(k_acc, dtype=accept_prob.dtype) < accept_prob
    new_state = HMCState(
        position=jnp.where(accept, q_new, state.position),
        log_prob=jnp.where(accept, lp_new, state.log_prob),
        grad=jnp.where(accept, g_new, state.grad),
    )
    return new_state, accept_prob


def find_reasonable_step_size(log_prob_fn, state: HMCState, key, inv_mass, init_eps=1.0):
    """Heuristic initial step size (Hoffman & Gelman 2014, Algorithm 4),
    expressed as a bounded lax.while_loop."""

    def one_step_accept(eps):
        _, ap = hmc_kernel(log_prob_fn, state, key, eps, inv_mass, 1)
        return ap

    ap0 = one_step_accept(init_eps)
    direction = jnp.where(ap0 > 0.5, 1.0, -1.0)

    def cond(carry):
        eps, it = carry
        ap = one_step_accept(eps)
        keep = jnp.where(direction > 0, ap > 0.5, ap < 0.5)
        return jnp.logical_and(keep, it < 50)

    def body(carry):
        eps, it = carry
        return eps * jnp.exp2(direction), it + 1

    # tie the initial eps to the (per-chain) state so the while_loop carry
    # has a consistent varying-axis type under shard_map
    eps0 = jnp.asarray(init_eps, state.position.dtype) + 0.0 * state.log_prob
    eps, _ = jax.lax.while_loop(cond, body, (eps0, 0))
    return eps


class WarmupState(NamedTuple):
    hmc: HMCState
    da: DualAveragingState
    mean: jax.Array
    m2: jax.Array
    count: jax.Array


def run_hmc(
    log_prob_fn: Callable,
    init_position,
    key,
    num_warmup: int = 500,
    num_samples: int = 1000,
    num_steps: int = 32,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
    thin: int = 1,
    mass_adapt: bool = True,
):
    """Single-chain HMC with warmup; wrap in vmap for multi-chain.

    Warmup: dual-averaging step size throughout + Welford variance of the
    second half of warmup for the diagonal mass matrix.  Returns
    (positions (num_samples, dim), info dict).
    """
    dtype = init_position.dtype
    dim = init_position.shape[0]
    state = hmc_init(log_prob_fn, init_position)
    inv_mass0 = jnp.ones(dim, dtype)

    k_find, k_warm, k_main = jax.random.split(key, 3)
    eps0 = find_reasonable_step_size(log_prob_fn, state, k_find, inv_mass0, init_step_size)

    half = num_warmup // 2

    def warm_body(carry, inp):
        ws, inv_mass = carry
        i, k = inp
        eps = jnp.exp(ws.da.log_eps)
        new_hmc, ap = hmc_kernel(log_prob_fn, ws.hmc, k, eps, inv_mass, num_steps)
        da = da_update(ws.da, ap, target_accept)
        # Welford accumulation over the 2nd half of warmup
        in_window = i >= half
        cnt = ws.count + jnp.where(in_window, 1.0, 0.0)
        delta = new_hmc.position - ws.mean
        mean = ws.mean + jnp.where(in_window, delta / jnp.maximum(cnt, 1.0), 0.0)
        m2 = ws.m2 + jnp.where(in_window, delta * (new_hmc.position - mean), 0.0)
        return (WarmupState(new_hmc, da, mean, m2, cnt), inv_mass), ap

    # zeros tied to the state keep the varying-axis type consistent when this
    # function runs inside shard_map (see shard_map scan-vma docs)
    ws0 = WarmupState(
        hmc=state,
        da=da_init(eps0),
        mean=0.0 * state.position,
        m2=0.0 * state.position,
        count=0.0 * state.log_prob,
    )
    keys = jax.random.split(k_warm, num_warmup)
    (ws, _), warm_aps = jax.lax.scan(
        warm_body, (ws0, inv_mass0), (jnp.arange(num_warmup), keys)
    )

    if mass_adapt and num_warmup > 10:
        var = ws.m2 / jnp.maximum(ws.count - 1.0, 1.0)
        var = jnp.where(var > 1e-10, var, 1.0)
        inv_mass = var  # inv mass = posterior variance estimate
    else:
        inv_mass = inv_mass0
    eps_final = jnp.exp(ws.da.log_eps_bar)

    # re-adapt the step size under the new mass matrix (the warmup step size
    # was tuned for unit mass and is generally far too large afterwards)
    n_readapt = max(num_warmup // 4, 1)

    def readapt_body(carry, k):
        st, da = carry
        st, ap = hmc_kernel(log_prob_fn, st, k, jnp.exp(da.log_eps), inv_mass, num_steps)
        return (st, da_update(da, ap, target_accept)), None

    k_warm2 = jax.random.fold_in(k_warm, 1)
    (state_r, da_r), _ = jax.lax.scan(
        readapt_body,
        (ws.hmc, da_init(eps_final)),
        jax.random.split(k_warm2, n_readapt),
    )
    ws = ws._replace(hmc=state_r)
    eps_final = jnp.exp(da_r.log_eps_bar)

    def main_body(hmc_state, k):
        ks = jax.random.split(k, thin)

        def inner(s, kk):
            s, ap = hmc_kernel(log_prob_fn, s, kk, eps_final, inv_mass, num_steps)
            return s, ap

        hmc_state, aps = jax.lax.scan(inner, hmc_state, ks)
        return hmc_state, (hmc_state.position, aps[-1], hmc_state.log_prob)

    keys = jax.random.split(k_main, num_samples)
    _, (positions, aps, lps) = jax.lax.scan(main_body, ws.hmc, keys)
    info = {
        "accept_prob": aps,
        "log_prob": lps,
        "step_size": eps_final,
        "inv_mass": inv_mass,
        "warmup_accept_mean": jnp.mean(warm_aps),
    }
    return positions, info
