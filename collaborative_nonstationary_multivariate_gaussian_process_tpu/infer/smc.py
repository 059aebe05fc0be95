"""Sequential Monte Carlo with adaptive tempering (model comparison).

The reference compares models with AIC/BIC/DIC over external-sampler
histories (SIM_code/Utility/model_validation.py:9-51).  SMC replaces that
with a *log marginal likelihood* estimate (BASELINE.json: "SMC for model
comparison"), TPU-first:

  - particles carried in a leading (P, dim) axis — `vmap` over particles;
    the explicit-collective variant (normalization / ESS / log-Z via
    `psum`/`pmax`, global systematic resampling via `all_gather`) is
    `parallel.sharded_smc.run_smc_sharded`;
  - adaptive temperature ladder: next beta chosen by bisection so the ESS
    of incremental weights stays at `ess_target` (all inside the jitted
    step, `lax.while_loop` bisection);
  - mutation: K HMC transitions at each temperature, step size tuned from
    the acceptance rate of the previous round.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .hmc import HMCState, hmc_kernel

__all__ = ["SMCState", "run_smc", "run_smc_staged", "log_marginal_likelihood"]


class SMCState(NamedTuple):
    positions: jax.Array  # (P, dim)
    log_like: jax.Array  # (P,) log-likelihood at particles
    beta: jax.Array  # () current inverse temperature
    log_z: jax.Array  # () accumulated log normalizing constant
    step_size: jax.Array  # () mutation step size
    num_stages: jax.Array  # ()


def _ess(log_w):
    log_w = log_w - jax.scipy.special.logsumexp(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * log_w))


def _find_next_beta(log_like, beta, ess_target_frac, num_particles):
    """Bisection for the largest dbeta in (0, 1-beta] with ESS >= target."""
    target = ess_target_frac * num_particles

    def ess_at(db):
        return _ess(db * log_like)

    full = 1.0 - beta

    def cond(carry):
        lo, hi, it = carry
        return jnp.logical_and(it < 50, (hi - lo) > 1e-6 * full)

    def body(carry):
        lo, hi, it = carry
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1

    # if even the full remaining jump keeps ESS above target, take it
    lo, hi, _ = jax.lax.while_loop(cond, body, (jnp.zeros_like(full), full, 0))
    db = jnp.where(ess_at(full) >= target, full, lo)
    db = jnp.maximum(db, 1e-6 * full)
    return beta + db


def _systematic_resample(key, log_w, num_particles):
    """Systematic resampling: returns parent indices (P,).

    Sorted-prefix-sum form — maps to cumsum + searchsorted, both
    XLA-friendly, and extends to the sharded all-to-all variant.
    """
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), dtype=w.dtype)
    us = (u0 + jnp.arange(num_particles, dtype=w.dtype)) / num_particles
    return jnp.searchsorted(cum, us, side="left").clip(0, num_particles - 1)


def run_smc(
    log_prior_fn: Callable,
    log_like_fn: Callable,
    init_positions,  # (P, dim) draws from the prior
    key,
    num_mutations: int = 5,
    num_leapfrog: int = 16,
    ess_target_frac: float = 0.5,
    max_stages: int = 100,
    init_step_size: float = 0.1,
    target_accept: float = 0.65,
):
    """Adaptive-tempering SMC from prior to posterior.

    Returns (final_positions, info) with info["log_z"] the log marginal
    likelihood estimate log p(y) = sum_t log E[w_t].
    """
    P, dim = init_positions.shape
    dtype = init_positions.dtype

    log_like0 = jax.vmap(log_like_fn)(init_positions)

    init = SMCState(
        positions=init_positions,
        log_like=log_like0,
        beta=jnp.zeros((), dtype),
        log_z=jnp.zeros((), dtype),
        step_size=jnp.asarray(init_step_size, dtype),
        num_stages=jnp.zeros((), jnp.int32),
    )

    def tempered_logprob(beta):
        def lp(q):
            return log_prior_fn(q) + beta * log_like_fn(q)

        return lp

    def cond(carry):
        state, _ = carry
        return jnp.logical_and(state.beta < 1.0, state.num_stages < max_stages)

    def body(carry):
        state, key = carry
        key, k_beta, k_res, k_mut = jax.random.split(key, 4)

        new_beta = _find_next_beta(state.log_like, state.beta, ess_target_frac, P)
        dbeta = new_beta - state.beta
        log_w = dbeta * state.log_like
        log_z_inc = jax.scipy.special.logsumexp(log_w) - jnp.log(P * 1.0)

        parents = _systematic_resample(k_res, log_w, P)
        positions = state.positions[parents]

        # --- mutation: K HMC steps at temperature new_beta ---------------
        lp_fn = tempered_logprob(new_beta)
        lps, grads = jax.vmap(jax.value_and_grad(lp_fn))(positions)
        hmc_states = HMCState(positions, lps, grads)

        def mutate(carry, k):
            hs, eps = carry
            keys = jax.random.split(k, P)
            hs, aps = jax.vmap(
                lambda s, kk: hmc_kernel(
                    lp_fn, s, kk, eps, jnp.ones(dim, dtype), num_leapfrog
                )
            )(hs, keys)
            # crude per-round step-size controller toward target_accept
            mean_ap = jnp.mean(aps)
            eps = eps * jnp.exp(0.5 * (mean_ap - target_accept))
            return (hs, eps), mean_ap

        (hmc_states, step_size), accepts = jax.lax.scan(
            mutate, (hmc_states, state.step_size), jax.random.split(k_mut, num_mutations)
        )

        new_log_like = jax.vmap(log_like_fn)(hmc_states.position)
        new_state = SMCState(
            positions=hmc_states.position,
            log_like=new_log_like,
            beta=new_beta,
            log_z=state.log_z + log_z_inc,
            step_size=step_size,
            num_stages=state.num_stages + 1,
        )
        return (new_state, key)

    final, _ = jax.lax.while_loop(cond, body, (init, key))
    info = {
        "log_z": final.log_z,
        "num_stages": final.num_stages,
        "final_step_size": final.step_size,
    }
    return final.positions, info


def run_smc_staged(
    log_prior_fn: Callable,
    log_like_fn: Callable,
    init_positions,
    key,
    num_mutations: int = 5,
    num_leapfrog: int = 16,
    ess_target_frac: float = 0.5,
    max_stages: int = 100,
    init_step_size: float = 0.1,
    target_accept: float = 0.65,
    progress: bool = False,
):
    """`run_smc` with ONE jitted dispatch per tempering stage (host loop).

    Identical math and RNG schedule to `run_smc` (the stage body is the
    same closure), but the adaptive while-loop runs on the host: at large
    particle counts a monolithic device loop can exceed the dispatch
    budget and crash the remote worker (config.DISPATCH_BUDGET_S).
    """
    P, dim = init_positions.shape
    dtype = init_positions.dtype
    log_like0 = jax.vmap(jax.jit(log_like_fn))(init_positions)
    state = SMCState(
        positions=init_positions,
        log_like=log_like0,
        beta=jnp.zeros((), dtype),
        log_z=jnp.zeros((), dtype),
        step_size=jnp.asarray(init_step_size, dtype),
        num_stages=jnp.zeros((), jnp.int32),
    )

    def tempered_logprob(beta):
        def lp(q):
            return log_prior_fn(q) + beta * log_like_fn(q)

        return lp

    @jax.jit
    def stage(state, key):
        key, k_beta, k_res, k_mut = jax.random.split(key, 4)
        new_beta = _find_next_beta(state.log_like, state.beta, ess_target_frac, P)
        dbeta = new_beta - state.beta
        log_w = dbeta * state.log_like
        log_z_inc = jax.scipy.special.logsumexp(log_w) - jnp.log(P * 1.0)
        parents = _systematic_resample(k_res, log_w, P)
        positions = state.positions[parents]
        lp_fn = tempered_logprob(new_beta)
        lps, grads = jax.vmap(jax.value_and_grad(lp_fn))(positions)
        hmc_states = HMCState(positions, lps, grads)

        def mutate(carry, k):
            hs, eps = carry
            keys = jax.random.split(k, P)
            hs, aps = jax.vmap(
                lambda st, kk: hmc_kernel(
                    lp_fn, st, kk, eps, jnp.ones(dim, dtype), num_leapfrog
                )
            )(hs, keys)
            mean_ap = jnp.mean(aps)
            eps = eps * jnp.exp(0.5 * (mean_ap - target_accept))
            return (hs, eps), mean_ap

        (hmc_states, step_size), _ = jax.lax.scan(
            mutate, (hmc_states, state.step_size), jax.random.split(k_mut, num_mutations)
        )
        new_log_like = jax.vmap(log_like_fn)(hmc_states.position)
        return (
            SMCState(
                positions=hmc_states.position,
                log_like=new_log_like,
                beta=new_beta,
                log_z=state.log_z + log_z_inc,
                step_size=step_size,
                num_stages=state.num_stages + 1,
            ),
            key,
        )

    n = 0
    while float(state.beta) < 1.0 and n < max_stages:
        state, key = stage(state, key)
        n += 1
        if progress:
            print(f"smc stage {n}: beta={float(state.beta):.4f}", flush=True)
    info = {
        "log_z": state.log_z,
        "num_stages": state.num_stages,
        "final_step_size": state.step_size,
    }
    return state.positions, info


def log_marginal_likelihood(
    log_prior_fn, log_like_fn, prior_sampler, key, num_particles=512, **smc_kwargs
):
    """Convenience: sample the prior, run SMC, return log Z."""
    k_init, k_smc = jax.random.split(key)
    init = prior_sampler(k_init, num_particles)
    _, info = run_smc(log_prior_fn, log_like_fn, init, k_smc, **smc_kwargs)
    return info["log_z"]
