"""Particle-sharded Sequential Monte Carlo over a device mesh.

The single-device sampler (`infer/smc.py`) carries particles in a leading
(P, dim) axis; here that axis shards over the mesh "chain" axis via
`shard_map`, with the cross-particle statistics expressed as explicit
collectives (SURVEY.md §2.4, §5.8 — the distributed layer the reference
lacks entirely):

  - weight normalization / log-Z increments / ESS: `psum`/`pmax`
    reductions (a numerically-safe distributed logsumexp);
  - the adaptive-tempering bisection runs identically on every device from
    those global reductions, so all shards walk the same beta ladder;
  - systematic resampling is global: local weights are `all_gather`ed
    ((P,) scalars — bytes, not positions), every device computes the same
    global cumulative weights and u0, and each device resolves the parent
    indices for *its* slots only.  Parent positions then move in one
    (P, dim) `all_gather`.  At this model family's scales (P <= 4096,
    dim <= a few thousand) that gather is <= a few MB over ICI per
    tempering stage — negligible against the K x P HMC-mutation FLOPs.
    (The gather-free sorted-prefix-sum + all_to_all scheme of SURVEY §7.3
    only pays off when P*dim*4 bytes approaches HBM scale.)
  - mutation (K HMC transitions) is embarrassingly parallel per particle;
    the step-size controller adapts from the *global* mean acceptance via
    `psum`, so every shard mutates with the same step size.

Replaces the reference's AIC/BIC/DIC model comparison
(SIM_code/Utility/model_validation.py:9-51) with a pod-scale log marginal
likelihood estimate.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..infer.hmc import HMCState, hmc_kernel
from .mesh import CHAIN_AXIS

__all__ = ["run_smc_sharded"]


def _global_logsumexp(x, axis_name):
    """logsumexp over a vector sharded along `axis_name` (x is the local
    block).  pmax keeps the shift finite when a shard holds only -inf."""
    m = jax.lax.pmax(jnp.max(x), axis_name)
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    return m + jnp.log(jax.lax.psum(jnp.sum(jnp.exp(x - m)), axis_name))


def _global_ess(log_w, axis_name):
    """ESS = (sum w)^2 / sum w^2 of the globally-normalized weights."""
    return jnp.exp(
        2.0 * _global_logsumexp(log_w, axis_name)
        - _global_logsumexp(2.0 * log_w, axis_name)
    )


def _find_next_beta_global(log_like, beta, ess_target_frac, num_particles, axis_name):
    """Same bisection as infer/smc._find_next_beta, with the ESS a global
    reduction; every device computes the identical ladder step."""
    target = ess_target_frac * num_particles

    def ess_at(db):
        return _global_ess(db * log_like, axis_name)

    full = 1.0 - beta

    def cond(carry):
        lo, hi, it = carry
        return jnp.logical_and(it < 50, (hi - lo) > 1e-6 * full)

    def body(carry):
        lo, hi, it = carry
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1

    lo, hi, _ = jax.lax.while_loop(cond, body, (jnp.zeros_like(full), full, 0))
    db = jnp.where(ess_at(full) >= target, full, lo)
    db = jnp.maximum(db, 1e-6 * full)
    return beta + db


def _systematic_resample_sharded(key, log_w_local, positions_local, axis_name):
    """Global systematic resampling of a (P, dim) particle cloud sharded
    over `axis_name`.  Returns the new local block (P_local, dim).

    Weight vectors gather as (P,) scalars; every device computes the same
    global cumsum and stratified u's, resolves parents for its own slot
    range, then pulls parent rows out of one positions all_gather.
    """
    p_local = log_w_local.shape[0]
    r = jax.lax.axis_index(axis_name)

    log_w = jax.lax.all_gather(log_w_local, axis_name).reshape(-1)  # (P,)
    num_particles = log_w.shape[0]
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), dtype=w.dtype)  # same key ⇒ same u0 everywhere
    slots = r * p_local + jnp.arange(p_local, dtype=jnp.int32)
    us = (u0 + slots.astype(w.dtype)) / num_particles
    parents = jnp.searchsorted(cum, us, side="left").clip(0, num_particles - 1)

    all_pos = jax.lax.all_gather(positions_local, axis_name)  # (S, P_local, dim)
    all_pos = all_pos.reshape(num_particles, positions_local.shape[-1])
    return all_pos[parents]


def run_smc_sharded(
    log_prior_fn: Callable,
    log_like_fn: Callable,
    init_positions,  # (P, dim) prior draws; P % mesh-chain-size == 0
    key,
    mesh: Mesh,
    num_mutations: int = 5,
    num_leapfrog: int = 16,
    ess_target_frac: float = 0.5,
    max_stages: int = 100,
    init_step_size: float = 0.1,
    target_accept: float = 0.65,
):
    """Adaptive-tempering SMC with particles sharded over the mesh chain
    axis.  Same algorithm/returns as `infer.smc.run_smc` (final positions
    (P, dim) + info with the log marginal likelihood `log_z`); collectives
    as per the module docstring.
    """
    num_particles, dim = init_positions.shape
    dtype = init_positions.dtype
    n_shards = mesh.shape[CHAIN_AXIS]
    assert num_particles % n_shards == 0, (num_particles, n_shards)

    def block(pos_local, key):
        # pos_local: (P/n_shards, dim); key: replicated — every device walks
        # the identical ladder/u0/step-size trajectory by construction.
        p_local = pos_local.shape[0]
        r = jax.lax.axis_index(CHAIN_AXIS)
        log_like0 = jax.vmap(log_like_fn)(pos_local)

        init = (
            pos_local,
            log_like0,
            jnp.zeros((), dtype),  # beta
            jnp.zeros((), dtype),  # log_z
            jnp.asarray(init_step_size, dtype),
            jnp.zeros((), jnp.int32),  # num_stages
            key,
        )

        def cond(carry):
            _, _, beta, _, _, stages, _ = carry
            return jnp.logical_and(beta < 1.0, stages < max_stages)

        def body(carry):
            pos, log_like, beta, log_z, eps, stages, key = carry
            key, k_res, k_mut = jax.random.split(key, 3)

            new_beta = _find_next_beta_global(
                log_like, beta, ess_target_frac, num_particles, CHAIN_AXIS
            )
            log_w = (new_beta - beta) * log_like
            log_z_inc = _global_logsumexp(log_w, CHAIN_AXIS) - jnp.log(
                jnp.asarray(num_particles, dtype)
            )

            pos = _systematic_resample_sharded(k_res, log_w, pos, CHAIN_AXIS)

            def lp_fn(q):
                return log_prior_fn(q) + new_beta * log_like_fn(q)

            lps, grads = jax.vmap(jax.value_and_grad(lp_fn))(pos)
            hmc_states = HMCState(pos, lps, grads)

            def mutate(carry, k):
                hs, eps = carry
                # distinct streams per shard, identical controller everywhere
                keys = jax.random.split(jax.random.fold_in(k, r), p_local)
                hs, aps = jax.vmap(
                    lambda s, kk: hmc_kernel(
                        lp_fn, s, kk, eps, jnp.ones(dim, dtype), num_leapfrog
                    )
                )(hs, keys)
                mean_ap = (
                    jax.lax.psum(jnp.sum(aps), CHAIN_AXIS) / num_particles
                )
                eps = eps * jnp.exp(0.5 * (mean_ap - target_accept))
                return (hs, eps), mean_ap

            (hmc_states, eps), _ = jax.lax.scan(
                mutate, (hmc_states, eps), jax.random.split(k_mut, num_mutations)
            )

            new_log_like = jax.vmap(log_like_fn)(hmc_states.position)
            return (
                hmc_states.position,
                new_log_like,
                new_beta,
                log_z + log_z_inc,
                eps,
                stages + 1,
                key,
            )

        pos, _, _, log_z, eps, stages, _ = jax.lax.while_loop(cond, body, init)
        # scalars are replicated across shards; tile to the local block so the
        # out_spec can stay P(CHAIN_AXIS) on every leaf (version-proof vs
        # shard_map replication checking) — callers read row 0.
        tile = lambda s: jnp.broadcast_to(s, (p_local,))
        return pos, tile(log_z), tile(stages), tile(eps)

    spec = P(CHAIN_AXIS)
    fn = shard_map(
        block,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(spec, spec, spec, spec),
    )
    positions, log_z, stages, eps = jax.jit(fn)(
        jax.device_put(init_positions, NamedSharding(mesh, spec)), key
    )
    info = {
        "log_z": log_z[0],
        "num_stages": stages[0],
        "final_step_size": eps[0],
    }
    return positions, info
