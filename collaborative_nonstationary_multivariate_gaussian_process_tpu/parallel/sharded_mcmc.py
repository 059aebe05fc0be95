"""Chain-parallel MCMC over a device mesh.

Chains shard over the mesh "chain" axis via `shard_map`; each device runs a
block of chains with `vmap`; cross-chain warmup statistics (step size /
mass-matrix moments) reduce with `psum` so every chain adapts from the *pod*
population, not just its local block.  This is the distributed-execution
layer the reference lacks entirely (SURVEY.md §2, §5.8) and targets the
BASELINE.json ≥80% host-scaling-efficiency goal.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..infer import hmc as hmc_mod
from ..infer import nuts as nuts_mod
from .mesh import CHAIN_AXIS

__all__ = [
    "run_nuts_sharded",
    "run_hmc_sharded",
    "run_chees_sharded",
    "potential_scale_reduction",
]


def run_nuts_sharded(
    log_prob_fn: Callable,
    init_positions,  # (num_chains, dim) — num_chains % mesh.chain == 0
    key,
    mesh: Mesh,
    num_warmup: int = 500,
    num_samples: int = 1000,
    max_depth: int = 10,
    target_accept: float = 0.8,
):
    """NUTS with chains sharded over the mesh chain axis.

    Returns positions (num_chains, num_samples, dim) + per-chain info.
    Warmup runs per-chain (embarrassingly parallel); use
    `potential_scale_reduction` (R-hat, psum-free post-hoc) for diagnostics.
    """
    num_chains, dim = init_positions.shape
    keys = jax.random.split(key, num_chains)

    def block(pos_block, key_block):
        # pos_block: (chains_per_dev, dim) — runs under vmap inside one device
        return jax.vmap(
            lambda p, k: nuts_mod.run_nuts(
                log_prob_fn,
                p,
                k,
                num_warmup=num_warmup,
                num_samples=num_samples,
                max_depth=max_depth,
                target_accept=target_accept,
            )
        )(pos_block, key_block)

    spec = P(CHAIN_AXIS)
    fn = shard_map(
        block,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
    )
    # dummy run to infer out treedef is unnecessary; shard_map handles pytrees
    positions, info = jax.jit(fn)(init_positions, keys)
    return positions, info


def run_hmc_sharded(
    log_prob_fn: Callable,
    init_positions,
    key,
    mesh: Mesh,
    num_warmup: int = 500,
    num_samples: int = 1000,
    num_steps: int = 32,
    target_accept: float = 0.8,
):
    num_chains, dim = init_positions.shape
    keys = jax.random.split(key, num_chains)

    def block(pos_block, key_block):
        return jax.vmap(
            lambda p, k: hmc_mod.run_hmc(
                log_prob_fn,
                p,
                k,
                num_warmup=num_warmup,
                num_samples=num_samples,
                num_steps=num_steps,
                target_accept=target_accept,
            )
        )(pos_block, key_block)

    spec = P(CHAIN_AXIS)
    fn = shard_map(
        block,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
    )
    positions, info = jax.jit(fn)(init_positions, keys)
    return positions, info


def run_chees_sharded(
    log_prob_fn: Callable,
    init_positions,  # (num_chains, dim) — num_chains % mesh.chain == 0
    key,
    mesh: Mesh,
    num_warmup: int = 500,
    num_samples: int = 1000,
    target_accept: float = 0.651,
    init_step_size: float = 0.1,
    **chees_kwargs,
):
    """ChEES-HMC with chains sharded over the mesh chain axis.

    Unlike NUTS/HMC (per-chain kernels vmapped inside each shard), ChEES is
    a JOINT kernel: every cross-chain adaptation statistic (mean acceptance,
    ChEES gradient, pooled mass-matrix moments) reduces over the full pod
    population via `pmean` on the chain axis — the collectives ride ICI.
    This is the sampler shape that actually *uses* the mesh during
    adaptation rather than only for throughput.

    Returns positions (num_chains, num_samples, dim) + info (trajectory
    length / step size replicated-identical across shards by construction).
    """
    from ..infer import chees as chees_mod

    num_chains, dim = init_positions.shape

    def block(pos_block, k):
        pos, info = chees_mod.run_chees(
            log_prob_fn,
            pos_block,
            k,
            num_warmup=num_warmup,
            num_samples=num_samples,
            target_accept=target_accept,
            init_step_size=init_step_size,
            axis_name=CHAIN_AXIS,
            **chees_kwargs,
        )
        # (S, C_local, dim) -> (C_local, S, dim) to match run_*_sharded
        info = dict(info)
        info["warmup_accept_mean"] = jax.lax.pmean(
            info["warmup_accept_mean"], CHAIN_AXIS
        )
        return jnp.swapaxes(pos, 0, 1), info

    spec = P(CHAIN_AXIS)
    fn = shard_map(
        block,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(
            spec,
            {
                "accept_prob": P(None, CHAIN_AXIS),
                "log_prob": P(None, CHAIN_AXIS),
                "num_steps": P(),
                "step_size": P(),
                "trajectory_length": P(),
                "inv_mass": P(),
                "warmup_accept_mean": P(),
            },
        ),
    )
    positions, info = jax.jit(fn)(init_positions, key)
    return positions, info


def effective_sample_size(chains_samples):
    """ESS via the autocorrelation method (Geyer initial positive sequence,
    FFT-based), over (num_chains, num_samples, dim) draws.  Returns (dim,)."""
    x = jnp.asarray(chains_samples)
    c, n, d = x.shape
    x = x - jnp.mean(x, axis=1, keepdims=True)
    # autocovariance per chain/dim via FFT
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = jnp.fft.rfft(x, n=nfft, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=1)[:, :n, :].real / n
    rho = jnp.mean(acov, axis=0) / jnp.maximum(jnp.mean(acov[:, 0, :], axis=0), 1e-30)
    # Geyer: sum pairs while positive
    n_pairs = (n - 1) // 2
    pair = rho[1 : 1 + 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)  # (P, d)
    positive = jnp.cumprod(pair > 0, axis=0).astype(rho.dtype)
    tau = 1.0 + 2.0 * jnp.sum(pair * positive, axis=0)
    return c * n / jnp.maximum(tau, 1.0)


def potential_scale_reduction(chains_samples):
    """Split R-hat over (num_chains, num_samples, dim) draws."""
    c, n, d = chains_samples.shape
    half = n // 2
    x = jnp.concatenate(
        [chains_samples[:, :half, :], chains_samples[:, half : 2 * half, :]], axis=0
    )  # (2c, half, d)
    m, nn = x.shape[0], x.shape[1]
    chain_means = jnp.mean(x, axis=1)  # (m, d)
    chain_vars = jnp.var(x, axis=1, ddof=1)  # (m, d)
    W = jnp.mean(chain_vars, axis=0)
    B = nn * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = (nn - 1) / nn * W + B / nn
    return jnp.sqrt(var_plus / W)
