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
    init_traj_length=None,
    max_num_steps: int = 1024,
    adam_lr: float = 0.025,
    mass_adapt: bool = True,
    max_iters_per_dispatch=None,
):
    """ChEES-HMC with chains sharded over the mesh chain axis.

    Unlike NUTS/HMC (per-chain kernels vmapped inside each shard), ChEES is
    a JOINT kernel: every cross-chain adaptation statistic (mean acceptance,
    ChEES gradient, pooled mass-matrix moments) reduces over the full pod
    population via `pmean` on the chain axis — the collectives ride ICI.
    This is the sampler shape that actually *uses* the mesh during
    adaptation rather than only for throughput.

    The run is driven as host-chunked shard_mapped SEGMENTS of at most
    `max_iters_per_dispatch` iterations (default
    infer.chees.DEFAULT_ITERS_PER_DISPATCH): one compile, many bounded
    dispatches — no multi-minute single dispatch at any chain count
    (round-2 postmortem, docs/DESIGN.md).  Sample draws stream to host per
    segment.

    Returns positions (num_chains, num_samples, dim) numpy + info
    (trajectory length / step size replicated-identical across shards by
    construction).
    """
    from ..infer import chees as chees_mod
    from ..infer.chees import CheesCarry, CheesState, CheesTuning

    if max_iters_per_dispatch is None:
        max_iters_per_dispatch = chees_mod.DEFAULT_ITERS_PER_DISPATCH

    num_chains, dim = init_positions.shape
    dtype = init_positions.dtype
    if init_traj_length is None:
        init_traj_length = float(init_step_size)

    cmean = chees_mod._make_cmean(CHAIN_AXIS)
    spec_c = P(CHAIN_AXIS)

    # ---- carry init (per-chain grads) under shard_map ---------------------
    def init_block(pos_block):
        return chees_mod.init_carry(
            log_prob_fn, pos_block, init_step_size, init_traj_length, dtype
        )

    # spec pytree: state sharded over chains, every adaptation leaf replicated
    carry_struct = jax.eval_shape(init_block, init_positions)
    carry_spec = jax.tree_util.tree_map(lambda _: P(), carry_struct)
    carry_spec = carry_spec._replace(state=CheesState(spec_c, spec_c, spec_c))

    carry = jax.jit(
        shard_map(init_block, mesh=mesh, in_specs=(spec_c,), out_specs=carry_spec)
    )(init_positions)

    # ---- shard_mapped segment builders ------------------------------------
    def make_segment(adapt):
        phase = chees_mod.make_phase(
            log_prob_fn, cmean, max_num_steps, target_accept, adam_lr, adapt
        )
        # warmup segments emit only acceptance probs; sampling segments emit
        # (positions, aps, log_probs, num_steps)
        out_spec = (
            P(None, CHAIN_AXIS)
            if adapt
            else (P(None, CHAIN_AXIS), P(None, CHAIN_AXIS), P(None, CHAIN_AXIS), P())
        )

        def seg_block(c, halton, keys, in_w):
            ax = jax.lax.axis_index(CHAIN_AXIS)
            keys_local = jax.vmap(lambda k: jax.random.fold_in(k, ax))(keys)
            return jax.lax.scan(phase, c, (halton, keys_local, in_w))

        return jax.jit(
            shard_map(
                seg_block,
                mesh=mesh,
                in_specs=(carry_spec, P(), P(), P()),
                out_specs=(carry_spec, out_spec),
            )
        )

    seg_adapt = make_segment(True)
    seg_fixed = make_segment(False)

    # iterations per dispatch respect config.SAMPLER_LEAPFROG_BUDGET via
    # the adaptive trajectory-length estimate (infer.chees); num_chains is
    # the GLOBAL count — conservative on a real pod where each worker only
    # executes its chain shard
    chunk_fn = chees_mod._budget_chunk_fn(
        num_chains, max_num_steps, max_iters_per_dispatch
    )

    def drive(seg, carry, inputs, collect=False):
        n = int(np.shape(inputs[0])[0])
        outs_np = []
        start = 0
        while start < n:
            chunk = min(chunk_fn(carry), n - start)
            sl = tuple(a[start : start + chunk] for a in inputs)
            carry, outs = seg(carry, *sl)
            start += chunk
            if collect:
                outs_np.append(jax.tree_util.tree_map(np.asarray, outs))
        if not collect:
            return carry, None
        return carry, jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0), *outs_np
        )

    n_re = max(num_warmup // 4, 1)
    halton = jnp.asarray(
        chees_mod.halton_sequence(num_warmup + n_re + num_samples), dtype
    )
    k_warm, k_re, k_main = jax.random.split(key, 3)

    # ---- warmup phase 1 ----------------------------------------------------
    in_w = jnp.arange(num_warmup) >= num_warmup // 2
    keys = jax.random.split(k_warm, num_warmup)
    carry, wouts = drive(
        seg_adapt, carry, (halton[:num_warmup], keys, in_w), collect=True
    )
    warm_accept_mean = float(np.mean(wouts))

    # ---- mass matrix + phase 2 re-adaptation ------------------------------
    carry = jax.tree_util.tree_map(jnp.asarray, carry)
    carry = chees_mod.finish_mass(carry, mass_adapt and num_warmup > 10)
    keys = jax.random.split(k_re, n_re)
    carry, _ = drive(
        seg_adapt,
        carry,
        (halton[num_warmup : num_warmup + n_re], keys, jnp.zeros(n_re, bool)),
    )

    tuning = CheesTuning(
        step_size=jnp.exp(carry.da.log_eps_bar),
        log_traj_length=carry.log_T,
        inv_mass=carry.inv_mass,
    )

    # ---- sampling at fixed tuning (streams to host per segment) -----------
    carry = CheesCarry(
        carry.state,
        hmc_mod.da_init(tuning.step_size),
        carry.adam,
        tuning.log_traj_length,
        tuning.inv_mass,
        0.0 * carry.m1,
        0.0 * carry.m2,
        0.0 * carry.cnt,
    )
    keys = jax.random.split(k_main, num_samples)
    carry, (positions, aps, lps, nsteps) = drive(
        seg_fixed,
        carry,
        (halton[num_warmup + n_re :], keys, jnp.zeros(num_samples, bool)),
        collect=True,
    )

    info = {
        "accept_prob": aps,  # (S, C)
        "log_prob": lps,  # (S, C)
        "num_steps": nsteps,  # (S,)
        "step_size": tuning.step_size,
        "trajectory_length": jnp.exp(tuning.log_traj_length),
        "inv_mass": tuning.inv_mass,
        "warmup_accept_mean": warm_accept_mean,
    }
    # (S, C, dim) -> (C, S, dim) to match run_*_sharded
    return np.swapaxes(positions, 0, 1), info


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
