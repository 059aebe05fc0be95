"""ChEES-HMC: jittered fixed-length HMC with cross-chain adaptation.

The accelerator-native alternative to NUTS (Hoffman, Radul & Sountsov 2021,
"An Adaptive-MCMC Scheme for Setting Trajectory Lengths in Hamiltonian Monte
Carlo").  Where NUTS builds a per-chain dynamic tree — so vmapped chains run
in lockstep at the DEEPEST chain's tree each draw and the trajectory machinery
branches heavily — ChEES runs every chain for the SAME number of leapfrog
steps each iteration and adapts that shared trajectory length from
cross-chain statistics:

  - trajectory length t_i = h_i * T, with h_i a Halton-sequence jitter
    shared by all chains (quasi-random; breaks resonances);
  - T maximizes the ChEES criterion E[(‖q' - E q'‖² - ‖q - E q‖²)²] by
    Adam on log T, with the gradient estimated from the chains themselves;
  - step size: dual averaging on the cross-chain mean acceptance
    (optimal target 0.651 for fixed-length HMC);
  - diagonal mass matrix: pooled cross-chain variance of warmup draws.

Every cross-chain reduction goes through a single `_cmean` hook: `jnp.mean`
over the chain axis on one device, composed with `lax.pmean(axis_name)` when
the chain axis is sharded over a mesh (parallel/sharded_mcmc.py) — the
TPU-native design from SURVEY.md §5.8 where adaptation statistics ride ICI
collectives.

Bounded dispatches: every driver below runs the warmup/sampling scans in
host-chunked SEGMENTS of at most `max_iters_per_dispatch` iterations (the
segment function is jitted once; all chunks share the compile).  Multi-minute
single XLA dispatches have crashed the remote TPU worker (round-2 postmortem,
docs/DESIGN.md) — the monolithic path is therefore gone; "unbounded" is just
one large segment.  The Halton jitter and the RNG key schedule are
precomputed per run, so the chunked scan is bit-identical to a single scan
over the concatenated inputs.

The reference repo has no sampler at all (SURVEY.md §0, §2.4); this module
and infer/{hmc,nuts,smc}.py are the new-framework deliverables over the
logdensities library.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hmc import DualAveragingState, da_init, da_update

__all__ = [
    "CheesState",
    "CheesTuning",
    "CheesCarry",
    "run_chees",
    "chees_warmup",
    "chees_sample",
    "halton_sequence",
    "DEFAULT_ITERS_PER_DISPATCH",
]

# Default dispatch budget: ≤128 iterations × ≤max_num_steps leapfrogs per
# XLA dispatch.  At the 1024-chain/52-dim scale of
# results/chees_1024chains_1chip_tpu.json one 128-iteration segment executes
# in single-digit seconds on one chip; the ~24 ms axon dispatch overhead
# amortizes to <1%.
DEFAULT_ITERS_PER_DISPATCH = 128


def leapfrog_budget_chunk(num_chains, eps, log_T, max_num_steps, requested):
    """Iterations-per-dispatch cap honoring config.SAMPLER_LEAPFROG_BUDGET.

    ChEES trajectories are adapted, so the per-iteration leapfrog count is
    not known statically like NUTS' 2^max_depth; instead the CURRENT
    estimate (ceil(exp(log_T)/eps), clipped to max_num_steps) is used with
    2x headroom for mid-segment growth, re-evaluated before every dispatch
    (two replicated scalars fetched per segment — ~24 ms each, amortized).
    The result is quantized to a power of two so at most log2(requested)
    distinct segment shapes ever compile."""
    from ..config import SAMPLER_LEAPFROG_BUDGET

    steps = min(max(int(np.ceil(np.exp(log_T) / max(eps, 1e-30))), 1), int(max_num_steps))
    cap = max(int(SAMPLER_LEAPFROG_BUDGET) // max(2 * num_chains * steps, 1), 1)
    cap = 1 << max(cap.bit_length() - 1, 0)  # round down to a power of two
    if requested is None or requested <= 0:
        return cap
    return max(min(int(requested), cap), 1)


def _budget_chunk_fn(num_chains, max_num_steps, requested):
    """chunk_fn(carry) for `_run_segments`: adaptive leapfrog-budget cap."""

    def chunk_fn(carry):
        return leapfrog_budget_chunk(
            num_chains,
            float(np.exp(np.asarray(carry.da.log_eps))),
            float(np.asarray(carry.log_T)),
            max_num_steps,
            requested,
        )

    return chunk_fn


def halton_sequence(n: int, offset: int = 0) -> np.ndarray:
    """Points offset..offset+n of the base-2 Halton (van der Corput) sequence
    in (0, 1): bit-reversed binary fractions — the standard quasi-random
    trajectory jitter for ChEES."""
    out = np.zeros(n)
    for i in range(n):
        f, r, k = 0.5, 0.0, offset + i + 1
        while k > 0:
            r += f * (k & 1)
            k >>= 1
            f *= 0.5
        out[i] = r
    return out


class CheesState(NamedTuple):
    position: jax.Array  # (C, dim)
    log_prob: jax.Array  # (C,)
    grad: jax.Array  # (C, dim)


class CheesTuning(NamedTuple):
    """Adapted sampler constants — returned by `chees_warmup`, consumed by
    `chees_sample`.  A plain pytree: checkpoint it with utils.checkpoint to
    resume sampling across processes."""

    step_size: jax.Array  # ()
    log_traj_length: jax.Array  # ()
    inv_mass: jax.Array  # (dim,)


class _AdamState(NamedTuple):
    m: jax.Array
    v: jax.Array
    step: jax.Array


class CheesCarry(NamedTuple):
    """Scan carry of the adaptation loop.  Under `shard_map` every leaf is
    REPLICATED except `state` (sharded over the chain axis): the Welford
    moments m1/m2 accumulate cross-chain (pmean'd) means, not per-shard
    sums — which is what lets segments stream through shard_map with clean
    out_specs."""

    state: CheesState
    da: DualAveragingState
    adam: _AdamState
    log_T: jax.Array  # ()
    inv_mass: jax.Array  # (dim,)
    m1: jax.Array  # (dim,) running sum over window iters of cmean(q)
    m2: jax.Array  # (dim,) running sum of cmean(q**2)
    cnt: jax.Array  # () window iterations accumulated


def _adam_update(s: _AdamState, g, lr=0.025, b1=0.9, b2=0.999, eps=1e-8):
    step = s.step + 1.0
    m = b1 * s.m + (1.0 - b1) * g
    v = b2 * s.v + (1.0 - b2) * g * g
    mhat = m / (1.0 - b1**step)
    vhat = v / (1.0 - b2**step)
    return _AdamState(m, v, step), lr * mhat / (jnp.sqrt(vhat) + eps)


def _chees_kernel(
    log_prob_fn,
    state: CheesState,
    key,
    eps,
    traj_len,
    inv_mass,
    max_num_steps,
    cmean,
):
    """One joint transition of all chains: `n = ceil(traj_len/eps)` leapfrog
    steps (a shared scalar — chains never diverge), per-chain MH correction,
    and the cross-chain ChEES gradient for the trajectory-length adaptation.
    """
    C, dim = state.position.shape
    dtype = state.position.dtype
    k_mom, k_acc = jax.random.split(key)

    sd = jnp.sqrt(1.0 / inv_mass)
    # the +0*position tie keeps the while_loop carry's varying-axis type
    # consistent under shard_map (noise from a replicated key is otherwise
    # typed replicated; see the same idiom in infer/nuts.py)
    p0 = sd[None, :] * jax.random.normal(k_mom, (C, dim), dtype) + 0.0 * state.position

    num_steps = jnp.clip(
        jnp.ceil(traj_len / eps).astype(jnp.int32), 1, max_num_steps
    )

    grad_all = jax.vmap(jax.value_and_grad(log_prob_fn))

    def body(carry):
        i, q, p, g, lp = carry
        p_half = p + 0.5 * eps * g
        q = q + eps * (inv_mass[None, :] * p_half)
        lp, g = grad_all(q)
        p = p_half + 0.5 * eps * g
        return (i + 1, q, p, g, lp)

    def cond(carry):
        return carry[0] < num_steps

    zero_i = jnp.int32(0)
    _, q1, p1, g1, lp1 = jax.lax.while_loop(
        cond, body, (zero_i, state.position, p0, state.grad, state.log_prob)
    )

    ke0 = 0.5 * jnp.sum(inv_mass[None, :] * p0**2, axis=-1)
    ke1 = 0.5 * jnp.sum(inv_mass[None, :] * p1**2, axis=-1)
    log_ratio = (lp1 - ke1) - (state.log_prob - ke0)
    log_ratio = jnp.where(jnp.isfinite(log_ratio), log_ratio, -jnp.inf)
    accept_prob = jnp.minimum(1.0, jnp.exp(log_ratio))
    accept = (
        jax.random.uniform(k_acc, (C,), dtype=dtype) < accept_prob
    )

    new_state = CheesState(
        position=jnp.where(accept[:, None], q1, state.position),
        log_prob=jnp.where(accept, lp1, state.log_prob),
        grad=jnp.where(accept[:, None], g1, state.grad),
    )

    # --- ChEES criterion gradient wrt the trajectory length ---------------
    # d/dt E[(‖q'-q̄'‖² - ‖q-q̄‖²)²] ∝ E[(‖dq'‖² - ‖dq‖²) · dq'ᵀ v'], with the
    # expectation estimated across chains weighted by acceptance.
    dq1 = q1 - cmean(q1)[None, :]
    dq0 = state.position - cmean(state.position)[None, :]
    v1 = inv_mass[None, :] * p1
    per_chain = (
        jnp.sum(dq1 * dq1, -1) - jnp.sum(dq0 * dq0, -1)
    ) * jnp.sum(dq1 * v1, -1)
    w = jnp.where(jnp.isfinite(per_chain), accept_prob, 0.0)
    per_chain = jnp.where(jnp.isfinite(per_chain), per_chain, 0.0)
    chees_grad_t = cmean(w * per_chain) / jnp.maximum(cmean(w), 1e-10)

    mean_accept = cmean(accept_prob)
    return new_state, accept_prob, mean_accept, chees_grad_t, num_steps


def _make_cmean(axis_name):
    if axis_name is None:
        def cmean(x):
            return jnp.mean(x, axis=0)
    else:
        def cmean(x):
            return jax.lax.pmean(jnp.mean(x, axis=0), axis_name)
    return cmean


def _fold_shard_key(key, axis_name):
    """Distinct noise per shard (a replicated key would duplicate the
    momentum draws on every device); adaptation stays consistent because
    every cross-chain statistic goes through pmean."""
    if axis_name is None:
        return key
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))


def make_phase(log_prob_fn, cmean, max_num_steps, target_accept, adam_lr, adapt):
    """Scan body over (halton, key, in_window) inputs with a CheesCarry.

    Exposed (used by parallel/sharded_mcmc.py to build shard_mapped
    segments); prefer the chees_warmup/chees_sample drivers elsewhere.
    """

    def phase_body(carry: CheesCarry, inp):
        h, k, in_window = inp
        eps = jnp.exp(carry.da.log_eps)
        traj = h * jnp.exp(carry.log_T)
        st, aps, mean_acc, chees_g, nsteps = _chees_kernel(
            log_prob_fn, carry.state, k, eps, traj, carry.inv_mass,
            max_num_steps, cmean,
        )
        da, adam, log_T = carry.da, carry.adam, carry.log_T
        m1, m2, cnt = carry.m1, carry.m2, carry.cnt
        if adapt:
            da = da_update(da, mean_acc, target_accept)
            # chain rule through t = h e^{logT}: dt/dlogT = t
            adam, delta = _adam_update(adam, -chees_g * traj, lr=adam_lr)
            log_T = log_T - delta  # Adam minimizes; flip for ascent
            # keep the trajectory reachable under the step-size cap
            log_T = jnp.clip(
                log_T,
                da.log_eps - 2.0,
                da.log_eps + jnp.log(float(max_num_steps)),
            )
            # cross-chain (replicated) Welford moments for the mass matrix
            m1 = m1 + jnp.where(in_window, cmean(st.position), 0.0)
            m2 = m2 + jnp.where(in_window, cmean(st.position**2), 0.0)
            cnt = cnt + jnp.where(in_window, 1.0, 0.0)
        new_carry = CheesCarry(st, da, adam, log_T, carry.inv_mass, m1, m2, cnt)
        if adapt:
            # warmup: draws are discarded — emit only the acceptance stats
            # (materializing (n, C, dim) warmup positions costs device
            # memory and, in the streamed drivers, a host transfer per
            # segment that halved 1024-chain throughput)
            return new_carry, aps
        return new_carry, (st.position, aps, st.log_prob, nsteps)

    return phase_body


def _in_trace(*trees) -> bool:
    """True when any leaf is a tracer — i.e. the caller wrapped us in jit /
    shard_map.  Host-side chunking is impossible there; we fall back to a
    single in-graph scan and the caller owns the dispatch structure."""
    return any(
        isinstance(leaf, jax.core.Tracer)
        for tree in trees
        for leaf in jax.tree_util.tree_leaves(tree)
    )


def _run_segments(segment_fn, carry, inputs, chunk, collect=False):
    """Drive `segment_fn(carry, inputs_slice) -> (carry, outs)` over
    host-sliced chunks of the per-iteration inputs.  One compile per
    distinct chunk size (+ ragged tail).  With collect=True the
    per-iteration outputs are pulled to host numpy after each dispatch and
    concatenated — the device never holds more than one chunk of draws.

    `chunk` may be an int/None (fixed size) or a callable
    `chunk_fn(carry) -> int` evaluated before every dispatch — used for
    the adaptive leapfrog-budget sizing (`leapfrog_budget_chunk`)."""
    n = int(np.shape(inputs[0])[0])
    outs_np = []
    start = 0
    while start < n:
        c = chunk(carry) if callable(chunk) else chunk
        c = (n - start) if (c is None or c <= 0) else min(int(c), n - start)
        sl = tuple(a[start : start + c] for a in inputs)
        carry, outs = segment_fn(carry, sl)
        start += c
        if collect:
            outs_np.append(jax.tree_util.tree_map(np.asarray, outs))
    if not collect:
        return carry, None
    merged = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *outs_np
    )
    return carry, merged


def init_carry(
    log_prob_fn,
    init_positions,
    init_step_size,
    init_traj_length,
    dtype,
) -> CheesCarry:
    """Initial CheesCarry (gradients evaluated once at the start points)."""
    lp0, g0 = jax.vmap(jax.value_and_grad(log_prob_fn))(init_positions)
    state = CheesState(init_positions, lp0, g0)
    dim = init_positions.shape[1]
    da = da_init(jnp.asarray(init_step_size, dtype))
    adam = _AdamState(
        m=jnp.zeros((), dtype), v=jnp.zeros((), dtype), step=jnp.zeros((), dtype)
    )
    log_T = jnp.log(jnp.asarray(init_traj_length, dtype))
    zeros_d = jnp.zeros(dim, dtype)
    return CheesCarry(
        state, da, adam, log_T, jnp.ones(dim, dtype), zeros_d, zeros_d,
        jnp.zeros((), dtype),
    )


def finish_mass(carry: CheesCarry, mass_adapt: bool) -> CheesCarry:
    """Between warmup phases: pooled mass matrix from the Welford moments,
    dual-averaging restart at the averaged step size.  Pure jnp on
    replicated leaves — a negligible dispatch."""
    if mass_adapt:
        mean = carry.m1 / jnp.maximum(carry.cnt, 1.0)
        var = carry.m2 / jnp.maximum(carry.cnt, 1.0) - mean**2
        inv_mass = jnp.where(var > 1e-10, var, 1.0)
    else:
        inv_mass = carry.inv_mass
    da = da_init(jnp.exp(carry.da.log_eps_bar))
    return CheesCarry(
        carry.state, da, carry.adam, carry.log_T, inv_mass,
        0.0 * carry.m1, 0.0 * carry.m2, 0.0 * carry.cnt,
    )


def chees_warmup(
    log_prob_fn: Callable,
    init_positions,
    key,
    num_warmup: int = 500,
    target_accept: float = 0.651,
    init_step_size: float = 0.1,
    init_traj_length: Optional[float] = None,
    max_num_steps: int = 1024,
    adam_lr: float = 0.025,
    mass_adapt: bool = True,
    axis_name: Optional[str] = None,
    max_iters_per_dispatch: Optional[int] = DEFAULT_ITERS_PER_DISPATCH,
):
    """Adaptation phases only.  Returns (CheesState, CheesTuning, info).

    Separated from sampling so drivers can checkpoint the tuned constants
    and stream draws with `chees_sample`.  Runs in segments of at most
    `max_iters_per_dispatch` iterations per XLA dispatch (None = one
    dispatch per phase); the segment boundary is invisible to the math —
    the key/Halton schedule is precomputed, so any chunking produces
    bit-identical results.
    """
    dtype = init_positions.dtype
    cmean = _make_cmean(axis_name)
    key = _fold_shard_key(key, axis_name)

    if init_traj_length is None:
        init_traj_length = float(init_step_size)

    n_re = max(num_warmup // 4, 1)
    halton = jnp.asarray(halton_sequence(num_warmup + n_re), dtype)
    k_warm, k_re = jax.random.split(key)

    carry = init_carry(
        log_prob_fn, init_positions, init_step_size, init_traj_length, dtype
    )

    phase_adapt = make_phase(
        log_prob_fn, cmean, max_num_steps, target_accept, adam_lr, True
    )

    def segment(c, inp):
        return jax.lax.scan(phase_adapt, c, inp)

    traced = axis_name is not None or _in_trace(init_positions, key)
    if traced:
        max_iters_per_dispatch = None  # single in-graph scan; caller owns it
    else:
        segment = jax.jit(segment)

    # ---- phase 1: joint adaptation under unit mass ------------------------
    half = num_warmup // 2
    in_w = jnp.arange(num_warmup) >= half
    keys = jax.random.split(k_warm, num_warmup)
    chunk_fn = _budget_chunk_fn(
        init_positions.shape[0], max_num_steps, max_iters_per_dispatch
    )
    if traced:
        carry, warm_aps = segment(carry, (halton[:num_warmup], keys, in_w))
    else:
        carry, warm_aps = _run_segments(
            segment,
            carry,
            (halton[:num_warmup], keys, in_w),
            chunk_fn,
            collect=True,
        )

    # ---- mass matrix from pooled cross-chain warmup variance --------------
    carry = finish_mass(carry, mass_adapt and num_warmup > 10)

    # ---- phase 2: short re-adaptation under the new metric ----------------
    keys = jax.random.split(k_re, n_re)
    phase2_in = (halton[num_warmup:], keys, jnp.zeros(n_re, bool))
    if traced:
        carry, _ = segment(carry, phase2_in)
    else:
        carry, _ = _run_segments(segment, carry, phase2_in, chunk_fn)
    tuning = CheesTuning(
        step_size=jnp.exp(carry.da.log_eps_bar),
        log_traj_length=carry.log_T,
        inv_mass=carry.inv_mass,
    )
    info = {
        "warmup_accept_mean": (
            jnp.mean(warm_aps) if traced else float(np.mean(warm_aps))
        ),
        "halton_offset": num_warmup + n_re,
    }
    return carry.state, tuning, info


def chees_sample(
    log_prob_fn: Callable,
    state: CheesState,
    tuning: CheesTuning,
    key,
    num_samples: int,
    halton_offset: int = 0,
    max_num_steps: int = 1024,
    axis_name: Optional[str] = None,
    max_iters_per_dispatch: Optional[int] = DEFAULT_ITERS_PER_DISPATCH,
):
    """Draw `num_samples` at fixed tuning, resuming the Halton jitter at
    `halton_offset`.  Returns (state, positions (S, C, dim), info).

    Draws stream to host per segment (the device holds at most one chunk),
    so arbitrarily long runs neither grow device memory nor lengthen any
    single dispatch.  Call repeatedly with advancing offsets (and fresh
    keys) to checkpoint between calls; chunking never changes the draws.
    """
    dtype = state.position.dtype
    cmean = _make_cmean(axis_name)
    key = _fold_shard_key(key, axis_name)

    halton = jnp.asarray(halton_sequence(num_samples, offset=halton_offset), dtype)
    phase_fixed = make_phase(log_prob_fn, cmean, max_num_steps, 0.651, 0.0, False)
    dim = state.position.shape[1]
    zeros_d = jnp.zeros(dim, dtype)
    carry = CheesCarry(
        state,
        da_init(tuning.step_size),
        _AdamState(
            m=jnp.zeros((), dtype), v=jnp.zeros((), dtype), step=jnp.zeros((), dtype)
        ),
        tuning.log_traj_length,
        tuning.inv_mass,
        zeros_d,
        zeros_d,
        jnp.zeros((), dtype),
    )

    def segment(c, inp):
        return jax.lax.scan(phase_fixed, c, inp)

    traced = axis_name is not None or _in_trace(state, tuning, key)
    keys = jax.random.split(key, num_samples)
    inputs = (halton, keys, jnp.zeros(num_samples, bool))
    if traced:
        carry, (positions, aps, lps, nsteps) = segment(carry, inputs)
    else:
        segment = jax.jit(segment)
        carry, (positions, aps, lps, nsteps) = _run_segments(
            segment,
            carry,
            inputs,
            _budget_chunk_fn(
                state.position.shape[0], max_num_steps, max_iters_per_dispatch
            ),
            collect=True,
        )
    info = {"accept_prob": aps, "log_prob": lps, "num_steps": nsteps}
    return carry.state, positions, info


def run_chees(
    log_prob_fn: Callable,
    init_positions,
    key,
    num_warmup: int = 500,
    num_samples: int = 1000,
    target_accept: float = 0.651,
    init_step_size: float = 0.1,
    init_traj_length: Optional[float] = None,
    max_num_steps: int = 1024,
    adam_lr: float = 0.025,
    mass_adapt: bool = True,
    axis_name: Optional[str] = None,
    max_iters_per_dispatch: Optional[int] = DEFAULT_ITERS_PER_DISPATCH,
):
    """ChEES-HMC over jointly-updated chains (warmup + sampling).

    init_positions: (C, dim) — the kernel is inherently multi-chain (the
    adaptation statistics are cross-chain expectations).  With
    `axis_name`, cross-chain reductions compose `pmean` over that mesh
    axis, so the same function runs chain-sharded (but then the caller owns
    the dispatch structure — see parallel/sharded_mcmc.run_chees_sharded,
    which rebuilds the segment loop with shard_map around each segment;
    this path must run with max_iters_per_dispatch=None inside a single
    trace).

    Every dispatch is bounded by `max_iters_per_dispatch` iterations
    (default 128; None = monolithic).  Chunking is bit-invisible.

    Returns (positions (num_samples, C, dim) numpy, info dict).
    """
    k_warm, k_main = jax.random.split(key)
    state, tuning, winfo = chees_warmup(
        log_prob_fn,
        init_positions,
        k_warm,
        num_warmup=num_warmup,
        target_accept=target_accept,
        init_step_size=init_step_size,
        init_traj_length=init_traj_length,
        max_num_steps=max_num_steps,
        adam_lr=adam_lr,
        mass_adapt=mass_adapt,
        axis_name=axis_name,
        max_iters_per_dispatch=max_iters_per_dispatch,
    )
    _, positions, info = chees_sample(
        log_prob_fn,
        state,
        tuning,
        k_main,
        num_samples,
        halton_offset=winfo["halton_offset"],
        max_num_steps=max_num_steps,
        axis_name=axis_name,
        max_iters_per_dispatch=max_iters_per_dispatch,
    )
    info = dict(info)
    info["step_size"] = tuning.step_size
    info["trajectory_length"] = jnp.exp(tuning.log_traj_length)
    info["inv_mass"] = tuning.inv_mass
    info["warmup_accept_mean"] = winfo["warmup_accept_mean"]
    return positions, info
