"""No-U-Turn Sampler (NUTS) — iterative, jit-compatible, vmap/shard-ready.

Dynamic-trajectory HMC with multinomial progressive sampling (Betancourt
2017) and the iterative checkpoint U-turn scheme (Phan et al., iterative
NUTS), so the whole transition is `lax.while_loop`s with static state shapes:
no recursion, no dynamic shapes — exactly what XLA/TPU wants.

The reference repo has *no* sampler (SURVEY.md §0: HMC results are plotted
from external runs, SIM_code/Utility/posterior_analysis.py:142-174); this
module supplies the missing piece over models/logdensities.py densities.

Algorithm summary:
  outer loop: up to `max_depth` doublings; each doubling extends the
    trajectory by 2^depth leapfrog steps in a random direction.
  inner loop (subtree build): one leapfrog step per iteration; the U-turn
    condition of every *internal* binary-subtree is checked via O(max_depth)
    checkpoints — a span [a, n] of size 2^k completes when (n+1) % 2^k == 0,
    and its left-edge state lives in checkpoint slot popcount(a) (active
    span-starts always have distinct popcounts).
  progressive multinomial sampling: each visited leaf replaces the current
    proposal with probability exp(lw_leaf - logsumexp(lw_so_far)); merged
    subtrees use biased progressive sampling P(new) = min(1, W_new/W_old).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .hmc import (
    DualAveragingState,
    HMCState,
    da_init,
    da_update,
    find_reasonable_step_size,
    hmc_init,
)

__all__ = ["NUTSInfo", "nuts_kernel", "run_nuts", "run_nuts_multichain"]

MAX_DELTA_ENERGY = 1000.0


class NUTSInfo(NamedTuple):
    accept_prob: jax.Array  # mean accept prob over visited leaves
    num_steps: jax.Array  # total leapfrog steps this transition
    depth: jax.Array  # tree depth reached
    diverging: jax.Array  # bool
    step_size: jax.Array


def _popcount(n):
    """Population count for int32 scalars (SWAR)."""
    n = n - ((n >> 1) & 0x55555555)
    n = (n & 0x33333333) + ((n >> 2) & 0x33333333)
    n = (n + (n >> 4)) & 0x0F0F0F0F
    return (n * 0x01010101) >> 24


def _is_turning(v_sharp_left, v_sharp_right, rho):
    """Generalized U-turn: trajectory turning if either edge velocity points
    against the span momentum sum."""
    return jnp.logical_or(
        jnp.dot(v_sharp_left, rho) <= 0.0, jnp.dot(v_sharp_right, rho) <= 0.0
    )


def _vel(inv_mass, p):
    """Velocity M^{-1} p.  inv_mass: (dim,) diagonal or (dim, dim) dense
    (the "diag_e" / "dense_e" metrics; ndim is static at trace time)."""
    if inv_mass.ndim == 1:
        return inv_mass * p
    return inv_mass @ p


def _kinetic(inv_mass, p):
    return 0.5 * jnp.dot(p, _vel(inv_mass, p))


def _sample_momentum(key, inv_mass, dim, dtype):
    """p ~ N(0, M) with M = inv_mass^{-1}.

    Dense: with L = chol(inv_mass), p = L^{-T} z has cov L^{-T} L^{-1} = M.
    The (dim, dim) Cholesky runs once per transition — negligible next to
    the tree's leapfrog gradients.
    """
    z = jax.random.normal(key, (dim,), dtype)
    if inv_mass.ndim == 1:
        return z / jnp.sqrt(inv_mass)
    L = jnp.linalg.cholesky(inv_mass)
    return jax.scipy.linalg.solve_triangular(L, z, lower=True, trans=1)


class _TreeState(NamedTuple):
    # trajectory edges (positions, momenta, grads)
    q_left: jax.Array
    p_left: jax.Array
    g_left: jax.Array
    q_right: jax.Array
    p_right: jax.Array
    g_right: jax.Array
    # proposal
    q_prop: jax.Array
    lp_prop: jax.Array
    g_prop: jax.Array
    # trajectory-wide accumulators
    rho: jax.Array  # momentum sum over whole trajectory
    log_w: jax.Array  # logsumexp of leaf weights
    sum_accept: jax.Array
    num_leaves: jax.Array
    depth: jax.Array
    turning: jax.Array
    diverging: jax.Array


def nuts_kernel(
    log_prob_fn: Callable,
    state: HMCState,
    key,
    step_size,
    inv_mass,
    max_depth: int = 10,
):
    """One NUTS transition.  Returns (HMCState, NUTSInfo)."""
    dtype = state.position.dtype
    dim = state.position.shape[0]
    k_mom, k_dir, k_prop = jax.random.split(key, 3)

    p0 = _sample_momentum(k_mom, inv_mass, dim, dtype)
    energy0 = state.log_prob - _kinetic(inv_mass, p0)

    def leapfrog(q, p, g, eps):
        p_half = p + 0.5 * eps * g
        q_new = q + eps * _vel(inv_mass, p_half)
        lp, g_new = jax.value_and_grad(log_prob_fn)(q_new)
        p_new = p_half + 0.5 * eps * g_new
        return q_new, p_new, g_new, lp

    def build_subtree(key, q0, p0_, g0, eps, depth):
        """Integrate 2^depth steps from (q0,p0,g0); returns subtree summary.

        Checkpoint arrays have static size max_depth+1; slot index is
        popcount of the span-start leaf index.
        """
        num_leaves = jnp.int32(2) ** depth

        # NOTE: every carry leaf is tied to the (potentially device-varying)
        # chain state so while_loop carry types stay consistent when this
        # kernel runs inside vmap-under-shard_map (shard_map scan-vma rule).
        zero = 0.0 * q0[0]
        false_v = jnp.isnan(q0[0])  # varying False
        ck_q = jnp.zeros((max_depth + 1, dim), dtype) + zero
        ck_p = jnp.zeros((max_depth + 1, dim), dtype) + zero
        ck_psum = jnp.zeros((max_depth + 1, dim), dtype) + zero

        init = dict(
            n=jnp.int32(0),
            q=q0,
            p=p0_,
            g=g0,
            psum=0.0 * p0_,  # cumulative momentum sum incl. leaf n-1
            ck_q=ck_q,
            ck_p=ck_p,
            ck_psum=ck_psum,
            q_prop=q0,
            lp_prop=zero - jnp.inf,
            g_prop=g0,
            log_w=zero - jnp.inf,
            sum_accept=zero,
            turning=false_v,
            diverging=false_v,
            key=key,
        )

        def cond(c):
            return jnp.logical_and(
                c["n"] < num_leaves,
                jnp.logical_not(jnp.logical_or(c["turning"], c["diverging"])),
            )

        ck_iota = jnp.arange(max_depth + 1, dtype=jnp.int32)
        spans = jnp.int32(2) ** jnp.arange(1, max_depth + 1, dtype=jnp.int32)

        def body(c):
            n = c["n"]
            q, p, g, lp = leapfrog(c["q"], c["p"], c["g"], eps)
            energy = lp - _kinetic(inv_mass, p)
            delta = energy - energy0
            delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
            diverging = delta < -MAX_DELTA_ENERGY
            accept_p = jnp.minimum(1.0, jnp.exp(delta))

            # --- progressive multinomial proposal within subtree ----------
            log_w_new = jnp.logaddexp(c["log_w"], delta)
            key, k_sel = jax.random.split(c["key"])
            take = jnp.log(jax.random.uniform(k_sel, dtype=dtype)) < (delta - log_w_new)
            q_prop = jnp.where(take, q, c["q_prop"])
            lp_prop = jnp.where(take, lp, c["lp_prop"])
            g_prop = jnp.where(take, g, c["g_prop"])

            # --- checkpoint store (span starts are even leaf indices) -----
            # One-hot masked select instead of .at[slot].set: the slot index
            # is chain-varying, so under vmap (multi-chain) a dynamic-index
            # update lowers to a scatter — TPU scatters/gathers in the inner
            # leapfrog loop cost more than the log-density gradient itself.
            slot = _popcount(n)
            is_start = (n % 2) == 0
            wsel = (jnp.logical_and(ck_iota == slot, is_start))[:, None]
            ck_q = jnp.where(wsel, q[None, :], c["ck_q"])
            ck_p = jnp.where(wsel, p[None, :], c["ck_p"])
            ck_psum = jnp.where(wsel, c["psum"][None, :], c["ck_psum"])

            psum = c["psum"] + p

            # --- completed-span U-turn checks, all depths at once ---------
            # Checkpoint reads become one small matmul: onehots (K, S) @
            # ck (S, dim) — no chain-varying gathers.
            np1 = n + 1
            complete = jnp.logical_and(np1 % spans == 0, np1 >= spans)  # (K,)
            slots_a = _popcount(np1 - spans)  # (K,)
            onehots = (ck_iota[None, :] == slots_a[:, None]).astype(dtype)  # (K, S)
            C_psum = onehots @ ck_psum  # (K, dim)
            C_p = onehots @ ck_p  # (K, dim)
            rho_span = psum[None, :] - C_psum  # (K, dim)
            if inv_mass.ndim == 1:
                v_left = C_p * inv_mass[None, :]
            else:
                v_left = C_p @ inv_mass
            v_cur = _vel(inv_mass, p)
            turn_k = jnp.logical_or(
                jnp.sum(v_left * rho_span, axis=-1) <= 0.0,
                rho_span @ v_cur <= 0.0,
            )
            turning = jnp.logical_or(
                c["turning"], jnp.any(jnp.logical_and(complete, turn_k))
            )

            return dict(
                n=np1,
                q=q,
                p=p,
                g=g,
                psum=psum,
                ck_q=ck_q,
                ck_p=ck_p,
                ck_psum=ck_psum,
                q_prop=q_prop,
                lp_prop=lp_prop,
                g_prop=g_prop,
                log_w=log_w_new,
                sum_accept=c["sum_accept"] + accept_p,
                turning=turning,
                diverging=jnp.logical_or(c["diverging"], diverging),
                key=key,
            )

        c = jax.lax.while_loop(cond, body, init)
        return c

    # ---- outer doubling loop ---------------------------------------------
    zero_v = 0.0 * state.log_prob
    false_v = jnp.isnan(state.log_prob)
    init_tree = _TreeState(
        q_left=state.position,
        p_left=p0,
        g_left=state.grad,
        q_right=state.position,
        p_right=p0,
        g_right=state.grad,
        q_prop=state.position,
        lp_prop=state.log_prob,
        g_prop=state.grad,
        rho=p0,
        log_w=zero_v,  # initial point has weight exp(0)
        sum_accept=zero_v,
        num_leaves=jnp.int32(1),
        depth=jnp.int32(0),
        turning=false_v,
        diverging=false_v,
    )

    def out_cond(carry):
        tree, _ = carry
        return jnp.logical_and(
            tree.depth < max_depth,
            jnp.logical_not(jnp.logical_or(tree.turning, tree.diverging)),
        )

    def out_body(carry):
        tree, key = carry
        key, k_dir, k_sub, k_bias = jax.random.split(key, 4)
        go_right = jax.random.bernoulli(k_dir)
        eps = jnp.where(go_right, step_size, -step_size)
        q0 = jnp.where(go_right, tree.q_right, tree.q_left)
        p0_ = jnp.where(go_right, tree.p_right, tree.p_left)
        g0 = jnp.where(go_right, tree.g_right, tree.g_left)

        sub = build_subtree(k_sub, q0, p0_, g0, eps, tree.depth)

        sub_ok = jnp.logical_not(jnp.logical_or(sub["turning"], sub["diverging"]))

        # biased progressive sampling between old trajectory and new subtree
        log_ratio = sub["log_w"] - tree.log_w
        take_new = jnp.log(jax.random.uniform(k_bias, dtype=dtype)) < log_ratio
        take_new = jnp.logical_and(take_new, sub_ok)
        q_prop = jnp.where(take_new, sub["q_prop"], tree.q_prop)
        lp_prop = jnp.where(take_new, sub["lp_prop"], tree.lp_prop)
        g_prop = jnp.where(take_new, sub["g_prop"], tree.g_prop)

        # merge edges (subtree's last state becomes the new edge)
        q_edge, p_edge, g_edge = sub["q"], sub["p"], sub["g"]
        q_left = jnp.where(go_right, tree.q_left, q_edge)
        p_left = jnp.where(go_right, tree.p_left, p_edge)
        g_left = jnp.where(go_right, tree.g_left, g_edge)
        q_right = jnp.where(go_right, q_edge, tree.q_right)
        p_right = jnp.where(go_right, p_edge, tree.p_right)
        g_right = jnp.where(go_right, g_edge, tree.g_right)

        rho = tree.rho + sub["psum"]
        turning_total = _is_turning(_vel(inv_mass, p_left), _vel(inv_mass, p_right), rho)
        turning = jnp.logical_or(
            sub["turning"], jnp.logical_and(sub_ok, turning_total)
        )

        new_tree = _TreeState(
            q_left=q_left,
            p_left=p_left,
            g_left=g_left,
            q_right=q_right,
            p_right=p_right,
            g_right=g_right,
            q_prop=q_prop,
            lp_prop=lp_prop,
            g_prop=g_prop,
            rho=rho,
            log_w=jnp.logaddexp(tree.log_w, sub["log_w"]),
            sum_accept=tree.sum_accept + sub["sum_accept"],
            num_leaves=tree.num_leaves + jnp.int32(2) ** tree.depth,
            depth=tree.depth + 1,
            turning=turning,
            diverging=sub["diverging"],
        )
        return (new_tree, key)

    tree, _ = jax.lax.while_loop(out_cond, out_body, (init_tree, k_prop))

    new_state = HMCState(position=tree.q_prop, log_prob=tree.lp_prop, grad=tree.g_prop)
    n_lf = tree.num_leaves - 1
    info = NUTSInfo(
        accept_prob=tree.sum_accept / jnp.maximum(n_lf.astype(dtype), 1.0),
        num_steps=n_lf,
        depth=tree.depth,
        diverging=tree.diverging,
        step_size=step_size,
    )
    return new_state, info


def run_nuts(
    log_prob_fn: Callable,
    init_position,
    key,
    num_warmup: int = 500,
    num_samples: int = 1000,
    max_depth: int = 10,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
    mass_adapt: bool = True,
    dense_mass: bool = False,
):
    """Single-chain NUTS with dual-averaging + mass-matrix warmup.

    `dense_mass=False` adapts a diagonal metric from warmup variances
    ("diag_e"); `dense_mass=True` adapts the full warmup covariance with
    Stan-style shrinkage toward a scaled identity ("dense_e") — worth it
    when the (whitened) posterior keeps strong correlations that inflate
    NUTS tree depths.

    Wrap in `jax.vmap` over (init_position, key) for multi-chain on one
    device, and `shard_map` over a mesh "chain" axis for multi-device
    (see parallel/sharded_mcmc.py).  Returns (positions, info dict).
    """
    dtype = init_position.dtype
    dim = init_position.shape[0]
    state = hmc_init(log_prob_fn, init_position)
    inv_mass0 = jnp.ones(dim, dtype)

    k_find, k_warm, k_main = jax.random.split(key, 3)
    eps0 = find_reasonable_step_size(log_prob_fn, state, k_find, inv_mass0, init_step_size)

    half = num_warmup // 2

    def warm_body(carry, inp):
        st, da, mean, m2, cnt = carry
        i, k = inp
        eps = jnp.exp(da.log_eps)
        st, info = nuts_kernel(log_prob_fn, st, k, eps, inv_mass0, max_depth)
        da = da_update(da, info.accept_prob, target_accept)
        in_w = i >= half
        cnt = cnt + jnp.where(in_w, 1.0, 0.0)
        delta = st.position - mean
        mean = mean + jnp.where(in_w, delta / jnp.maximum(cnt, 1.0), 0.0)
        if dense_mass:
            # Welford covariance: M2 += outer(delta, x - mean_new)
            m2 = m2 + jnp.where(
                in_w, jnp.outer(delta, st.position - mean), 0.0
            )
        else:
            m2 = m2 + jnp.where(in_w, delta * (st.position - mean), 0.0)
        return (st, da, mean, m2, cnt), info.accept_prob

    # zeros tied to the state keep the varying-axis type consistent when this
    # function runs inside shard_map (see shard_map scan-vma docs)
    m2_0 = (
        0.0 * state.position[:, None] * state.position[None, :]
        if dense_mass
        else 0.0 * state.position
    )
    carry0 = (
        state,
        da_init(eps0),
        0.0 * state.position,
        m2_0,
        0.0 * state.log_prob,
    )
    keys = jax.random.split(k_warm, num_warmup)
    (state, da, mean, m2, cnt), warm_aps = jax.lax.scan(
        warm_body, carry0, (jnp.arange(num_warmup), keys)
    )

    if mass_adapt and num_warmup > 10:
        denom = jnp.maximum(cnt - 1.0, 1.0)
        if dense_mass:
            # Stan regularization: shrink toward a small identity
            cov = m2 / denom
            w = cnt / (cnt + 5.0)
            inv_mass = w * cov + (1e-3 * (1.0 - w)) * jnp.eye(dim, dtype=dtype)
        else:
            var = m2 / denom
            inv_mass = jnp.where(var > 1e-10, var, 1.0)
    else:
        inv_mass = inv_mass0 if not dense_mass else jnp.eye(dim, dtype=dtype)
    eps_final = jnp.exp(da.log_eps_bar)

    # short re-adaptation of step size under the new mass matrix
    n_readapt = max(num_warmup // 5, 1)

    def readapt_body(carry, k):
        st, da = carry
        eps = jnp.exp(da.log_eps)
        st, info = nuts_kernel(log_prob_fn, st, k, eps, inv_mass, max_depth)
        da = da_update(da, info.accept_prob, target_accept)
        return (st, da), None

    (state, da2), _ = jax.lax.scan(
        readapt_body,
        (state, da_init(eps_final)),
        jax.random.split(jax.random.fold_in(k_warm, 1), n_readapt),
    )
    eps_final = jnp.exp(da2.log_eps_bar)

    def main_body(st, k):
        st, info = nuts_kernel(log_prob_fn, st, k, eps_final, inv_mass, max_depth)
        return st, (st.position, info.accept_prob, st.log_prob, info.num_steps, info.diverging)

    keys = jax.random.split(k_main, num_samples)
    _, (positions, aps, lps, steps, divs) = jax.lax.scan(main_body, state, keys)
    info = {
        "accept_prob": aps,
        "log_prob": lps,
        "num_steps": steps,
        "diverging": divs,
        "step_size": eps_final,
        "inv_mass": inv_mass,
        "warmup_accept_mean": jnp.mean(warm_aps),
    }
    return positions, info


def run_nuts_multichain(
    log_prob_fn: Callable,
    inits,
    key,
    num_warmup: int = 500,
    num_samples: int = 1000,
    max_depth: int = 10,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
    mass_adapt: bool = True,
    dense_mass: bool = False,
    segment_iters: Optional[int] = None,
    progress: bool = False,
):
    """Vmapped multi-chain NUTS with host-chunked dispatch segments.

    Same algorithm as `run_nuts` (identity-metric warmup with Welford
    statistics, post-warmup mass estimate, short step-size re-adaptation,
    fixed-kernel sampling), restructured for chain counts where one
    monolithic scan would exceed the dispatch budget (multi-minute XLA
    dispatches have crashed the remote TPU worker — config.DISPATCH_
    BUDGET_S): every phase runs in jitted segments of `segment_iters`
    iterations, compiled once each.  The RNG schedule is precomputed per
    phase, so results are bit-identical for any `segment_iters`.

    `segment_iters=None` (default) sizes segments automatically from
    `config.SAMPLER_LEAPFROG_BUDGET`: the per-dispatch worst case is
    chains x iters x 2^max_depth leapfrogs, and exceeding ~1.6M of them
    crashed the remote worker in round 4 (docs/DESIGN.md §13).  An explicit
    `segment_iters` is honored but still CAPPED at the budget — chunking
    cannot change the draws, so the cap is always safe.

    inits: (C, dim).  Returns (positions (C, S, dim), info dict) with
    per-chain step sizes and mass matrices.
    """
    from ..config import SAMPLER_LEAPFROG_BUDGET

    C, dim = inits.shape
    dtype = inits.dtype
    seg_cap = max(int(SAMPLER_LEAPFROG_BUDGET) // max(C << max_depth, 1), 1)
    seg = seg_cap if segment_iters is None else min(max(int(segment_iters), 1), seg_cap)

    k_find, k_warm, k_re, k_main = jax.random.split(key, 4)
    inv0 = jnp.ones((dim,), dtype)

    def _key_grid(k, a, b):
        ks = jax.random.split(k, a * b)
        return ks.reshape((a, b) + ks.shape[1:])

    @jax.jit
    def init_all(qs, kf):
        st = jax.vmap(lambda q: hmc_init(log_prob_fn, q))(qs)
        eps0 = jax.vmap(
            lambda s, k: find_reasonable_step_size(log_prob_fn, s, k, inv0, init_step_size)
        )(st, jax.random.split(kf, C))
        return st, eps0

    state, eps0 = init_all(inits, k_find)

    total_warm = num_warmup
    half = total_warm // 2

    def _one_warm(cc, i, k):
        st, da, mean, m2, cnt = cc
        eps = jnp.exp(da.log_eps)
        st, info = nuts_kernel(log_prob_fn, st, k, eps, inv0, max_depth)
        da = da_update(da, info.accept_prob, target_accept)
        in_w = i >= half
        cnt = cnt + jnp.where(in_w, 1.0, 0.0)
        delta = st.position - mean
        mean = mean + jnp.where(in_w, delta / jnp.maximum(cnt, 1.0), 0.0)
        if dense_mass:
            m2 = m2 + jnp.where(in_w, jnp.outer(delta, st.position - mean), 0.0)
        else:
            m2 = m2 + jnp.where(in_w, delta * (st.position - mean), 0.0)
        return (st, da, mean, m2, cnt), info.accept_prob

    @jax.jit
    def warm_seg(carry, i0, keys):
        # segment length is the keys slice length (static at trace time):
        # the host loop may pass one smaller remainder slice — that single
        # extra compile buys bit-identical results for ANY segment_iters
        L = keys.shape[0]

        def body(c, inp):
            i, ks = inp
            c, aps = jax.vmap(lambda cc, k: _one_warm(cc, i, k))(c, ks)
            return c, jnp.mean(aps)

        return jax.lax.scan(body, carry, (i0 + jnp.arange(L), keys))

    m2_0 = (
        jnp.zeros((C, dim, dim), dtype) if dense_mass else jnp.zeros((C, dim), dtype)
    )
    carry = (
        state,
        jax.vmap(da_init)(eps0),
        jnp.zeros((C, dim), dtype),
        m2_0,
        jnp.zeros((C,), dtype),
    )
    warm_keys = _key_grid(k_warm, total_warm, C)
    warm_ap_sums = []
    n_wseg = -(-total_warm // seg)
    for si in range(n_wseg):
        lo, hi = si * seg, min((si + 1) * seg, total_warm)
        carry, aps = warm_seg(carry, jnp.asarray(lo), warm_keys[lo:hi])
        # per-iteration SUM so a ragged remainder segment isn't overweighted
        warm_ap_sums.append(jnp.sum(aps))
        if progress:
            print(f"warmup segment {si + 1}/{n_wseg}", flush=True)
    state, da, mean, m2, cnt = carry

    if mass_adapt and total_warm > 10:
        denom = jnp.maximum(cnt - 1.0, 1.0)
        if dense_mass:
            cov = m2 / denom[:, None, None]
            w = (cnt / (cnt + 5.0))[:, None, None]
            inv_mass = w * cov + (1e-3 * (1.0 - w)) * jnp.eye(dim, dtype=dtype)
        else:
            var = m2 / denom[:, None]
            inv_mass = jnp.where(var > 1e-10, var, 1.0)
    else:
        inv_mass = (
            jnp.tile(jnp.eye(dim, dtype=dtype), (C, 1, 1))
            if dense_mass
            else jnp.ones((C, dim), dtype)
        )
    eps_f = jnp.exp(da.log_eps_bar)

    n_readapt = max(total_warm // 5, 1)
    total_re = n_readapt

    @jax.jit
    def readapt_seg(st, da, im, keys):
        def body(c, ks):
            st, da = c
            def one(s, d, k, m):
                eps = jnp.exp(d.log_eps)
                s, info = nuts_kernel(log_prob_fn, s, k, eps, m, max_depth)
                d = da_update(d, info.accept_prob, target_accept)
                return s, d
            st, da = jax.vmap(one)(st, da, ks, im)
            return (st, da), None
        (st, da), _ = jax.lax.scan(body, (st, da), keys)
        return st, da

    da2 = jax.vmap(da_init)(eps_f)
    re_keys = _key_grid(k_re, total_re, C)
    for si in range(-(-total_re // seg)):
        lo, hi = si * seg, min((si + 1) * seg, total_re)
        state, da2 = readapt_seg(state, da2, inv_mass, re_keys[lo:hi])
    eps_final = jnp.exp(da2.log_eps_bar)

    n_mseg = -(-num_samples // seg)
    total_main = num_samples

    @jax.jit
    def main_seg(st, eps, im, keys):
        def body(s, ks):
            def one(s1, k, e, m):
                s1, info = nuts_kernel(log_prob_fn, s1, k, e, m, max_depth)
                return s1, (s1.position, info.accept_prob, s1.log_prob,
                            info.num_steps, info.diverging)
            s, outs = jax.vmap(one, in_axes=(0, 0, 0, 0))(s, ks, eps, im)
            return s, outs
        return jax.lax.scan(body, st, keys)

    main_keys = _key_grid(k_main, total_main, C)
    pos_chunks, ap_chunks, lp_chunks, ns_chunks, dv_chunks = [], [], [], [], []
    import numpy as _np

    for si in range(n_mseg):
        lo, hi = si * seg, min((si + 1) * seg, total_main)
        state, (pos, aps, lps, nst, dvs) = main_seg(
            state, eps_final, inv_mass, main_keys[lo:hi]
        )
        pos_chunks.append(_np.asarray(pos))
        ap_chunks.append(_np.asarray(aps))
        lp_chunks.append(_np.asarray(lps))
        ns_chunks.append(_np.asarray(nst))
        dv_chunks.append(_np.asarray(dvs))
        if progress:
            print(f"sampling segment {si + 1}/{n_mseg}", flush=True)

    positions = _np.concatenate(pos_chunks).transpose(1, 0, 2)  # (C, S, dim)
    info = {
        "accept_prob": _np.concatenate(ap_chunks).T,
        "log_prob": _np.concatenate(lp_chunks).T,
        "num_steps": _np.concatenate(ns_chunks).T,
        "diverging": _np.concatenate(dv_chunks).T,
        "step_size": _np.asarray(eps_final),
        "inv_mass": _np.asarray(inv_mass),
        "warmup_accept_mean": float(
            jnp.sum(jnp.stack(warm_ap_sums)) / total_warm
        ),
        "segment_iters": seg,
    }
    return positions, info
