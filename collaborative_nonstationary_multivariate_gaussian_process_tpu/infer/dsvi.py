"""DSVI training loop: Adam over the negative stochastic ELBO.

TPU-native replacement of the reference `inference()` driver
(/root/reference/code/nmgp_dsvi.py:758-909):

  - optax Adam with an optional freeze mask over the three length-scale log
    hyperparameters (the reference's `fix_hyperpars` requires_grad toggles,
    nmgp_dsvi.py:794-814)
  - hyperparameter overrides by name (nmgp_dsvi.py:779-787).  The reference
    has a copy-paste bug writing `sigma2_L1_log` into `sigma2_L0_log`
    (nmgp_dsvi.py:784-785); we implement the *intended* behavior.
  - minibatch epochs with device-side shuffling; static batch shapes via
    padding + 0/1 weights (the reference's DataLoader yields ragged last
    batches — that would retrigger XLA compilation, so we pad)
  - epoch-window stop criterion (nmgp_dsvi.py:876-883) and periodic ELBO
    probe (nmgp_dsvi.py:885-888)
  - checkpoint save/resume (nmgp_dsvi.py:789-792,893-899) via utils.checkpoint
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import cnmgp
from ..models.cnmgp import CNMGPParams
from ..utils import profiling

__all__ = ["DSVIResult", "make_train_step", "make_scan_epochs", "inference"]

FROZEN_WHEN_FIXED = (
    "length_scales_tildeell_log",
    "length_scales_L0_log",
    "length_scales_L1_log",
)


@dataclass
class DSVIResult:
    params: CNMGPParams
    Z: jnp.ndarray
    loss_list: List[float]
    time_list: List[float]
    elbo_trace: List[float] = field(default_factory=list)
    rmse_test_list: List[float] = field(default_factory=list)
    # fast-path test trace: (wall_seconds, epochs_done, rmse) at each
    # dispatch boundary (see `inference(chunked_test_trace=True)`)
    rmse_trace: List[tuple] = field(default_factory=list)
    # number of divergence rollbacks taken (see
    # `inference(divergence_rollback=True)`)
    rollbacks: int = 0


def apply_hyperpars(params: CNMGPParams, hyperpars: Optional[Dict[str, float]]):
    """Override named log-hyperparameters (nmgp_dsvi.py:779-814)."""
    if not hyperpars:
        return params
    updates = {}
    for name in (
        "sigma2_tildeell_log",
        "length_scales_tildeell_log",
        "sigma2_L0_log",
        "length_scales_L0_log",
        "sigma2_L1_log",
        "length_scales_L1_log",
        "sigma2_err_log",
    ):
        if name in hyperpars:
            updates[name] = jnp.asarray(hyperpars[name], params.mu_v.dtype)
    return params._replace(**updates)


def freeze_mask(params: CNMGPParams, fix_hyperpars: bool) -> CNMGPParams:
    """Pytree of 0/1 multipliers: 0 on frozen leaves."""
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    if not fix_hyperpars:
        return ones
    return ones._replace(
        **{f: jnp.zeros_like(getattr(params, f)) for f in FROZEN_WHEN_FIXED}
    )


def make_train_step(optimizer, n_total: int, jitter: float, kl_mode: str = "true"):
    """Build a jitted (params, opt_state, batch, key) -> ... step."""

    @jax.jit
    def step(params, opt_state, grad_mask, Z, bx, by, bidx, bw, key):
        def loss_fn(p):
            return cnmgp.negative_selbo(
                p, Z, bx, by, bidx, bw, n_total, key, jitter, kl_mode
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # NaN/Inf guard: reference zeroes non-finite grads
        # (nmgp_dsvi.py:78-83); also apply the freeze mask.
        grads = jax.tree_util.tree_map(
            lambda g, m: jnp.where(jnp.isfinite(g), g, 0.0) * m, grads, grad_mask
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_scan_epochs(
    optimizer,
    n_total: int,
    jitter: float,
    num_batches: int,
    batch_size: int,
    mesh=None,
    kl_mode: str = "true",
):
    """Fused multi-epoch trainer: runs `n_epochs` epochs inside one jitted
    `lax.scan`, re-shuffling minibatches on-device each epoch.

    This is the TPU fast path — one dispatch per probe interval instead of
    one per step (the reference pays Python/DataLoader overhead every step,
    nmgp_dsvi.py:827-874).

    `mesh`: optional `jax.sharding.Mesh` with a "data" axis — each minibatch
    is sharding-constrained onto it, so GSPMD splits the per-row ELBO work
    across devices and inserts the gradient psum (data-parallel DSVI,
    SURVEY.md §5.8).  Numerics-preserving: tested identical to the
    single-device path (tests/test_parallel.py).
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.mesh import DATA_AXIS

        batch_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

        def shard_rows(a):
            return jax.lax.with_sharding_constraint(a, batch_sharding)
    else:

        def shard_rows(a):
            return a

    def epoch_body(carry, key):
        params, opt_state, grad_mask, Z, x, y, idx = carry
        n = x.shape[0]
        k_perm, k_steps = jax.random.split(key)
        # Shuffle the epoch's data DIRECTLY with one multi-operand sort by
        # random keys (= a uniform random permutation of the rows), then
        # scan over contiguous slices.  TPU gathers cost ~6 ns/row whether
        # issued per step or per epoch (~90 us/step at B=2000 — a quarter
        # of the training step); the variadic sort shuffles all three
        # arrays in ~40 us/epoch and slicing a scanned operand is free.
        if num_batches == 1:
            ex = x[None, :]
            ey = y[None, :]
            ei = idx[None, :]
            batch_w = jnp.ones((1, n), x.dtype)
        else:
            rkeys = jax.random.bits(k_perm, (n,), jnp.uint32)
            _, sx, sy, si = jax.lax.sort((rkeys, x, y, idx), dimension=0, num_keys=1)
            pad = num_batches * batch_size - n
            shape = (num_batches, batch_size)
            ex = jnp.concatenate([sx, jnp.zeros(pad, x.dtype)]).reshape(shape)
            ey = jnp.concatenate([sy, jnp.zeros(pad, y.dtype)]).reshape(shape)
            ei = jnp.concatenate([si, jnp.zeros(pad, idx.dtype)]).reshape(shape)
            batch_w = jnp.concatenate(
                [jnp.ones(n, x.dtype), jnp.zeros(pad, x.dtype)]
            ).reshape(shape)

        def step_body(pc, inp):
            params, opt_state = pc
            bx, by, bi, w, k = inp

            def loss_fn(p):
                return cnmgp.negative_selbo(
                    p,
                    Z,
                    shard_rows(bx),
                    shard_rows(by),
                    shard_rows(bi),
                    shard_rows(w),
                    n_total,
                    k,
                    jitter,
                    kl_mode,
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.tree_util.tree_map(
                lambda g, m: jnp.where(jnp.isfinite(g), g, 0.0) * m,
                grads,
                grad_mask,
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        step_keys = jax.random.split(k_steps, num_batches)
        (params, opt_state), losses = jax.lax.scan(
            step_body, (params, opt_state), (ex, ey, ei, batch_w, step_keys)
        )
        return (params, opt_state, grad_mask, Z, x, y, idx), losses

    @partial(jax.jit, static_argnames=("n_epochs",))
    def run(params, opt_state, grad_mask, Z, x, y, idx, key, n_epochs):
        # `key` may be ONE key (split here, the simple API) or a pre-stacked
        # (n_epochs,) array of per-epoch keys — the dispatch-budget driver in
        # `inference` passes slices of one split so the training RNG stream
        # is identical no matter how epochs are chunked across dispatches.
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            stacked = key.ndim == 1
        else:
            stacked = key.ndim == 2
        keys = key if stacked else jax.random.split(key, n_epochs)
        carry, losses = jax.lax.scan(
            epoch_body, (params, opt_state, grad_mask, Z, x, y, idx), keys
        )
        params, opt_state = carry[0], carry[1]
        return params, opt_state, losses.reshape(-1)

    return run


def _scale_injected_lr(opt_state, factor):
    """Multiply the `learning_rate` held in an `optax.inject_hyperparams`
    state by `factor`, recursing through chain tuples.  Leaves every other
    state untouched; no recompile (the hyperparam is a traced array)."""
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = hp["learning_rate"] * factor
        return opt_state._replace(hyperparams=hp)
    if type(opt_state) is tuple:
        return tuple(_scale_injected_lr(s, factor) for s in opt_state)
    return opt_state


def _read_injected_lr(opt_state):
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        return float(opt_state.hyperparams["learning_rate"])
    if type(opt_state) is tuple:
        for s in opt_state:
            v = _read_injected_lr(s)
            if v is not None:
                return v
    return None


def _make_batches(key, n, batch_size):
    """Shuffled padded batch index matrix (num_batches, batch_size) plus a
    0/1 weight matrix for the padded tail."""
    perm = jax.random.permutation(key, n)
    num_batches = -(-n // batch_size)
    padded = jnp.concatenate([perm, jnp.zeros(num_batches * batch_size - n, perm.dtype)])
    weights = jnp.concatenate(
        [jnp.ones(n), jnp.zeros(num_batches * batch_size - n)]
    )
    return (
        padded.reshape(num_batches, batch_size),
        weights.reshape(num_batches, batch_size),
    )


def inference(
    X_train_list,
    Y_train_list,
    z,
    batch_size: int,
    dim_outputs: int,
    hyperpars: Optional[Dict[str, float]] = None,
    fix_hyperpars: bool = True,
    mu_v=None,
    mu_W=None,
    mu_U=None,
    sqrt_v=None,
    sqrt_W=None,
    sqrt_U=None,
    lr: float = 0.01,
    itnum: int = 1000,
    do_stop_criterion: bool = False,
    seed: int = 22,
    verbose: bool = False,
    PATH: Optional[str] = None,
    continuous_training: bool = False,
    show_ELBO: bool = True,
    save_model: bool = False,
    X_test_list=None,
    Y_test_list=None,
    dtype=None,
    jitter: float = 1e-4,
    elbo_every: int = 100,
    elbo_samples: int = 100,
    mesh=None,
    kl_mode: str = "true",
    grad_clip_norm: Optional[float] = None,
    lr_decay: Optional[float] = None,
    chunked_test_trace: bool = False,
    divergence_rollback: bool = False,
    rollback_lr_factor: float = 0.5,
    max_rollbacks: int = 5,
    optimizer: str = "adam",
    ckpt_moments_dtype=None,
) -> DSVIResult:
    """Train a CNMGP by DSVI.  Signature mirrors the reference `inference()`
    (nmgp_dsvi.py:758-761) so reference drivers port one-to-one.

    `mesh`: optional `jax.sharding.Mesh` with a "data" axis for
    data-parallel minibatches (see `make_scan_epochs`); applies to the fast
    path (no per-step test trace / verbose / stop criterion).

    `grad_clip_norm`: optional global-norm gradient clip prepended to Adam
    (the reference has no clipping and neither does our default; long
    runs at the real-data drivers' aggressive settings can destabilize —
    observed on the 200-epoch HCP workload — and a clip bounds the
    excursion without changing converged behavior).

    `lr_decay`: optional per-EPOCH exponential decay rate for the Adam
    learning rate (e.g. 0.99).  The post-minimum loss oscillation on long
    runs (docs/DESIGN.md §15) is the classic constant-lr limit cycle; a
    mild decay converges it.  None keeps the reference's constant lr.

    `chunked_test_trace`: with `X_test_list` given, stay on the scan fast
    path and record test RMSE only at dispatch boundaries (every
    DISPATCH_BUDGET_S seconds) into `result.rmse_trace` as
    (wall_s, epochs_done, rmse) tuples.  This is the TPU-native version of
    the reference's per-step `do_test` trace (nmgp_dsvi.py:865-868), which
    would serialize a host round-trip into every step; RMSE-vs-wallclock
    curves (the train_trace_BS study, NMGP_PM25.py:244-263) only need
    O(seconds) resolution.

    `divergence_rollback`: automatic failure recovery on the fast path.
    The dispatch-budget chunking already gives a natural checkpoint
    cadence (~DISPATCH_BUDGET_S); with this flag each chunk keeps its
    entry state, and if the chunk's losses go non-finite or escape the
    loss basin (> 10x |best loss so far| after a basin was established —
    the docs/DESIGN.md §15 late-training escape signature), the chunk is
    rolled back and retried with the Adam learning rate scaled by
    `rollback_lr_factor` (at most `max_rollbacks` times, then the run
    proceeds unguarded).  Snapshots are references to immutable device
    arrays — no copies, no host traffic.  Requires a constant float `lr`
    (incompatible with `lr_decay`); the reference has no equivalent (its
    runs simply blow up, NMGP_HCP 200-epoch repro).

    `ckpt_moments_dtype`: optional dtype (e.g. `jnp.bfloat16`) for the
    optimizer-state floats in checkpoint SAVES — halves the dominant
    axon-tunnel fetch of a large-state save (docs/DESIGN.md §17.3);
    loading restores the live optimizer's dtypes."""
    from ..utils.data import flatten_output_lists
    from ..utils import checkpoint as ckpt

    if dtype is None:
        from ..config import default_dtype

        dtype = default_dtype()

    data = flatten_output_lists(X_train_list, Y_train_list)
    n_total = data.n
    if batch_size <= 0 or batch_size > n_total:
        batch_size = n_total

    x = jnp.asarray(data.x, dtype)
    y = jnp.asarray(data.y, dtype)
    idx = jnp.asarray(data.idx)
    Z = jnp.asarray(np.asarray(z).reshape(-1), dtype)
    M = Z.shape[0]

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = cnmgp.init_params(
        k_init,
        dim_outputs,
        M,
        dtype=dtype,
        mu_v=mu_v,
        mu_W=mu_W,
        mu_U=mu_U,
        sqrt_v=sqrt_v,
        sqrt_W=sqrt_W,
        sqrt_U=sqrt_U,
    )
    params = apply_hyperpars(params, hyperpars)

    # `lr` may be a float OR any optax schedule (callable step -> rate):
    # optax.adam consumes both, so warmup/cosine/piecewise schedules come
    # for free; `lr_decay` remains the convenience knob for the drivers.
    if divergence_rollback and (lr_decay is not None or callable(lr)):
        raise ValueError(
            "divergence_rollback scales a constant injected learning rate; "
            "it cannot be combined with lr_decay or a schedule (a schedule "
            "recomputes the rate from the step count every update)"
        )
    if lr_decay is not None:
        num_batches_sched = -(-n_total // batch_size)
        lr = optax.exponential_decay(
            init_value=lr,
            transition_steps=num_batches_sched,
            decay_rate=float(lr_decay),
        )
    # optimizer core: "adam" (reference parity) or "adam_bf16" (bf16 moment
    # storage, f32 compute — measured +6% step rate at ECoG scale where
    # Adam state HBM is 38% of the step; infer/optimizers.py)
    if optimizer == "adam":
        opt_core = optax.adam
    elif optimizer == "adam_bf16":
        from .optimizers import adam_bf16_moments as opt_core
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if divergence_rollback:
        # the learning rate lives in the optimizer STATE so a rollback can
        # halve it without rebuilding/recompiling anything
        adam = optax.inject_hyperparams(opt_core)(learning_rate=lr)
    else:
        adam = opt_core(lr)
    optimizer = adam
    if grad_clip_norm is not None:
        optimizer = optax.chain(
            optax.clip_by_global_norm(float(grad_clip_norm)), adam
        )
    opt_state = optimizer.init(params)

    if continuous_training and PATH is not None:
        params, opt_state = ckpt.load_train_state(PATH, params, opt_state)
        params = apply_hyperpars(
            params,
            {k: v for k, v in (hyperpars or {}).items() if k.startswith("length_scales")}
            if fix_hyperpars
            else None,
        )

    grad_mask = freeze_mask(params, fix_hyperpars)
    step = make_train_step(optimizer, float(n_total), jitter, kl_mode)
    elbo_fn = jax.jit(
        partial(cnmgp.elbo_estimate, n_sample=elbo_samples, jitter=jitter, kl_mode=kl_mode)
    )

    loss_list: List[float] = []
    time_list: List[float] = []
    elbo_trace: List[float] = []
    rmse_test_list: List[float] = []

    if X_test_list is not None:
        test = flatten_output_lists(X_test_list, Y_test_list)
        xt = jnp.asarray(test.x, dtype)
        it = jnp.asarray(test.idx)
        yt = np.asarray(test.y)
        predict_fn = jax.jit(partial(cnmgp.predict_y_mean, jitter=jitter))

    num_batches = -(-n_total // batch_size)
    ts = time.time()

    fast_path = (
        (X_test_list is None or chunked_test_trace)
        and not do_stop_criterion
        and not verbose
    )
    rmse_trace: List[tuple] = []
    if fast_path:
        run_epochs = make_scan_epochs(
            optimizer, float(n_total), jitter, num_batches, batch_size, mesh=mesh,
            kl_mode=kl_mode,
        )

        # Bound every dispatch's wall time (config.DISPATCH_BUDGET_S):
        # multi-minute single dispatches crash the remote TPU worker.  The
        # first 1-epoch dispatch pays compile; the second is timed to
        # calibrate epochs-per-dispatch.  Both are real training epochs.
        from ..config import DISPATCH_BUDGET_S

        epoch = 0
        budget_chunk = None  # unknown until calibrated
        next_probe = elbo_every if show_ELBO else None
        # per-epoch keys fixed up front: the RNG stream (and thus the full
        # training trajectory) is identical however the timing-dependent
        # dispatch budget chunks the epochs
        key, k_train = jax.random.split(key)
        epoch_keys = jax.random.split(k_train, itnum)

        def _run(chunk):
            nonlocal params, opt_state, epoch
            params, opt_state, losses = run_epochs(
                params, opt_state, grad_mask, Z, x, y, idx,
                epoch_keys[epoch : epoch + chunk], chunk,
            )
            loss_list.extend(np.asarray(losses).tolist())
            time_list.extend([time.time() - ts] * int(losses.shape[0]))
            epoch += chunk
            if chunked_test_trace and X_test_list is not None:
                est = np.asarray(predict_fn(params, Z, xt, it))
                rmse = float(np.sqrt(np.mean((est - yt) ** 2)))
                rmse_trace.append((time.time() - ts, epoch, rmse))
                rmse_test_list.append(rmse)

        rollback_count = 0
        _run_raw = _run

        def _run_guarded(chunk):
            # divergence_rollback: retry a chunk whose losses go non-finite
            # or escape the established loss basin, at a reduced lr.  The
            # pre-chunk state is a tuple of references to immutable device
            # arrays — snapshotting costs nothing.
            nonlocal params, opt_state, epoch, rollback_count
            while True:
                snap = (params, opt_state, epoch, len(loss_list),
                        len(time_list), len(rmse_trace), len(rmse_test_list))
                _run_raw(chunk)
                new = np.asarray(loss_list[snap[3]:], dtype=np.float64)
                bad = not np.all(np.isfinite(new))
                if not bad:
                    prev = np.asarray(loss_list[: snap[3]], dtype=np.float64)
                    prev = prev[np.isfinite(prev)]
                    if prev.size:  # basin escape only once a basin exists
                        bad = float(np.max(new)) > 10.0 * abs(float(np.min(prev)))
                if not bad or rollback_count >= max_rollbacks:  # global cap
                    return
                params, opt_state, epoch = snap[0], snap[1], snap[2]
                del loss_list[snap[3]:]
                del time_list[snap[4]:]
                del rmse_trace[snap[5]:]
                del rmse_test_list[snap[6]:]
                opt_state = _scale_injected_lr(opt_state, rollback_lr_factor)
                rollback_count += 1
                print(
                    f"divergence rollback #{rollback_count}: retrying "
                    f"{chunk} epoch(s) from epoch {epoch} at lr="
                    f"{_read_injected_lr(opt_state):.3g}"
                )

        if divergence_rollback:
            _run = _run_guarded  # noqa: F811 — guarded wrapper owns retries

        def _probe():
            nonlocal key, next_probe
            key, k_elbo = jax.random.split(key)
            elbo = float(elbo_fn(params, Z, x, y, idx, k_elbo))
            elbo_trace.append(elbo)
            print(f"epoch: {epoch}, ELBO: {elbo:.4f}")
            profiling.print_mem(epoch)
            next_probe += elbo_every

        if itnum > 2:
            _run(1)  # compile + first epoch
            t1 = time.time()
            _run(1)  # steady-state epoch, timed
            epoch_s = max(time.time() - t1, 1e-6)
            if itnum > 3:
                # min-of-2 calibration: one slow epoch (grant hiccup,
                # background compile) must not miscalibrate the whole run
                t2 = time.time()
                _run(1)
                epoch_s = max(min(epoch_s, time.time() - t2), 1e-6)
            budget_chunk = max(int(DISPATCH_BUDGET_S / epoch_s), 1)
            if next_probe is None:
                # equalize the remaining chunks so only ONE more program
                # shape compiles (e.g. 48 epochs @ budget 21 -> 3 x 16,
                # not 21 + 21 + 6)
                remaining = itnum - epoch
                if remaining > 0:
                    k = -(-remaining // budget_chunk)
                    budget_chunk = -(-remaining // k)
            # calibration dispatches may have run past probe epochs
            # (elbo_every < 4): fire the missed probes now so the loop's
            # chunk = next_probe - epoch stays positive.  NB the replayed
            # probes evaluate at the CURRENT (post-calibration) params —
            # the first 1-3 trace entries of an elbo_every<4 run are
            # duplicates by construction (the pre-calibration params are
            # gone); entry count stays aligned with the probe schedule
            while next_probe is not None and epoch >= next_probe:
                _probe()

        while epoch < itnum:
            chunk = itnum - epoch
            if budget_chunk is not None:
                chunk = min(chunk, budget_chunk)
            if next_probe is not None:
                chunk = min(chunk, next_probe - epoch)
            _run(chunk)
            if next_probe is not None and epoch >= next_probe:
                _probe()
        epoch = itnum - 1
        if show_ELBO:
            print(f"training takes {time.time() - ts:.2f}s")
        if save_model and PATH is not None:
            ckpt.save_train_state(PATH, params, opt_state, epoch=epoch, loss=loss_list[-1], moments_dtype=ckpt_moments_dtype)
        return DSVIResult(
            params=params,
            Z=Z,
            loss_list=loss_list,
            time_list=time_list,
            elbo_trace=elbo_trace,
            rmse_test_list=rmse_test_list,
            rmse_trace=rmse_trace,
            rollbacks=rollback_count,
        )

    for epoch in range(itnum):
        key, k_perm = jax.random.split(key)
        if num_batches == 1:
            batch_idx = jnp.arange(n_total)[None, :]
            batch_w = jnp.ones((1, n_total), dtype)
        else:
            batch_idx, batch_w = _make_batches(k_perm, n_total, batch_size)
            batch_w = batch_w.astype(dtype)
        for b in range(num_batches):
            sel = batch_idx[b]
            key, k_step = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state, grad_mask, Z, x[sel], y[sel], idx[sel], batch_w[b], k_step
            )
            loss_list.append(float(loss))
            time_list.append(time.time() - ts)
            if X_test_list is not None:
                est = np.asarray(predict_fn(params, Z, xt, it))
                rmse_test_list.append(float(np.sqrt(np.mean((est - yt) ** 2))))
            if verbose:
                print(
                    f"epoch: {epoch}/{itnum}, batch: {b + 1}/{num_batches}, "
                    f"loss: {loss_list[-1]:.4f}"
                )

        if do_stop_criterion and epoch % 5 == 4 and epoch > 5:
            la = np.array(loss_list)
            bn = num_batches
            if la[-bn:].sum() > la[-bn * 6 : -bn * 5].sum():
                print("Stop criteria is satisfied.")
                break

        if show_ELBO and epoch % elbo_every == elbo_every - 1:
            key, k_elbo = jax.random.split(key)
            elbo = float(elbo_fn(params, Z, x, y, idx, k_elbo))
            elbo_trace.append(elbo)
            print(f"epoch: {epoch + 1}, ELBO: {elbo:.4f}")
            profiling.print_mem(epoch + 1)

    if verbose or show_ELBO:
        print(f"training takes {time.time() - ts:.2f}s")

    if save_model and PATH is not None:
        ckpt.save_train_state(PATH, params, opt_state, epoch=epoch, loss=loss_list[-1], moments_dtype=ckpt_moments_dtype)

    return DSVIResult(
        params=params,
        Z=Z,
        loss_list=loss_list,
        time_list=time_list,
        elbo_trace=elbo_trace,
        rmse_test_list=rmse_test_list,
        rmse_trace=rmse_trace,
    )
