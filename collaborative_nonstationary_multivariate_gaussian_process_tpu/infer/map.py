"""MAP estimation over the fully-Bayesian log-posteriors.

The reference obtains MAP estimates with an external optimizer driving
`nlogpos_obj*` through the scipy adapter on `Model._loss_and_grad`
(nmgp_dsvi.py:62-83); `synthetic_plot.py:59` loads the resulting `MAP.dat`.
Here both paths are first-class:

  - `run_map`: jitted Adam (optax) on the negative log posterior —
    the TPU-native path (one fused lax.scan);
  - `run_map_scipy`: L-BFGS-B through scipy with jax-computed gradients
    (the reference's workflow), including the reference's non-finite-
    gradient zeroing guard (nmgp_dsvi.py:78-83).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["run_map", "run_map_scipy"]


def run_map(
    neg_log_prob: Callable,
    init_position,
    num_steps: int = 2000,
    learning_rate: float = 1e-2,
    optimizer: Optional[optax.GradientTransformation] = None,
):
    """Adam MAP optimization, fused in one lax.scan.

    Returns (position, loss_trace (num_steps,))."""
    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    @jax.jit
    def run(q0):
        opt_state = optimizer.init(q0)

        def body(carry, _):
            q, s = carry
            loss, g = jax.value_and_grad(neg_log_prob)(q)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, s = optimizer.update(g, s, q)
            q = optax.apply_updates(q, updates)
            return (q, s), loss

        (q, _), losses = jax.lax.scan(body, (q0, opt_state), None, length=num_steps)
        return q, losses

    return run(jnp.asarray(init_position))


def run_map_scipy(
    neg_log_prob: Callable,
    init_position,
    method: str = "L-BFGS-B",
    maxiter: int = 1000,
    verbose: bool = False,
):
    """scipy.optimize MAP with jax gradients (the reference's adapter
    pattern, nmgp_dsvi.py:62-83, including its NaN→0 gradient guard)."""
    from scipy.optimize import minimize

    vg = jax.jit(jax.value_and_grad(neg_log_prob))

    def fun(q):
        loss, g = vg(jnp.asarray(q))
        loss = float(loss)
        g = np.asarray(g, dtype=np.float64)
        finite = np.isfinite(g)
        if not finite.all():
            if verbose:
                print("Warning: inf or nan in gradient: replacing with zeros.")
            g = np.where(finite, g, 0.0)
        if verbose:
            print(f"loss: {loss}.")
        return loss, g

    res = minimize(
        fun,
        np.asarray(init_position, dtype=np.float64),
        jac=True,
        method=method,
        options={"maxiter": maxiter},
    )
    return res.x, res
