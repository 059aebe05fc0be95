"""Optimizer variants tuned for the TPU HBM profile of this model family.

The CNMGP parameter tree is dominated by the (G, M, M) `sqrt_U` factor
table (31.9M parameters at D=78/M=100 for 62,400 observations), so Adam's
optimizer state moves ~0.9 GB of HBM per training step — measured at 38%
of the ECoG-scale step wall time (results/ecog_step_profile_m100.json,
docs/DESIGN.md §14).  `adam_bf16_moments` halves that traffic by storing
BOTH Adam moments in bfloat16 while keeping every arithmetic operation
(moment updates, bias correction, the update itself) and the parameters
in f32.

Precision note: bf16's 8 mantissa bits add stochastic rounding-free noise
to the moment EMAs.  For this model that noise is far below the gradient
noise of the stochastic ELBO (minibatch + reparameterization MC), but the
swap is validated per workload by an on-chip loss-trajectory A/B
(scripts/bench_ecog.py --optimizer adam_bf16) before any default changes
— the same protocol that rejected the bf16-operand and adafactor
candidates in round 4 (docs/DESIGN.md §14).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["adam_bf16_moments"]


class ScaleByAdamBf16State(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates  # bf16 leaves
    nu: optax.Updates  # bf16 leaves


def scale_by_adam_bf16(b1=0.9, b2=0.999, eps=1e-8):
    """`optax.scale_by_adam` with BOTH moment EMAs stored in bfloat16.

    optax's own `mu_dtype` casts only the first moment; the second moment
    (same size) stays f32 — half the possible saving.  Here each update
    upcasts the stored moments to f32, applies the standard EMA + bias
    correction in f32, emits the f32 update, and stores the new moments
    back as bf16.  Only the *storage* dtype changes.
    """

    def init_fn(params):
        zeros_like_bf16 = lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16)
        return ScaleByAdamBf16State(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros_like_bf16, params),
            nu=jax.tree_util.tree_map(zeros_like_bf16, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c

        def one(g, mu_lo, nu_lo):
            g = g.astype(jnp.float32)
            mu = b1 * mu_lo.astype(jnp.float32) + (1.0 - b1) * g
            nu = b2 * nu_lo.astype(jnp.float32) + (1.0 - b2) * (g * g)
            upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            return upd, mu.astype(jnp.bfloat16), nu.astype(jnp.bfloat16)

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [one(g, m, n) for g, m, n in zip(flat_u, flat_mu, flat_nu)]
        updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        return updates, ScaleByAdamBf16State(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_bf16_moments(learning_rate, b1=0.9, b2=0.999, eps=1e-8):
    """Adam with bf16 moment storage (see module docstring)."""
    return optax.chain(
        scale_by_adam_bf16(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )
