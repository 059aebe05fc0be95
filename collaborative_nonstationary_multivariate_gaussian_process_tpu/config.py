"""Global numeric policy for the CNMGP-TPU framework.

The reference implementation (see /root/reference: ``code/utils.py:6-13`` and
``code/SIM_code/Utility/settings.py:1-6``) pins float64 on CPU and leans on two
jitter constants (1e-4 for the DSVI path, 1e-6 for the fully-Bayesian path).

On TPU we default to float32 compute (MXU-friendly) and keep the same jitter
policy, scaled appropriately.  Tests run with ``jax_enable_x64`` on a CPU mesh
for oracle-grade comparisons; the library itself is dtype-polymorphic and
follows its inputs.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# Jitter added before every Cholesky/solve on inducing-point (M x M) blocks.
# Mirrors `tridiagonal_jitter = 1e-4` (reference code/utils.py:7).
DSVI_JITTER = 1e-4

# Jitter used by the fully-Bayesian (log-posterior) path.
# Mirrors `settings.jitter = 1e-6` (reference SIM_code/Utility/settings.py:3).
MCMC_JITTER = 1e-6

# Floor for predictive variances, mirrors `settings.precision = 1e-6`
# (reference SIM_code/Utility/settings.py:6).
PRECISION = 1e-6

# Wall-clock budget for any single device dispatch (seconds).  Multi-minute
# single XLA dispatches have crashed/wedged the remote TPU worker (observed
# twice in round 2 with 1024-chain ChEES, once in round 3 with the ECoG
# M=200 DSVI run — the grant then takes 1-3 h to recover), so every long
# loop must be host-chunked: `infer.chees` segments by iteration count, and
# `infer.dsvi.inference` calibrates epochs-per-dispatch against this budget
# from a timed 1-epoch dispatch.  Override via CNMGP_DISPATCH_BUDGET_S.
DISPATCH_BUDGET_S = float(os.environ.get("CNMGP_DISPATCH_BUDGET_S", "30.0"))

# Sampler-side companion to DISPATCH_BUDGET_S, in worst-case leapfrog
# gradient evaluations per dispatch.  Measured crash boundary on the remote
# worker (docs/DESIGN.md §13): 64-chain NUTS x 25 iters x 2^8 max tree
# (~410k) ran clean; 256 x 25 x 2^8 (~1.6M) crashed the worker and wedged
# the grant for hours.  400k keeps headroom under the clean point.  The
# segmented sampler drivers (infer.nuts.run_nuts_multichain,
# infer.chees.*, parallel.sharded_mcmc.run_chees_sharded) size their
# per-dispatch iteration chunks from this automatically; chunking is
# bit-invisible to the math, so the cap only adds ~24 ms dispatch overhead
# per extra segment.  Override via CNMGP_SAMPLER_LEAPFROG_BUDGET.
SAMPLER_LEAPFROG_BUDGET = int(
    os.environ.get("CNMGP_SAMPLER_LEAPFROG_BUDGET", "400000")
)

# Run the large G-batched coefficient-process contractions (the ECoG-scale
# hot spot: (G, M, M) whitening matmuls + the (G, B, M) variance quadform,
# G = D(D+1)/2) as single-pass bf16 MXU matmuls with f32 accumulation.
# f32 inputs on the v5e MXU otherwise lower to the 3-pass bf16x3 scheme —
# ~3x the MXU work — and the bf16 operands halve the HBM traffic of the
# 123 MB (G, M, M) tensors at D=78/M=100.  Read at TRACE time (scripts may
# set `config.BF16_BATCH_MATMULS = True` before building a jitted step).
# Off by default: flipped per-workload after parity validation
# (scripts/bench_ecog.py --bf16; see docs/DESIGN.md).
BF16_BATCH_MATMULS = os.environ.get("CNMGP_BF16_MATMULS", "0") == "1"


def default_dtype():
    """Compute dtype: float64 iff jax x64 mode is on, else float32."""
    from jax import config as jax_config

    return jnp.float64 if jax_config.jax_enable_x64 else jnp.float32


def is_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing only
        return False
