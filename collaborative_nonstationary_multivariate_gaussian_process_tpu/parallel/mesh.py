"""Device-mesh construction and sharding helpers.

The reference is single-process/CPU (SURVEY.md §2: zero parallelism); this
layer is new work.  Design (SURVEY.md §5.8): a mesh with axes
("data", "chain") — minibatch rows sharded over "data" for DSVI, MCMC chains
/ SMC particles sharded over "chain"; adaptation statistics and gradient
reductions ride `psum` over ICI.

All logic is expressible on a fake CPU mesh
(`--xla_force_host_platform_device_count=N`), which is how tests run.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_pod_mesh",
    "DATA_AXIS",
    "CHAIN_AXIS",
    "shard_batch",
    "replicate",
    "initialize_distributed",
    "process_local_slice",
    "process_local_blocks",
    "global_batch_from_local",
]

DATA_AXIS = "data"
CHAIN_AXIS = "chain"


def make_mesh(
    data: Optional[int] = None,
    chain: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "chain") mesh over available devices.

    `data=None` uses all remaining devices after the chain axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % chain == 0, (n, chain)
        data = n // chain
    assert data * chain <= n, (data, chain, n)
    dev_array = np.asarray(devices[: data * chain]).reshape(data, chain)
    return Mesh(dev_array, (DATA_AXIS, CHAIN_AXIS))


def shard_batch(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Place a pytree of arrays with leading batch dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# ---------------------------------------------------------------------------
# Multi-host (pod / multi-slice) support
# ---------------------------------------------------------------------------
#
# SURVEY.md §5.8 / §7.1(6): single program via jax.distributed.initialize
# across hosts; mesh axes laid out so the heavy "data"/"chain" collectives
# ride ICI, not DCN; host-local data loading with process_index sharding.
# The reference has no distributed layer at all — this is new work, written
# so every code path degrades to a no-op / identity in a single process and
# is therefore exercised by the CPU fake-mesh test suite.


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> Tuple[int, int]:
    """Join the multi-host SPMD program; returns (process_index, process_count).

    Thin, idempotent wrapper over `jax.distributed.initialize`:
      - On TPU pods the runtime discovers coordinator/rank automatically —
        call with no arguments from every host before first device use.
      - In a single-process run (tests, one-host dev) initialization is
        skipped entirely; the return value is (0, 1).
      - Calling twice is safe (the second call is a no-op).

    IMPORTANT: the decision to initialize must NOT touch the backend —
    `jax.process_count()` / `jax.devices()` initialize XLA, after which
    `jax.distributed.initialize` raises.  So the dispatch below looks only at
    explicit args, env vars, and cluster auto-detection; backend queries
    happen strictly *after* the decision.
    """
    if _distributed_is_initialized():
        return jax.process_index(), jax.process_count()
    explicit = coordinator_address is not None or num_processes is not None
    if explicit or _cluster_detected():
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
        except RuntimeError as e:
            # "already initialized" (race with another caller) is benign;
            # anything else — e.g. backend already touched — is a real error.
            if "already" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def _distributed_is_initialized() -> bool:
    """Public API when present (jax>=0.4.34), documented fallback otherwise."""
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:
        return bool(is_init())
    return (
        getattr(jax._src.distributed.global_state, "client", None)  # noqa: SLF001
        is not None
    )


def _cluster_detected() -> bool:
    """Multi-process environment detection WITHOUT touching the XLA backend.

    Mirrors the signals jax.distributed's own ClusterEnv implementations use:
    explicit coordinator env vars, Slurm, Open MPI, and multi-host TPU pod
    metadata env vars set by the TPU runtime.
    """
    import os

    env = os.environ
    if any(env.get(v) for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")):
        return True
    # Slurm multi-task
    if env.get("SLURM_NTASKS") and int(env["SLURM_NTASKS"]) > 1:
        return True
    # Open MPI / PMIx
    if env.get("OMPI_COMM_WORLD_SIZE") and int(env["OMPI_COMM_WORLD_SIZE"]) > 1:
        return True
    # Cloud TPU pod: worker hostnames list present and >1 entry
    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    if hosts and len(hosts.split(",")) > 1:
        return True
    return False


def make_pod_mesh(
    data: Optional[int] = None,
    chain: int = 1,
    *,
    allow_split_physical_axes: bool = False,
) -> Mesh:
    """("data", "chain") mesh over ALL processes' devices, ICI-topology-aware.

    Uses `mesh_utils.create_device_mesh`, which permutes devices so that
    neighboring mesh coordinates are ICI neighbors on TPU (minimizing the
    hop count of the gradient-psum ring on "data" and the adaptation
    reductions on "chain").  Works identically on the virtual CPU mesh.
    """
    from jax.experimental import mesh_utils

    n = len(jax.devices())
    if data is None:
        assert n % chain == 0, (n, chain)
        data = n // chain
    assert data * chain == n, (
        f"pod mesh must use every device: data*chain={data * chain} != {n}; "
        "use make_mesh(devices=...) for a sub-mesh"
    )
    dev_array = mesh_utils.create_device_mesh(
        (data, chain), allow_split_physical_axes=allow_split_physical_axes
    )
    return Mesh(dev_array, (DATA_AXIS, CHAIN_AXIS))


def process_local_slice(mesh: Mesh, n_rows: int, axis: str = DATA_AXIS):
    """(start, size) of the rows THIS process must load for a global array of
    `n_rows` rows sharded over `axis`.

    Host-local ETL: each host reads only its slice of the dataset from disk
    (the reference loads everything everywhere — single process).  Rows must
    divide evenly over the axis (pad upstream; the DSVI weights column makes
    padded rows exact no-ops in the ELBO).

    Raises ValueError when this process's axis coordinates are not one
    contiguous run (possible under `create_device_mesh`'s ICI permutation with
    chain>1 or allow_split_physical_axes) — use `process_local_blocks` for the
    general case.
    """
    blocks = process_local_blocks(mesh, n_rows, axis)
    if len(blocks) != 1:
        raise ValueError(
            f"this process's '{axis}'-axis rows are not contiguous "
            f"(blocks={blocks}); load via process_local_blocks() instead"
        )
    return blocks[0]


def process_local_blocks(mesh: Mesh, n_rows: int, axis: str = DATA_AXIS):
    """List of (start, size) row ranges THIS process must load, in ascending
    global-coordinate order (the order `global_batch_from_local` expects the
    local rows concatenated in).

    Handles any device permutation `create_device_mesh` picked, including
    non-contiguous per-process coordinates; a process owning no devices on
    the mesh gets an empty list.
    """
    axis_size = mesh.shape[axis]
    assert n_rows % axis_size == 0, (n_rows, axis_size)
    block = n_rows // axis_size
    # Which axis coordinates live on this process?  Walk the mesh's device
    # array once — exact for any device permutation create_device_mesh picked.
    axis_index = list(mesh.axis_names).index(axis)
    coords_here = sorted(
        {
            idx[axis_index]
            for idx, dev in np.ndenumerate(mesh.devices)
            if dev.process_index == jax.process_index()
        }
    )
    if not coords_here:
        return []
    # merge contiguous coordinate runs into maximal row ranges
    blocks = []
    run_start = prev = coords_here[0]
    for c in coords_here[1:]:
        if c == prev + 1:
            prev = c
            continue
        blocks.append((run_start * block, (prev - run_start + 1) * block))
        run_start = prev = c
    blocks.append((run_start * block, (prev - run_start + 1) * block))
    return blocks


def global_batch_from_local(mesh: Mesh, tree, axis: str = DATA_AXIS):
    """Assemble a jax.Array sharded over `axis` from per-process local rows.

    Each process passes ONLY its rows (the `process_local_slice` it loaded);
    the result is a global array usable by the jitted DP train step with no
    cross-host data movement.  Single-process: identical to `shard_batch`.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )
