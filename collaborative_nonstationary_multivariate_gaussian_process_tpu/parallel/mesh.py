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

__all__ = ["make_mesh", "DATA_AXIS", "CHAIN_AXIS", "shard_batch", "replicate"]

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
