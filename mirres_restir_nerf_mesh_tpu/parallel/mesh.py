"""Device-mesh / sharding utilities (TPU-native data parallelism).

The reference's only distribution strategy is vestigial DDP over rays
(SURVEY.md §2.5, reference nerf/utils.py:761-764,1705-1719).  Here data
parallelism is first-class: ray/pixel batches are sharded over the 'data'
mesh axis, parameters are replicated, and XLA inserts the gradient psum when
the train step is jitted with these shardings — collectives ride ICI with no
NCCL-style backend code.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = np.array(jax.devices())
    if shape is None:
        shape = (len(devices),)
    return Mesh(devices.reshape(tuple(shape)), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray/pixel) axis across the data dimension."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every array in a pytree with its leading axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
