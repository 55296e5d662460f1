"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's NCCL data parallelism
(tools/train_net.py:408-414 init_process_group, DDP wrap :148-155,
utils/comm.py collectives): a 1-D `jax.sharding.Mesh` over ICI with the
batch sharded on the `data` axis and parameters replicated. Gradient
all-reduce is inserted by XLA from the sharding annotations — no explicit
collectives needed in the train step.

The LVIS chunked evaluation adds a second natural axis: prompt chunks are
embarrassingly parallel (reference runs them sequentially per rank,
engine/inference.py:603-648), so eval shards (image, chunk) pairs over the
same data axis.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[list] = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    # an explicit smaller mesh (e.g. MESH_SHAPE: [1] in CPU tests) uses the
    # first prod(shape) devices
    need = int(np.prod(shape))
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for array leaves (first axis over `data`)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading axis sharded over `data`."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
