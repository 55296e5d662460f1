"""Cross-host communication helpers.

Capability twin of maskrcnn_benchmark/utils/comm.py (:26-157): world
size/rank, synchronize, all_gather of python objects for evaluation merging
(engine/inference.py:293-312), reduce_dict — built on jax.distributed /
multihost_utils instead of NCCL+pickle.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mqdet_sync")


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable python objects from every host."""
    if jax.process_count() == 1:
        return [data]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes())
        for i in range(jax.process_count())
    ]


def reduce_dict(d: Dict[str, jax.Array], average: bool = True) -> Dict[str, np.ndarray]:
    """Sum (or average) scalar metrics across hosts (utils/comm.py reduce_dict)."""
    if jax.process_count() == 1:
        return {k: np.asarray(v) for k, v in d.items()}
    from jax.experimental import multihost_utils

    keys = sorted(d.keys())
    vec = np.asarray([float(d[k]) for k in keys])
    gathered = multihost_utils.process_allgather(vec)
    total = gathered.sum(0)
    if average:
        total = total / jax.process_count()
    return dict(zip(keys, total))
