"""Sampling strategies for the training loader.

Capability twins of maskrcnn_benchmark/data/samplers/:
  * distributed_shard — DistributedSampler (distributed.py:12-72): each host
    takes a strided shard of the (optionally shuffled) index list
  * grouped_by_aspect_ratio — GroupedBatchSampler (grouped_batch_sampler.py):
    batches drawn from same aspect-ratio bucket (here: same image bucket,
    which is what actually matters for static-shape batching on TPU)
  * iteration_based — IterationBasedBatchSampler (iteration_based_batch_sampler.py):
    repeat the sampler until a target iteration count
"""
from __future__ import annotations

import random
from typing import Iterable, Iterator, List, Sequence


def distributed_shard(
    ids: Sequence, num_hosts: int, host_id: int, shuffle: bool = True,
    seed: int = 0, epoch: int = 0,
) -> List:
    ids = list(ids)
    if shuffle:
        random.Random(seed + epoch).shuffle(ids)
    # pad to a multiple of num_hosts (DistributedSampler total_size semantics)
    total = -(-len(ids) // num_hosts) * num_hosts
    ids = (ids + ids)[:total]
    return ids[host_id::num_hosts]


def grouped_by_bucket(
    ids: Sequence, bucket_of, batch_size: int, drop_uneven: bool = False
) -> List[List]:
    groups = {}
    for i in ids:
        groups.setdefault(bucket_of(i), []).append(i)
    batches = []
    for _, members in sorted(groups.items(), key=lambda kv: str(kv[0])):
        for s in range(0, len(members), batch_size):
            batch = members[s : s + batch_size]
            if drop_uneven and len(batch) < batch_size:
                continue
            batches.append(batch)
    return batches


def iteration_based(batches: Iterable, num_iterations: int, start_iter: int = 0) -> Iterator:
    it = start_iter
    while it < num_iterations:
        for b in batches:
            if it >= num_iterations:
                return
            it += 1
            yield b
