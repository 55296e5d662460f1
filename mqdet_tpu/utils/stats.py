"""Model complexity statistics.

Capability twin of utils/stats.py (ptflops-derived get_model_complexity_info)
using JAX's own cost analysis: parameter counts from the pytree, FLOPs from
the compiled executable's cost analysis.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def count_params_by_prefix(params, depth: int = 2) -> Dict[str, int]:
    out: Dict[str, int] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(k, "key", k)) for k in path[:depth])
        out[name] = out.get(name, 0) + int(np.prod(leaf.shape))
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))


def flops_of(fn: Callable, *args) -> float:
    """FLOPs of jit(fn)(*args) from XLA cost analysis (lowered, not run)."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def model_complexity(model, params, *example_args) -> Tuple[int, float]:
    """(num_params, forward_flops) — get_model_complexity_info twin."""
    n = count_params(params)
    try:
        f = flops_of(lambda p, *a: model.apply(p, *a), params, *example_args)
    except Exception:
        f = float("nan")
    return n, f
