"""Optimizer / LR schedule construction (optax).

Capability twin of the reference solver
(maskrcnn_benchmark/solver/build.py:8-121, solver/lr_scheduler.py:11-163):
  * AdamW with per-parameter LR groups selected by name substring —
    language_backbone -> LANG_LR; attn_gate/ff_gate -> GATE_LR;
    pre_select/qv_layer -> QUERY_LR (later rules override earlier, matching
    the reference's sequential ifs); bias LR x BIAS_LR_FACTOR.
  * full-model global-norm gradient clipping (CLIP_TYPE=full_model).
  * WarmupMultiStepLR: linear warmup then gamma^k decay at fractional
    milestones of MAX_ITER.
  * frozen-parameter partition driven by the TUNING_HIGHLEVEL_OVERRIDE
    recipes (tools/train_net.py:41-59): trainable iff any pattern matches.
  * ModelEma decay (utils/ema.py:6-46) as a pure function.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax


def path_name(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def lr_group_for(name: str, cfg) -> float:
    lr = cfg.SOLVER.BASE_LR
    if "language_backbone" in name:
        lr = cfg.SOLVER.LANG_LR
    if "attn_gate" in name or "ff_gate" in name:
        lr = cfg.SOLVER.GATE_LR
    if "pre_select" in name or "qv_layer" in name:
        lr = cfg.SOLVER.QUERY_LR
    if "bias" in name:
        lr *= cfg.SOLVER.BIAS_LR_FACTOR
    return lr


def is_trainable(name: str, patterns: List[str]) -> bool:
    return any(p in name for p in patterns)


def warmup_multistep_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Multiplicative LR factor (solver/lr_scheduler.py WarmupMultiStepLR)."""
    max_iter = max(int(cfg.SOLVER.MAX_ITER), 1)
    milestones = []
    for s in cfg.SOLVER.STEPS:
        milestones.append(round(s * max_iter) if s < 1 else int(s))
    milestones = sorted(milestones)
    gamma = cfg.SOLVER.GAMMA
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR

    def factor(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warm = warmup_factor * (1 - alpha) + alpha
        warm = jnp.where(step < warmup_iters, warm, 1.0)
        decays = jnp.zeros(())
        for m in milestones:
            decays = decays + (step >= m)
        return warm * gamma**decays

    return factor


def cosine_schedule(cfg) -> Callable:
    """WarmupCosineAnnealingLR factor."""
    max_iter = max(int(cfg.SOLVER.MAX_ITER), 1)
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR

    def factor(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warm = warmup_factor * (1 - alpha) + alpha
        progress = jnp.clip((step - warmup_iters) / max(max_iter - warmup_iters, 1), 0.0, 1.0)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_iters, warm, cos)

    return factor


_NORM_MARKERS = ("norm", "_ln", "ln_", "/gn", "bn1", "bn2", "layernorm")


def wd_group_for(name: str, cfg) -> float:
    """Per-parameter weight decay (solver/build.py:26-53): norm-layer params
    get WEIGHT_DECAY * WEIGHT_DECAY_NORM_FACTOR."""
    wd = cfg.SOLVER.WEIGHT_DECAY
    low = name.lower()
    if any(m in low for m in _NORM_MARKERS):
        wd *= cfg.SOLVER.WEIGHT_DECAY_NORM_FACTOR
    return wd


def wd_schedule(cfg) -> Callable:
    """SOLVER.WEIGHT_DECAY_SCHEDULE (engine/trainer.py:193-206): drop the
    weight decay by GAMMA when the step passes milestone * SCHEDULE_RATIO."""
    if not cfg.SOLVER.WEIGHT_DECAY_SCHEDULE:
        return lambda step: 1.0
    max_iter = max(int(cfg.SOLVER.MAX_ITER), 1)
    milestones = sorted(
        round(s * max_iter) if s < 1 else int(s) for s in cfg.SOLVER.STEPS
    )
    ratio = cfg.SOLVER.WEIGHT_DECAY_SCHEDULE_RATIO
    gamma = cfg.SOLVER.GAMMA

    def factor(step):
        step = jnp.asarray(step, jnp.float32)
        decays = jnp.zeros(())
        for m in milestones:
            decays = decays + (step >= m * ratio)
        return gamma**decays

    return factor


def _add_scheduled_decay(wd_tree, factor):
    """add_decayed_weights with a per-leaf decay and a step-dependent scale."""

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        f = factor(state.count)
        updates = jax.tree.map(
            lambda u, p, w: u + w * f * p, updates, params, wd_tree
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_lr_tree(lr_tree, schedule):
    """u_leaf <- -base_lr_leaf * schedule(step) * u_leaf."""

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        f = schedule(state.count)
        updates = jax.tree.map(lambda u, lr: -lr * f * u, updates, lr_tree)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg, params, trainable_patterns: List[str] = None):
    """Build the optax transform over the TRAINABLE sub-tree.

    `params` is either a nested tree or the flat {path: array} dict produced
    by `partition_params` (preferred — LR groups key off the path strings).
    Returns (tx, lr_tree).
    """
    if isinstance(params, dict) and all(isinstance(k, str) for k in params):
        lr_tree = {k: lr_group_for(k, cfg) for k in params}
        wd_tree = {k: wd_group_for(k, cfg) for k in params}
    else:
        lr_tree = jax.tree_util.tree_map_with_path(
            lambda p, v: lr_group_for(path_name(p), cfg), params
        )
        wd_tree = jax.tree_util.tree_map_with_path(
            lambda p, v: wd_group_for(path_name(p), cfg), params
        )
    schedule = (
        cosine_schedule(cfg) if getattr(cfg.SOLVER, "USE_COSINE", False)
        else warmup_multistep_schedule(cfg)
    )

    chain = [optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)] if (
        cfg.SOLVER.CLIP_GRADIENTS.ENABLED
        and cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE == "full_model"
    ) else []

    # torch AdamW decays every param in the group; norm layers get the
    # NORM_FACTOR-scaled decay, and WEIGHT_DECAY_SCHEDULE drops it by GAMMA
    # past the (ratio-shifted) LR milestones
    decay = _add_scheduled_decay(wd_tree, wd_schedule(cfg))
    if cfg.SOLVER.OPTIMIZER == "ADAMW":
        chain += [
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            decay,
            _scale_by_lr_tree(lr_tree, schedule),
        ]
    elif cfg.SOLVER.OPTIMIZER == "SGD":
        chain += [
            optax.trace(decay=0.9),
            decay,
            _scale_by_lr_tree(lr_tree, schedule),
        ]
    else:
        raise ValueError(cfg.SOLVER.OPTIMIZER)

    return optax.chain(*chain), lr_tree


def partition_params(params, trainable_patterns: List[str],
                     frozen_patterns: List[str] = ()):
    """Split a param tree into flat {path: array} dicts and a merge fn.

    Mirrors requires_grad gating (tools/train_net.py:67-82,112-126): a leaf
    is trainable iff any recipe pattern is a substring of its path. The merge
    fn rebuilds the original nested tree; frozen leaves are closed over with
    stop_gradient by the caller's loss, so backward never materializes
    gradients for the frozen 90+% of MQ-GLIP.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    names = [path_name(p) for p, _ in flat]

    def train_ok(n):
        if any(fp in n for fp in frozen_patterns):
            return False
        return is_trainable(n, trainable_patterns)

    trainable = {n: v for n, (_, v) in zip(names, flat) if train_ok(n)}
    frozen = {n: v for n, (_, v) in zip(names, flat) if not train_ok(n)}

    def merge(trainable_d, frozen_d):
        leaves = [
            trainable_d[n] if n in trainable_d else frozen_d[n] for n in names
        ]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return trainable, frozen, merge


def ema_update(ema_params, new_params, decay: float = 0.999):
    """ModelEma (utils/ema.py): ema <- decay * ema + (1-decay) * new."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )
