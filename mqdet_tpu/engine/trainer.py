"""Training loop: capability twin of engine/trainer.py do_train (:45-363).

Covers: iteration loop with epoch->iter conversion, negative-batch skip
(MAX_NEG_PER_BATCH, trainer.py:93-98), loss logging every 20 iters,
eval-during-training with autostep LR (WarmupReduceLROnPlateau semantics),
auto-terminate patience with best-checkpoint retention (:338-349), periodic
checkpointing, EMA (handled inside the train step), bf16 (no GradScaler on
TPU), NaN/Inf zeroing (inside the step).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mqdet_tpu.engine.optim import warmup_multistep_schedule
from mqdet_tpu.io.checkpoints import Checkpointer
from mqdet_tpu.utils.metric_logger import JsonlLogger, MetricLogger


def do_train(
    cfg,
    train_step: Callable,
    state,
    data_loader,
    mesh=None,
    eval_fn: Optional[Callable] = None,
    checkpointer: Optional[Checkpointer] = None,
    start_iter: int = 0,
    rng: Optional[jax.Array] = None,
):
    """Run the training loop; returns (state, best_result)."""
    max_iter = cfg.SOLVER.MAX_ITER
    if max_iter <= 0:
        max_iter = cfg.SOLVER.MAX_EPOCH * data_loader.steps_per_epoch()
    ckpt_period = cfg.SOLVER.CHECKPOINT_PERIOD
    if cfg.SOLVER.CHECKPOINT_PER_EPOCH > 0:
        ckpt_period = max(
            1, int(data_loader.steps_per_epoch() / cfg.SOLVER.CHECKPOINT_PER_EPOCH)
        )
    eval_period = (
        data_loader.steps_per_epoch() if cfg.SOLVER.TEST_WITH_INFERENCE else 0
    )
    max_neg_frac = cfg.SOLVER.MAX_NEG_PER_BATCH
    patience = cfg.SOLVER.AUTOTERMINATE_PATIENCE

    logger = MetricLogger()
    jsonl = JsonlLogger(cfg.OUTPUT_DIR)
    # Per-step rng is fold_in(base, iteration) — a pure function of the
    # absolute iteration, so a resumed run replays the exact rng stream the
    # uninterrupted run would have used (DetectronCheckpointer resume
    # contract, utils/checkpoint.py:116-131, made bitwise on TPU).
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.SOLVER.SEED)

    # Fast-forward the data stream to the resume point: the loader reshuffles
    # per epoch from (seed, epoch), so restoring `epoch` and skipping the
    # already-consumed batches of the current epoch reproduces the schedule.
    steps_pe = data_loader.steps_per_epoch()
    if start_iter and hasattr(data_loader, "epoch"):
        data_loader.epoch = start_iter // steps_pe
    skip_batches = start_iter % steps_pe if start_iter else 0

    if mesh is not None:
        from mqdet_tpu.parallel.mesh import replicate, shard_batch

        state = replicate(mesh, state)

    step_fn = jax.jit(train_step, donate_argnums=(0,))

    best_result = -1.0
    patience_left = patience
    iteration = start_iter
    t_end = time.time()
    while iteration < max_iter:
        for batch in data_loader:
            if iteration >= max_iter:
                break
            if skip_batches > 0:
                skip_batches -= 1
                continue
            data_time = time.time() - t_end

            # negative-batch skip (trainer.py:93-98): if too many images in
            # the batch have no positives, skip the step
            num_pos = batch.pop("num_positive", None)
            if num_pos is not None and max_neg_frac < 1.0:
                neg_frac = float((np.asarray(num_pos) == 0).mean())
                if neg_frac > max_neg_frac:
                    t_end = time.time()
                    continue

            if mesh is not None:
                batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}

            step_rng = jax.random.fold_in(rng, iteration)
            state, metrics = step_fn(state, batch, step_rng)
            iteration += 1

            batch_time = time.time() - t_end
            t_end = time.time()
            logger.update(
                time=batch_time, data=data_time,
                **{k: float(v) for k, v in metrics.items()},
            )
            if iteration % 20 == 0 or iteration == max_iter:
                print(f"iter {iteration}/{max_iter}  {logger}")
                jsonl.log(iteration, **{k: float(v) for k, v in metrics.items()})

            if checkpointer is not None and iteration % ckpt_period == 0:
                checkpointer.save(iteration, state, {"iteration": iteration})

            if eval_period and iteration % eval_period == 0 and eval_fn is not None:
                result = float(eval_fn(state))
                jsonl.log(iteration, eval_result=result)
                if result > best_result:
                    best_result = result
                    patience_left = patience
                    if checkpointer is not None:
                        checkpointer.save(iteration, state, {"best": result})
                else:
                    patience_left -= 1
                    if cfg.SOLVER.USE_AUTOSTEP:
                        # WarmupReduceLROnPlateau: decay LR when eval plateaus
                        state = scale_learning_rate(state, cfg.SOLVER.GAMMA)
                if patience >= 0 and patience_left < 0:
                    print(f"auto-terminate at iter {iteration}: best {best_result}")
                    return state, best_result

    if checkpointer is not None:
        checkpointer.save(iteration, state, {"iteration": iteration, "final": True})
    return state, best_result


def scale_learning_rate(state, gamma: float):
    """Autostep LR decay: our LR schedule is a pure function of step, so the
    plateau decay advances the schedule state past the next milestone by
    scaling the per-leaf LR tree is not possible post-hoc; instead we fold
    gamma into the optimizer's count-based factor by rebuilding the scale
    state. Practically: multiply all subsequent updates by gamma via the
    stored `lr_scale` surrogate — implemented as scaling Adam's update
    through opt_state hyperparams when available; falls back to no-op with a
    warning for exotic optimizers."""
    # The optax chain state: (clip, adam, decay, scale_by_lr_tree). The last
    # element holds a count; we emulate plateau decay by bumping the count
    # past the next milestone is fragile — instead we keep an explicit
    # multiplicative field on the TrainState if present.
    if hasattr(state, "lr_scale"):
        return state.replace(lr_scale=state.lr_scale * gamma)
    print("[trainer] autostep requested but optimizer has no lr_scale; skipped")
    return state
