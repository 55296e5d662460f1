"""Checkpoint/resume round trip — the DetectronCheckpointer contract
(reference utils/checkpoint.py:34-211, tools/train_net.py:167-189):
save {model, optimizer, iteration, arguments}, tag `last_checkpoint`,
restore into a fresh process, and continue training EXACTLY as if never
interrupted (rng stream, data order, optimizer state, EMA, lr_scale).
"""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqdet_tpu.io.checkpoints import Checkpointer


def _tree_equal(a, b, exact=True):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        if exact:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_checkpointer_round_trip_and_pruning(tmp_path):
    """Save/restore an arbitrary nested state; last_checkpoint tag; arguments
    sidecar; MAX_TO_KEEP pruning (checkpoint.py:16-32)."""
    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "opt": (np.float32(3.5), {"m": np.ones((4,), np.float32)}),
        "step": np.int32(7),
    }
    ckpt = Checkpointer(str(tmp_path), max_to_keep=2)
    assert not ckpt.has_checkpoint()
    for step in (1, 2, 3):
        ckpt.save(step, state, {"iteration": step, "best": 0.5 * step})
    assert ckpt.has_checkpoint()
    assert ckpt.last_step() == 3
    template = jax.tree.map(lambda x: np.zeros_like(x), state)
    restored, step = ckpt.restore(template)
    assert step == 3
    _tree_equal(state, restored)
    assert ckpt.load_arguments(3)["iteration"] == 3
    # max_to_keep=2: step 1 must have been pruned
    with pytest.raises(Exception):
        ckpt.restore(template, step=1)


class _FakeLoader:
    """Epoch-reshuffling loader with the GroundingTrainLoader surface."""

    def __init__(self, n=4):
        self.n = n
        self.epoch = 0

    def steps_per_epoch(self):
        return self.n

    def __iter__(self):
        ids = list(range(self.n))
        random.Random(7 + self.epoch).shuffle(ids)
        self.epoch += 1
        for i in ids:
            yield {"x": np.full((2, 2), float(i), np.float32)}


def _fake_step(state, batch, rng):
    w = state["w"] * 0.9 + batch["x"].sum() + jax.random.uniform(rng)
    return {"w": w}, {"loss_total": w.sum()}


def test_do_train_resume_replays_schedule(tmp_path):
    """do_train interrupted at iter 3 of 5 (mid-epoch-2 data position) and
    resumed from the checkpoint must produce bitwise-identical state to the
    uninterrupted run: fold_in rng stream, loader epoch restore, and
    skip-consumed-batches fast-forward are all exercised."""
    from mqdet_tpu.engine.trainer import do_train
    from mqdet_tpu.utils.builders import tiny_test_config

    def fresh_cfg(out):
        cfg = tiny_test_config()
        cfg.OUTPUT_DIR = str(out)
        cfg.SOLVER.CHECKPOINT_PERIOD = 3
        cfg.SOLVER.TEST_WITH_INFERENCE = False
        cfg.SOLVER.AUTOTERMINATE_PATIENCE = -1
        return cfg

    # do_train donates the state buffers into the jitted step, so each run
    # gets its own freshly-materialized state.
    def state0():
        return {"w": jnp.zeros((2, 2), jnp.float32)}

    # uninterrupted 5 steps
    cfg = fresh_cfg(tmp_path / "straight")
    cfg.SOLVER.MAX_ITER = 5
    straight, _ = do_train(cfg, _fake_step, state0(), _FakeLoader())

    # interrupted at 3 + resumed to 5, fresh loader (as a new process has)
    cfg_a = fresh_cfg(tmp_path / "part1")
    cfg_a.SOLVER.MAX_ITER = 3
    ckpt = Checkpointer(str(tmp_path / "part1"), max_to_keep=2)
    do_train(cfg_a, _fake_step, state0(), _FakeLoader(), checkpointer=ckpt)
    assert ckpt.last_step() == 3
    restored, start = ckpt.restore(jax.tree.map(jnp.zeros_like, state0()))
    assert start == 3
    cfg_b = fresh_cfg(tmp_path / "part2")
    cfg_b.SOLVER.MAX_ITER = 5
    resumed, _ = do_train(cfg_b, _fake_step, restored, _FakeLoader(), start_iter=start)

    _tree_equal(straight, resumed)


@pytest.mark.slow
def test_real_train_state_resume_round_trip(tmp_path):
    """3 steps + save + restore-into-zero-template + 2 steps == 5 straight
    steps, bitwise, on the real MQ-GLIP train step — including optimizer
    moments, EMA, and lr_scale (reference counterpart: optimizer+scheduler
    state_dict round trip, utils/checkpoint.py:44-58)."""
    from test_multidevice import _build_tiny_train

    train_step, state0, batch, _ = _build_tiny_train()
    step = jax.jit(train_step)
    rng = jax.random.PRNGKey(11)

    s = state0
    for it in range(5):
        s, _ = step(s, batch, jax.random.fold_in(rng, it))

    s2 = state0
    for it in range(3):
        s2, _ = step(s2, batch, jax.random.fold_in(rng, it))
    ckpt = Checkpointer(str(tmp_path), max_to_keep=2)
    ckpt.save(3, s2, {"iteration": 3})

    template = jax.tree.map(jnp.zeros_like, s2)
    restored, start = ckpt.restore(template)
    assert start == 3
    for it in range(3, 5):
        restored, _ = step(restored, batch, jax.random.fold_in(rng, it))

    _tree_equal(s, restored)
