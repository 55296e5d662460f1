"""Training checkpoints (orbax) with the reference checkpointer's surface.

Capability twin of DetectronCheckpointer
(maskrcnn_benchmark/utils/checkpoint.py:34-211): save/load
{model, optimizer state, iteration, extra arguments (eval_result, ema,
dataset ids)}; a `last_checkpoint` tag file (:116-131); keep the newest
MAX_TO_KEEP checkpoints (:16-32). Torch/Detectron-format loading lives in
io/torch_import.py.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        flat[name] = np.asarray(leaf)
    return flat


class Checkpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 4):
        self.output_dir = output_dir
        self.max_to_keep = max_to_keep
        os.makedirs(output_dir, exist_ok=True)
        self._mgr = None

    def _manager(self):
        if self._mgr is None:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.output_dir, "ckpts")),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.max_to_keep, create=True
                ),
            )
        return self._mgr

    def save(self, step: int, state, arguments: Optional[Dict[str, Any]] = None):
        import orbax.checkpoint as ocp

        mgr = self._manager()
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
        with open(os.path.join(self.output_dir, "last_checkpoint"), "w") as f:
            f.write(str(step))
        if arguments:
            with open(
                os.path.join(self.output_dir, f"arguments_{step}.json"), "w"
            ) as f:
                json.dump(arguments, f, default=str)

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.output_dir, "last_checkpoint"))

    def last_step(self) -> Optional[int]:
        tag = os.path.join(self.output_dir, "last_checkpoint")
        if not os.path.exists(tag):
            return None
        with open(tag) as f:
            return int(f.read().strip())

    def restore(self, state_template, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self.last_step()
        assert step is not None, "no checkpoint to restore"
        mgr = self._manager()
        return mgr.restore(step, args=ocp.args.StandardRestore(state_template)), step

    def load_arguments(self, step: int) -> Dict[str, Any]:
        path = os.path.join(self.output_dir, f"arguments_{step}.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {}


def save_params_npz(path: str, params) -> None:
    """Export a param tree to a flat npz (clean native serving format)."""
    np.savez_compressed(path, **_flatten(params))


def load_params_npz(path: str, params_template):
    """Load a flat npz back into the template's structure."""
    data = np.load(path)

    def fill(p, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in p)
        arr = data[name]
        assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
        return arr.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, params_template)
