"""Checkpoint save/restore (orbax) + resume discovery.

Replaces Lightning's ModelCheckpoint (save_last + top-1 on a monitored metric,
config/defaults.yaml:28-32) and `find_last_checkpoint_path` resume discovery
(utils/utils_train.py:103-113).  Best-so-far state is saved inside the
checkpoint so tracking survives resume (engines/base.py:57-61).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """last + best-k checkpoints under `directory`."""

    def __init__(self, directory: str, monitor: str = "val_psnr",
                 mode: str = "max", save_top_k: int = 1):
        self.directory = osp.abspath(osp.expanduser(directory))
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=save_top_k + 1,
                best_fn=(lambda m: m.get(self.monitor, -np.inf)
                         if mode == "max" else -m.get(self.monitor, np.inf)),
                best_mode="max",
                keep_checkpoints_without_metrics=True,
            ),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_params_only(self, params_template: Any,
                            step: Optional[int] = None) -> Any:
        """Extract just the model params from a saved TrainState/GANTrainState
        (cross-stage handoff, e.g. BSR PSNR -> GAN generator warm start)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(None))
        for key in ("params", "params_g"):
            if isinstance(restored, dict) and key in restored:
                found = restored[key]
                break
        else:
            found = restored
        # align leaf dtypes/structure with the template
        flat_t, treedef = jax.tree_util.tree_flatten(params_template)
        flat_r = jax.tree_util.tree_leaves(found)
        assert len(flat_t) == len(flat_r), "checkpoint/template mismatch"
        return jax.tree_util.tree_unflatten(
            treedef,
            [np.asarray(r).astype(t.dtype) for t, r in zip(flat_t, flat_r)],
        )

    def close(self):
        self._mgr.close()


def find_last_checkpoint_dir(output_path: str) -> Optional[str]:
    """Resume discovery: latest version dir containing checkpoints
    (utils/utils_train.py:103-113 semantics, orbax layout)."""
    if not osp.isdir(output_path):
        return None
    versions = sorted(
        (d for d in os.listdir(output_path) if d.startswith("version_")),
        key=lambda d: int(d.split("_")[1]),
        reverse=True,
    )
    for v in versions:
        ckpt_dir = osp.join(output_path, v, "checkpoints")
        if osp.isdir(ckpt_dir) and os.listdir(ckpt_dir):
            return ckpt_dir
    return None
