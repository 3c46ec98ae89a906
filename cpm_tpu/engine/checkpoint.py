"""Checkpointing: orbax-backed save/resume with the reference's layout.

Parity with /root/reference/pet/utils/checkpointer.py:35-158:
  * save {params, opt_state, step} as `model_latest` plus an
    iteration-tagged copy every SNAPSHOT_ITERS (save:124-137);
  * auto-resume from `model_latest` when TRAIN.AUTO_RESUME (:47-54);
  * pretrained-weight loading with suffix-matching alignment lives in
    cpm_tpu/utils/weight_import.py (align_and_update_state_dicts
    equivalent).
"""

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckPointer:
    def __init__(self, ckpt_dir: str, auto_resume: bool = True):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.checkpointer = ocp.StandardCheckpointer()
        self.latest_path = os.path.join(self.ckpt_dir, "model_latest")
        self.resumed = auto_resume and os.path.exists(self.latest_path)

    def save(self, state, step: int, snapshot: bool = False):
        """Write model_latest (+ model_iter<N> snapshot copy)."""
        payload = jax.tree_util.tree_map(np.asarray, state)
        for path in [self.latest_path] + (
            [os.path.join(self.ckpt_dir, f"model_iter{step}")]
            if snapshot
            else []
        ):
            self.checkpointer.save(path, payload, force=True)
        self.checkpointer.wait_until_finished()

    def load(self, abstract_state) -> Optional[Any]:
        """Restore model_latest into the given abstract pytree, or None."""
        if not os.path.exists(self.latest_path):
            return None
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state
        )
        return self.checkpointer.restore(self.latest_path, abstract)
