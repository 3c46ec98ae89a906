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
        # Multi-process: the resume decision must be COLLECTIVE. If ranks
        # decided from their own os.path.exists and disagreed (eventually
        # consistent fs, a racing save), the divergent ranks would skip
        # load()'s barrier + collective orbax restore while the rest
        # block and die at the barrier timeout. Rank 0's answer is
        # broadcast through the coordination-service KV store so every
        # rank takes the same branch; ranks where the file is then
        # genuinely absent fail loudly in restore instead of deadlocking.
        self._exists = self._collective_exists()
        self.resumed = auto_resume and self._exists

    def _collective_exists(self) -> bool:
        local = os.path.exists(self.latest_path)
        if jax.process_count() <= 1:
            return local
        try:
            from jax._src import distributed

            client = distributed.global_state.client
            if client is None:
                return local
            key = f"cpm_ckpt_exists:{self.latest_path}"
            if jax.process_index() == 0:
                try:
                    client.key_value_set(key, "1" if local else "0",
                                         allow_overwrite=True)
                except TypeError:  # older jax: no allow_overwrite kwarg
                    client.key_value_set(key, "1" if local else "0")
            return client.blocking_key_value_get(key, 600_000) == "1"
        except Exception:
            return local  # best-effort: single-controller runtimes etc.

    def save(self, state, step: int, snapshot: bool = False):
        """Write model_latest (+ model_iter<N> snapshot copy).

        Multi-process discipline: EVERY process must call this (orbax
        coordinates with a barrier and the primary process writes the
        replicated host arrays) — the collective equivalent of the
        reference's rank-0 torch.save (train_net.py:84-88). The
        host-side np.asarray conversion requires the state to be fully
        replicated over the mesh, which DP training guarantees.
        """
        payload = jax.tree_util.tree_map(np.asarray, state)
        for path in [self.latest_path] + (
            [os.path.join(self.ckpt_dir, f"model_iter{step}")]
            if snapshot
            else []
        ):
            self.checkpointer.save(path, payload, force=True)
        self.checkpointer.wait_until_finished()
        self._exists = True  # save is collective: all ranks agree

    def load(self, abstract_state) -> Optional[Any]:
        """Restore model_latest into the given abstract pytree, or None.

        Falls back to a legacy-rename shim for checkpoints saved before
        the deform main param was renamed kernel -> weight (round 3,
        cpm_tpu/ops/deform_conv.py): deform modules are identified by a
        conv_offset[_mask] sibling, their "weight" leaf is presented to
        orbax as "kernel", then renamed back after restore.
        """
        # Collective decision (see _collective_exists): either every rank
        # returns None here or every rank proceeds to the barrier +
        # restore below. Re-evaluated when __init__ saw nothing — a
        # checkpoint may have been written since (e.g. by this process).
        if not self._exists:
            self._exists = self._collective_exists()
        if not self._exists:
            return None
        # Multi-process: orbax's restore ends with a GLOO-backed
        # sync_global_processes whose hard ~30s window cannot be
        # configured; ranks reach load() with minutes of startup skew
        # (backend init, cache loads), which kills the whole job. Align
        # on the coordination-service barrier (its timeout IS
        # configurable and it does not touch gloo) first.
        if jax.process_count() > 1:
            try:
                from jax._src import distributed

                client = distributed.global_state.client
                if client is not None:
                    client.wait_at_barrier(
                        "cpm_checkpointer_load", 600_000
                    )
            except Exception:
                pass  # single-controller runtimes have no client
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state
        )
        try:
            return self.checkpointer.restore(self.latest_path, abstract)
        except Exception as err:
            # The rename shim can only heal a structure mismatch caused
            # by legacy on-disk names; for any other failure (corrupt
            # checkpoint, genuine shape/dtype mismatch) re-raise the
            # ORIGINAL error rather than masking it with a retry
            # traceback.
            renamed, n = _rename_deform_weight(abstract, to_legacy=True)
            if n == 0 or self._on_disk_has_legacy_names() is False:
                raise
            try:
                restored = self.checkpointer.restore(
                    self.latest_path, renamed
                )
            except Exception as retry_err:
                raise retry_err from err
            out, _ = _rename_deform_weight(restored, to_legacy=False)
            return out

    def _on_disk_has_legacy_names(self) -> Optional[bool]:
        """True/False if the saved tree verifiably does/doesn't contain a
        legacy deform 'kernel' param (a conv_offset sibling), None when
        the metadata can't be read (then the retry stays permissive)."""
        try:
            meta = self.checkpointer.metadata(self.latest_path)
            tree = getattr(meta, "item_metadata", None) or meta
            found = False

            def walk(node):
                nonlocal found
                if hasattr(node, "keys"):
                    keys = set(node.keys())
                    if "kernel" in keys and (
                        "conv_offset" in keys
                        or "conv_offset_mask" in keys
                    ):
                        found = True
                    for k in keys:
                        walk(node[k])

            walk(tree)
            return found
        except Exception:
            return None


def _rename_deform_weight(tree, to_legacy: bool):
    """Rename deform-pack main params weight<->kernel throughout a pytree
    of nested dicts. A deform pack is any dict with a conv_offset or
    conv_offset_mask child next to the main param. Returns (tree, count)."""
    count = 0
    src, dst = ("weight", "kernel") if to_legacy else ("kernel", "weight")

    def walk(node):
        nonlocal count
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        if src in out and (
            "conv_offset" in out or "conv_offset_mask" in out
        ):
            out[dst] = out.pop(src)
            count += 1
        return out

    return walk(tree), count
