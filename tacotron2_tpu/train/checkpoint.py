"""Checkpointing: orbax-backed save/restore with partial-restore masks.

Replaces the reference's tf.train.Saver machinery (tacotron/train.py:267-345;
wavenet_vocoder/train.py:67-86):
- periodic checkpoints with max_to_keep (reference: 250 steps / keep 50)
- partial restore: drop pretrained/nat_gan/optimizer subtrees on restart
  (tacotron/train.py:274-288) via subtree filters applied after restore
- WaveNet EMA 'shadow saver' equivalence: the full TrainState (params AND
  ema_params) is checkpointed, so synthesis restores averaged weights.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax CheckpointManager wrapper for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 50):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any = None,
                step: Optional[int] = None) -> Any:
        """Restore into the structure of `abstract_state` (a live pytree).

        With abstract_state=None, restores the checkpoint's own saved
        structure (for consumers that don't know the saved tree, e.g.
        importing another model's discriminator checkpoint)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if abstract_state is None:
            return self._mgr.restore(step)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def close(self):
        self._mgr.close()


def partial_restore(restored_params: Any, fresh_params: Any,
                    skip_predicate: Callable[[str], bool]) -> Any:
    """Keep fresh values for parameter subtrees matching `skip_predicate`.

    Mirrors the reference's var-list filtered savers (tacotron/train.py:274-288)
    — e.g. `lambda n: 'pretrained' in n or 'nat_gan' in n` on restart.
    """
    def pick(path, restored_leaf, fresh_leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        return fresh_leaf if skip_predicate(name) else restored_leaf

    return jax.tree_util.tree_map_with_path(pick, restored_params, fresh_params)


def import_pretrained_subtree(params: Any, pretrained: Any,
                              target_prefix: str) -> Any:
    """Graft a pretrained param subtree into the model under `target_prefix`.

    The reference's pretrained emt/spk discriminator import
    (tacotron/train.py:280-285, scopes pretrained_ref_enc_{emt,spk}).
    """
    if target_prefix not in params:
        raise KeyError(f"model has no subtree {target_prefix!r}")
    new = dict(params)
    new[target_prefix] = pretrained
    return new
