"""Orbax checkpointing with the reference's logical content.

The reference saves {iteration, model/optimizer/scheduler state, acc} as
``checkpoint_{best,iter_N}.pt`` (reference: run/main_run.py:405-427). Here the
same logical payload (episode count, params, batch_stats, opt_state, best
accuracy, rng) round-trips through orbax; LR-schedule state is implicit in
the optimizer step count, matching the reference's episode-unit milestones.

Unlike the reference, a fresh run never deletes an existing checkpoint dir
(reference: utils/utils.py:61-95 ``rm -rf``s it — SURVEY §2.8 defect 6);
collisions are an error instead.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import orbax.checkpoint as ocp

from .learner import TrainState


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, f"checkpoint_{tag}")

    def save(self, state: TrainState, tag: str, best_acc: float = 0.0,
             overwrite: bool = True) -> str:
        path = self._path(tag)
        payload = {
            "state": state,
            "meta": {"iteration": np.asarray(int(state.episode)),
                     "acc": np.asarray(float(best_acc))},
        }
        self._ckptr.save(path, payload, force=overwrite)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, tag: str, template_state: TrainState
                ) -> Dict[str, Any]:
        return self.restore_path(self._path(tag), template_state)

    def restore_path(self, path: str, template_state: TrainState
                     ) -> Dict[str, Any]:
        """Restore from an explicit checkpoint directory (the
        ``TEST.TEST_MODEL_PATH`` surface — reference: utils/utils.py:113 +
        run/main_run.py:415-418 load an arbitrary path in ONLY_TEST mode)."""
        path = os.path.abspath(path)
        if os.path.isfile(path):
            raise ValueError(
                f"checkpoint path {path} is a FILE — this framework saves "
                "orbax checkpoint DIRECTORIES (checkpoint_<tag>/). A "
                "reference torch .pt head checkpoint is not loadable here "
                "(different parameter layout); pretrained CLIP backbone "
                ".pt weights import via models/backbones/torch_import.py "
                "at build time instead.")
        template = {
            "state": template_state,
            "meta": {"iteration": np.asarray(0), "acc": np.asarray(0.0)},
        }
        try:
            payload = self._ckptr.restore(path, template)
        except ValueError as e:
            if "mismatch" in str(e).lower() or "MISSING" in str(e):
                raise ValueError(
                    f"checkpoint at {path} does not match the current model's "
                    "parameter tree — it was likely saved by a different "
                    "MODEL.NAME/BACKBONE. Point CHECKPOINT.CHECKPOINT_DIR at "
                    "a matching checkpoint (or an empty directory to skip "
                    "restore).") from e
            raise
        return payload

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))
