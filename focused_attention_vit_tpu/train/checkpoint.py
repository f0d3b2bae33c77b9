"""Checkpoint / resume via Orbax.

The reference never saves training state — only results CSVs persist
(SURVEY.md §5 checkpoint row). This module is the TPU-native capability
superset: per-epoch ``TrainState`` save/restore with retention, giving
resume-after-crash for free, plus simple msgpack (de)serialization of bare
param pytrees for the pretrained-weight cache (the converted-checkpoint
analogue of the reference's ``torch.save`` cache,
utils/data_utils.py:291-303).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp
from flax import serialization


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()
        # Params-only sidecar for serving (restoring a full TrainState
        # requires an optimizer-structure-matching template, which a
        # serving process doesn't have).
        save_params(
            os.path.join(self._dir, "params_latest.msgpack"), state.params
        )

    def params_path(self) -> str:
        return os.path.join(self._dir, "params_latest.msgpack")

    def restore(self, state_template, step: Optional[int] = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self):
        self._mngr.close()


def save_params(path: str, params: Any) -> str:
    """Serialize a bare param pytree to msgpack (pretrained-weight cache).

    Written to a temp path + atomic ``os.replace`` so a crash mid-write
    (the exact scenario checkpointing exists to survive) cannot destroy
    the previous good copy."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return path


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
