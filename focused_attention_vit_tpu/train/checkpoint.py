"""Checkpoint / resume via Orbax.

The reference never saves training state — only results CSVs persist
(SURVEY.md §5 checkpoint row). This module is the TPU-native capability
superset: per-epoch ``TrainState`` save/restore with retention, giving
resume-after-crash for free, plus simple msgpack (de)serialization of bare
param pytrees for the pretrained-weight cache (the converted-checkpoint
analogue of the reference's ``torch.save`` cache,
utils/data_utils.py:291-303).

Async saves (``async_save=True``, the experiment default): ``save()``
takes a cheap on-device snapshot (one jitted whole-tree buffer copy —
milliseconds at HBM bandwidth) and returns; the expensive device→host
pull plus the Orbax + sidecar writes run on a background thread while
training continues. The snapshot is what makes this safe against the
train step's buffer donation: the copies are fresh buffers nobody ever
donates, so the background ``device_get`` cannot race the next step
reusing the live state's memory. On this environment's remote-tunnel
device the pull alone is tens of seconds for a ViT-B ``TrainState``
(>1 GB at ~30 MB/s), all of it hidden. Background failures are
re-raised at the next ``save``/``restore``/``latest_step``/``close``
call, and every read path waits for the in-flight save first, so
observable semantics match the blocking mode; a crash mid-save loses at
most the in-flight checkpoint (Orbax commits atomically, the previous
step survives).
"""

from __future__ import annotations

import os
import threading
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp
from flax import serialization


@jax.jit
def _copy_leaves(leaves):
    # jnp.copy under jit emits a real copy op: the outputs are distinct
    # buffers, never input-forwarded, bit-exact incl. -0.0 (pinned by
    # tests/test_checkpoint.py::test_async_snapshot_is_a_distinct_copy).
    return [jnp.copy(x) for x in leaves]


def _device_snapshot(tree):
    """On-device copy of every jax.Array leaf (one dispatch), other
    leaves passed through (host values carry no donation hazard)."""
    leaves, treedef = jax.tree.flatten(tree)
    idx = [i for i, leaf in enumerate(leaves) if isinstance(leaf, jax.Array)]
    if idx:
        copied = _copy_leaves([leaves[i] for i in idx])
        for i, c in zip(idx, copied):
            leaves[i] = c
    return jax.tree.unflatten(treedef, leaves)


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees.

    ``async_save=True`` makes ``save()`` non-blocking (see module
    docstring); at most one save is in flight — a second ``save`` first
    waits for the previous one.
    """

    def __init__(
        self, directory: str, max_to_keep: int = 3, async_save: bool = False
    ):
        self._dir = os.path.abspath(directory)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._async = bool(async_save)
        self._pending: Optional[threading.Thread] = None
        self._pending_exc: Optional[BaseException] = None

    def save(self, step: int, state) -> None:
        self.wait_until_finished()  # serialize saves; surface prior failure
        if not self._async:
            self._write(step, state)
            return
        snapshot = _device_snapshot(state)
        t = threading.Thread(
            target=self._background_write,
            args=(step, snapshot),
            name=f"ckpt-save-{step}",
            daemon=True,
        )
        self._pending = t
        t.start()

    def _background_write(self, step: int, snapshot) -> None:
        try:
            # The device→host pull — the expensive part on a remote
            # tunnel — happens here, off the training thread, reading
            # only the snapshot's private buffers.
            self._write(step, jax.device_get(snapshot))
        except BaseException as e:  # re-raised at the next sync point
            self._pending_exc = e

    def _write(self, step: int, state) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()
        # Params-only sidecar for serving (restoring a full TrainState
        # requires an optimizer-structure-matching template, which a
        # serving process doesn't have).
        save_params(
            os.path.join(self._dir, "params_latest.msgpack"), state.params
        )

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed; re-raise
        its failure if it had one."""
        t = self._pending
        if t is not None:
            t.join()
            self._pending = None
        if self._pending_exc is not None:
            exc, self._pending_exc = self._pending_exc, None
            raise RuntimeError(
                "async checkpoint save failed (raised in the background "
                "writer; training continued past the failed epoch)"
            ) from exc

    def params_path(self) -> str:
        return os.path.join(self._dir, "params_latest.msgpack")

    def restore(self, state_template, step: Optional[int] = None):
        self.wait_until_finished()
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        self.wait_until_finished()
        return self._mngr.latest_step()

    def close(self):
        self.wait_until_finished()
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
