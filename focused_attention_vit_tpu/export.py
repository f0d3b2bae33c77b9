"""Serialized serving artifacts — StableHLO via ``jax.export``.

The torch reference "deploys" by unpickling Python modules next to their
source tree (`/root/reference/utils/data_utils.py:247-384` loads `.pth`
state dicts into freshly constructed classes); a TPU-native framework's
deployment unit is a *compiled program*. This module packages the live
:class:`~focused_attention_vit_tpu.infer.Predictor`'s serving function —
uint8 NHWC in, probabilities out, with the on-device resize/normalize
preprocessing and the chunk-scan schedule included — as a self-contained
artifact directory:

``serving_fn.jaxexport``
    the serialized StableHLO program (``jax.export`` stable-serialization
    bytes), lowered for both ``tpu`` and ``cpu`` so one artifact serves on
    either backend;
``params.msgpack``
    the parameter pytree (flax msgpack — same format as the training
    checkpoints' sidecar);
``meta.json``
    shapes, class count, normalization constants, framework/jax versions.

Loading (:func:`load_serving_artifact`) needs **no model class and no
framework model code** — the program is replayed by XLA from the artifact
alone — which is the property that makes it a deployment format rather
than a checkpoint: serving hosts don't import ``models/``.

Numerics are identical to the live Predictor *by construction*: the
exported computation is the very jitted function the Predictor serves
with, not a re-derivation (pinned by tests/test_export.py).

Measured on the v5e (2026-08-19): ``serve --from_export`` + HTTP
round-trip serves artifact probabilities matching the live path; the
first ``warmup()`` of a deserialized artifact pays a full XLA compile
(~minutes on the remote-compile toolchain — the persistent compile cache
keys the deserialized StableHLO differently from the original trace), so
warm once at deploy time, before cutting traffic over.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from focused_attention_vit_tpu.infer import Predictor, padded_predict_proba

_FN_FILE = "serving_fn.jaxexport"
_PARAMS_FILE = "params.msgpack"
_META_FILE = "meta.json"


def save_serving_artifact(
    predictor: Predictor,
    out_dir: str,
    *,
    input_hw: Tuple[int, int] | None = None,
) -> str:
    """Export ``predictor``'s serving program + params to ``out_dir``.

    ``input_hw`` fixes the client image shape baked into the program
    (default: the model's own ``img_size`` square — the program resizes
    in-graph, but an exported artifact is one XLA program, hence one
    input shape; export one artifact per shape clients will send).
    Mesh-sharded predictors are refused: a serialized program pins a
    device topology, which is a deployment-site decision — export the
    single-device artifact and shard at load time instead.
    """
    if predictor.mesh is not None:
        raise ValueError(
            "export of a mesh-sharded Predictor is not supported: the "
            "serialized program would pin this host's device topology. "
            "Export from a Predictor(mesh=None) and apply sharding on the "
            "serving host."
        )
    from flax import serialization

    h, w = input_hw if input_hw is not None else (
        predictor.img_size, predictor.img_size
    )
    params_shapes = jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(jnp.shape(p), jnp.result_type(p)),
        predictor.params,
    )
    exported = jax.export.export(
        predictor._fwd, platforms=("tpu", "cpu")
    )(
        params_shapes,
        jax.ShapeDtypeStruct((predictor.batch_size, h, w, 3), jnp.uint8),
    )

    # The three files are one logical artifact: write them into a fresh
    # temp directory and swap directories at the end, so a crash mid-write
    # can never leave a MIXED artifact (new program + old params would
    # load cleanly and serve wrong predictions). The windows that remain
    # fail loudly (missing directory), never wrongly.
    import shutil

    tmp_dir = out_dir.rstrip("/") + ".tmp-new"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    for name, payload in (
        (_FN_FILE, exported.serialize()),
        (_PARAMS_FILE, serialization.msgpack_serialize(
            jax.tree.map(np.asarray, predictor.params)
        )),
        (_META_FILE, json.dumps({
            "batch_size": predictor.batch_size,
            "input_hw": [h, w],
            "num_classes": int(predictor.model.num_classes),
            "img_size": predictor.img_size,
            "jax_version": jax.__version__,
            "platforms": list(exported.platforms),
        }, indent=2).encode()),
    ):
        with open(os.path.join(tmp_dir, name), "wb") as f:
            f.write(payload)
    if os.path.exists(out_dir):
        old_dir = out_dir.rstrip("/") + ".tmp-old"
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
        os.rename(out_dir, old_dir)
        os.rename(tmp_dir, out_dir)
        shutil.rmtree(old_dir)
    else:
        os.rename(tmp_dir, out_dir)
    return out_dir


class ExportedPredictor:
    """Serving face of a loaded artifact — the Predictor API
    (``predict_proba`` / ``predict``, arbitrary request sizes via the
    shared padding loop) without any model class behind it."""

    def __init__(self, fwd, params, meta: Dict[str, Any]):
        self._fwd = fwd
        self.params = params
        self.meta = meta
        self.batch_size = int(meta["batch_size"])
        self.num_classes = int(meta["num_classes"])
        self.input_hw = tuple(meta["input_hw"])

    def warmup(self) -> None:
        h, w = self.input_hw
        dummy = np.zeros((self.batch_size, h, w, 3), dtype=np.uint8)
        np.asarray(self._fwd(self.params, jnp.asarray(dummy)))

    def predict_proba(self, images_u8: np.ndarray) -> np.ndarray:
        return padded_predict_proba(
            self._fwd, self.params, self.batch_size, self.num_classes,
            images_u8,
        )

    def predict(self, images_u8: np.ndarray):
        probs = self.predict_proba(images_u8)
        ids = probs.argmax(-1)
        return ids, probs[np.arange(len(ids)), ids]


def load_serving_artifact(artifact_dir: str) -> ExportedPredictor:
    """Rehydrate an artifact directory into a serving callable.

    Imports no model code: the program comes from the StableHLO bytes,
    the params from the msgpack pytree (plain nested dict of arrays —
    the same tree structure the program was traced with).
    """
    from flax import serialization

    missing = [n for n in (_FN_FILE, _PARAMS_FILE, _META_FILE)
               if not os.path.exists(os.path.join(artifact_dir, n))]
    if missing:
        raise FileNotFoundError(
            f"{artifact_dir} is not a complete serving artifact "
            f"(missing {missing}); re-export with save_serving_artifact"
        )
    with open(os.path.join(artifact_dir, _FN_FILE), "rb") as f:
        rehydrated = jax.export.deserialize(f.read())
    with open(os.path.join(artifact_dir, _PARAMS_FILE), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    with open(os.path.join(artifact_dir, _META_FILE)) as f:
        meta = json.load(f)
    fwd = jax.jit(rehydrated.call)
    return ExportedPredictor(fwd, params, meta)
