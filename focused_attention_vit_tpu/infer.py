"""Batch inference / serving path.

The reference has no inference entry point beyond the experiment eval
loops; this module is the production-serving face of the framework: one
compiled program, fixed batch shape (arbitrary request sizes handled by
padding), uint8 in / probabilities out, optional Orbax checkpoint loading.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from focused_attention_vit_tpu.data.pipeline import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    prepare_eval_batch,
)


def padded_predict_proba(
    fwd, params, batch_size: int, num_classes: int, images_u8: np.ndarray,
    *, max_in_flight: int = 2,
) -> np.ndarray:
    """Run a fixed-batch serving function over an arbitrary request size.

    Requests are cut into ``batch_size`` chunks, the last chunk padded by
    repeating its first image (padding rows discarded on the way out) —
    the one compiled program serves every request size. Shared by the live
    :class:`Predictor` and the deserialized artifact predictor
    (export.ExportedPredictor).

    Chunks are pipelined ``max_in_flight`` deep: JAX dispatch is async, so
    chunk i+1's host→device transfer overlaps chunk i's compute and
    result readback instead of serializing transfer→compute→readback per
    chunk (the serving path is transfer-bound — BASELINE.md "serving-stack
    throughput": 92% of a batch's 377 ms here is host↔device movement).
    Device memory holds at most ``max_in_flight`` input batches.
    """
    n = len(images_u8)
    if n == 0:
        return np.zeros((0, num_classes), dtype=np.float32)
    from collections import deque

    pending: deque = deque()  # (device_probs, pad)
    out = []

    def collect():
        dev, pad = pending.popleft()
        probs = np.asarray(dev)
        out.append(probs[: len(probs) - pad] if pad else probs)

    for start in range(0, n, batch_size):
        chunk = images_u8[start : start + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, axis=0)])
        pending.append((fwd(params, jnp.asarray(chunk)), pad))
        if len(pending) >= max(1, max_in_flight):
            collect()
    while pending:
        collect()
    return np.concatenate(out)[:n]


class Predictor:
    """Fixed-shape jitted classifier over uint8 NHWC images.

    One XLA program serves any request size: requests are cut into
    ``batch_size`` chunks, the last chunk padded (padding discarded on the
    way out), so the serving path never recompiles.
    """

    def __init__(
        self,
        model,
        params: Dict[str, Any],
        *,
        img_size: int,
        batch_size: int = 256,
        compute_dtype=jnp.bfloat16,
        mean=CIFAR10_MEAN,
        std=CIFAR10_STD,
        chunk: int = 64,
        mesh=None,
    ):
        """With ``mesh`` (a ('data','model') jax.sharding.Mesh), params are
        placed per the TP sharding rules and request batches shard over
        'data' — multi-chip serving with the same fixed-shape program."""
        self.model = model
        self.img_size = img_size
        self.batch_size = batch_size
        self.mesh = mesh

        jit_kw = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from focused_attention_vit_tpu.parallel import shard_params

            params = shard_params(params, mesh)
            if batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size={batch_size} must be divisible by the "
                    f"'data' axis size {mesh.shape['data']}"
                )
            # On a mesh, chunking would scan over the batch axis that DP
            # shards; the per-device batch is already small.
            chunk = None
            jit_kw = dict(
                in_shardings=(None, NamedSharding(mesh, P("data"))),
                out_shardings=NamedSharding(mesh, P("data")),
            )
        self.params = params

        def one_chunk(params, images_u8):
            x = prepare_eval_batch(
                images_u8, img_size, mean=mean, std=std, dtype=compute_dtype
            )
            logits = model.apply({"params": params}, x).astype(jnp.float32)
            return jax.nn.softmax(logits, axis=-1)

        if chunk and batch_size > chunk and batch_size % chunk == 0:
            n = batch_size // chunk

            # Scan over chunks inside one program: measured on v5e, XLA's
            # scheduling degrades with the live activation set — chunk-64
            # eval runs batch 128 in ~46 ms device time vs ~72 ms
            # monolithic (BASELINE.md "v5e roofline").
            @jax.jit
            def _fwd(params, images_u8):
                xs = images_u8.reshape((n, chunk) + images_u8.shape[1:])
                _, probs = jax.lax.scan(
                    lambda _, xc: (None, one_chunk(params, xc)), None, xs
                )
                return probs.reshape(batch_size, -1)
        else:
            _fwd = jax.jit(one_chunk, **jit_kw)

        self._fwd = _fwd

    @classmethod
    def from_checkpoint(
        cls,
        model,
        checkpoint_dir: str,
        sample_input: jnp.ndarray,
        **kw,
    ) -> "Predictor":
        """Restore params from a training checkpoint dir (the params-only
        sidecar written by train.checkpoint.CheckpointManager.save)."""
        import os

        from focused_attention_vit_tpu.train.checkpoint import load_params

        template = model.init(jax.random.PRNGKey(0), sample_input)["params"]
        path = os.path.join(checkpoint_dir, "params_latest.msgpack")
        if not os.path.exists(path):
            raise FileNotFoundError(f"no params sidecar at {path}")
        params = load_params(path, template)
        return cls(model, params, **kw)

    def warmup(self, input_hw: "tuple[int, int] | None" = None) -> None:
        """Compile the serving program for the expected input shape.

        The program resizes inputs in-graph, but each distinct input
        (h, w) is a distinct XLA program — warm the shape clients will
        actually send (default: the model's own img_size; remote compiles
        cost seconds-to-minutes on this toolchain)."""
        h, w = input_hw if input_hw is not None else (
            self.img_size, self.img_size
        )
        dummy = np.zeros((self.batch_size, h, w, 3), dtype=np.uint8)
        np.asarray(self._fwd(self.params, jnp.asarray(dummy)))

    def predict_proba(self, images_u8: np.ndarray) -> np.ndarray:
        """[N, h, w, C] uint8 → [N, num_classes] probabilities."""
        return padded_predict_proba(
            self._fwd, self.params, self.batch_size,
            int(self.model.num_classes), images_u8,
        )

    def predict(self, images_u8: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (predicted class ids, their probabilities)."""
        probs = self.predict_proba(images_u8)
        ids = probs.argmax(-1)
        return ids, probs[np.arange(len(ids)), ids]
