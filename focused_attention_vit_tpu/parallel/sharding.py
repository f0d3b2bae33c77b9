"""Sharding rules and the sharded train step.

Parallelism layout (scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert collectives):

* **DP** — the batch axis of every activation is sharded over 'data';
  gradient all-reduce is emitted automatically by XLA over ICI.
* **TP (Megatron-style)** — MLP: fc1 kernel column-sharded over 'model'
  (each shard computes a slice of the hidden dim), fc2 kernel row-sharded
  (partial results psum-reduced by XLA). Attention: per-head partitioning —
  the qkv projection is head-shaped (kernel [D, 3, h, d], see
  models/layers.py), so the head axis shards directly over 'model' with no
  relayout; q/k/v/attention stay head-local per shard and the head-major
  output projection (kernel [h, d, D]) is row-sharded, psum-reduced.
* Everything else (norms, embeddings, latent_proj, head) is replicated.
* **FSDP (ZeRO-3 style, opt-in)** — with ``fsdp=True`` every parameter
  and optimizer-moment leaf is additionally sharded over 'data' on its
  largest still-unsharded divisible dim. GSPMD then all-gathers each
  param just-in-time for its op and reduce-scatters its gradient, and
  the AdamW update runs on the 1/dp shard — per-device parameter +
  optimizer memory drops by the data-axis size while the math stays
  bitwise the DP trajectory. Leaves with no divisible dim (tiny norms
  at odd widths) stay replicated rather than erroring.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from focused_attention_vit_tpu.data.pipeline import augment_train_batch


def _rule_for(path: str, leaf) -> P:
    ndim = len(leaf.shape) if hasattr(leaf, "shape") else 0
    if path.endswith("mlp/fc1/kernel"):
        return P(None, "model")
    if path.endswith("mlp/fc1/bias"):
        return P("model")
    if path.endswith("mlp/fc2/kernel"):
        return P("model", None)
    # Per-head attention TP (kernel [D, 3, h, d] / bias [3, h, d] /
    # proj kernel [h, d, D] — models/layers.py head-shaped projections).
    if path.endswith("attn/qkv/kernel") and ndim == 4:
        return P(None, None, "model", None)
    if path.endswith("attn/qkv/bias") and ndim == 3:
        return P(None, "model", None)
    if path.endswith("attn/proj/kernel") and ndim == 3:
        return P("model", None, None)
    return P(*([None] * ndim)) if ndim else P()


def _fits(spec: P, leaf, mesh: Mesh) -> bool:
    """True iff every sharded dim of ``leaf`` divides by its axis size."""
    if not hasattr(leaf, "shape"):
        return True
    for dim, axis in zip(leaf.shape, spec):
        if axis is None:
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else int(
            np.prod([mesh.shape[a] for a in axis])
        )
        if dim % size:
            return False
    return True


def _add_fsdp(spec: P, leaf, mesh: Mesh) -> P:
    """Augment a (TP/PP) spec with 'data' on the largest free divisible dim.

    This is the ZeRO-3 placement: the weight itself lives sharded over the
    data axis and GSPMD inserts the all-gather (use) / reduce-scatter
    (grad) collectives. Dims already owned by 'model'/'stage' are left
    alone so FSDP composes with TP and PP.
    """
    ndim = len(leaf.shape) if hasattr(leaf, "shape") else 0
    if ndim == 0 or "data" not in mesh.axis_names:
        return spec
    dp = mesh.shape["data"]
    if dp <= 1:
        return spec
    entries = list(spec) + [None] * (ndim - len(spec))
    free = [
        d for d in range(ndim)
        if entries[d] is None and leaf.shape[d] % dp == 0 and leaf.shape[d] > 0
    ]
    if free:
        d = max(free, key=lambda i: leaf.shape[i])
        entries[d] = "data"
        return P(*entries)
    # No free dim: extend a TP/PP-owned dim to an (axis, 'data') product
    # when the dim divides both (e.g. fc1 bias [H] is P('model') — under
    # FSDP it becomes P(('model','data')), each device holding H/(tp*dp)).
    taken = [
        d for d in range(ndim)
        if isinstance(entries[d], str)
        and leaf.shape[d] % (mesh.shape[entries[d]] * dp) == 0
    ]
    if taken:
        d = max(taken, key=lambda i: leaf.shape[i])
        entries[d] = (entries[d], "data")
        return P(*entries)
    return spec


def param_sharding_rules(params: Mapping[str, Any], mesh: Mesh, *, fsdp: bool = False):
    """PartitionSpec pytree for a model parameter pytree.

    Dims not divisible by their mesh axis (e.g. num_heads % tp != 0) fall
    back to replication rather than erroring. With ``fsdp=True`` every
    leaf is additionally sharded over 'data' (see _add_fsdp).
    """

    def path_str(path) -> str:
        return "/".join(
            str(getattr(p, "key", getattr(p, "idx", ""))) for p in path
        )

    class _Inner:
        """Shape proxy for the per-layer view of a stacked leaf."""

        def __init__(self, shape):
            self.shape = shape

    def base_rule(path, leaf) -> P:
        p = path_str(path)
        ndim = len(leaf.shape) if hasattr(leaf, "shape") else 0
        if "/block/" in f"/{p}/" and ndim >= 1:
            # Scan-form stacked block params (scanned_blocks names them
            # blocks/block/...): the per-layer TP rule applies to the
            # dims BEHIND the leading depth axis. Without this shift a
            # stacked fc1 kernel [depth, D, H] would match the per-layer
            # P(None, 'model') at the wrong dim (sharding the embed dim,
            # which divides tp, so _fits would accept it) and the
            # 5-D/4-D stacked qkv/proj leaves would silently replicate —
            # the Megatron layout lost exactly when --scan_layers --tp
            # are combined without --pp. Under pipeline parallelism the
            # depth axis additionally shards over 'stage'
            # (parallel/pipeline.py holds depth/n layers per stage).
            lead = "stage" if "stage" in mesh.axis_names else None
            inner = _rule_for(p, _Inner(leaf.shape[1:]))
            spec = P(lead, *inner)
            if _fits(spec, leaf, mesh):
                return spec
            spec = P(lead, *([None] * (ndim - 1)))
            return spec if _fits(spec, leaf, mesh) else P(*([None] * ndim))
        spec = _rule_for(p, leaf)
        if not _fits(spec, leaf, mesh):
            return P(*([None] * ndim)) if ndim else P()
        return spec

    def rule(path, leaf) -> P:
        spec = base_rule(path, leaf)
        return _add_fsdp(spec, leaf, mesh) if fsdp else spec

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [rule(p, leaf) for p, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_state(state, mesh: Mesh, *, fsdp: bool = False):
    """Place a full TrainState (params + optimizer state) onto the mesh.

    Optimizer-moment leaves (AdamW mu/nu) mirror the param tree, so their
    flattened paths end with the same ``<module>/<param>`` suffixes and the
    same rules apply; scalar counts replicate. With ``fsdp=True`` the
    ZeRO-3 placement applies to params and moments alike.
    """
    specs = param_sharding_rules(state, mesh, fsdp=fsdp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def state_shardings(state, mesh: Mesh, *, fsdp: bool = False):
    """NamedSharding pytree mirroring shard_state's placement (for jit
    in/out_shardings — pins the updated state to the same layout so a
    donated FSDP state cannot silently densify across steps)."""
    specs = param_sharding_rules(state, mesh, fsdp=fsdp)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh, *, fsdp: bool = False):
    """Place a parameter pytree onto the mesh per the rules."""
    specs = param_sharding_rules(params, mesh, fsdp=fsdp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_sharded_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    img_size: int,
    *,
    augment: bool = True,
    compute_dtype=jnp.float32,
) -> Callable:
    """Fused augment+fwd+bwd+update step jitted over the mesh.

    Signature: ``train_step(params, opt_state, images_u8, labels, key) ->
    (params, opt_state, metrics)``. Batch inputs must be shardable over
    'data' (batch divisible by the data-axis size).
    """
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def step(params, opt_state, images_u8, labels, key):
        if augment:
            images = augment_train_batch(
                images_u8, key, img_size, dtype=compute_dtype
            )
        else:
            from focused_attention_vit_tpu.data.pipeline import prepare_eval_batch

            images = prepare_eval_batch(images_u8, img_size, dtype=compute_dtype)
        images = jax.lax.with_sharding_constraint(images, batch_sharding)

        def loss_fn(p):
            logits = model.apply(
                {"params": p},
                images,
                False,
                rngs={"dropout": jax.random.fold_in(key, 1)},
            )
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    # Params/opt-state shardings are inherited from their placement (see
    # shard_params); batch inputs are constrained explicitly.
    return jax.jit(
        step,
        in_shardings=(None, None, batch_sharding, batch_sharding, replicated),
        donate_argnums=(0, 1),
    )
