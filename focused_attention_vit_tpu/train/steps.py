"""Jitted train/eval step factories.

The reference hot loop (experiments/traditional.py:187-200) moves a batch
to device, runs fwd/bwd/step, then syncs ``loss.item()`` every step. Here
one jitted ``train_step(state, images_u8, labels, key)`` fuses on-device
augmentation, forward, backward and the optimizer update into a single XLA
program; metrics accumulate on device and cross to the host once per epoch.

``donate_argnums`` hands the old state's buffers back to XLA so parameters
and optimizer state are updated in place in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from focused_attention_vit_tpu.data.pipeline import (
    augment_train_batch,
    prepare_eval_batch,
    CIFAR10_MEAN,
    CIFAR10_STD,
)


def make_train_step(
    img_size: int,
    *,
    augment: bool = True,
    mean=CIFAR10_MEAN,
    std=CIFAR10_STD,
    compute_dtype=jnp.float32,
    sharding_constraint: Optional[Callable] = None,
    mesh=None,
    microbatch: Optional[int] = None,
    state_sharding=None,
) -> Callable:
    """Build the fused augment+fwd+bwd+update step.

    Returns ``train_step(state, images_u8, labels, key) ->
    (state, metrics)`` with metrics = {loss_sum, correct, count} (device
    scalars; divide on host at epoch end).

    With ``mesh`` (a ('data','model') jax.sharding.Mesh), batch inputs are
    sharded over 'data' (host numpy batches are split across devices by
    jit) and the state keeps whatever sharding it was placed with (see
    parallel.shard_state) — XLA inserts the gradient all-reduce over ICI.
    ``state_sharding`` (a NamedSharding pytree mirroring the TrainState,
    parallel.state_shardings) pins the state layout explicitly on both
    sides of the jit — required under FSDP, where the partitioner must
    not be free to return a densified (all-gathered) updated state.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        if microbatch:
            # Gradient accumulation composes with the mesh: each scan
            # chunk keeps its batch dim sharded over 'data', so the
            # microbatch must itself split evenly across the axis (the
            # [B,...] → [n, mb, ...] reshape is an all-to-all on ICI,
            # then every chunk step is an ordinary DP step).
            dp = mesh.shape["data"]
            if microbatch % dp:
                raise ValueError(
                    f"microbatch={microbatch} must be a multiple of the "
                    f"data-parallel axis size {dp} (each accumulation "
                    f"chunk is itself batch-sharded over 'data')"
                )

        batch_sh = NamedSharding(mesh, _P("data"))
        repl = NamedSharding(mesh, _P())
        chunk_sh = NamedSharding(mesh, _P(None, "data"))
        chunk_constraint = lambda x: jax.lax.with_sharding_constraint(
            x, chunk_sh
        )
        if sharding_constraint is None:
            sharding_constraint = lambda x: jax.lax.with_sharding_constraint(
                x, batch_sh
            )
        jit = partial(
            jax.jit,
            donate_argnums=(0,),
            in_shardings=(
                state_sharding, batch_sh, batch_sh, repl
            ),
            out_shardings=(state_sharding, None),
        )
    else:
        jit = partial(jax.jit, donate_argnums=(0,))

    def fwd_bwd(params, apply_fn, images_u8, labels, key):
        """One microbatch: augment + fwd + bwd → (grads, loss_sum, correct)."""
        if augment:
            images = augment_train_batch(
                images_u8, key, img_size, mean=mean, std=std, dtype=compute_dtype
            )
        else:
            images = prepare_eval_batch(
                images_u8, img_size, mean=mean, std=std, dtype=compute_dtype
            )
        if sharding_constraint is not None:
            images = sharding_constraint(images)

        dropout_key = jax.random.fold_in(key, 1)

        def loss_fn(params):
            logits = apply_fn(
                {"params": params},
                images,
                False,  # deterministic=False
                rngs={"dropout": dropout_key},
            )
            # Promote-only cast: bf16 logits go to f32 for a stable CE; an
            # f64 run (training-dynamics parity vs torch, test_parity_torch)
            # must NOT be silently downcast — that reintroduces f32 noise
            # which Adam's g/(sqrt(v)+eps) amplifies to O(lr) on
            # near-zero-gradient coordinates.
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.promote_types(logits.dtype, jnp.float32)),
                labels,
            ).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        correct = jnp.sum(jnp.argmax(logits, -1) == labels)
        return grads, loss * labels.shape[0], correct

    @jit
    def train_step(state, images_u8, labels, key):
        b = labels.shape[0]
        if microbatch and b > microbatch and b % microbatch == 0:
            # Gradient accumulation over microbatch chunks inside ONE XLA
            # program: identical batch-mean loss/grad math, but the live
            # activation set is per-chunk. Measured on v5e @ ViT-B/16: the
            # 128-image working set degrades XLA's scheduling (596 img/s)
            # while 64-image chunks run at 737 img/s — the chunked scan
            # recovers that locality without changing batch semantics.
            n = b // microbatch
            imgs = images_u8.reshape((n, microbatch) + images_u8.shape[1:])
            labs = labels.reshape(n, microbatch)
            if mesh is not None:
                # Pin the chunk-stack layout: batch stays sharded over
                # 'data' within each chunk (one ICI all-to-all up front,
                # then each scan step is a plain DP step).
                imgs = chunk_constraint(imgs)
                labs = chunk_constraint(labs)

            def chunk(carry, xs):
                gacc, lacc, cacc = carry
                im, la, i = xs
                g, ls, co = fwd_bwd(
                    state.params, state.apply_fn, im, la,
                    jax.random.fold_in(key, i),
                )
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (gacc, lacc + ls, cacc + co), None

            # Accumulate in promote(param_dtype, compute_dtype, f32): f32
            # for the production configs, f64 when any part of the run is
            # f64 (the training-dynamics parity harness) — a forced-f32
            # carry would make lax.scan reject the f64 chunk grads/loss
            # at trace time (carry dtype mismatch).
            acc_t = jnp.promote_types(
                jnp.promote_types(
                    jax.tree_util.tree_leaves(state.params)[0].dtype,
                    jnp.dtype(compute_dtype),
                ),
                jnp.float32,
            )
            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.promote_types(p.dtype, jnp.float32)),
                state.params,
            )
            (gsum, loss_sum, correct), _ = jax.lax.scan(
                chunk,
                # jnp.result_type(int) = the canonical default integer
                # dtype (int32 normally, int64 under x64 — what the
                # chunk's correct-count sum produces, so the carry types
                # agree either way) without the int64-truncation warning
                # jnp.int_ emits in non-x64 mode.
                (zeros, jnp.zeros((), acc_t), jnp.zeros((), jnp.result_type(int))),
                (imgs, labs, jnp.arange(n)),
            )
            grads = jax.tree.map(lambda g: g / n, gsum)
        else:
            grads, loss_sum, correct = fwd_bwd(
                state.params, state.apply_fn, images_u8, labels, key
            )
        state = state.apply_gradients(grads=grads)
        metrics = {
            "loss_sum": loss_sum,
            "correct": correct,
            "count": jnp.asarray(labels.shape[0], jnp.int32),
        }
        return state, metrics

    return train_step


def make_eval_step(
    img_size: int,
    *,
    mean=CIFAR10_MEAN,
    std=CIFAR10_STD,
    compute_dtype=jnp.float32,
    return_logits: bool = False,
    mesh=None,
) -> Callable:
    """Build ``eval_step(state, images_u8, labels, mask) -> metrics``.

    ``mask`` zeroes padded examples (see data/pipeline.padded_eval_batches)
    so full-dataset metrics are exact with static shapes. With ``mesh``,
    batch inputs shard over the 'data' axis.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        batch_sh = NamedSharding(mesh, _P("data"))
        jit = partial(
            jax.jit, in_shardings=(None, batch_sh, batch_sh, batch_sh)
        )
    else:
        jit = jax.jit

    @jit
    def eval_step(state, images_u8, labels, mask):
        images = prepare_eval_batch(
            images_u8, img_size, mean=mean, std=std, dtype=compute_dtype
        )
        logits = state.apply_fn({"params": state.params}, images).astype(
            jnp.float32
        )
        # Clamp at the mathematical floor: TPU transcendental error can
        # push near-zero CE slightly negative when |logits| is large
        # (observed ~1e-3 at full overfit).
        losses = jnp.maximum(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels),
            0.0,
        )
        correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        metrics = {
            "loss_sum": jnp.sum(losses * mask),
            "correct": jnp.sum(correct * mask),
            "count": jnp.sum(mask),
        }
        if return_logits:
            metrics["logits"] = logits
        return metrics

    return eval_step
