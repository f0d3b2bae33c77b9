"""Epoch-level training/eval loops with the reference's observable surface.

Progress-line format matches experiments/traditional.py:241-244 exactly
('Epoch {e}/{E} | Train Loss: … | Train Acc: …% | Val Loss: … | Val Acc: …%
| Time: …s'); timing is ``jax.block_until_ready``-correct per epoch instead
of the reference's per-step ``loss.item()`` syncs.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from focused_attention_vit_tpu.data.pipeline import (
    batch_iterator,
    padded_eval_batches,
)


def _epoch_pass(
    train_step,
    state,
    images,
    labels,
    batch_size,
    key,
    np_rng,
    prefetcher=None,
    should_stop=None,
):
    if prefetcher is not None:
        batches = prefetcher.epoch_batches()
    else:
        batches = batch_iterator(
            images, labels, batch_size, shuffle=True, rng=np_rng, drop_last=True
        )
    metrics_acc = []
    completed = True
    for bi, (xb, yb) in enumerate(batches):
        # Preemption poll (train/resilience.py): stop at a batch
        # boundary — the in-flight state is consistent and the caller
        # checkpoints it before exiting.
        if should_stop is not None and should_stop():
            completed = False
            break
        step_key = jax.random.fold_in(key, bi)
        state, m = train_step(state, xb, yb, step_key)
        metrics_acc.append(m)
    # One host sync per epoch.
    metrics_acc = jax.device_get(metrics_acc)
    loss_sum = float(sum(m["loss_sum"] for m in metrics_acc))
    correct = float(sum(m["correct"] for m in metrics_acc))
    count = float(sum(m["count"] for m in metrics_acc))
    return (
        state,
        loss_sum / max(count, 1),
        100.0 * correct / max(count, 1),
        completed,
    )


def evaluate(
    eval_step,
    state,
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
) -> Dict[str, float]:
    """Full-dataset eval; returns loss/acc plus per-batch wall times
    (the reference times each eval batch, experiments/traditional.py:286-289)."""
    loss_sum = correct = count = 0.0
    batch_times = []
    for xb, yb, mask in padded_eval_batches(images, labels, batch_size):
        t0 = time.time()
        m = eval_step(state, xb, yb, mask)
        m = jax.device_get(m)
        batch_times.append(time.time() - t0)
        loss_sum += float(m["loss_sum"])
        correct += float(m["correct"])
        count += float(m["count"])
    return {
        "loss": loss_sum / max(count, 1),
        "acc": 100.0 * correct / max(count, 1),
        "avg_batch_time": float(np.mean(batch_times)),
        # Per-image time divides total time by ACTUAL images, not padded
        # slots — the final batch is padded to batch_size, and the
        # reference divides by real image count
        # (experiments/traditional.py:294-301).
        "avg_image_time": float(np.sum(batch_times)) / max(count, 1),
        "count": count,
    }


import functools


@functools.cache
def _cached_probs_fn(model, img_size: int, mesh=None):
    """One jitted softmax-probabilities function per (model, img_size, mesh).

    Flax modules are frozen dataclasses (hashable), so the jitted closure is
    built once per experiment and reused across every ``evaluate_detailed``
    call — defining it inside the function body would recompile the full
    model on each eval (several minutes for f32 ViT-B on this toolchain).
    ``jax.sharding.Mesh`` is hashable too, so a mesh-sharded variant caches
    alongside: with a mesh, the batch is constrained to ``P('data')`` so
    detailed metrics ride the same DP layout the model trained on instead
    of computing un-sharded (VERDICT round-2 task 7).
    """
    import jax.numpy as jnp

    from focused_attention_vit_tpu.data.pipeline import prepare_eval_batch

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sharding = NamedSharding(mesh, P("data"))
    else:
        data_sharding = None

    @jax.jit
    def probs_fn(params, images_u8):
        if data_sharding is not None:
            images_u8 = jax.lax.with_sharding_constraint(
                images_u8, data_sharding
            )
        x = prepare_eval_batch(images_u8, img_size)
        logits = model.apply({"params": params}, x).astype(jnp.float32)
        return jax.nn.softmax(logits, axis=-1)

    return probs_fn


def evaluate_detailed(
    state,
    model,
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    img_size: int,
    num_classes: int,
    mesh=None,
) -> Dict[str, Any]:
    """Full eval with AUC (macro one-vs-rest) and confusion matrix.

    The reference computes only top-1 accuracy
    (experiments/traditional.py:198-200); AUC + confusion matrix are the
    rebuild's extended metrics surface (SURVEY.md §5), computed on device
    from accumulated probabilities.
    """
    import jax.numpy as jnp

    from focused_attention_vit_tpu.train.metrics import auc_ovr, confusion_matrix

    probs_fn = _cached_probs_fn(model, img_size, mesh)

    all_probs = []
    for xb, yb, mask in padded_eval_batches(images, labels, batch_size):
        p = jax.device_get(probs_fn(state.params, xb))
        all_probs.append(p[mask.astype(bool)])
    probs = np.concatenate(all_probs)[: len(labels)]
    preds = probs.argmax(-1)
    labels = np.asarray(labels)

    return {
        "accuracy": float((preds == labels).mean()),
        "auc_macro_ovr": float(
            auc_ovr(jnp.asarray(probs), jnp.asarray(labels), num_classes)
        ),
        "confusion_matrix": np.asarray(
            confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), num_classes)
        ),
    }


def train_and_evaluate(
    state,
    train_step: Callable,
    eval_step: Callable,
    data: Dict[str, Any],
    *,
    epochs: int,
    batch_size: int,
    seed: int = 42,
    epoch_offset: int = 0,
    log_fn: Callable[[str], None] = print,
    epoch_callback: Optional[Callable[[int, Any], None]] = None,
    should_stop: Optional[Callable[[], bool]] = None,
) -> Dict[str, Any]:
    """Run the reference training protocol: per-epoch train + val pass.

    ``epoch_offset`` is the number of epochs already trained before this
    call (checkpoint resume): per-epoch RNG keys are derived from the
    GLOBAL epoch index and the shuffle streams are seeded per segment, so
    a resumed run does not replay the exact batch order / augmentation
    randomness its first epochs already consumed.

    ``should_stop`` is polled at batch boundaries (preemption — see
    train/resilience.py): when it returns True the loop stops, skips the
    partial epoch's metrics/val pass, and returns with
    ``interrupted=True`` (plus ``interrupted_mid_epoch`` when training
    stopped inside an epoch rather than between epochs) so the caller
    can checkpoint the returned state.

    Returns the training-metrics dict with the reference's keys
    (experiments/traditional.py:255-266).
    """
    train_losses, train_accs, val_losses, val_accs, epoch_times = [], [], [], [], []
    base_key = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng([seed, epoch_offset])

    # Native C++ prefetcher (background batch assembly, native/batcher.cpp);
    # falls back to the numpy iterator when no toolchain is available.
    prefetcher = None
    if len(data["train_images"]) >= batch_size:
        try:
            from focused_attention_vit_tpu.data.native import (
                NativePrefetcher,
                native_available,
            )

            if native_available():
                prefetcher = NativePrefetcher(
                    data["train_images"],
                    data["train_labels"],
                    batch_size,
                    seed=seed + 1_000_003 * epoch_offset,
                )
        except Exception:
            prefetcher = None
        # The two paths shuffle with different RNGs (C++ mt19937_64 vs
        # numpy default_rng), so same-seed runs are reproducible only
        # within a path — say which one ran instead of diverging silently.
        logging.getLogger(__name__).info(
            "train batch pipeline: %s",
            "native C++ prefetcher" if prefetcher is not None
            else "numpy iterator",
        )

    total_start = time.time()
    interrupted = False
    interrupted_mid_epoch = False
    try:
        for epoch in range(epochs):
            if should_stop is not None and should_stop():
                interrupted = True  # between epochs: state is at a boundary
                break
            t0 = time.time()
            epoch_key = jax.random.fold_in(base_key, epoch_offset + epoch)
            state, tr_loss, tr_acc, completed = _epoch_pass(
                train_step,
                state,
                data["train_images"],
                data["train_labels"],
                batch_size,
                epoch_key,
                np_rng,
                prefetcher=prefetcher,
                should_stop=should_stop,
            )
            if not completed:
                interrupted = True
                interrupted_mid_epoch = True
                break
            val = evaluate(
                eval_step, state, data["test_images"], data["test_labels"],
                batch_size,
            )
            epoch_time = time.time() - t0

            train_losses.append(tr_loss)
            train_accs.append(tr_acc)
            val_losses.append(val["loss"])
            val_accs.append(val["acc"])
            epoch_times.append(epoch_time)

            log_fn(
                f"Epoch {epoch + 1}/{epochs} | "
                f"Train Loss: {tr_loss:.4f} | Train Acc: {tr_acc:.2f}% | "
                f"Val Loss: {val['loss']:.4f} | Val Acc: {val['acc']:.2f}% | "
                f"Time: {epoch_time:.2f}s"
            )
            if epoch_callback is not None:
                epoch_callback(epoch, state)
    finally:
        # Also on exceptions: the worker thread + the pinned full-dataset
        # copies must not outlive a failed run until some later GC.
        if prefetcher is not None:
            prefetcher.close()

    total_training_time = time.time() - total_start
    return {
        "interrupted": interrupted,
        "interrupted_mid_epoch": interrupted_mid_epoch,
        "state": state,
        "train_losses": train_losses,
        "train_accs": train_accs,
        "val_losses": val_losses,
        "val_accs": val_accs,
        "epoch_times": epoch_times,
        "avg_epoch_time": float(np.mean(epoch_times)) if epoch_times else 0.0,
        "total_training_time": total_training_time,
        "final_val_acc": val_accs[-1] if val_accs else 0.0,
        "final_val_loss": val_losses[-1] if val_losses else 0.0,
    }
