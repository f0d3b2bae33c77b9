"""Quality metrics computed on device: accuracy, confusion matrix, AUC.

The reference only ever computes top-1 accuracy
(experiments/traditional.py:198-200); AUC and confusion matrix are part of
the rebuild's metrics surface (BASELINE.json expects them — SURVEY.md §5
metrics row). All three are jnp-native and jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accuracy_from_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Top-1 accuracy in [0, 1]."""
    return jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))


def confusion_matrix(
    predictions: jnp.ndarray, labels: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """``[C, C]`` counts, rows = true class, cols = predicted class."""
    onehot_true = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    onehot_pred = jax.nn.one_hot(predictions, num_classes, dtype=jnp.float32)
    return jnp.einsum("nt,np->tp", onehot_true, onehot_pred).astype(jnp.int32)


def auc_ovr(scores: jnp.ndarray, labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Macro-averaged one-vs-rest ROC AUC from class scores.

    AUC for class c equals the Mann-Whitney U statistic of the class-c
    scores of positives vs negatives: (sum of positive ranks - offset) /
    (n_pos * n_neg), with average ranks for ties. Classes absent from
    ``labels`` are excluded from the macro average. Computed in float32 —
    exact for rank sums up to 2^24 (test sets ≲ a few thousand positives
    per class; CIFAR-scale is well inside).
    """
    n = scores.shape[0]

    def one_class(c):
        s = scores[:, c]
        pos = (labels == c).astype(jnp.float32)
        order = jnp.argsort(s)
        s_sorted = s[order]
        pos_sorted = pos[order]
        # Average ranks with ties: rank of each element = mean of the
        # 1-based index range occupied by its tied group.
        idx = jnp.arange(1, n + 1, dtype=jnp.float32)
        # Group boundaries where value changes.
        new_group = jnp.concatenate(
            [jnp.array([True]), s_sorted[1:] != s_sorted[:-1]]
        )
        group_id = jnp.cumsum(new_group) - 1
        group_start = jax.ops.segment_min(idx, group_id, num_segments=n)
        group_end = jax.ops.segment_max(idx, group_id, num_segments=n)
        avg_rank = (group_start[group_id] + group_end[group_id]) / 2.0
        n_pos = jnp.sum(pos)
        n_neg = n - n_pos
        rank_sum = jnp.sum(avg_rank * pos_sorted)
        u = rank_sum - n_pos * (n_pos + 1) / 2.0
        auc = u / jnp.maximum(n_pos * n_neg, 1.0)
        valid = (n_pos > 0) & (n_neg > 0)
        return jnp.where(valid, auc, 0.0), valid.astype(jnp.float32)

    aucs, valids = jax.vmap(one_class)(jnp.arange(num_classes))
    return (jnp.sum(aucs) / jnp.maximum(jnp.sum(valids), 1.0)).astype(
        jnp.float32
    )
