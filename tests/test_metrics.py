"""Metric correctness: AUC vs an independent rank-based computation,
confusion matrix counts."""

import numpy as np
import jax.numpy as jnp
from scipy.stats import rankdata

from focused_attention_vit_tpu.train.metrics import (
    auc_ovr,
    confusion_matrix,
    accuracy_from_logits,
)


def _auc_numpy(scores, labels, num_classes):
    aucs = []
    for c in range(num_classes):
        pos = labels == c
        n_pos, n_neg = pos.sum(), (~pos).sum()
        if n_pos == 0 or n_neg == 0:
            continue
        ranks = rankdata(scores[:, c])
        u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2
        aucs.append(u / (n_pos * n_neg))
    return float(np.mean(aucs))


def test_auc_matches_rank_computation(rng):
    n, c = 400, 6
    labels = rng.integers(0, c, n)
    # Scores correlated with labels + ties to exercise the tie handling.
    scores = rng.normal(size=(n, c)).round(1)
    scores[np.arange(n), labels] += rng.normal(1.0, 0.5, n).round(1)
    got = float(auc_ovr(jnp.asarray(scores.astype(np.float32)),
                        jnp.asarray(labels), c))
    expect = _auc_numpy(scores.astype(np.float32), labels, c)
    assert abs(got - expect) < 1e-5


def test_auc_perfect_and_chance(rng):
    labels = rng.integers(0, 3, 120)
    onehot = np.eye(3, dtype=np.float32)[labels]
    assert float(auc_ovr(jnp.asarray(onehot), jnp.asarray(labels), 3)) == 1.0
    const = np.ones((120, 3), np.float32)
    assert abs(float(auc_ovr(jnp.asarray(const), jnp.asarray(labels), 3)) - 0.5) < 1e-6


def test_confusion_matrix_counts(rng):
    labels = np.array([0, 0, 1, 2, 2, 2])
    preds = np.array([0, 1, 1, 2, 0, 2])
    cm = np.asarray(confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 3))
    expect = np.array([[1, 1, 0], [0, 1, 0], [1, 0, 2]])
    np.testing.assert_array_equal(cm, expect)
    assert cm.sum() == len(labels)


def test_accuracy(rng):
    logits = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 1.0]], np.float32)
    labels = np.array([0, 1, 1])
    assert abs(float(accuracy_from_logits(jnp.asarray(logits), jnp.asarray(labels))) - 2 / 3) < 1e-6


def test_bench_flops_formula_sanity():
    """bench.py's MFU numerator must track 2·matmul-params·tokens for the
    dominant terms (guards the MFU report against formula drift)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import vit_matmul_flops_per_image

    f = vit_matmul_flops_per_image(224, 16, 768, 12, 12)
    s, d = 197, 768
    # dominant dense params: qkv+proj+mlp = 12·D² per block × depth
    dense_params = 12 * 12 * d * d
    expect_dense = 2 * s * dense_params
    attn = 12 * 4 * s * s * d
    patch = 2 * s * (16 * 16 * 3) * d
    assert abs(f - (expect_dense + attn + patch + 2 * d * 10)) / f < 1e-6
    # ballpark: ViT-B fwd ≈ 35 GFLOP/img at 224² (2 FLOPs/MAC convention)
    assert 30e9 < f < 40e9


def test_memory_peak_not_inherited_across_measurements(monkeypatch):
    """PJRT's allocator peak is process-lifetime-monotone (no reset, unlike
    torch.cuda.reset_peak_memory_stats — reference utils/metrics.py:264).
    When a measurement does NOT raise the lifetime peak (it was set by an
    earlier, larger model), the reported peak must fall back to the
    observed live-bytes delta instead of reporting the earlier model's
    peak minus entry-live bytes (review finding)."""
    from focused_attention_vit_tpu.utils import metrics as M

    seq = iter([
        # inherited-peak case: lifetime peak 8 GB from an earlier model,
        # this pass moves live bytes 0.5 → 1.0 GB and never nears 8 GB.
        {"device_bytes_in_use": 0.5e9, "device_peak_bytes": 8e9},
        {"device_bytes_in_use": 1.0e9, "device_peak_bytes": 8e9},
        # peak-advancing case: this pass sets a new lifetime high-water.
        {"device_bytes_in_use": 1.0e9, "device_peak_bytes": 8e9},
        {"device_bytes_in_use": 1.2e9, "device_peak_bytes": 9e9},
    ])
    monkeypatch.setattr(M, "_device_memory_stats", lambda: next(seq))

    out1 = M.measure_memory_usage(lambda x: x + 1, jnp.ones((4,)))
    assert out1["gpu_memory_peak_bytes"] == 0.5e9  # live delta, NOT 7.5 GB

    out2 = M.measure_memory_usage(lambda x: x + 1, jnp.ones((4,)))
    assert out2["gpu_memory_peak_bytes"] == 9e9 - 1.0e9  # new peak − entry
