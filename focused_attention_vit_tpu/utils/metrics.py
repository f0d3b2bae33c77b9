"""Complexity / timing / memory measurement utilities.

Mirrors the observable surface of the reference metrics module
(utils/metrics.py): the same analytical ViT complexity model (so CSV
columns are comparable number-for-number), wall-clock timing with the same
warm-up/iteration protocol, and memory probes — re-expressed for JAX
(``block_until_ready``-correct timing, TPU ``memory_stats`` instead of
``torch.cuda``).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np

try:
    import psutil
except ImportError:  # pragma: no cover
    psutil = None


def count_parameters(params) -> int:
    """Total parameter count of a pytree (reference: utils/metrics.py:16-26)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def calculate_model_size(params) -> Dict[str, float]:
    """Size at fp32 — 4 bytes/param (reference: utils/metrics.py:29-51)."""
    n = count_parameters(params)
    size_bytes = n * 4
    return {
        "parameters": n,
        "size_bytes": size_bytes,
        "size_kb": size_bytes / 1024,
        "size_mb": size_bytes / 1024 / 1024,
    }


def calculate_vit_complexity(
    img_size: int,
    patch_size: int,
    embed_dim: int,
    depth: int,
    num_heads: int,
    mlp_ratio: float = 4.0,
    in_channels: int = 3,
) -> Dict[str, Any]:
    """Closed-form ViT parameter/FLOP/activation-memory model.

    Reproduces the reference formula exactly (utils/metrics.py:54-149),
    including its conventions: multiply-accumulate counted once, the head
    sized for 1000 classes, and activation memory = seq·dim·4·(depth+2)
    bytes. Keeping the same formula keeps experiment CSVs comparable.
    """
    num_patches = (img_size // patch_size) ** 2
    seq_len = num_patches + 1

    patch_embed_params = patch_size * patch_size * in_channels * embed_dim + embed_dim
    patch_embed_flops = num_patches * patch_size * patch_size * in_channels * embed_dim
    pos_embed_params = seq_len * embed_dim

    head_dim = embed_dim // num_heads
    mlp_hidden = int(embed_dim * mlp_ratio)

    ln_params = 2 * embed_dim
    mha_params = 3 * embed_dim * embed_dim + embed_dim * embed_dim + 2 * embed_dim
    mha_flops = (
        3 * seq_len * embed_dim * embed_dim
        + 2 * num_heads * seq_len * seq_len * head_dim
        + num_heads * seq_len * seq_len * head_dim
        + seq_len * embed_dim * embed_dim
    )
    mlp_params = embed_dim * mlp_hidden + mlp_hidden + mlp_hidden * embed_dim + embed_dim
    mlp_flops = seq_len * (embed_dim * mlp_hidden + mlp_hidden * embed_dim)

    block_params = depth * (2 * ln_params + mha_params + mlp_params)
    block_flops = depth * (mha_flops + mlp_flops)

    final_ln_params = 2 * embed_dim
    head_params = embed_dim * 1000 + 1000

    total_params = (
        patch_embed_params + pos_embed_params + block_params
        + final_ln_params + head_params
    )
    total_flops = patch_embed_flops + block_flops
    activation_memory = seq_len * embed_dim * 4 * (depth + 2)
    inference_memory = total_params * 4 + activation_memory

    return {
        "parameters": total_params,
        "flops": total_flops,
        "time_complexity": total_flops,
        "space_complexity_bytes": inference_memory,
        "space_complexity_mb": inference_memory / (1024 * 1024),
    }


def _sync(x) -> None:
    """Force completion of the async dispatch chain ending in ``x``.

    ``jax.block_until_ready`` is not reliable on every PJRT plugin (the
    tunneled backend on this machine returns immediately); a host transfer
    of one element is an unconditional synchronization point.
    """
    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf))


def measure_inference_time(
    apply_fn: Callable,
    *args,
    num_iterations: int = 100,
    warm_up: int = 250,
) -> Dict[str, float]:
    """Warm-up + timed iterations, sync-correct
    (reference protocol: utils/metrics.py:152-194 — 250 warm-up, 100 timed)."""
    fn = jax.jit(apply_fn) if not hasattr(apply_fn, "lower") else apply_fn
    out = None
    for _ in range(warm_up):
        out = fn(*args)
    if out is not None:
        _sync(out)

    start = time.time()
    for _ in range(num_iterations):
        out = fn(*args)
    _sync(out)
    total = time.time() - start
    return {
        "total_time": total,
        "avg_time": total / num_iterations,
        "fps": num_iterations / total,
    }


def measure_training_time(
    train_step: Callable,
    state,
    *args,
    num_iterations: int = 10,
) -> Tuple[Dict[str, float], Any]:
    """Timed fwd+bwd+update iterations (reference: utils/metrics.py:197-241)."""
    # One warm-up step to exclude compilation.
    state2, m = train_step(state, *args)
    _sync(m)

    start = time.time()
    for _ in range(num_iterations):
        state2, m = train_step(state2, *args)
    _sync(m)
    total = time.time() - start
    return (
        {
            "total_time": total,
            "avg_time": total / num_iterations,
            "iterations_per_second": num_iterations / total,
        },
        state2,
    )


def _device_memory_stats() -> Dict[str, float]:
    """Per-device allocator stats (TPU equivalent of torch.cuda probes)."""
    stats = {}
    try:
        dev = jax.devices()[0]
        s = dev.memory_stats()
        if s:
            stats["device_bytes_in_use"] = float(s.get("bytes_in_use", 0))
            stats["device_peak_bytes"] = float(
                s.get("peak_bytes_in_use", s.get("bytes_in_use", 0))
            )
    except Exception:
        pass
    return stats


def measure_memory_usage(
    apply_fn: Callable,
    *args,
    backward: bool = False,
) -> Dict[str, float]:
    """RSS delta + device allocator peak around one fwd(/bwd) pass
    (reference: utils/metrics.py:244-308)."""
    process = psutil.Process(os.getpid()) if psutil else None
    cpu_before = process.memory_info().rss if process else 0
    before = _device_memory_stats()

    if backward:
        def scalar_fn(*a):
            return apply_fn(*a).sum()

        out = jax.grad(scalar_fn)(*args)
    else:
        out = apply_fn(*args)
    _sync(out)

    cpu_after = process.memory_info().rss if process else 0
    after = _device_memory_stats()

    # The allocator peak is process-lifetime-monotone and PJRT has no
    # reset (the reference calls torch.cuda.reset_peak_memory_stats before
    # measuring, utils/metrics.py:264-265). If THIS pass raised the
    # lifetime peak, its own peak is that new high-water relative to the
    # bytes live at entry. If it did not (the lifetime peak was inherited
    # from an earlier, larger measurement in the same process), subtracting
    # entry-live bytes would still report the EARLIER model's peak — fall
    # back to the live-bytes delta we did observe (a lower bound on the
    # true transient peak, disclosed here rather than silently wrong).
    used_before = before.get("device_bytes_in_use", 0.0)
    used_after = after.get("device_bytes_in_use", 0.0)
    used = used_after - used_before
    peak_before = before.get("device_peak_bytes", 0.0)
    peak_after = after.get("device_peak_bytes", 0.0)
    if peak_after > peak_before:
        peak = max(peak_after - used_before, 0.0)
    else:
        peak = max(used, 0.0)
    return {
        "cpu_memory_before_bytes": cpu_before,
        "cpu_memory_after_bytes": cpu_after,
        "cpu_memory_used_bytes": cpu_after - cpu_before,
        "cpu_memory_used_mb": (cpu_after - cpu_before) / (1024 * 1024),
        "device_memory_before_bytes": used_before,
        "device_memory_after_bytes": used_after,
        # Reference key names (utils/metrics.py:303-307).
        "gpu_memory_used_bytes": used,
        "gpu_memory_used_mb": used / (1024 * 1024),
        "gpu_memory_peak_bytes": peak,
        "gpu_memory_peak_mb": peak / (1024 * 1024),
    }


def benchmark_model(
    model,
    params,
    input_shape: Tuple[int, ...],
    *,
    num_classes: int = 1000,
    batch_size: int = 1,
    num_inference_iterations: int = 100,
    num_training_iterations: int = 10,
    warm_up: int = 250,
    seed: int = 0,
) -> Dict[str, Any]:
    """Model-size + inference/training time + memory in one dict
    (reference aggregator: utils/metrics.py:311-370). ``input_shape`` is
    (H, W, C) — NHWC."""
    import jax.numpy as jnp
    import optax
    from focused_attention_vit_tpu.train.state import TrainState, make_adamw

    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.normal(size=(batch_size, *input_shape)).astype(np.float32)
    )
    y = jnp.asarray(rng.integers(0, num_classes, size=(batch_size,)))

    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))

    inference_time = measure_inference_time(
        apply, params, x,
        num_iterations=num_inference_iterations, warm_up=warm_up,
    )
    memory_inference = measure_memory_usage(lambda p: apply(p, x), params)

    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=make_adamw(1e-3, 0.0)
    )

    @jax.jit
    def train_step(state, x, y):
        def loss_fn(p):
            logits = state.apply_fn({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    training_time, _ = measure_training_time(
        train_step, state, x, y, num_iterations=num_training_iterations
    )
    memory_training = measure_memory_usage(
        lambda p: model.apply({"params": p}, x), params, backward=True
    )

    return {
        "theoretical": {"model_size": calculate_model_size(params)},
        "actual": {
            "inference_time": inference_time,
            "training_time": training_time,
            "memory_usage_inference": memory_inference,
            "memory_usage_training": memory_training,
        },
    }
