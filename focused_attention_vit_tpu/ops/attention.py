"""Dense multi-head self/cross attention primitives.

Numerical semantics match the reference MultiHeadAttention
(reference: models/vit.py:56-104): scaled dot-product with per-head scale
``head_dim**-0.5``, softmax over keys, no causal mask.

TPU notes: for short sequences (SPPP runs at R+1 = 17 tokens) the plain
einsum formulation below is already MXU-bound after XLA fusion. For long
sequences the flash-attention Pallas kernel in
:mod:`focused_attention_vit_tpu.ops.flash_attention` is used instead; the
``multi_head_attention`` wrapper dispatches between the two.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sequence length at or above which the Pallas flash-attention kernel is
# preferred over the materialized-scores einsum path.
FLASH_MIN_SEQ_LEN = 512


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Attention over ``[..., S, d]`` q / ``[..., T, d]`` k, v.

    Args:
      mask: optional boolean/0-1 array broadcastable to ``[..., S, T]``;
        zero entries are masked to -inf before softmax (reference:
        models/attention.py:67-68 semantics).
      scale: logit scale; defaults to ``d**-0.5``.
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    logits = jnp.einsum(
        "...sd,...td->...st", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask == 0, jnp.finfo(logits.dtype).min, logits)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...st,...td->...sd", weights, v)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """``[B, S, D] -> [B, h, S, d]`` with contiguous head slices of D."""
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, h, S, d] -> [B, S, D]``."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def qkv_split_heads(qkv: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Split a head-shaped fused qkv ``[B, S, 3, h, d]`` into q, k, v
    ``[B, h, S, d]``.

    The attention modules project with ``nn.DenseGeneral`` to a
    ``(3, h, d)``-shaped feature tree (kernel ``[D, 3, h, d]``) instead of a
    flat ``Dense(3D)``: the head axis is then a real array axis on both the
    parameter and the activation, so tensor parallelism shards it with a
    plain ``PartitionSpec`` — no GSPMD relayout through a flat-3D reshape
    (see parallel/sharding.py).
    """
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # [3, B, h, S, d]
    return qkv[0], qkv[1], qkv[2]


def qkv_split(qkv: jnp.ndarray, num_heads: int) -> tuple[jnp.ndarray, ...]:
    """Split a fused qkv projection ``[B, S, 3D]`` into per-head q, k, v.

    Layout matches the reference fused ``nn.Linear(D, 3D)`` followed by
    ``reshape(B, S, 3, h, d)`` (reference: models/vit.py:90-92): the 3D output
    dim is ordered [q | k | v], each of which splits into contiguous heads.
    """
    b, s, three_d = qkv.shape
    d = three_d // 3
    qkv = qkv.reshape(b, s, 3, num_heads, d // num_heads)
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # [3, B, h, S, hd]
    return qkv[0], qkv[1], qkv[2]


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    use_flash: bool | None = None,
) -> jnp.ndarray:
    """Multi-head attention core on ``[B, h, S, d]`` inputs → ``[B, h, S, d]``.

    Dispatches to the Pallas flash-attention kernel for long sequences on TPU
    (set ``use_flash`` to force either path).
    """
    seq_len = q.shape[-2]
    if use_flash is None:
        use_flash = (
            seq_len >= FLASH_MIN_SEQ_LEN
            and jax.default_backend() == "tpu"
        )
    if use_flash:
        from focused_attention_vit_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v)
    # Flash-style memory behavior for the materialized short-S path too:
    # under autodiff, save only q/k/v (O(S·d)) and recompute the [S, S]
    # logits/softmax in the backward pass. Without this, JAX saves TWO
    # S²-sized residuals per call (f32 softmax output + bf16 weights) —
    # at the bench geometry (b128 mb16, ViT-B/16) that is ~60 MB × 12
    # layers × 8 microbatch chunks of residual HBM traffic per step,
    # stacked across the accumulation scan through layout-changing
    # copies (measured: ~12 ms/step of copy-dones alone). The recompute
    # is one extra QK^T einsum + softmax — ~1.4% of the model's matmul
    # FLOPs. Identical numerics (same ops, same order); a no-op when not
    # differentiated (eval).
    return jax.checkpoint(scaled_dot_product_attention)(q, k, v)
