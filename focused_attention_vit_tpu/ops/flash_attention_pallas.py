"""Pallas TPU flash-attention wrapper for the dense MHA path.

Uses the Pallas flash-attention kernel that ships with JAX
(``jax.experimental.pallas.ops.tpu.flash_attention`` — fwd + custom-VJP
bwd, MXU-tiled, online softmax). This module adapts it to the framework's
non-causal ViT workload: sequence lengths like S = 3137 (patch 4 @ 224²,
reference geometry models/vit.py:33) are padded to the kernel's block
multiple and the padded keys are masked out via segment ids, so the result
equals dense softmax(q·kᵀ/√d)·v on the original length exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    SegmentIds,
    flash_attention as _pallas_flash,
)

_BLOCK = 512


@functools.partial(jax.jit, static_argnames=())
def flash_attention_tpu(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Non-causal attention on ``[B, h, S, d]`` via the Pallas kernel."""
    b, h, s, d = q.shape
    sp = -(-s // _BLOCK) * _BLOCK
    pad = sp - s

    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # Segment ids: real tokens 0, padded tokens 1 → real queries never
        # attend to padded keys; padded query rows are sliced off below.
        seg = jnp.broadcast_to(
            (jnp.arange(sp) >= s).astype(jnp.int32), (b, sp)
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        qp, kp, vp = q, k, v
        segment_ids = None

    # Tuned on v5e at S=3137, d=64: q blocks with the full K resident win
    # for the forward (round-5 re-sweep at BOTH the mb1 BH=12 regime and
    # BH=384: block_q=512 beats 256 by 15% / 2.7% — /tmp sweep recorded
    # in BASELINE.md "dense roofline round 5"; square 512/1024 blocks
    # lose); the backward kernels carry more per-block state and OOM VMEM
    # with a full-K block, so they use 512² tiles (re-swept best at both
    # BH=384 and BH=12 — BASELINE.md).
    block_q = min(512, sp)
    block_k = sp if sp <= 4096 else 1024
    block_bwd = min(512, sp)
    sizes = BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=1,
        block_q_major_dkv=block_bwd,
        block_k_major_dkv=block_bwd,
        block_k_dkv=block_bwd,
        block_q_dkv=block_bwd,
        block_k_major_dq=block_bwd,
        block_k_dq=block_bwd,
        block_q_dq=block_bwd,
    )
    out = _pallas_flash(
        qp,
        kp,
        vp,
        segment_ids=segment_ids,
        causal=False,
        sm_scale=d**-0.5,
        block_sizes=sizes,
    )
    return out[:, :, :s] if pad else out
