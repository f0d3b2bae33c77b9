"""Memory-bounded attention for long sequences (flash-attention pattern).

At the reference's default geometry (patch 4 @ 224² → S = 3137 tokens,
12 heads) materializing the [B, h, S, S] score tensor costs ~2.4 GB per
8 images in fp32 — dense attention does not fit HBM at training batch
sizes. This module computes attention with the online-softmax
(flash-attention) recurrence over key/value chunks so memory is
O(S · chunk).

Two implementations:

* ``flash_attention_pallas`` (ops/flash_attention_pallas.py) — hand-written
  Pallas TPU kernel with a custom VJP; the production path.
* ``_chunked_attention`` — a lax.scan online-softmax in plain jnp;
  differentiable via autodiff, used as fallback (CPU tests, interpreter
  debugging) and as the reference the kernel is validated against.

Semantics match dense softmax(q·kᵀ/√d)·v exactly (no masking, non-causal)
— the reference MHA (models/vit.py:95-100).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_CHUNK = 512


@functools.partial(jax.jit, static_argnames=("chunk",))
def _chunked_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, chunk: int = DEFAULT_CHUNK
) -> jnp.ndarray:
    """Online-softmax attention over K/V chunks. [B, h, S, d] → [B, h, S, d]."""
    b, h, s, d = q.shape
    t = k.shape[2]
    scale = d**-0.5
    nchunks = -(-t // chunk)
    pad = nchunks * chunk - t

    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    # Padded keys get -inf logits via a validity mask.
    valid = (jnp.arange(nchunks * chunk) < t).reshape(nchunks, chunk)

    kc = kp.reshape(b, h, nchunks, chunk, d).transpose(2, 0, 1, 3, 4)
    vc = vp.reshape(b, h, nchunks, chunk, d).transpose(2, 0, 1, 3, 4)

    qf = q.astype(jnp.float32)

    def step(carry, inp):
        m, l, acc = carry
        kb, vb, ok = inp  # [B, h, C, d], [C]
        s_blk = jnp.einsum(
            "bhsd,bhcd->bhsc", qf, kb.astype(jnp.float32)
        ) * scale
        s_blk = jnp.where(ok[None, None, None, :], s_blk, -jnp.inf)
        m_new = jnp.maximum(m, s_blk.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s_blk - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhsc,bhcd->bhsd", p, vb.astype(jnp.float32)
        )
        return (m_new, l, acc), None

    init = (
        jnp.full((b, h, s), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((b, h, s), dtype=jnp.float32),
        jnp.zeros((b, h, s, d), dtype=jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(
        jax.checkpoint(step), init, (kc, vc, valid)
    )
    return (acc / l[..., None]).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("rate", "chunk"))
def dropout_attention_q_chunked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rate: float,
    rng: jax.Array,
    chunk: int = 256,
) -> jnp.ndarray:
    """Attention with *attention-weight* dropout at long S, computed in
    query chunks — memory is O(B·h·chunk·S), never the ``[B, h, S, S]``
    tensor the materialized branch would allocate (at the reference-default
    S = 3137 that tensor is ~15 GB f32 at batch 32 — an OOM footgun on a
    reference-surface flag, /root/reference/main.py:108-109 feeding
    models/vit.py:96-97).

    Per chunk: full-key logits → softmax → inverted dropout (mask drawn
    from ``fold_in(rng, chunk_index)``) → P·V. Semantics match the
    materialized branch in distribution (same rate, independent Bernoulli
    per weight); the mask *realization* differs from ``nn.Dropout`` for the
    same key because masks are drawn per chunk. ``rate=0`` is exactly dense
    attention. Differentiable via autodiff; the scan recomputes each
    chunk's logits in the backward pass (remat) instead of saving them.
    """
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"dropout rate must be in [0, 1), got {rate}")
    b, h, s, d = q.shape
    scale = d**-0.5
    n = -(-s // chunk)
    pad = n * chunk - s
    keep = 1.0 - rate

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qc = qp.reshape(b, h, n, chunk, d).transpose(2, 0, 1, 3, 4)

    def per_chunk(i, qblk):
        logits = jnp.einsum(
            "bhcd,bhtd->bhct", qblk, k, preferred_element_type=jnp.float32
        ) * scale
        w = jax.nn.softmax(logits, axis=-1)
        if rate > 0.0:
            m = jax.random.bernoulli(
                jax.random.fold_in(rng, i), keep, w.shape
            )
            w = jnp.where(m, w / keep, 0.0)
        return jnp.einsum("bhct,bhtd->bhcd", w.astype(v.dtype), v)

    def step(_, inp):
        i, qblk = inp
        return None, jax.checkpoint(per_chunk)(i, qblk)

    _, out = jax.lax.scan(step, None, (jnp.arange(n), qc))
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, n * chunk, d)
    return out[:, :, :s]


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, chunk: int = DEFAULT_CHUNK
) -> jnp.ndarray:
    """Dispatch to the Pallas TPU kernel when available, else chunked jnp."""
    if jax.default_backend() == "tpu":
        try:
            from focused_attention_vit_tpu.ops.flash_attention_pallas import (
                flash_attention_tpu,
            )

            return flash_attention_tpu(q, k, v)
        except ImportError:
            pass
    return _chunked_attention(q, k, v, chunk=chunk)
