"""Fused single-tile multi-head attention kernel (short sequences).

ViT-B at patch 16 runs S = 197 tokens — far below the flash kernel's
pipeline sweet spot, but the XLA dense path is brutal in *training*:
attention-weight dropout (reference models/vit.py:96-97) forces
materializing, per block, the f32 ``[B, h, S, S]`` logits, the f32 softmax
output (saved for backward), the dropout mask (saved for backward) and the
bf16 probabilities — ≈ 0.8 GB of HBM round-trips per block at batch 128.

This kernel exploits that the *whole* score tile for one (batch·head) fits
VMEM at these lengths (S ≤ ~1k): one grid step computes
``softmax(q·kᵀ/√d) ∘ dropout → ·V`` entirely on-chip. Nothing S² ever
touches HBM, in either direction:

* forward: logits → masked softmax → in-kernel dropout via the hardware
  PRNG (``pltpu.prng_seed`` / ``prng_random_bits``) → P·V;
* backward: a second kernel **regenerates** the identical dropout bits from
  the same per-(b,h) seed and recomputes the softmax, then forms dq, dk,
  dv in-tile. Residuals: just q, k, v.

HBM traffic becomes 4·B·h·S·d reads/writes per direction — the same as the
projections that surround it.

Dropout semantics: inverted dropout with keep probability 1-p, like
``flax.linen.Dropout`` (the reference's nn.Dropout on attention weights).
The bit stream comes from the TPU core PRNG, *not* threefry — per-step
seeds are derived from the training key, but streams are not
reproducible across backends (documented framework-wide; SURVEY §7 promises
eval-mode parity, which is dropout-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
# Largest padded S the single-tile formulation accepts (logits f32 VMEM).
MAX_TILE_SEQ = 1024


def _row_tile(s: int) -> int:
    return -(-s // 128) * 128


def _dropout_mask(shape, p: float):
    """Inverted-dropout scale mask from the seeded core PRNG (f32)."""
    bits = pltpu.prng_random_bits(shape)  # int32 random bits
    # Uniform in [0, 1) from the low 24 bits (exact in f32).
    u = (bits & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    keep = u >= p
    return jnp.where(keep, 1.0 / (1.0 - p), 0.0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *,
                scale: float, s_real: int, p_drop: float):
    sp = q_ref.shape[1]
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [Sp, Sp]
    if s_real < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        logits = jnp.where(col < s_real, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        w = w * _dropout_mask((sp, sp), p_drop)
    o_ref[0] = jax.lax.dot_general(
        w.astype(v_ref.dtype), v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, s_real: int, p_drop: float):
    sp = q_ref.shape[1]
    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if s_real < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        logits = jnp.where(col < s_real, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # softmax [Sp, Sp]

    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        mask = _dropout_mask((sp, sp), p_drop)  # identical bit stream
        z = p * mask  # dropped probs, as used in fwd
    else:
        mask = None
        z = p

    g = g_ref[0]
    # out = z @ V  →  dV = zᵀ g ;  dz = g Vᵀ
    dv_ref[0] = jax.lax.dot_general(
        z.astype(g.dtype), g,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dz = jax.lax.dot_general(
        g, v_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = dz * mask if mask is not None else dz
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q_ref.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q_ref[0],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _pad_to(x, sp):
    s = x.shape[1]
    return x if s == sp else jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_mha(q, k, v, seed, s_real: int, p_drop: float):
    return _fwd_impl(q, k, v, seed, s_real, p_drop)


def _fwd_impl(q, k, v, seed, s_real, p_drop):
    bh, s, d = q.shape
    sp = _row_tile(s)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=d**-0.5, s_real=s_real, p_drop=p_drop
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sp, d), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0)),
    )(seed, _pad_to(q, sp), _pad_to(k, sp), _pad_to(v, sp))
    return out[:, :s]


def _fwd_rule(q, k, v, seed, s_real, p_drop):
    return _fwd_impl(q, k, v, seed, s_real, p_drop), (q, k, v, seed)


def _bwd_rule(s_real, p_drop, res, g):
    q, k, v, seed = res
    bh, s, d = q.shape
    sp = _row_tile(s)
    gp = _pad_to(g, sp)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=d**-0.5, s_real=s_real, p_drop=p_drop
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, sp, d), q.dtype)] * 3,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, sp, d), lambda b: (b, 0, 0))] * 3,
    )(seed, _pad_to(q, sp), _pad_to(k, sp), _pad_to(v, sp), gp)
    return dq[:, :s], dk[:, :s], dv[:, :s], None


_fused_mha.defvjp(_fwd_rule, _bwd_rule)


def fused_mha_supported(seq_len: int, head_dim: int) -> bool:
    """Single-tile applicability: padded S² f32 logits must fit VMEM."""
    return _row_tile(seq_len) <= MAX_TILE_SEQ and head_dim % 8 == 0


def fused_multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Fused attention (+ optional weight dropout) on ``[B, h, S, d]``.

    Matches ``softmax(q·kᵀ/√d)`` (reference models/vit.py:95-100) with
    inverted dropout on the attention weights when ``dropout_rate > 0``
    (reference models/vit.py:96-97; requires ``dropout_rng``).
    """
    b, h, s, d = q.shape
    bh = b * h
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(
            dropout_rng, (1,), minval=0, maxval=jnp.iinfo(jnp.int32).max,
            dtype=jnp.int32,
        )
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _fused_mha(
        q.reshape(bh, s, d), k.reshape(bh, s, d), v.reshape(bh, s, d),
        seed, s, float(dropout_rate),
    )
    return out.reshape(b, h, s, d)
