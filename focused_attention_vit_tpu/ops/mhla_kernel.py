"""Fused Pallas TPU kernel for MHLA banded window attention.

The windowed attention (reference: models/mhla.py:109-154) is
bandwidth-bound: its FLOPs are O(S·W·d) but the reference's gather
formulation materializes a ``[B, h, S, W, d]`` window tensor — W× the
K/V traffic plus full round-trips through HBM. This kernel computes the
band in one pass over VMEM-resident K/V: per query block it performs W
shifted elementwise multiply-reduces (VPU), an in-register softmax over
the W logits, and the weighted sum — reading Q/K/V once and writing O
once. Speed of light is ~4·S·d bytes per (batch·head), which this kernel
approaches.

Semantics: *clamped* band — query i attends keys ``clamp(i-hw+o, 0, S-1)``.
This matches the reference's window rule for all interior rows; the caller
(ops/window.windowed_latent_attention) overwrites the first/last ``hw``
rows with the reference's exact edge windows.

Backward pass: custom VJP whose backward recomputes via the jnp
shift-banded formulation (same clamp semantics, fused by XLA) — the band
is too cheap to warrant a bespoke backward kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Query rows per grid step. 512×64 f32 = 128 KB per operand block — small
# against ~16 MB VMEM even with the full padded K/V resident.
DEFAULT_BLOCK_Q = 512

# Keep full K/V in VMEM only while they fit comfortably.
MAX_KV_VMEM_BYTES = 6 * 1024 * 1024


def _read_rows(block_q: int, window_size: int) -> int:
    """Aligned superblock length covering block_q rows + W-1 halo.

    Mosaic requires dynamic ref-slice starts to be provably tile-aligned;
    loading one aligned superblock and doing the W shifts as *static*
    slices of the loaded value keeps every memory access aligned.
    """
    need = block_q + window_size - 1
    return -(-need // 32) * 32  # 32-row alignment covers f32/bf16 tiles


def _banded_kernel(q_ref, kp_ref, vp_ref, o_ref, *, window_size, block_q):
    """One grid step = one batch·head; static inner loop over query blocks.

    One grid step per bh means Q/K/V/O cross HBM↔VMEM exactly once; every
    slice below has a static start, so Mosaic never needs dynamic-alignment
    proofs.
    """
    w = window_size
    d = q_ref.shape[-1]
    sp = q_ref.shape[1]
    rr = _read_rows(block_q, w)
    scale = d**-0.5

    def body(j, _):
        # Block starts are multiples of block_q — Mosaic's alignment prover
        # accepts the hinted dynamic slice; the W shifts are then *static*
        # slices of the loaded superblock value.
        base = pl.multiple_of(j * block_q, block_q)
        q = q_ref[0, pl.ds(base, block_q), :]  # [TQ, d]
        kb = kp_ref[0, pl.ds(base, rr), :]  # [rr, d]
        vb = vp_ref[0, pl.ds(base, rr), :]

        logits = []
        for o in range(w):  # static tiny loop (W ~ 7)
            logits.append(
                jnp.sum(
                    q * kb[o : o + block_q],
                    axis=-1,
                    keepdims=True,
                    dtype=jnp.float32,
                )
                * scale
            )  # [TQ, 1] f32
        lg = jnp.concatenate(logits, axis=-1)  # [TQ, W]

        m = jnp.max(lg, axis=-1, keepdims=True)
        e = jnp.exp(lg - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)

        acc = jnp.zeros((block_q, d), jnp.float32)
        for o in range(w):
            acc = acc + e[:, o : o + 1] * vb[o : o + block_q].astype(
                jnp.float32
            )
        o_ref[0, pl.ds(base, block_q), :] = (acc / denom).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, sp // block_q, body, 0)


def _banded_fwd_pallas(q, kp, vp, window_size, block_q):
    bh, sp, d = q.shape
    w = window_size
    kv_len = kp.shape[1]
    return pl.pallas_call(
        functools.partial(
            _banded_kernel, window_size=w, block_q=block_q
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sp, d), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec(
                (1, sp, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kv_len, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kv_len, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sp, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sp * w * d,
            bytes_accessed=q.dtype.itemsize * bh * sp * d * 4,
            transcendentals=bh * sp * w,
        ),
    )(q, kp, vp)


def _shift_banded_core(q, k, v, window_size):
    """jnp clamp-banded attention on [BH, S, d] (backward / fallback)."""
    bh, s, d = q.shape
    w = window_size
    hw = w // 2
    qf = q.astype(jnp.float32)
    kp = jnp.pad(k, ((0, 0), (hw, w - 1 - hw), (0, 0)), mode="edge")
    vp = jnp.pad(v, ((0, 0), (hw, w - 1 - hw), (0, 0)), mode="edge")
    lg = jnp.stack(
        [
            jnp.einsum(
                "bsd,bsd->bs",
                qf,
                jax.lax.dynamic_slice_in_dim(kp, o, s, 1).astype(jnp.float32),
            )
            for o in range(w)
        ],
        axis=-1,
    ) * (d**-0.5)
    wgt = jax.nn.softmax(lg, axis=-1)
    out = sum(
        wgt[..., o : o + 1]
        * jax.lax.dynamic_slice_in_dim(vp, o, s, 1).astype(jnp.float32)
        for o in range(w)
    )
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _banded_attention(q, k, v, window_size):
    """[BH, S, d] clamp-banded attention; Pallas fwd, jnp-recompute bwd."""
    bh, s, d = q.shape
    w = window_size
    block_q = min(DEFAULT_BLOCK_Q, max(128, s))
    sp = -(-s // block_q) * block_q

    if (sp + w) * d * q.dtype.itemsize > MAX_KV_VMEM_BYTES:
        return _shift_banded_core(q, k, v, w)

    hw = w // 2
    pad_tail = sp - s
    # K/V are left-padded by hw (clamp at the front) and right-padded so
    # the last block's aligned superblock read stays in bounds.
    kv_len = sp - block_q + _read_rows(block_q, w)
    right = kv_len - hw - s
    qp = jnp.pad(q, ((0, 0), (0, pad_tail), (0, 0)), mode="edge")
    kp = jnp.pad(k, ((0, 0), (hw, right), (0, 0)), mode="edge")
    vp = jnp.pad(v, ((0, 0), (hw, right), (0, 0)), mode="edge")
    out = _banded_fwd_pallas(qp, kp, vp, w, block_q)
    return out[:, :s]


def _banded_fwd_rule(q, k, v, window_size):
    return _banded_attention(q, k, v, window_size), (q, k, v)


def _banded_bwd_rule(window_size, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: _shift_banded_core(q, k, v, window_size), q, k, v
    )
    return vjp(g)


_banded_attention.defvjp(_banded_fwd_rule, _banded_bwd_rule)


def banded_attention_tpu(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, window_size: int
) -> jnp.ndarray:
    """Clamp-banded window attention on ``[B, h, S, d]`` via the fused
    Pallas kernel (differentiable)."""
    b, h, s, d = q.shape
    out = _banded_attention(
        q.reshape(b * h, s, d),
        k.reshape(b * h, s, d),
        v.reshape(b * h, s, d),
        window_size,
    )
    return out.reshape(b, h, s, d)
