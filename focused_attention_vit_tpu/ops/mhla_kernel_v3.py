"""Banded MHLA kernel v3: shifted windows via async DMA — EXPERIMENT CLOSED.

v1/v2 showed the band's cost on v5e is Mosaic's lowering of
sublane-shifted vector slices (60 ms at B·h=1536, S=3137, W=7 — identical
whether slices are 64- or 128-lane wide). v3 tried to remove register
relayouts by staging each shifted K/V window into aligned VMEM scratch
with the DMA engines. **Finding: Mosaic requires VMEM memref slice starts
to be sublane-tile-aligned (multiple of 8 rows) even for DMA sources**
("Failed to prove that a tile index in dimension 1 is divisible by the
tiling (8)"), so a ±o row shift cannot be expressed as a DMA either.
Unaligned row access in VMEM is closed off at the Mosaic level on this
toolchain; the XLA fused-shift formulation (ops/window.py) remains the
production path. This module is kept as the record of the investigation
and still runs (small shapes / fallback path) for its tests.

Same clamp-band semantics; caller handles exact edge rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from focused_attention_vit_tpu.ops.mhla_kernel import _shift_banded_core

DEFAULT_BLOCK_Q = 512
MAX_KV_VMEM_BYTES = 6 * 1024 * 1024


def _kernel(q_ref, kp_ref, vp_ref, o_ref, ksc, vsc, sems, *, window_size,
            block_q, head_dim):
    """Operands are head-pair packed: [1, L, 2d] with 2d = 128 lanes (DMA
    slices must span full 128-lane tiles)."""
    w = window_size
    d = head_dim
    d2 = q_ref.shape[-1]
    sp = q_ref.shape[1]
    scale = d**-0.5

    def copy_k(j, o):
        base = j * block_q
        return pltpu.make_async_copy(
            kp_ref.at[0, pl.ds(base + o, block_q), :], ksc.at[o], sems.at[o]
        )

    def copy_v(j, o):
        base = j * block_q
        return pltpu.make_async_copy(
            vp_ref.at[0, pl.ds(base + o, block_q), :],
            vsc.at[o],
            sems.at[w + o],
        )

    def body(j, _):
        for o in range(w):
            copy_k(j, o).start()
            copy_v(j, o).start()

        base = pl.multiple_of(j * block_q, block_q)
        q = q_ref[0, pl.ds(base, block_q), :]

        lg0, lg1 = [], []
        for o in range(w):
            copy_k(j, o).wait()
            prod = (q * ksc[o]).astype(jnp.float32)
            lg0.append(jnp.sum(prod[:, :d], axis=-1, keepdims=True) * scale)
            lg1.append(jnp.sum(prod[:, d:], axis=-1, keepdims=True) * scale)

        def softmax_w(parts):
            lg = jnp.concatenate(parts, axis=-1)
            m = jnp.max(lg, axis=-1, keepdims=True)
            e = jnp.exp(lg - m)
            return e, jnp.sum(e, axis=-1, keepdims=True)

        e0, den0 = softmax_w(lg0)
        e1, den1 = softmax_w(lg1)

        acc0 = jnp.zeros((block_q, d), jnp.float32)
        acc1 = jnp.zeros((block_q, d), jnp.float32)
        for o in range(w):
            copy_v(j, o).wait()
            vbf = vsc[o].astype(jnp.float32)
            acc0 = acc0 + e0[:, o : o + 1] * vbf[:, :d]
            acc1 = acc1 + e1[:, o : o + 1] * vbf[:, d:]
        out = jnp.concatenate([acc0 / den0, acc1 / den1], axis=-1)
        o_ref[0, pl.ds(base, block_q), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, sp // block_q, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _banded_v3(q, k, v, window_size):
    """q/k/v: head-pair packed [BH2, S, 2d] with 2d = 128."""
    bh2, s, d2 = q.shape
    w = window_size
    block_q = min(DEFAULT_BLOCK_Q, max(128, s))
    sp = -(-s // block_q) * block_q
    kv_len = sp + w - 1

    if (kv_len * d2 * 2) * q.dtype.itemsize > MAX_KV_VMEM_BYTES:
        return _shift_banded_core(q, k, v, w)

    hw = w // 2
    right = kv_len - hw - s
    qp = jnp.pad(q, ((0, 0), (0, sp - s), (0, 0)), mode="edge")
    kp = jnp.pad(k, ((0, 0), (hw, right), (0, 0)), mode="edge")
    vp = jnp.pad(v, ((0, 0), (hw, right), (0, 0)), mode="edge")

    out = pl.pallas_call(
        functools.partial(
            _kernel, window_size=w, block_q=block_q, head_dim=d2 // 2
        ),
        out_shape=jax.ShapeDtypeStruct((bh2, sp, d2), q.dtype),
        grid=(bh2,),
        in_specs=[
            pl.BlockSpec((1, sp, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sp, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((w, block_q, d2), q.dtype),
            pltpu.VMEM((w, block_q, d2), q.dtype),
            pltpu.SemaphoreType.DMA((2 * w,)),
        ],
    )(qp, kp, vp)
    return out[:, :s]


def _packed_shift_core(q, k, v, window_size):
    """Clamp-band on packed [BH2, S, 2d]: per-head halves via the jnp core."""
    bh2, s, d2 = q.shape
    d = d2 // 2

    def unpack(x):
        return jnp.concatenate([x[:, :, :d], x[:, :, d:]], axis=0)

    out = _shift_banded_core(
        unpack(q), unpack(k), unpack(v), window_size
    )  # [2*BH2, S, d]
    return jnp.concatenate([out[:bh2], out[bh2:]], axis=-1)


def _fwd(q, k, v, window_size):
    return _banded_v3(q, k, v, window_size), (q, k, v)


def _bwd(window_size, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _packed_shift_core(q, k, v, window_size), q, k, v
    )
    return vjp(g)


_banded_v3.defvjp(_fwd, _bwd)


def banded_attention_v3(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, window_size: int
) -> jnp.ndarray:
    """[B, h, S, d] clamp-banded attention; DMA-staged shifted windows.

    Requires an even head count (pairs packed to 128 lanes); falls back to
    the jnp core otherwise.
    """
    b, h, s, d = q.shape
    if h % 2 or 2 * d != 128:
        bh = b * h
        out = _shift_banded_core(
            q.reshape(bh, s, d), k.reshape(bh, s, d), v.reshape(bh, s, d),
            window_size,
        )
        return out.reshape(b, h, s, d)

    from focused_attention_vit_tpu.ops.mhla_kernel_v2 import (
        _pairs_pack,
        _pairs_unpack,
    )

    out = _banded_v3(
        _pairs_pack(q), _pairs_pack(k), _pairs_pack(v), window_size
    )
    return _pairs_unpack(out, b, h, s, d)
