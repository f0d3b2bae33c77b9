"""Fused MHLA kernel v2: latent projection + banded attention, head-pair
lane packing.

Status (measured on v5e, B·h=1536, S=3137, d=64, W=7, bf16): numerically
exact (5e-7 vs the gather oracle) but 60.5 ms vs 40.6 ms for the XLA
latent-GEMM + fused-shift path — per-step time is unchanged from v1
despite full-lane packing, indicating Mosaic's static sublane-shifted
slices lower to expensive rotate sequences regardless of width. The XLA
path remains the default; this kernel is kept for further iteration (next
lever: VMEM→VMEM async-DMA shifts instead of register relayouts).

Improvements over ops/mhla_kernel.py (v1):

* **Full-lane utilization** — head dim 64 wastes half of the VPU's 128
  lanes; packing two heads per row ([B·h/2, S, 2d]) makes every shifted
  slice, multiply-reduce and FMA full-width, halving the per-head VPU op
  count (the v1 bottleneck).
* **Latent projection fused** — K/V enter *pre-latent*; the kernel applies
  the shared latent projection as one [S, 2d]×[2d, 2d] block-diagonal MXU
  matmul per batch·pair, eliminating XLA's separate latent GEMM round-trip
  through HBM (4 full passes over K/V).

Same clamp-band semantics as v1 (exact edge rows handled by the caller).
Backward recomputes via the jnp formulation (band FLOPs are negligible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from focused_attention_vit_tpu.ops.mhla_kernel import _read_rows

DEFAULT_BLOCK_Q = 512
MAX_KV_VMEM_BYTES = 6 * 1024 * 1024


def _kernel(q_ref, k_ref, v_ref, wl_ref, bl_ref, o_ref, klat_ref, vlat_ref,
            *, window_size, block_q, head_dim):
    """Grid step = one (batch, head-pair). Refs: q/k/v [1, L, 2d];
    wl [2d, 2d] block-diag latent kernel; bl [1, 2d]; scratch klat/vlat
    [L, 2d]."""
    w = window_size
    d2 = q_ref.shape[-1]  # 2 * head_dim
    d = head_dim
    sp = o_ref.shape[1]
    scale = d**-0.5

    # Latent projection on the MXU, once per (batch, pair).
    klat_ref[:, :] = (
        jnp.dot(k_ref[0], wl_ref[:, :], preferred_element_type=jnp.float32)
        + bl_ref[0, :]
    ).astype(klat_ref.dtype)
    vlat_ref[:, :] = (
        jnp.dot(v_ref[0], wl_ref[:, :], preferred_element_type=jnp.float32)
        + bl_ref[0, :]
    ).astype(vlat_ref.dtype)

    rr = _read_rows(block_q, w)

    def body(j, _):
        base = pl.multiple_of(j * block_q, block_q)
        q = q_ref[0, pl.ds(base, block_q), :]  # [TQ, 2d]
        kb = klat_ref[pl.ds(base, rr), :]  # [rr, 2d]
        vb = vlat_ref[pl.ds(base, rr), :]

        # Per-offset logits for both packed heads: full-width multiply,
        # half-lane reductions.
        lg0, lg1 = [], []
        for o in range(w):
            prod = (q * kb[o : o + block_q]).astype(jnp.float32)  # [TQ, 2d]
            lg0.append(
                jnp.sum(prod[:, :d], axis=-1, keepdims=True) * scale
            )
            lg1.append(
                jnp.sum(prod[:, d:], axis=-1, keepdims=True) * scale
            )
        l0 = jnp.concatenate(lg0, axis=-1)  # [TQ, W]
        l1 = jnp.concatenate(lg1, axis=-1)

        def softmax_w(lg):
            m = jnp.max(lg, axis=-1, keepdims=True)
            e = jnp.exp(lg - m)
            return e, jnp.sum(e, axis=-1, keepdims=True)

        e0, den0 = softmax_w(l0)
        e1, den1 = softmax_w(l1)

        acc0 = jnp.zeros((block_q, d), jnp.float32)
        acc1 = jnp.zeros((block_q, d), jnp.float32)
        for o in range(w):
            vbf = vb[o : o + block_q].astype(jnp.float32)
            acc0 = acc0 + e0[:, o : o + 1] * vbf[:, :d]
            acc1 = acc1 + e1[:, o : o + 1] * vbf[:, d:]
        out = jnp.concatenate([acc0 / den0, acc1 / den1], axis=-1)
        o_ref[0, pl.ds(base, block_q), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, sp // block_q, body, 0)


def _pairs_pack(x):
    """[B, h, S, d] → [B·h/2, S, 2d] packing adjacent heads along lanes."""
    b, h, s, d = x.shape
    x = x.reshape(b, h // 2, 2, s, d).transpose(0, 1, 3, 2, 4)
    return x.reshape(b * (h // 2), s, 2 * d)


def _pairs_unpack(x, b, h, s, d):
    x = x.reshape(b, h // 2, s, 2, d).transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, s, d)


def _latent_banded_core(q, k, v, wl, bl, window_size):
    """jnp fallback/backward: latent proj + clamp-banded attention on
    packed [BH2, S, 2d] with per-head (2d = blockdiag) latent kernel."""
    bh2, s, d2 = q.shape
    d = d2 // 2
    w = window_size
    hw = w // 2
    klat = k @ wl + bl  # [BH2, S, 2d]
    vlat = v @ wl + bl
    kp = jnp.pad(klat, ((0, 0), (hw, w - 1 - hw), (0, 0)), mode="edge")
    vp = jnp.pad(vlat, ((0, 0), (hw, w - 1 - hw), (0, 0)), mode="edge")
    qf = q.astype(jnp.float32)

    outs = []
    for half in (slice(0, d), slice(d, d2)):
        lg = jnp.stack(
            [
                jnp.einsum(
                    "bsd,bsd->bs",
                    qf[:, :, half],
                    jax.lax.dynamic_slice_in_dim(kp, o, s, 1)[:, :, half]
                    .astype(jnp.float32),
                )
                for o in range(w)
            ],
            axis=-1,
        ) * (d**-0.5)
        wgt = jax.nn.softmax(lg, axis=-1)
        outs.append(
            sum(
                wgt[..., o : o + 1]
                * jax.lax.dynamic_slice_in_dim(vp, o, s, 1)[:, :, half]
                .astype(jnp.float32)
                for o in range(w)
            )
        )
    return jnp.concatenate(outs, axis=-1).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_latent_banded(q, k, v, wl, bl, window_size):
    bh2, s, d2 = q.shape
    w = window_size
    block_q = min(DEFAULT_BLOCK_Q, max(128, s))
    sp = -(-s // block_q) * block_q
    kv_len = sp - block_q + _read_rows(block_q, w)

    if (kv_len * d2 * 2) * q.dtype.itemsize > MAX_KV_VMEM_BYTES:
        return _latent_banded_core(q, k, v, wl, bl, w)

    hw = w // 2
    right = kv_len - hw - s
    qp = jnp.pad(q, ((0, 0), (0, sp - s), (0, 0)), mode="edge")
    kp = jnp.pad(k, ((0, 0), (hw, right), (0, 0)), mode="edge")
    vp = jnp.pad(v, ((0, 0), (hw, right), (0, 0)), mode="edge")

    d = d2 // 2
    out = pl.pallas_call(
        functools.partial(
            _kernel, window_size=w, block_q=block_q, head_dim=d
        ),
        out_shape=jax.ShapeDtypeStruct((bh2, sp, d2), q.dtype),
        grid=(bh2,),
        in_specs=[
            pl.BlockSpec((1, sp, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_len, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, d2), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d2), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sp, d2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((kv_len, d2), q.dtype),
            pltpu.VMEM((kv_len, d2), q.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh2 * kv_len * d2 * d2 + 4 * bh2 * sp * w * d2,
            bytes_accessed=q.dtype.itemsize * bh2 * sp * d2 * 4,
            transcendentals=2 * bh2 * sp * w,
        ),
    )(qp, kp, vp, wl, bl.reshape(1, -1))
    return out[:, :s]


def _fwd_rule(q, k, v, wl, bl, window_size):
    return _fused_latent_banded(q, k, v, wl, bl, window_size), (q, k, v, wl, bl)


def _bwd_rule(window_size, res, g):
    q, k, v, wl, bl = res
    _, vjp = jax.vjp(
        lambda q, k, v, wl, bl: _latent_banded_core(q, k, v, wl, bl, window_size),
        q, k, v, wl, bl,
    )
    return vjp(g)


_fused_latent_banded.defvjp(_fwd_rule, _bwd_rule)


def fused_latent_banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    latent_kernel: jnp.ndarray,
    latent_bias: jnp.ndarray,
    window_size: int,
) -> jnp.ndarray:
    """Latent projection + clamp-banded window attention, fused.

    Args:
      q, k, v: ``[B, h, S, d]`` per-head tensors (k/v pre-latent).
      latent_kernel: ``[d, d]`` shared latent projection (Flax layout).
      latent_bias: ``[d]``.

    Returns ``[B, h, S, d]``; edge rows follow clamp semantics (caller
    overwrites them with the reference rule).
    """
    b, h, s, d = q.shape
    if h % 2:
        # Odd head count: no pairing; fall back to jnp on unpacked heads.
        from focused_attention_vit_tpu.ops.mhla_kernel import _shift_banded_core

        klat = (k @ latent_kernel + latent_bias).reshape(b * h, s, d)
        vlat = (v @ latent_kernel + latent_bias).reshape(b * h, s, d)
        out = _shift_banded_core(
            q.reshape(b * h, s, d), klat, vlat, window_size
        )
        return out.reshape(b, h, s, d)

    wl2 = jax.scipy.linalg.block_diag(latent_kernel, latent_kernel).astype(
        q.dtype
    )
    bl2 = jnp.concatenate([latent_bias, latent_bias]).astype(q.dtype)
    out = _fused_latent_banded(
        _pairs_pack(q), _pairs_pack(k), _pairs_pack(v), wl2, bl2, window_size
    )
    return _pairs_unpack(out, b, h, s, d)
