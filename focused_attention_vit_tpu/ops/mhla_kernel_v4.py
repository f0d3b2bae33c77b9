"""Banded MHLA kernel v4/v4b: tile-band matmul formulation — INVESTIGATION
CLOSED (lost to XLA's shift path; measured roofline in BASELINE.md).

Measured at B·h=1536, S=3137, d=64, W=7, bf16 on v5e (fwd): v4 = 77 ms
(19968 tiny grid steps → per-step DMA-latency-bound, plus 2× bytes from the
128-lane DMA alignment pad), v4b (grouped 8 pairs per step,
XLA-materialized windows, BlockSpec pipelining) = 67 ms — the MXU logits
are cheap but the **softmax runs on (T+2·halo)/W ≈ 41× the band's elements
on the VPU**, which alone exceeds the 23.5 ms the XLA shift formulation
takes end-to-end. Shift stays the production path (ops/window.py); this
module is the tested record — fwd and the custom-VJP bwd (a key-tile
kernel emitting dq/dk/dv in one pass, plus the edge-clamp gradient fold)
are exact vs the oracle at 1e-5.

Why v1-v3 lost (superseded generations, deleted after the investigation
closed — findings preserved here and in BASELINE.md): every
diagonal-by-diagonal formulation needs ±o row shifts of K/V, and Mosaic on
this toolchain cannot express unaligned row access in VMEM. v1 (per-query-
block W shifted multiply-reduces on the VPU, in-register softmax over W
logits) hit Mosaic's sublane-shift relayouts — each ±o row shift of a VMEM
vector lowers to a VPU relayout pass, turning the O(S·W·d) band into W
full-tensor shuffles. v2 (fusing the latent projection into the same
kernel to save one K/V round-trip) inherited the identical relayout wall.
v3 (manual double-buffered DMA of shifted K/V windows from HBM) died on
the 8-row DMA alignment rule: a DMA slice start must be 8-row aligned, so
odd shifts are inexpressible and even ones pad 2× the bytes. v4 sidesteps
shifts entirely:

* tile the sequence into T-row query blocks;
* each block's whole band lives inside K/V rows ``[iT - halo, iT + T + halo)``
  (halo ≥ W//2), so one **aligned** DMA per tile fetches the window —
  the slice start ``iT`` is a multiple of T, trivially 8-row aligned;
* compute dense ``[T, T + 2·halo]`` tile logits on the **MXU**, mask to the
  band (a static iota pattern, identical for every tile), softmax, and hit
  the MXU again for ``P·V`` — the flash-attention shape, but with *no*
  cross-tile softmax state because the band never crosses the halo.

Semantics: clamped band (edge-replicated pad), exactly like
``_shift_banded_attention`` — the caller overwrites the first/last W//2
rows with the reference's duplicated-edge-key windows
(ops/window.py ``windowed_latent_attention``; reference
models/mhla.py:46-83). Backward is a second kernel over *key* tiles that
recomputes the band probabilities and emits dq, dk, dv in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256
NEG_INF = float("-inf")


def _band_mask(n_q: int, n_k: int, q_off: int, hw: int):
    """[n_q, n_k] bool: key (c - q_off) within ±hw of query r."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n_q, n_k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n_q, n_k), 1)
    return jnp.abs(c - q_off - r) <= hw


def _fwd_kernel(kp_hbm, vp_hbm, q_ref, o_ref, ksc, vsc, sem_k, sem_v, *,
                block: int, halo: int, hw: int, scale: float):
    b = pl.program_id(0)
    i = pl.program_id(1)
    t = block
    ext = t + 2 * halo

    ck = pltpu.make_async_copy(
        kp_hbm.at[b, pl.ds(i * t, ext), :], ksc, sem_k
    )
    cv = pltpu.make_async_copy(
        vp_hbm.at[b, pl.ds(i * t, ext), :], vsc, sem_v
    )
    ck.start()
    cv.start()

    q = q_ref[0]  # [T, d]
    ck.wait()
    logits = jax.lax.dot_general(
        q, ksc[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [T, T + 2*halo]
    logits = jnp.where(_band_mask(t, ext, halo, hw), logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    den = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / den).astype(q_ref.dtype)

    cv.wait()
    o_ref[0] = jax.lax.dot_general(
        p, vsc[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(qp_hbm, kp_hbm, vp_hbm, gp_hbm, dq_ref, dk_ref, dv_ref,
                qsc, gsc, ksc, vsc, sems, *,
                block: int, halo: int, hw: int, scale: float):
    """Per key-tile j: queries [jT - halo, jT + T + halo) fully cover every
    row that touches keys [jT, jT + T); their own key windows extend another
    halo, so K/V load [jT - 2·halo, jT + T + 2·halo) (operands are padded so
    all slices start at jT ≥ 0 in padded coordinates)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    t = block
    eq = t + 2 * halo  # query rows covered
    ek = t + 4 * halo  # key columns needed by those rows

    cq = pltpu.make_async_copy(qp_hbm.at[b, pl.ds(j * t, eq), :], qsc, sems.at[0])
    cg = pltpu.make_async_copy(gp_hbm.at[b, pl.ds(j * t, eq), :], gsc, sems.at[1])
    ck = pltpu.make_async_copy(kp_hbm.at[b, pl.ds(j * t, ek), :], ksc, sems.at[2])
    cv = pltpu.make_async_copy(vp_hbm.at[b, pl.ds(j * t, ek), :], vsc, sems.at[3])
    cq.start(); cg.start(); ck.start(); cv.start()

    # Recompute band probabilities for the covered query rows.
    cq.wait(); ck.wait()
    logits = jax.lax.dot_general(
        qsc[...], ksc[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [eq, ek]; key global - query global = c - halo - r
    mask = _band_mask(eq, ek, halo, hw)
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # f32 [eq, ek]

    cg.wait(); cv.wait()
    g = gsc[...]
    dp = jax.lax.dot_general(
        g, vsc[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [eq, ek]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # softmax vjp
    ds = jnp.where(mask, ds, 0.0) * scale
    dsb = ds.astype(qsc.dtype)
    pb = p.astype(qsc.dtype)

    # dq for the tile's own queries = center rows [halo : halo + T).
    dq_full = jax.lax.dot_general(
        dsb, ksc[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [eq, d]
    dq_ref[0] = dq_full[halo:halo + t].astype(dq_ref.dtype)

    # dk / dv for this tile's keys = center columns [2·halo : 2·halo + T).
    dk_full = jax.lax.dot_general(
        dsb, qsc[...],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [ek, d]
    dk_ref[0] = dk_full[2 * halo:2 * halo + t].astype(dk_ref.dtype)
    dv_full = jax.lax.dot_general(
        pb, gsc[...],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [ek, d]
    dv_ref[0] = dv_full[2 * halo:2 * halo + t].astype(dv_ref.dtype)


def _pad_seq(x, lo, hi):
    return jnp.pad(x, ((0, 0), (lo, hi), (0, 0)), mode="edge")


LANE = 128


def _pad_lanes(x):
    """Zero-pad head_dim to a full 128-lane tile: Mosaic requires manual
    DMA slices to span whole lane tiles (the HBM memref is (8,128)-tiled
    even for d=64 operands). Zero columns leave q·kᵀ and p·v unchanged;
    the caller passes the *real* d's softmax scale."""
    d = x.shape[-1]
    if d % LANE == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, LANE - d % LANE)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _banded_v4(q, k, v, window_size: int, block: int):
    return _fwd_impl(q, k, v, window_size, block)


def _halo(block: int, hw: int) -> int:
    # ≥ hw, multiple of the bf16 sublane tile (16) so every VMEM scratch and
    # slice boundary stays tile-aligned.
    return max(16, -(-hw // 16) * 16)


def _fwd_impl(q, k, v, window_size: int, block: int):
    bh, s, d = q.shape
    hw = window_size // 2
    t = block
    halo = _halo(t, hw)
    sp = -(-s // t) * t

    qp = _pad_lanes(_pad_seq(q, 0, sp - s))
    kp = _pad_lanes(_pad_seq(k, halo, sp - s + halo))
    vp = _pad_lanes(_pad_seq(v, halo, sp - s + halo))
    dl = qp.shape[-1]

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, block=t, halo=halo, hw=hw, scale=d**-0.5
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sp, dl), q.dtype),
        grid=(bh, sp // t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, t, dl), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, dl), lambda b, i: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((t + 2 * halo, dl), q.dtype),
            pltpu.VMEM((t + 2 * halo, dl), q.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(kp, vp, qp)
    return out[:, :s, :d]


def _fwd_rule(q, k, v, window_size, block):
    return _fwd_impl(q, k, v, window_size, block), (q, k, v)


def _bwd_rule(window_size, block, res, g):
    q, k, v = res
    bh, s, d = q.shape
    hw = window_size // 2
    t = block
    halo = _halo(t, hw)
    sp = -(-s // t) * t

    # Query-side operands padded by halo (slices [jT, jT+T+2halo));
    # key-side by 2·halo (slices [jT, jT+T+4halo)). Cotangent pad is ZERO —
    # padded/edge rows carry no gradient of their own.
    qp = _pad_lanes(_pad_seq(q, halo, sp - s + halo))
    gp = _pad_lanes(jnp.pad(g, ((0, 0), (halo, sp - s + halo), (0, 0))))
    kp = _pad_lanes(_pad_seq(k, 2 * halo, sp - s + 2 * halo))
    vp = _pad_lanes(_pad_seq(v, 2 * halo, sp - s + 2 * halo))
    dl = qp.shape[-1]

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, block=t, halo=halo, hw=hw, scale=d**-0.5
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, sp, dl), q.dtype)] * 3,
        grid=(bh, sp // t),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec((1, t, dl), lambda b, j: (b, j, 0))] * 3,
        scratch_shapes=[
            pltpu.VMEM((t + 2 * halo, dl), q.dtype),
            pltpu.VMEM((t + 2 * halo, dl), q.dtype),
            pltpu.VMEM((t + 4 * halo, dl), q.dtype),
            pltpu.VMEM((t + 4 * halo, dl), q.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(qp, kp, vp, gp)
    dq, dk, dv = dq[:, :s, :d], dk[:, :s, :d], dv[:, :s, :d]

    # The clamped band reads edge-replicated K/V rows for the first/last hw
    # queries; those pad reads fold their gradients back onto rows 0 / S-1.
    # With the caller overwriting edge rows the cotangent there is zero and
    # these corrections vanish, but the op stands alone correctly too.
    # dk/dv pad-region gradients are produced by queries r < hw (left) and
    # r >= S-hw (right) reading out-of-range keys; recompute their
    # contribution densely (2·hw rows — negligible).
    if hw > 0:
        dk, dv = _edge_fold(q, k, v, g, dk, dv, window_size)
    return dq, dk, dv


def _edge_fold(q, k, v, g, dk, dv, window_size):
    """Add the gradient mass that clamped (out-of-range) band positions of
    the first/last hw queries send to rows 0 and S-1."""
    bh, s, d = q.shape
    hw = window_size // 2
    scale = d**-0.5

    def side(rows, clamp_row):
        qe = q[:, rows].astype(jnp.float32)  # [bh, e, d]
        ge = g[:, rows].astype(jnp.float32)
        # Each edge query r attends clamped keys idx = clip(r-hw..r+hw).
        offs = jnp.arange(-hw, hw + 1)
        idx = jnp.clip(rows[:, None] + offs[None, :], 0, s - 1)  # [e, W]
        ke = k[:, idx].astype(jnp.float32)  # [bh, e, W, d]
        ve = v[:, idx].astype(jnp.float32)
        lg = jnp.einsum("bed,bewd->bew", qe, ke) * scale
        p = jax.nn.softmax(lg, axis=-1)
        dp = jnp.einsum("bed,bewd->bew", ge, ve)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dk_e = jnp.einsum("bew,bed->bewd", ds * scale, qe)
        dv_e = jnp.einsum("bew,bed->bewd", p, ge)
        # Only the *clamped* positions were mis-attributed by the tiled
        # kernel (in-range positions are already correct): scatter-add the
        # clamped-position grads to the clamp row and subtract nothing —
        # the kernel's mask made out-of-range columns read replicated pad
        # rows, whose grads were folded into... they were DROPPED (pad
        # region sliced off), so adding the clamped-position grads here is
        # exactly the missing mass.
        clamped = (rows[:, None] + offs[None, :]) != idx  # [e, W]
        wsum_k = jnp.einsum("bewd,ew->bd", dk_e, clamped.astype(jnp.float32))
        wsum_v = jnp.einsum("bewd,ew->bd", dv_e, clamped.astype(jnp.float32))
        return wsum_k, wsum_v, clamp_row

    upd_k, upd_v = jnp.zeros_like(dk[:, 0]), jnp.zeros_like(dv[:, 0])
    left = jnp.arange(0, hw)
    right = jnp.arange(s - hw, s)
    lk, lv, _ = side(left, 0)
    rk, rv, _ = side(right, s - 1)
    dk = dk.at[:, 0].add(lk.astype(dk.dtype))
    dv = dv.at[:, 0].add(lv.astype(dv.dtype))
    dk = dk.at[:, s - 1].add(rk.astype(dk.dtype))
    dv = dv.at[:, s - 1].add(rv.astype(dv.dtype))
    return dk, dv


_banded_v4.defvjp(_fwd_rule, _bwd_rule)


def banded_attention_v4(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, window_size: int,
    block: int = DEFAULT_BLOCK,
) -> jnp.ndarray:
    """Clamp-banded attention on ``[B, h, S, d]`` via the tile-band kernel.

    Numerics: identical to ``_shift_banded_attention`` (clamped windows) on
    interior rows; the caller replaces the 2·(W//2) edge rows with the
    reference's exact duplicated-key windows.
    """
    b, h, s, d = q.shape
    bh = b * h
    block = min(block, -(-s // 8) * 8)
    out = _banded_v4(
        q.reshape(bh, s, d), k.reshape(bh, s, d), v.reshape(bh, s, d),
        window_size, block,
    )
    return out.reshape(b, h, s, d)


# ---------------------------------------------------------------------------
# v4b: same tile-band math, but the K/V windows are materialized by XLA
# (reshape/roll — no manual DMA, so no 128-lane padding) and each grid step
# processes GROUP (b·h) pairs: the v4 manual-DMA variant ran 19968 tiny grid
# steps and was per-step-latency-bound (77 ms vs 23.5 for XLA's shift path);
# grouping divides the step count by GROUP and BlockSpec pipelining overlaps
# the copies with compute.
# ---------------------------------------------------------------------------

GROUP = 8


def _window_tiles(x, t, halo, sp):
    """[BH, S, d] → [BH, n_t, t + 2·halo, d] overlapping key windows, built
    from two shifted reshapes (pure data movement, no gathers). Window i
    covers rows [i·t, i·t + t + 2·halo) of the edge-padded sequence (pad
    halo front / sp - S + halo back)."""
    bh, s, d = x.shape
    n_t = sp // t
    # Length sp + 2·halo + t so the shifted view below stays in range.
    xp = _pad_seq(x, halo, sp - s + halo + t)

    def tiles(off):
        return xp[:, off:off + n_t * t].reshape(bh, n_t, t, d)

    main = tiles(0)  # rows [i·t, i·t + t)
    head = tiles(t)[:, :, : 2 * halo]  # rows [i·t + t, i·t + t + 2·halo)
    return jnp.concatenate([main, head], axis=2)


def _fwd_kernel_b(q_ref, ke_ref, ve_ref, o_ref, *, halo, hw, scale):
    g, t, d = q_ref.shape[0], q_ref.shape[2], q_ref.shape[3]
    ext = ke_ref.shape[2]
    mask = _band_mask(t, ext, halo, hw)
    for i in range(g):
        logits = jax.lax.dot_general(
            q_ref[i, 0], ke_ref[i, 0],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = jnp.where(mask, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[i, 0] = jax.lax.dot_general(
            p, ve_ref[i, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window_size", "block"))
def banded_attention_v4b(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, window_size: int,
    block: int = DEFAULT_BLOCK,
) -> jnp.ndarray:
    """Forward-only tile-band kernel, grouped + BlockSpec-pipelined."""
    b, h, s, d = q.shape
    bh = b * h
    hw = window_size // 2
    halo = _halo(block, hw)
    # _window_tiles slices 2*halo halo rows out of each t-row tile, so the
    # effective tile must satisfy t >= 2*halo or pallas_call hits a
    # trace-time shape mismatch (short-S inputs with the default halo).
    t = max(2 * halo, min(block, -(-s // 8) * 8))
    sp = -(-s // t) * t
    n_t = sp // t
    ext = t + 2 * halo
    g = GROUP if bh % GROUP == 0 else 1

    qf = q.reshape(bh, s, d)
    ke = _window_tiles(k.reshape(bh, s, d), t, halo, sp)  # [BH, n_t, ext, d]
    ve = _window_tiles(v.reshape(bh, s, d), t, halo, sp)
    qp = _pad_seq(qf, 0, sp - s).reshape(bh, n_t, t, d)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel_b, halo=halo, hw=hw, scale=d**-0.5),
        out_shape=jax.ShapeDtypeStruct((bh, n_t, t, d), q.dtype),
        grid=(bh // g, n_t),
        in_specs=[
            pl.BlockSpec((g, 1, t, d), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((g, 1, ext, d), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((g, 1, ext, d), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, 1, t, d), lambda b, i: (b, i, 0, 0)),
    )(qp, ke, ve)
    return out.reshape(bh, sp, d)[:, :s].reshape(b, h, s, d)
