"""Banded MHLA kernel v5: lane-roll compact band (S-minor layout).

The closed v1-v4b investigation (ops/mhla_kernel_v4.py, BASELINE.md "MHLA
band roofline") established that on this Mosaic toolchain every banded
formulation loses to XLA's shift path for one of three reasons: ±o row
shifts of K/V are inexpressible in VMEM (**sublane** shifts lower to full
relayout passes — v1/v2), DMA slices must be 8-row aligned (v3), or the
dense-tile softmax runs on ~41× the band's elements (v4/v4b). All four
generations kept S on the *sublane* axis.

v5 keeps S on the **lane** axis (the S-minor ``[.., d, S]`` layout that
already won the band's XLA formulation its [B,h,W,S] softmax, BASELINE.md
"attack #2") and expresses the ±o shifts as ``pltpu.roll`` along lanes —
a cross-lane permute the VPU supports natively — followed by an *aligned*
slice. Concretely, for each query tile of T lanes the kernel holds the
halo-extended K/V rows ``[d, T+128]`` in VMEM (one aligned slice of the
whole padded row, which the BlockSpec pipeline fetched once per (b·h)),
and offset ``o``'s shifted keys are ``roll(k_tile, T+128-o)[:, :T]`` —
no gather, no sublane shuffle, no extra HBM reads. Per step the VPU does
W multiply-reduces over d=64 sublanes for the logits, an 8-row softmax,
and W broadcast-multiply-accumulates for the output: exactly the band's
O(S·W·d) elements and **one** HBM round-trip of q/k/v/out, vs the XLA
shift path's 7× K and V reads (2.5 GB vs 8.6 GB at the reference-default
geometry — BASELINE.md measures the shift path at 23.5 ms fwd against a
4.1 ms roofline).

Semantics are exactly ``ops.window._shift_banded_attention`` — the
reference's circular edge rule with duplicated-key softmax multiplicity
(models/mhla.py:72-79 — left-edge windows pad with key S-1, right-edge
with key 0) via the same halo layout (``k_ext[j] = key(j - W//2)``), and
optional train-mode attention-weight dropout (one Bernoulli per window
slot, reference models/mhla.py:146-147) drawn by the in-kernel TPU PRNG —
the mask is recomputed from the same per-(b·h, mask-block) seed in the
backward kernel, so the backward's residuals are just q, the
halo-extended K/V (saved instead of rebuilt — round 4), and the
pre-dropout band weights (f32 [bh, 8, s_pad], ~0.1 ms of HBM at the
bench geometry — saves recomputing the W logit reduces + softmax). RNG
stream parity with the XLA path is explicitly not promised (SURVEY §7)
— rate and independence semantics are identical.

Layout contract: q/k/v arrive ``[B, h, d, S]`` (S-minor, the layout the
qkv einsum can emit directly — ``bsD,Dhd->bhds``); output matches. The
``[B, h, S, d]`` adapter lives in ops/window.py's dispatch
(``FAVIT_MHLA_IMPL=roll``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Query-tile width in lanes. 640 divides the padded reference-default
# sequence exactly (3137 → 3200 = 5×640) and keeps the per-step VMEM
# footprint (k/v rows + q/out tiles) around 1 MB. Env-overridable for
# tile sweeps (must be a multiple of 128 — in-kernel lane slices are
# 128-aligned).
DEFAULT_TILE = int(os.environ.get("FAVIT_ROLL_TILE", "640"))
if DEFAULT_TILE <= 0 or DEFAULT_TILE % 128:
    raise ValueError(
        f"FAVIT_ROLL_TILE must be a positive multiple of 128 "
        f"(got {DEFAULT_TILE})"
    )
_HALO = 128  # lane-aligned halo: covers any o < 128 ≥ W-1

# Forward tile-widening budget: the d=64 / s_pad=6400 single-tile working
# set the round-4 sweep validated on chip (≈ 8.5 MB — comfortably inside
# the 16 MB scoped-VMEM limit with Mosaic's own overheads).
_WIDEN_VMEM_BYTES = (2 * 64 * (6400 + _HALO) + 3 * 64 * 6400 + 8 * 6400) * 4


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _keep_mask(shape, rate: float, seed, b, i):
    """Per-(b·h, tile) keep mask, identical between fwd and bwd.

    On TPU: the in-kernel hardware PRNG (pltpu), seeded with
    (seed, b, i). In interpret mode (CPU tests) pltpu's PRNG has no
    lowering, so an equivalent threefry draw keyed the same way stands
    in — streams differ across backends, which is fine (RNG stream
    parity is explicitly not promised, SURVEY §7; determinism-given-seed
    holds on each backend).
    """
    if _interpret():
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(seed), b), i
        )
        return jax.random.uniform(key, shape) >= rate
    # This Mosaic's prng_seed accepts at most TWO scalars ("Setting seed
    # with more than 2 values is not supported" — compile error measured
    # on the chip, round 4; the 3-value form silently only worked in
    # interpret mode where the threefry stand-in runs instead). Fold
    # (b, i) into one scalar: distinct per (row, mask-block) for
    # b < 2^15 rows and i < 2^16 blocks — far above any real geometry
    # (bench: b·h = 384, 5 blocks).
    pltpu.prng_seed(seed, b * 65536 + i)
    bits = pltpu.prng_random_bits(shape)  # int32-typed uniform bits
    # uint32 uniform threshold: keep iff U32 >= rate * 2^32. Compare in
    # uint32 so the sign bit doesn't split the range.
    thr = np.uint32(min(int(rate * 2**32), 2**32 - 1))
    return bits.astype(jnp.uint32) >= thr


def _keep_mask_tiled(w: int, t: int, mask_block: int, rate: float,
                     seed, b, i):
    """Keep mask for execution-tile lanes [i·t, i·t+t), drawn in
    ``mask_block``-lane units so the mask stream is EXECUTION-TILING-
    INDEPENDENT: the j-th block of a row always gets the (seed, b, j)
    draw whether the kernel runs one whole-row tile or many narrow ones.
    This is what lets the forward widen its tile (round-4: 6.6 vs
    7.6 ms) while the backward re-derives identical masks at the
    VMEM-constrained narrow tiling. ``t`` must be a multiple of
    ``mask_block`` (both come from :func:`_tiling`)."""
    n = t // mask_block
    if n == 1:
        return _keep_mask((w, t), rate, seed, b, i)
    parts = [
        _keep_mask((w, mask_block), rate, seed, b, i * n + j)
        for j in range(n)
    ]
    return jnp.concatenate(parts, axis=1)


def _shifted(x, o: int, t: int):
    """Lanes [o, o+T) of ``x`` [d, T+_HALO] via roll + aligned slice."""
    ext = x.shape[-1]
    return (pltpu.roll(x, shift=ext - o, axis=1) if o else x)[:, :t]


def _band_weights(q, k_sh, scale: float):
    """Band softmax weights [w, T] (f32) for one query tile.

    ``q`` [d, T] f32; ``k_sh`` the W shifted key views [d, T] (f32).
    Products in f32 on the VPU (64-sublane reduce), softmax over the W
    offsets. Fwd and bwd kernels MUST share this single definition: the
    bwd recomputes the dropout mask and pre-dropout weights from the same
    seed, so any divergence silently breaks grad/mask consistency.
    """
    logits = jnp.concatenate(
        [
            jnp.sum(q * ko, axis=0, keepdims=True) * scale
            for ko in k_sh
        ],
        axis=0,
    )
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=0, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, w_ref=None, *,
                w: int, t: int, scale: float, rate: float,
                mask_block: int = 0):
    """``w_ref`` (band-weights residual out) is present only on the
    custom-VJP forward; the primal/eval kernel omits it — the write is
    inside pallas so XLA cannot DCE it, and eval shouldn't pay it."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    d = q_ref.shape[1]

    q = q_ref[0].astype(jnp.float32)
    # Upcast BEFORE the rolls: this Mosaic lowers pltpu.roll to
    # tpu.dynamic_rotate, which is implemented for 32-bit element types
    # only ("Rotate with non-32-bit data" on bf16 — measured on the axon
    # toolchain, round 3). bf16→f32 widening is exact, so the band's
    # numerics are bit-identical to rolling bf16 then upcasting.
    # K and V roll TOGETHER as one [2d, ext] vector: offset o's key and
    # value views need the same lane shift, so one rotate serves both —
    # half the rotate ops of per-operand rolls.
    ks = k_ref[0, :, pl.ds(i * t, t + _HALO)].astype(jnp.float32)
    vs = v_ref[0, :, pl.ds(i * t, t + _HALO)].astype(jnp.float32)
    kv = jnp.concatenate([ks, vs], axis=0)  # [2d, ext]

    kv_sh = [_shifted(kv, o, t) for o in range(w)]
    wts = _band_weights(q, [x[:d] for x in kv_sh], scale)
    if w_ref is not None:
        # Residual for the backward: PRE-dropout weights (bwd re-derives
        # the mask from the seed). Rows padded to the 8-sublane tile and
        # stored as one full block (sub-tile sublane stores hit Mosaic's
        # 8-row alignment rule).
        w_ref[0] = jnp.pad(wts, ((0, w_ref.shape[1] - w), (0, 0)))
    if rate > 0.0:
        keep = _keep_mask_tiled(w, t, mask_block, rate, seed_ref[0], b, i)
        wts = jnp.where(keep, wts / (1.0 - rate), 0.0)

    acc = jnp.zeros((d, t), jnp.float32)
    for o in range(w):
        acc = acc + wts[o : o + 1] * kv_sh[o][d:]
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, w_ref,
                dq_ref, dk_ref, dv_ref, acc_ref, *,
                w: int, t: int, s: int, scale: float, rate: float,
                mask_block: int = 0):
    """Per query-tile: reload the fwd's saved band weights (re-deriving
    only the dropout mask from the seed), emit dq [d,T] and accumulate
    this tile's stacked dk/dv contribution [2d,T+_HALO] into the
    PERSISTENT f32 VMEM scratch ``acc_ref`` [2d, s_pad+_HALO] (scratch
    persists across the sequential grid, so the row's tiles overlap-add
    in place — 1.7 MB resident at the bench geometry). On the row's LAST
    tile the halo fold (ops-level ``_fold_ext``: core shift by W//2,
    edge-duplicate lanes accumulated into rows S-1 / 0) runs IN-KERNEL
    and dk/dv are written once in the PRIMAL dtype — round-5: deletes
    both the [bh, 2d, s_pad+_HALO] f32 HBM round-trip (654 MB/layer at
    the bench geometry) and the XLA fold pass that re-read it (the
    round-4 design wrote the f32 accumulator to HBM and folded in XLA;
    the round-3 one emitted per-tile contributions, 755 MB + overlap-add
    — BASELINE.md attacks #8 and round-5).
    K‖V views and dk‖dv scatters each roll as ONE [2d, ·] rotate per
    offset (rotates dominated the first-cut bwd's 22.6 ms:
    24 per tile → 12 here)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    d = q_ref.shape[1]
    ext = t + _HALO

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    # f32 before the rolls — see _fwd_kernel (Mosaic rotate is 32-bit-only).
    ks = k_ref[0, :, pl.ds(i * t, ext)].astype(jnp.float32)
    vs = v_ref[0, :, pl.ds(i * t, ext)].astype(jnp.float32)
    kv = jnp.concatenate([ks, vs], axis=0)  # [2d, ext]
    kv_sh = [_shifted(kv, o, t) for o in range(w)]

    wts = w_ref[0][:w]  # pre-dropout [w, T], saved by the fwd (full-block
    # load, row slice in registers — sub-tile sublane loads are unaligned)

    # dL/d(dropped weights) and the dropped weights themselves.
    u = jnp.concatenate(
        [jnp.sum(g * kv_sh[o][d:], axis=0, keepdims=True) for o in range(w)],
        axis=0,
    )
    if rate > 0.0:
        keep = _keep_mask_tiled(w, t, mask_block, rate, seed_ref[0], b, i)
        inv = 1.0 / (1.0 - rate)
        wd = jnp.where(keep, wts * inv, 0.0)   # dropped weights (fwd's)
        dwts = jnp.where(keep, u * inv, 0.0)   # dL/d(pre-dropout weights)
    else:
        wd = wts
        dwts = u
    dot = jnp.sum(wts * dwts, axis=0, keepdims=True)
    dlog = wts * (dwts - dot)  # softmax backward [w, T]

    dq = jnp.zeros((d, t), jnp.float32)
    dkv_tile = jnp.zeros((2 * d, ext), jnp.float32)
    qs = q * scale
    for o in range(w):
        dq = dq + dlog[o : o + 1] * kv_sh[o][:d] * scale
        ckv = jnp.pad(
            jnp.concatenate(
                [dlog[o : o + 1] * qs, wd[o : o + 1] * g], axis=0
            ),
            ((0, 0), (0, _HALO)),
        )
        # Contribution lands on k_ext lanes [iT+o, iT+o+T): place at
        # tile-local lanes [o, o+T) by rolling right o lanes.
        dkv_tile = dkv_tile + (pltpu.roll(ckv, shift=o, axis=1) if o else ckv)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    # Accumulate into the persistent scratch at this tile's lane window
    # (i·T is a lane-tile multiple — aligned slice).
    win = acc_ref[:, pl.ds(i * t, ext)]
    acc_ref[:, pl.ds(i * t, ext)] = win + dkv_tile

    @pl.when(i == pl.num_programs(1) - 1)
    def _fold_and_emit():
        # In-kernel halo fold (the transpose of _extend — see _fold_ext):
        # core[:, j] = acc[:, j + hw]; the hw left-edge duplicate lanes
        # accumulate into row S-1, the (w-1-hw) right-edge ones into
        # row 0. All rolls/selects on f32 (Mosaic rotate is 32-bit-only).
        acc = acc_ref[...]
        hw = w // 2
        s_pad = dk_ref.shape[2]
        if hw:
            core = pltpu.roll(
                acc, shift=acc.shape[1] - hw, axis=1
            )[:, :s_pad]
            lanes = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
            left = jnp.sum(
                jnp.where(lanes < hw, acc, 0.0), axis=1, keepdims=True
            )
            core_lanes = jax.lax.broadcasted_iota(jnp.int32, core.shape, 1)
            core = jnp.where(core_lanes == s - 1, core + left, core)
        else:
            core = acc[:, :s_pad]
        if w - 1 - hw:
            lanes = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
            right = jnp.sum(
                jnp.where((lanes >= hw + s) & (lanes < s + w - 1), acc, 0.0),
                axis=1, keepdims=True,
            )
            core_lanes = jax.lax.broadcasted_iota(jnp.int32, core.shape, 1)
            core = jnp.where(core_lanes == 0, core + right, core)
        dk_ref[0] = core[:d].astype(dk_ref.dtype)
        dv_ref[0] = core[d:].astype(dv_ref.dtype)


def _extend(x, s: int, w: int, s_pad: int):
    """Halo-extend the lane axis: ``x_ext[j] = row(j - W//2)`` with the
    reference edge rule (hw copies of row S-1 left, row 0 right —
    ops/window._halo_pad), zero-padded to s_pad + _HALO lanes."""
    hw = w // 2
    parts = (
        [x[:, :, s - 1 : s]] * hw + [x] + [x[:, :, 0:1]] * (w - 1 - hw)
    )
    ext = jnp.concatenate(parts, -1) if len(parts) > 1 else x
    return jnp.pad(ext, ((0, 0), (0, 0), (0, s_pad + _HALO - ext.shape[-1])))


def _tiling(s: int, w: int):
    t = DEFAULT_TILE
    if s + w - 1 <= t:
        # Single tile: round the padded width up to a lane multiple.
        t = max(128, -(-(s + w - 1) // 128) * 128)
    n_tiles = -(-s // t)
    return t, n_tiles, t * n_tiles


def _fold_ext(d_ext, s: int, w: int):
    """Fold an x_ext cotangent back to [d, S] (edge copies accumulate
    into rows S-1 / 0 — the halo-pad transpose). Reference semantics for
    the backward kernel's in-kernel fold (``_bwd_kernel._fold_and_emit``,
    which performs exactly this on the f32 scratch accumulator before the
    single primal-dtype write); kept as the executable spec."""
    hw = w // 2
    core = d_ext[:, hw : hw + s]
    if hw:
        core = core.at[:, s - 1].add(jnp.sum(d_ext[:, :hw], axis=1))
    if w - 1 - hw:
        core = core.at[:, 0].add(
            jnp.sum(d_ext[:, hw + s : s + w - 1], axis=1)
        )
    return core


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _roll_band_core(q, k, v, seed, window_size: int, rate: float):
    """custom_vjp core; ``seed`` is a [1] int32 array (traced OK).

    The primal (eval / no-grad) path runs the lean kernel WITHOUT the
    band-weights residual output — only the VJP forward pays that write.
    """
    out, _ = _fwd_impl(q, k, v, seed, window_size, rate, save_wts=False)
    return out


def roll_banded_attention(q, k, v, window_size: int, dropout=(0.0, None)):
    """Lane-roll banded attention on S-minor ``[B, h, d, S]`` tensors.

    ``k``/``v`` already carry the latent projection. ``dropout`` is a
    ``(rate, seed)`` pair — seed may be None (deterministic), a Python
    int, or a traced int32 scalar (e.g. derived from a flax RNG); the
    rate must be static. Semantics match
    ops/window.windowed_latent_attention exactly at rate=0, and the
    reference's per-window-slot weight dropout (models/mhla.py:146-147)
    otherwise; the mask is recomputed in backward from the same seed.
    """
    rate, seed = dropout
    if seed is None:
        rate = 0.0
    if window_size - 1 > _HALO:
        # Each tile's K/V slice extends only _HALO lanes past the tile, so
        # offsets o > _HALO would wrap to wrong keys (silently, via the
        # circular roll) on multi-tile shapes.
        raise ValueError(
            f"roll band supports window_size <= {_HALO + 1} "
            f"(got {window_size}); use the shift path for wider windows"
        )
    seed_arr = jnp.reshape(
        jnp.asarray(0 if seed is None else seed, dtype=jnp.int32), (1,)
    )
    return _roll_band_core(q, k, v, seed_arr, window_size, float(rate))


def _pallas(fn, grid, in_specs, out_specs, out_shape, scratch_shapes=()):
    return pl.pallas_call(
        fn,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=list(scratch_shapes),
        interpret=_interpret(),
    )


def _fwd_impl(q, k, v, seed_arr, window_size, rate, save_wts: bool,
              return_ext: bool = False):
    b, h, d, s = q.shape
    w = window_size
    bh = b * h
    t, n_tiles, s_pad = _tiling(s, w)
    # Forward-only tile widening: one whole-row tile measured 6.6-6.9 vs
    # 7.6 ms at the bench geometry (round-4 sweep — fewer grid steps,
    # same VPU work; the BACKWARD at one tile blows the 16 MB scoped-VMEM
    # limit on its [2d, ext] accumulator, so _roll_bwd keeps _tiling's).
    # Constraints: s_pad is unchanged (t·n is the same product) and the
    # single-tile VMEM working set — estimated as
    # (2d·(s_pad+_HALO) + 3·d·s_pad + 8·s_pad)·4 B — must fit. The gate
    # is the byte estimate itself (not a fixed s_pad: at d ≥ ~128 a
    # 6400-lane tile would exceed the 16 MB scoped-VMEM limit), capped at
    # the d=64 / s_pad=6400 envelope the round-4 sweep validated on chip
    # (≈ 8.5 MB). Dropout masks stay consistent with the backward's
    # narrow tiling because they are drawn in _tiling-sized blocks
    # regardless of execution tile (:func:`_keep_mask_tiled`, pinned by
    # test_roll_band_dropout_semantics' FD checks).
    mask_block = t
    widen_bytes = (2 * d * (s_pad + _HALO) + 3 * d * s_pad + 8 * s_pad) * 4
    if n_tiles > 1 and widen_bytes <= _WIDEN_VMEM_BYTES:
        t, n_tiles = s_pad, 1
    if rate > 0.0 and (bh >= 2**15 or s_pad // mask_block >= 2**16):
        # The in-kernel PRNG folds (row, mask-block) into ONE seed scalar
        # (b·2¹⁶ + i — this Mosaic's prng_seed takes at most two values);
        # beyond these bounds the fold wraps int32 / aliases streams, so
        # fail loudly instead of silently reusing dropout masks.
        raise ValueError(
            f"roll-band dropout seed fold supports b*h < 2**15 rows and "
            f"< 2**16 mask blocks per row (got bh={bh}, "
            f"blocks={s_pad // mask_block}); split the batch or use the "
            f"shift path"
        )

    qf = q.reshape(bh, d, s)
    k_ext = _extend(k.reshape(bh, d, s), s, w, s_pad)
    v_ext = _extend(v.reshape(bh, d, s), s, w, s_pad)
    q_p = jnp.pad(qf, ((0, 0), (0, 0), (0, s_pad - s)))

    wp = -(-w // 8) * 8  # saved-weights rows, padded to the sublane tile
    row_spec = pl.BlockSpec((1, d, s_pad + _HALO), lambda bb, i: (bb, 0, 0))
    tile_spec = pl.BlockSpec((1, d, t), lambda bb, i: (bb, 0, i))
    wts_spec = pl.BlockSpec((1, wp, t), lambda bb, i: (bb, 0, i))
    out_specs = [tile_spec]
    out_shape = [jax.ShapeDtypeStruct((bh, d, s_pad), q.dtype)]
    if save_wts:
        out_specs.append(wts_spec)
        # Pre-dropout band weights: the bwd kernel reloads these (39 MB
        # at the reference geometry — ~0.1 ms of HBM) instead of
        # recomputing the W logit reduces + softmax.
        out_shape.append(jax.ShapeDtypeStruct((bh, wp, s_pad), jnp.float32))
    res = _pallas(
        functools.partial(_fwd_kernel, w=w, t=t, scale=d**-0.5, rate=rate,
                          mask_block=mask_block),
        grid=(bh, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile_spec, row_spec, row_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(seed_arr, q_p, k_ext, v_ext)
    out, wts = res if save_wts else (res[0], None)
    out = out[:, :, :s].reshape(b, h, d, s)
    if return_ext:
        # Residual handoff to the backward: the halo-extended K/V are
        # saved INSTEAD of k/v, so the bwd skips rebuilding them — two
        # [bh, d, s_pad+_HALO] concat+pad passes (~650 MB/layer of HBM
        # at the bench geometry) deleted from every backward.
        return out, wts, k_ext, v_ext
    return out, wts


def _roll_fwd(q, k, v, seed_arr, window_size, rate):
    out, wts, k_ext, v_ext = _fwd_impl(
        q, k, v, seed_arr, window_size, rate, save_wts=True,
        return_ext=True,
    )
    return out, (q, k_ext, v_ext, seed_arr, wts)


def _roll_bwd(window_size, rate, res, g):
    q, k_ext, v_ext, seed_arr, wts = res
    b, h, d, s = q.shape
    # _extend preserves dtype, so the primal k/v dtypes are recoverable
    # from the saved extended buffers.
    q_dtype, k_dtype, v_dtype = q.dtype, k_ext.dtype, v_ext.dtype
    w = window_size
    bh = b * h
    t, n_tiles, s_pad = _tiling(s, w)
    wp = wts.shape[1]

    q_p = jnp.pad(q.reshape(bh, d, s), ((0, 0), (0, 0), (0, s_pad - s)))
    g_p = jnp.pad(
        g.reshape(bh, d, s).astype(q.dtype),
        ((0, 0), (0, 0), (0, s_pad - s)),
    )

    row_spec = pl.BlockSpec((1, d, s_pad + _HALO), lambda bb, i: (bb, 0, 0))
    tile_spec = pl.BlockSpec((1, d, t), lambda bb, i: (bb, 0, i))
    wts_spec = pl.BlockSpec((1, wp, t), lambda bb, i: (bb, 0, i))
    # dk/dv: ONE persistent [d, s_pad] primal-dtype block each per bh row
    # (index map ignores the tile axis) — written ONCE on the row's last
    # tile, after the in-kernel fold of the f32 scratch accumulator. At
    # the bench geometry this is 2×154 MB bf16 per layer, vs the round-4
    # design's 654 MB f32 dkv write + XLA fold re-read (band fwd+bwd
    # 17.1 → 12.8 ms at BH=384 — BASELINE.md round-5).
    dkv_spec = pl.BlockSpec((1, d, s_pad), lambda bb, i: (bb, 0, 0))
    dq, dk, dv = _pallas(
        functools.partial(_bwd_kernel, w=w, t=t, s=s, scale=d**-0.5,
                          rate=rate, mask_block=t),
        grid=(bh, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile_spec, row_spec, row_spec, tile_spec, wts_spec,
        ],
        out_specs=[tile_spec, dkv_spec, dkv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, s_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, d, s_pad), k_dtype),
            jax.ShapeDtypeStruct((bh, d, s_pad), v_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * d, s_pad + _HALO), jnp.float32)
        ],
    )(seed_arr, q_p, k_ext, v_ext, g_p, wts)

    dk = dk[:, :, :s].reshape(b, h, d, s)
    dv = dv[:, :, :s].reshape(b, h, d, s)
    dq = dq[:, :, :s].reshape(b, h, d, s).astype(q_dtype)
    # seed is integer-typed: its cotangent is float0.
    dseed = np.zeros((1,), dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


_roll_band_core.defvjp(_roll_fwd, _roll_bwd)


def roll_banded_attention_bhsd(q, k, v, window_size: int,
                               dropout=(0.0, None)):
    """Adapter from the ``[B, h, S, d]`` convention of
    ops/window.windowed_latent_attention (transposes included — the
    production S=3137 path should feed the S-minor layout directly)."""
    out = roll_banded_attention(
        q.transpose(0, 1, 3, 2),
        k.transpose(0, 1, 3, 2),
        v.transpose(0, 1, 3, 2),
        window_size,
        dropout,
    )
    return out.transpose(0, 1, 3, 2)
