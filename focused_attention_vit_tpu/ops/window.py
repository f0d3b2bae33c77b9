"""MHLA windowed local attention (gather-based reference formulation).

Multi-Head Latent Attention (reference: models/mhla.py:17-161) attends each
query to a fixed-size window of W keys centred on it, with a shared learned
"latent" projection applied to K and V before the windowed attention.

The reference builds the ``[S, W]`` window-index table with a Python loop on
the host *every forward call* (reference: models/mhla.py:46-83). Here the
table is a closed-form numpy constant computed once at trace time — S and W
are static under jit, so XLA folds it into the program. The edge rule is
reproduced exactly for odd W:

* interior query i:            window = [i-hw, ..., i+hw]          (hw = W//2)
* left edge  (i < hw):         window = [0..i+hw] padded AT THE END with the
                               *last* sequence index S-1 (reference:
                               models/mhla.py:74-76)
* right edge (i+hw >= S):      window = [i-hw..S-1] padded AT THE BEGINNING
                               with index 0 (reference: models/mhla.py:77-79)

Note the duplicated indices at the edges participate in the softmax with
their multiplicity — this is part of the defined numerics, not a mask.

For even W the reference loop produces ragged windows and crashes in
``torch.stack`` (interior windows get W+1 entries); this rebuild defines the
even case as the asymmetric window [i-hw, i+hw-1] with the same edge-padding
rules, which degrades gracefully and agrees with the odd case construction.

TPU notes: this module provides the correctness-first gather formulation
(``jnp.take`` along the key axis). Long-sequence production: on a real
TPU backend the MHLA module dispatches to the Pallas lane-roll kernel
(:mod:`focused_attention_vit_tpu.ops.mhla_band_roll` — fwd AND training
since round 4, BASELINE.md "attack #8"); the XLA shift-banded
formulation below is the portable path (CPU/other backends, sequence
parallelism, masked attention) and the oracle the kernel is pinned
against. The archival tile-band Pallas kernel
(:mod:`focused_attention_vit_tpu.ops.mhla_kernel_v4`) is the record of
the closed v1-v4b investigation, opt-in (measured slower on v5e —
BASELINE.md roofline).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

# Trace-time switch set by models running under remat_policy='band_weights'
# (models/vit_mhla.py): the short-S dense band then skips its inner
# flash-style jax.checkpoint so the tagged softmax weights stay visible to
# the OUTER nn.remat's save_only_these_names policy (an inner checkpoint
# would hide the tag and silently recompute the weights, making the knob a
# no-op on this path). Trace-time only — the resulting program is cached
# per model config, and remat_policy is part of the model.
_SAVE_BAND_WEIGHTS = contextvars.ContextVar(
    "favit_save_band_weights", default=False
)


@contextlib.contextmanager
def saving_band_weights(enabled: bool):
    """Mark the dynamic extent of a model trace whose remat policy saves
    the ``mhla_band_weights``-tagged tensors (see ``_SAVE_BAND_WEIGHTS``)."""
    tok = _SAVE_BAND_WEIGHTS.set(bool(enabled))
    try:
        yield
    finally:
        _SAVE_BAND_WEIGHTS.reset(tok)


@functools.lru_cache(maxsize=64)
def window_index_table(seq_len: int, window_size: int) -> np.ndarray:
    """Closed-form ``[S, W]`` int32 window-index table.

    Matches the reference host-loop construction for odd ``window_size``
    (reference: models/mhla.py:46-83), extended to even sizes as documented
    in the module docstring.
    """
    s, w = seq_len, window_size
    hw = w // 2
    # Window end offset: for odd W the reference window is [i-hw, i+hw]
    # (end = i + hw + 1); for even W we define [i-hw, i+hw-1].
    up = hw if w % 2 else hw - 1
    i = np.arange(s, dtype=np.int64)[:, None]  # [S, 1]
    j = np.arange(w, dtype=np.int64)[None, :]  # [1, W]

    interior = i - hw + j
    # Left edge (window_start would be < 0): real entries are indices
    # [0 .. min(i+up, S-1)] placed first, then padded with S-1 at the end.
    left = np.where(j <= np.minimum(i + up, s - 1), j, s - 1)
    # Right edge (window_end would exceed S): pad count p = i+up+1-S zeros at
    # the beginning, then [i-hw .. S-1]. The real entry at slot j is
    # i - hw + (j - p) ... wait, entries are contiguous: value = i-hw+j-p.
    p = i + up + 1 - s
    right = np.where(j >= p, i - hw + j - p, 0)

    # Left branch applies whenever window_start would clamp to 0 (i <= hw):
    # the reference checks `window_start == 0` and pads at the end
    # (models/mhla.py:74-76), which takes precedence over the right-edge
    # rule when S < W.
    table = np.where(i <= hw, left, np.where(i + up >= s, right, interior))
    return np.asarray(np.clip(table, 0, s - 1), dtype=np.int32)


def _gather_windowed_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    attention_mask: jnp.ndarray | None = None,
    weights_transform=None,
) -> jnp.ndarray:
    """Direct table-gather formulation (correctness reference).

    Materializes the ``[B, h, S, W, d]`` window tensor — memory-heavy, like
    the reference's torch.gather path (models/mhla.py:117-126). Used for
    tiny sequences, masked attention, and as the oracle the fast paths are
    tested against. ``weights_transform`` (optional) is applied to the
    ``[B, h, S, W]`` softmax weights — the train-mode attention-weight
    dropout hook (reference models/mhla.py:146-147), threaded here so the
    training path shares this single definition of the semantics.
    """
    b, h, s, d = q.shape
    table = jnp.asarray(window_index_table(s, window_size))  # [S, W]

    k_win = jnp.take(k, table, axis=2)
    v_win = jnp.take(v, table, axis=2)

    logits = jnp.einsum(
        "bhsd,bhswd->bhsw", q, k_win, preferred_element_type=jnp.float32
    ) * (d**-0.5)

    if attention_mask is not None:
        # [B, S, S] -> gather window entries -> [B, 1, S, W]
        mask_win = jnp.take_along_axis(
            attention_mask, table[None, :, :], axis=2
        )[:, None]
        logits = jnp.where(mask_win == 0, jnp.finfo(logits.dtype).min, logits)

    # Same remat-policy tag on every band formulation's softmax weights
    # (see _shift_banded_attention) so remat_policy='band_weights' applies
    # regardless of which path the dispatch picks.
    weights = checkpoint_name(jax.nn.softmax(logits, axis=-1),
                              "mhla_band_weights")
    if weights_transform is not None:
        weights = weights_transform(weights)
    return jnp.einsum(
        "bhsw,bhswd->bhsd", weights.astype(v.dtype), v_win
    )


@functools.lru_cache(maxsize=32)
def _band_log_multiplicity(seq_len: int, window_size: int) -> np.ndarray:
    """Static ``[S, S]`` additive logit bias encoding the window rule.

    A softmax over the W window slots in which key ``j`` appears with
    multiplicity ``m_ij`` (the duplicated edge keys, models/mhla.py:72-79)
    equals a dense softmax over keys with ``log(m_ij)`` added to the
    logit — both the normalizer and the weighted value sum pick up the
    factor ``m_ij·e^{l_j}``. Keys outside the window get ``-inf``. This
    turns the *exact* reference window semantics (edges included) into two
    dense MXU matmuls plus one static bias add.
    """
    table = window_index_table(seq_len, window_size)  # [S, W]
    counts = np.zeros((seq_len, seq_len), np.float32)
    rows = np.repeat(np.arange(seq_len), window_size)
    np.add.at(counts, (rows, table.reshape(-1)), 1.0)
    with np.errstate(divide="ignore"):
        bias = np.log(counts, where=counts > 0)
    bias[counts == 0] = -np.inf
    return bias.astype(np.float32)


# Below this sequence length the dense band-masked formulation wins on TPU:
# its S×S logits are a single MXU matmul (vs 7 shifted VPU passes reading
# K/V W times) and its working set matches dense attention's, so the
# microbatch gradient-accumulation lever applies (BASELINE.md "working-set
# effect"). Above it, S² cost overtakes the O(S·W) shift path.
DENSE_BAND_MAX_SEQ = 512


def _dense_band_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, window_size: int,
    weights_transform=None,
) -> jnp.ndarray:
    """Windowed attention as dense masked attention (short S).

    Matches the gather oracle bit-for-bit in semantics — including the
    duplicated-edge-key softmax multiplicity — via the log-multiplicity
    bias; no separate edge-row fix-up needed. ``weights_transform``
    (optional) applies to the ``[B, h, S, S]`` masked weights: train-mode
    dropout draws ONE Bernoulli per merged duplicated-edge key instead of
    one per slot — same mean, negligibly different variance (the
    dense-band working set is what restores the microbatch lever,
    BASELINE.md round 3).
    """
    b, h, s, d = q.shape
    bias = jnp.asarray(_band_log_multiplicity(s, window_size))

    # Flash-style selective remat (see ops/attention.multi_head_attention):
    # save only q/k/v under autodiff and recompute the [B,h,S,S]
    # logits/softmax (and the keyed dropout mask inside
    # ``weights_transform``, whose closed-over seed rides along as a
    # checkpoint residual) in the backward pass — identical numerics,
    # no S²-sized saved residuals. The bias is a closure constant.
    def _core(q, k, v):
        logits = jnp.einsum(
            "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
        ) * (d**-0.5) + bias
        # remat-policy tag (see _shift_banded_attention); here the saved
        # tensor is the full masked [B,h,S,S] — meaningful only at short S.
        weights = checkpoint_name(jax.nn.softmax(logits, axis=-1),
                                  "mhla_band_weights")
        if weights_transform is not None:
            weights = weights_transform(weights)
        return jnp.einsum("bhst,bhtd->bhsd", weights.astype(v.dtype), v)

    if _SAVE_BAND_WEIGHTS.get():
        # remat_policy='band_weights': leave the tag visible to the outer
        # nn.remat (an inner checkpoint would hide it and recompute).
        return _core(q, k, v)
    return jax.checkpoint(_core)(q, k, v)


def _halo_pad(x: jnp.ndarray, window_size: int, axis: int) -> jnp.ndarray:
    """Pad ``axis`` with the reference's edge halo: ``hw`` copies of row
    S-1 on the left and ``w-1-hw`` copies of row 0 on the right.

    With this halo, offset ``o`` of the shift band reads padded row
    ``i+o`` = row ``i-hw+o`` for interior indices, row S-1 wherever
    ``i-hw+o < 0`` and row 0 wherever ``i-hw+o > S-1`` — exactly the
    reference's window table (models/mhla.py:72-79), with duplicated edge
    keys naturally appearing once per duplicated slot so their softmax
    multiplicity is preserved. Backward of the concat is contiguous
    slices; backward of the broadcast halos is a tiny sum — never a
    full-K scatter (the post-hoc edge-row overwrite this replaces cost
    ~413 ms/step at S=3137 b32, BASELINE.md round-3 bisect).
    """
    w = window_size
    hw = w // 2
    s = x.shape[axis]
    last = jax.lax.slice_in_dim(x, s - 1, s, axis=axis)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    # Repeat via concat of the same slice (jnp.repeat lowers to a gather).
    parts = [last] * hw + [x] + [first] * (w - 1 - hw)
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


def _banded_mask(attention_mask: jnp.ndarray, seq_len: int,
                 window_size: int) -> jnp.ndarray:
    """Gather a dense ``[B, S, S]`` attention mask into the shift band's
    ``[B, W, S]`` layout: entry ``(o, i)`` is the mask bit for query ``i``
    against the key the band's offset ``o`` reads — halo-clamped exactly
    like :func:`_halo_pad` clamps K/V, so duplicated edge slots see the
    mask bit of the duplicated key (reference: models/mhla.py:136-143
    gathers the mask per window slot the same way).

    The gather here is fine where a K/V gather is not: masks carry no
    gradient, so there is no scatter in the backward pass, and the result
    is O(S·W) bytes — never the ``[B, h, S, W, d]`` window tensor.
    """
    s, w = seq_len, window_size
    mp = _halo_pad(attention_mask, w, axis=2)  # [B, S, S+W-1] along keys
    # Padded key column read by (query i, offset o) is i + o.
    col = (np.arange(s, dtype=np.int32)[:, None]
           + np.arange(w, dtype=np.int32)[None, :])  # [S, W]
    mask_win = jnp.take_along_axis(mp, jnp.asarray(col)[None], axis=2)
    return mask_win.transpose(0, 2, 1)  # [B, W, S]


def _shift_banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    weights_transform=None,
    attention_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Shift-based banded attention — no window tensor, no K/V gathers.

    For interior rows the window is a pure diagonal band: offset o reads
    key row i-hw+o, so scores come from W shifted elementwise
    multiply-reduces over halo-padded K (:func:`_halo_pad`), which makes
    the result exact everywhere including the reference's duplicated-key
    edge rule — no edge-row fixup needed.

    Layout note: logits/weights live as ``[B, h, W, S]`` (S on the minor
    axis). The natural ``[B, h, S, W]`` stack puts W=7 on the lane axis,
    which the TPU pads to 128 lanes — an ~18× inflation of every softmax
    byte that dominated the band's cost at S=3137 (BASELINE.md round 3).

    Args:
      weights_transform: optional callable applied to the ``[B, h, W, S]``
        softmax weights (e.g. attention-weight dropout,
        reference models/mhla.py:146-147 — one Bernoulli per window slot,
        duplicated edge slots drawn independently, exactly like the
        reference's ``[B, h, S, W]`` dropout).
      attention_mask: optional ``[B, S, S]`` mask; zero entries are set to
        the dtype minimum pre-softmax (reference: models/mhla.py:136-143),
        gathered into the band layout by :func:`_banded_mask` — this is
        the long-S masked path, O(S·W) where the gather formulation
        materializes O(S·W·d) K/V windows plus a scatter backward.
    """
    b, h, s, d = q.shape
    w = window_size

    kp = _halo_pad(k, w, axis=2)
    vp = _halo_pad(v, w, axis=2)

    # Products at the input dtype with f32 accumulation
    # (preferred_element_type) — in bf16 training this halves the band's
    # HBM bytes vs materialized f32 casts of Q and every K slice
    # (measured +0.7 img/s at S=3137 b32, BASELINE.md "attack #3");
    # in f32 eval it is bit-identical to the explicit-cast form.
    logits = jnp.stack(
        [
            jnp.einsum(
                "bhsd,bhsd->bhs",
                q,
                jax.lax.dynamic_slice_in_dim(kp, o, s, axis=2),
                preferred_element_type=jnp.float32,
            )
            for o in range(w)
        ],
        axis=2,
    ) * (d**-0.5)  # [B, h, W, S]

    if attention_mask is not None:
        mask_win = _banded_mask(attention_mask, s, w)[:, None]  # [B,1,W,S]
        logits = jnp.where(mask_win == 0, jnp.finfo(logits.dtype).min,
                           logits)

    weights = jax.nn.softmax(logits, axis=2)
    # Named for remat policies: under remat_policy='band_weights' the
    # model's nn.remat saves this tensor across fwd→bwd (f32 [B,h,W,S],
    # ~34 MB/layer at the S=3137 b32 geometry) so the backward pass skips
    # recomputing the W logit einsums + softmax — the band's non-matmul
    # in-context cost that the round-3 repro measured as the scheduling
    # wall. Identity when no policy names it.
    weights = checkpoint_name(weights, "mhla_band_weights")
    if weights_transform is not None:
        weights = weights_transform(weights)
    out = sum(
        # Static slice + free reshape [B,h,1,S]→[B,h,S,1] (integer
        # indexing would lower to a gather). Weighted V sum accumulates in
        # f32 (weights are f32; V upcast fuses into the multiply).
        jax.lax.slice_in_dim(weights, o, o + 1, axis=2).reshape(b, h, s, 1)
        * jax.lax.dynamic_slice_in_dim(vp, o, s, axis=2).astype(jnp.float32)
        for o in range(w)
    )
    return out.astype(q.dtype)


def _shift_banded_attention_ds(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    weights_transform=None,
) -> jnp.ndarray:
    """Shift-banded attention on S-minor ``[B, h, d, S]`` operands.

    The DS twin of :func:`_shift_banded_attention` — same halo pad (along
    the minor S axis), same ``[B, h, W, S]`` logit/weight layout (so the
    ``weights_transform`` dropout hook is shape-identical), same f32
    softmax algebra. The point of the layout: fed from an S-minor
    residual stream, every surrounding matmul (qkv/latent/merge, the
    MLP) contracts a non-minor axis and none of the per-layer
    ``[B,S,h,d] → [B,h,S,d]`` physical relayouts exist (measured ~215
    ms/step of the S=3137 b32 ViT-B/4 step — BASELINE.md round-3
    bisect; removal measured in tools/s3137_sched_repro.py
    ``block_sminor``).
    """
    b, h, d, s = q.shape
    w = window_size

    kp = _halo_pad(k, w, axis=3)
    vp = _halo_pad(v, w, axis=3)

    logits = jnp.stack(
        [
            jnp.einsum(
                "bhds,bhds->bhs",
                q,
                jax.lax.dynamic_slice_in_dim(kp, o, s, axis=3),
                preferred_element_type=jnp.float32,
            )
            for o in range(w)
        ],
        axis=2,
    ) * (d**-0.5)  # [B, h, W, S]

    weights = checkpoint_name(jax.nn.softmax(logits, axis=2),
                              "mhla_band_weights")  # remat-policy tag
    if weights_transform is not None:
        weights = weights_transform(weights)
    out = sum(
        # [B,h,1,S] weight slice broadcasts over the d sublanes of V.
        jax.lax.slice_in_dim(weights, o, o + 1, axis=2)
        * jax.lax.dynamic_slice_in_dim(vp, o, s, axis=3).astype(jnp.float32)
        for o in range(w)
    )
    return out.astype(q.dtype)


def windowed_latent_attention_ds(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    weights_transform=None,
) -> jnp.ndarray:
    """Window-local attention on S-minor ``[B, h, d, S]`` tensors — the
    long-S production layout of the S-minor residual stream (see
    :func:`_shift_banded_attention_ds`). Numerics match
    :func:`windowed_latent_attention` exactly, including the
    duplicated-edge-key softmax multiplicity.
    """
    b, h, d, s = q.shape
    w = window_size
    if s <= 2 * w:
        if weights_transform is not None:
            raise ValueError(
                f"weights_transform requires S > 2*W (got S={s}, W={w})"
            )
        out = _gather_windowed_attention(
            q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2),
            v.transpose(0, 1, 3, 2), w,
        )
        return out.transpose(0, 1, 3, 2)
    return _shift_banded_attention_ds(q, k, v, w, weights_transform)


def windowed_latent_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    attention_mask: jnp.ndarray | None = None,
    weights_transform=None,
) -> jnp.ndarray:
    """Window-local attention on per-head tensors ``[B, h, S, d]``.

    ``k``/``v`` are expected to already carry the latent projection
    (reference applies ``latent_proj`` before windowing,
    models/mhla.py:105-106). Numerics match the reference exactly,
    including the duplicated edge keys participating in the softmax with
    their multiplicity.

    Fast path: halo-padded shift-banded compute (O(S·W·d) reads, no
    [S, W, d] materialization, exact edge rule built into the pad) —
    also the masked and weights-transformed path at banded S; optional
    Pallas kernels (roll / archival v4) via ``FAVIT_MHLA_IMPL``. Falls
    back to the gather formulation only for tiny sequences (S ≤ 2W,
    where the halo construction degenerates).

    Remat-policy contract: every formulation tags its softmax weights
    ``mhla_band_weights`` for ``remat_policy='band_weights'``. A caller
    that wraps this op in its OWN ``jax.checkpoint`` with that policy
    must trace inside :func:`saving_band_weights` — otherwise the short-S
    dense band's inner flash-style checkpoint hides the tag from the
    outer policy and the knob silently becomes a no-op (the models'
    ``VisionTransformerMHLA.__call__`` does this; see
    ``models.layers.resolve_remat_policy``).

    Args:
      attention_mask: optional ``[B, S, S]`` mask; zero entries filled
        with the dtype minimum pre-softmax
        (reference: models/mhla.py:136-143). At banded S the mask rides
        the shift band via :func:`_banded_mask` (O(S·W), no-gradient
        gather) — the ``[B, h, S, W, d]`` window tensor is never
        materialized at any S.
      weights_transform: optional callable on the ``[B, h, W, S]`` softmax
        weights (attention-weight dropout for long-S training — see
        :func:`_shift_banded_attention`). Requires banded S (S > 2W);
        forces the shift path so the transform is never silently dropped.

    Returns:
      ``[B, h, S, d]`` attention output (pre output-projection).
    """
    b, h, s, d = q.shape
    w = window_size
    hw = w // 2

    if s <= 2 * w:
        if weights_transform is not None:
            raise ValueError(
                f"weights_transform requires S > 2*W (got S={s}, W={w})"
            )
        return _gather_windowed_attention(q, k, v, w, attention_mask)

    if attention_mask is not None or weights_transform is not None:
        # Masked and/or transformed: the shift band handles both exactly
        # (mask gathered into the [B, W, S] band layout — no [B,h,S,W,d]
        # tensor, no scatter backward, at any S).
        return _shift_banded_attention(
            q, k, v, w, weights_transform, attention_mask
        )

    impl = os.environ.get("FAVIT_MHLA_IMPL", "auto")
    if impl == "densefull" or (impl == "auto" and s <= DENSE_BAND_MAX_SEQ):
        # Short S: full dense S×S with the log-multiplicity bias — exact
        # including edges, no overwrite needed. Attention is ~1.4% of the
        # step FLOPs at S=197, so the O(S·W) band saves nothing that
        # matters; what matters is the dense working-set shape, which
        # restores the microbatch scheduling lever (BASELINE.md round 3:
        # densefull+mb16 771 vs shift 507 same-process; blocked tiles lose
        # — [T,d]·[d,T+2hw] matmuls too small for the MXU; the measured-
        # and-pruned blocked path's record lives in BASELINE.md).
        return _dense_band_attention(q, k, v, w)

    if impl == "roll":
        # v5 lane-roll compact band (ops/mhla_band_roll.py): S-minor
        # [.., d, S] Pallas kernel — pltpu.roll along lanes expresses the
        # ±o shifts the v1-v4 investigation could not (they fought
        # *sublane* shifts), reading K/V once instead of the shift path's
        # 7×. Exact vs the oracle incl. edge multiplicity (custom-VJP
        # grads pinned in tests/test_ops.py). This entry point adapts
        # from [B,h,S,d]; the S-minor production path feeds the kernel's
        # native layout directly.
        from focused_attention_vit_tpu.ops.mhla_band_roll import (
            roll_banded_attention_bhsd,
        )

        return roll_banded_attention_bhsd(q, k, v, w)

    use_pallas = (
        jax.default_backend() == "tpu"
        and os.environ.get("FAVIT_USE_PALLAS_MHLA", "0") == "1"
    )
    if use_pallas:
        # Opt-in: five kernel generations were numerically identical but all
        # lost to XLA's fused shift formulation on v5e (23.5 ms fwd at
        # B·h=1536, S=3137, d=64, W=7, bf16): v1/v2 on Mosaic's
        # sublane-shift relayouts, v3 on the 8-row DMA alignment rule, v4
        # on per-tile DMA latency, v4b on the 41×-inflated dense-tile
        # softmax. Full measured roofline: BASELINE.md "MHLA band roofline".
        # v4 (the strongest, with custom-VJP grads) is kept as the archival
        # record for hardware/toolchains where the balance differs.
        from focused_attention_vit_tpu.ops.mhla_kernel_v4 import (
            banded_attention_v4,
        )

        out = banded_attention_v4(q, k, v, w)
    else:
        # Halo-padded shift band: exact everywhere incl. the reference's
        # duplicated-edge-key rule (:func:`_halo_pad`) — returns directly.
        return _shift_banded_attention(q, k, v, w)

    if hw == 0:
        return out

    # Exact edge rows (first/last hw) for the archival v4 Pallas path, whose
    # banded compute clamps at the edges: the reference pads left-edge
    # windows with key S-1 and right-edge windows with key 0
    # (models/mhla.py:72-79). Recompute those 2·hw rows exactly —
    # gathering from tiny (W+1)-row slabs built by contiguous slices so the
    # backward pass never scatter-adds into the full K/V (the naive
    # edge fix cost ~400 ms/step at S=3137 b32, BASELINE.md round-3
    # bisect), and writing back via contiguous dynamic_update_slices.
    table = window_index_table(s, w)

    def edge_rows(row_lo, slab_k, slab_v, slab_idx):
        q_e = jax.lax.slice_in_dim(q, row_lo, row_lo + hw, axis=2)
        k_e = jnp.take(slab_k, jnp.asarray(slab_idx), axis=2)
        v_e = jnp.take(slab_v, jnp.asarray(slab_idx), axis=2)
        logits = jnp.einsum(
            "bhed,bhewd->bhew", q_e, k_e, preferred_element_type=jnp.float32
        ) * (d**-0.5)
        weights = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhew,bhewd->bhed", weights, v_e.astype(jnp.float32)
        ).astype(out.dtype)

    # Left edge: keys < W plus key S-1 (slot W).
    lk = jnp.concatenate(
        [jax.lax.slice_in_dim(k, 0, w, axis=2),
         jax.lax.slice_in_dim(k, s - 1, s, axis=2)], axis=2)
    lv = jnp.concatenate(
        [jax.lax.slice_in_dim(v, 0, w, axis=2),
         jax.lax.slice_in_dim(v, s - 1, s, axis=2)], axis=2)
    lidx = np.where(table[:hw] < w, table[:hw], w).astype(np.int32)
    left = edge_rows(0, lk, lv, lidx)

    # Right edge: key 0 (slot 0) plus keys ≥ S-W (slot t-(S-W)+1).
    rk = jnp.concatenate(
        [jax.lax.slice_in_dim(k, 0, 1, axis=2),
         jax.lax.slice_in_dim(k, s - w, s, axis=2)], axis=2)
    rv = jnp.concatenate(
        [jax.lax.slice_in_dim(v, 0, 1, axis=2),
         jax.lax.slice_in_dim(v, s - w, s, axis=2)], axis=2)
    rtab = table[s - hw:]
    ridx = np.where(rtab == 0, 0, rtab - (s - w) + 1).astype(np.int32)
    right = edge_rows(s - hw, rk, rv, ridx)

    out = jax.lax.dynamic_update_slice_in_dim(out, left, 0, axis=2)
    return jax.lax.dynamic_update_slice_in_dim(out, right, s - hw, axis=2)
