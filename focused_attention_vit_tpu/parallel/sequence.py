"""Sequence parallelism (SP) for windowed latent attention.

The reference's whole thesis is *algorithmic* sequence-cost reduction —
windowed MHLA attends each query to W neighbours (reference:
models/mhla.py:46-83) — and window locality is exactly the property that
makes the op sequence-shardable with O(W) communication: shard the token
axis over a mesh axis, exchange a W//2-row halo with the two neighbouring
shards over ICI, and every query's full window is local. This scales the
paper's long-S geometry (patch 4 → S=3137, reference models/vit.py:33,202)
across chips with per-step traffic of 2·B·h·(W//2)·d elements per shard —
thousands of times smaller than the activations DP already all-reduces.

Design (shard_map, explicit collectives):

* q/k/v arrive ``[B, h, S, d]`` with S sharded over ``axis`` (padded to a
  multiple of the axis size; the pad is neutralized inside, see below).
* The reference's circular edge rule — left-edge windows padded with key
  S-1, right-edge windows with key 0, duplicates keeping softmax
  multiplicity (models/mhla.py:72-79) — needs global rows 0 and S-1 on
  the edge shards: both are broadcast with one masked ``psum`` each.
* Neighbour halos move by ``ppermute`` (non-circular; the sequence edges
  use the broadcast rows instead, which IS the circular edge rule).
* Per shard, attention is the same shift-band as the single-device
  production path (ops/window._shift_banded_attention): W shifted
  multiply-reduces over the halo-extended K/V, softmax over the W offsets
  — fully local, no further collectives. The backward pass flows through
  ``ppermute``/``psum`` transposes automatically.

Everything else in the transformer (LayerNorm, MLP, projections) is
token-local, so the surrounding model runs under ordinary GSPMD with the
token axis of activations sharded over the same mesh axis — XLA partitions
those ops with zero communication. Only this op needs manual collectives,
and only because of the halo.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _broadcast_rows(k, v, own0, ownS, axis: str):
    """All-shards copies of global rows 0 and S-1 of K and V.

    One stacked [B, h, 4, d] psum instead of four [B, h, 1, d] ones —
    these tiny collectives are latency-bound, and every block pays them
    once per step."""

    def row(x, own):
        return jnp.sum(
            x * own[None, None, :, None].astype(x.dtype),
            axis=2, keepdims=True,
        )

    stacked = jnp.concatenate(
        [row(k, own0), row(v, own0), row(k, ownS), row(v, ownS)], axis=2
    )
    stacked = jax.lax.psum(stacked, axis)  # [B, h, 4, d]
    return tuple(
        jax.lax.slice_in_dim(stacked, i, i + 1, axis=2) for i in range(4)
    )


def _sp_band_local(
    q_l: jnp.ndarray,
    k_l: jnp.ndarray,
    v_l: jnp.ndarray,
    dropout_key: Optional[jnp.ndarray],
    *,
    window_size: int,
    s_true: int,
    n_shards: int,
    axis: str,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """Per-shard halo-exchange shift-band attention (runs inside shard_map).

    Local blocks are ``[B, h, L, d]`` with L = padded_S / n_shards; global
    row ``g`` lives on shard ``g // L``. Exactness argument: after (a) the
    pad rows (global index ≥ s_true) are overwritten with the broadcast
    row 0 and (b) the halo exchange places physical neighbour rows (or the
    broadcast edge rows on shards 0 / n-1) around each block, the
    concatenated ``[L + W - 1]`` strip seen by shard ``i`` equals rows
    ``[iL - hw, iL + L + (W-1-hw))`` of the *globally* halo-padded sequence
    of ops/window._halo_pad — so the W shifted reduces below compute
    exactly what the single-device production band computes.
    """
    b, h, L, d = q_l.shape
    w = window_size
    hw = w // 2
    rc = w - 1 - hw
    n = n_shards

    idx = jax.lax.axis_index(axis)
    gidx = idx * L + jnp.arange(L)

    # Global edge rows (the circular part of the reference edge rule).
    k0, v0, kS, vS = _broadcast_rows(
        k_l, v_l, gidx == 0, gidx == s_true - 1, axis
    )

    # Pad rows (beyond the true sequence) act as copies of row 0 — exactly
    # the right-edge halo of ops/window._halo_pad.
    padm = (gidx >= s_true)[None, None, :, None]
    k_l = jnp.where(padm, k0, k_l)
    v_l = jnp.where(padm, v0, v_l)

    def halo(x, x0, xS):
        """[left hw rows | right rc rows] for this shard."""
        if hw:
            tail = jax.lax.slice_in_dim(x, L - hw, L, axis=2)
            left = (
                jax.lax.ppermute(
                    tail, axis, [(j, j + 1) for j in range(n - 1)]
                )
                if n > 1
                else jnp.zeros_like(tail)
            )
            # Shard 0's left halo is hw copies of global row s_true-1.
            left = jnp.where(
                idx == 0, jnp.broadcast_to(xS, tail.shape), left
            )
        else:
            left = x[:, :, :0]
        if rc:
            head = jax.lax.slice_in_dim(x, 0, rc, axis=2)
            right = (
                jax.lax.ppermute(
                    head, axis, [(j + 1, j) for j in range(n - 1)]
                )
                if n > 1
                else jnp.zeros_like(head)
            )
            # Last shard's right halo is rc copies of global row 0.
            right = jnp.where(
                idx == n - 1, jnp.broadcast_to(x0, head.shape), right
            )
        else:
            right = x[:, :, :0]
        return jnp.concatenate([left, x, right], axis=2)

    kp = halo(k_l, k0, kS)  # [B, h, L + W - 1, d]
    vp = halo(v_l, v0, vS)

    # Local shift band — identical math to the single-device production
    # path (ops/window._shift_banded_attention), S-minor [B, h, W, L]
    # weights layout; products at input dtype, f32 accumulation.
    logits = jnp.stack(
        [
            jnp.einsum(
                "bhsd,bhsd->bhs",
                q_l,
                jax.lax.dynamic_slice_in_dim(kp, o, L, axis=2),
                preferred_element_type=jnp.float32,
            )
            for o in range(w)
        ],
        axis=2,
    ) * (d**-0.5)
    weights = jax.nn.softmax(logits, axis=2)
    # Same remat-policy tag as the single-device band (ops/window) so
    # remat_policy='band_weights' also applies under sequence parallelism.
    weights = jax.ad_checkpoint.checkpoint_name(weights, "mhla_band_weights")
    if dropout_rate > 0.0 and dropout_key is not None:
        # Train-mode attention-weight dropout on the band — one Bernoulli
        # per window slot (reference: models/mhla.py:146-147), inverted
        # scaling. Each shard folds its position into the key so masks
        # are independent across shards (stream differs from the
        # single-device order; rate/independence semantics are identical —
        # RNG stream parity is explicitly not promised, SURVEY §7).
        key = jax.random.fold_in(dropout_key, jax.lax.axis_index(axis))
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = sum(
        jax.lax.slice_in_dim(weights, o, o + 1, axis=2).reshape(b, h, L, 1)
        * jax.lax.dynamic_slice_in_dim(vp, o, L, axis=2).astype(jnp.float32)
        for o in range(w)
    )
    return out.astype(q_l.dtype)


def sp_windowed_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window_size: int,
    mesh: Mesh,
    axis: str = "seq",
    dropout_rate: float = 0.0,
    dropout_key: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sequence-parallel windowed latent attention, ``[B, h, S, d]``.

    Numerics match :func:`ops.window.windowed_latent_attention` exactly
    (including the duplicated-edge-key softmax multiplicity). S is padded
    to a multiple of the ``axis`` size internally; requires the per-shard
    block to cover a full window (``ceil(S/n) ≥ W``) and the pad to fit in
    the last shard.

    ``k``/``v`` must already carry the latent projection, as in the
    single-device op. With ``dropout_rate > 0`` and a ``dropout_key``,
    applies the reference's attention-weight dropout to the band weights
    (one Bernoulli per window slot, models/mhla.py:146-147).
    """
    n = mesh.shape[axis]
    b, h, s, d = q.shape
    L = -(-s // n)
    pad = L * n - s
    if L < window_size:
        raise ValueError(
            f"sequence shards too small for SP: ceil({s}/{n})={L} < "
            f"window_size={window_size}"
        )
    if pad >= L:
        raise ValueError(
            f"padding {pad} spans more than the last shard (L={L}); "
            f"use fewer sequence shards for S={s}"
        )

    def padded(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    # Nested-manual support (e.g. SP attention inside the PP pipeline's
    # shard_map): an enclosing shard_map establishes a context mesh with
    # its axes marked Manual, and the inner shard_map must be built
    # against THAT abstract mesh, not the concrete one.
    ctx = jax.sharding.get_abstract_mesh()
    shmap_mesh = (
        ctx
        if (ctx is not None and axis in getattr(ctx, "axis_names", ()))
        else mesh
    )
    spec = P(None, None, axis, None)
    local = partial(
        _sp_band_local,
        window_size=window_size,
        s_true=s,
        n_shards=n,
        axis=axis,
        dropout_rate=dropout_rate if dropout_key is not None else 0.0,
    )
    if dropout_key is not None:
        f = jax.shard_map(
            local,
            mesh=shmap_mesh,
            in_specs=(spec, spec, spec, P()),
            out_specs=spec,
            axis_names={axis},
        )
        out = f(padded(q), padded(k), padded(v), dropout_key)
    else:
        f = jax.shard_map(
            lambda q_, k_, v_: local(q_, k_, v_, None),
            mesh=shmap_mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            axis_names={axis},
        )
        out = f(padded(q), padded(k), padded(v))
    return out[:, :, :s] if pad else out


def token_sharding_constraint(x, mesh, sp_axis: str = "seq"):
    """Pin ``[B, S, D]`` activations to ``P(data?, sp_axis, None)``.

    The single SP entry hint the models emit after token assembly: the
    token axis shards over ``sp_axis`` so every token-local op (LayerNorm,
    MLP, qkv/out projections) partitions with zero communication under
    GSPMD, and the batch axis shards over 'data' when the mesh has it and
    the batch divides (a batch-1 init trace falls back to replicated).
    Shared by VisionTransformerMHLA and PretrainedViTWithMHLA — one place
    for the divisibility rule and the PartitionSpec.
    """
    batch_axis = (
        "data"
        if "data" in mesh.axis_names
        and x.shape[0] % mesh.shape["data"] == 0
        else None
    )
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(batch_axis, sp_axis, None))
    )
