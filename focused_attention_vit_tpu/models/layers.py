"""Shared Flax building blocks for the model zoo.

Numerics deliberately match the torch reference so that converted weights
produce identical logits:

* Linear init: normal(σ=0.02) weights, zero bias — the reference's recursive
  init policy (reference: models/vit.py:266-274).
* LayerNorm: eps 1e-5 (torch default).
* GELU: exact (erf) form — torch ``nn.GELU()`` default.
* Fused qkv layout: output dim ordered [q | k | v], contiguous heads within
  each (reference: models/vit.py:90-92).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from focused_attention_vit_tpu.ops import attention as attn_ops
from focused_attention_vit_tpu.ops import window as window_ops
from focused_attention_vit_tpu.ops.patch_embed import extract_patches

# Reference init policy: all Linear weights ~ N(0, 0.02), biases zero
# (reference: models/vit.py:266-271).
dense_init = nn.initializers.normal(stddev=0.02)


class PatchEmbedding(nn.Module):
    """Patchify + linear projection (reference: models/vit.py:19-53).

    Input is NHWC (TPU-native). The flattened-patch ordering (p1, p2, c)
    matches the reference Rearrange so converted torch weights line up.
    """

    patch_size: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        patches = extract_patches(images, self.patch_size)
        return nn.Dense(
            self.embed_dim,
            kernel_init=dense_init,
            dtype=self.dtype,
            name="projection",
        )(patches)


class MLP(nn.Module):
    """fc1 → GELU → drop → fc2 → drop (reference: models/vit.py:107-139)."""

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden_dim, kernel_init=dense_init, dtype=self.dtype, name="fc1"
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_dim, kernel_init=dense_init, dtype=self.dtype, name="fc2"
        )(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    """Fused-qkv multi-head self-attention (reference: models/vit.py:56-104).

    ``use_flash=None`` auto-selects the Pallas flash kernel for long
    sequences on TPU.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_flash: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        head_dim = self.embed_dim // self.num_heads
        # Head-shaped fused projection (kernel [D, 3, h, d]); the head axis
        # is TP-shardable without relayout — see ops.attention.qkv_split_heads.
        qkv = nn.DenseGeneral(
            features=(3, self.num_heads, head_dim),
            kernel_init=dense_init,
            dtype=self.dtype,
            name="qkv",
        )(x)
        q, k, v = attn_ops.qkv_split_heads(qkv)

        seq_len = q.shape[-2]
        from focused_attention_vit_tpu.ops.mha_kernel import (
            fused_mha_supported,
            fused_multi_head_attention,
        )

        # Opt-in: measured on v5e, XLA's batched dense attention beats the
        # per-(b·h)-tile kernel at short S (its [S,d]·[d,S] matmuls are too
        # small to keep the MXU busy) once training runs at microbatch ≤ 64;
        # the kernel wins only for large single-shot batches (b128: 201 vs
        # 214 ms/step). Kept for that regime and as the in-kernel-PRNG
        # dropout reference.
        use_fused = (
            os.environ.get("FAVIT_FUSED_MHA", "0") == "1"
            and self.use_flash is None  # explicit True/False: caller's choice
            and jax.default_backend() == "tpu"
            and fused_mha_supported(seq_len, head_dim)
        )
        if self.dropout > 0.0 and not deterministic:
            # Train-mode attention-weight dropout (reference:
            # models/vit.py:96-97).
            if use_fused:
                # Single-tile fused kernel: softmax + inverted dropout +
                # P·V entirely in VMEM; the backward pass regenerates the
                # mask from the seed, so no S² tensor or mask ever reaches
                # HBM (ops/mha_kernel.py).
                out = fused_multi_head_attention(
                    q, k, v,
                    dropout_rate=self.dropout,
                    dropout_rng=self.make_rng("dropout"),
                )
            elif seq_len >= attn_ops.FLASH_MIN_SEQ_LEN:
                # Long-S train-mode dropout: query-chunked weights dropout
                # (O(S·chunk) memory) instead of materializing the
                # [B, h, S, S] tensor — at the reference default S=3137
                # that tensor is ~15 GB f32 at batch 32.
                from focused_attention_vit_tpu.ops.flash_attention import (
                    dropout_attention_q_chunked,
                )

                out = dropout_attention_q_chunked(
                    q, k, v, self.dropout, self.make_rng("dropout")
                )
            else:
                # Materialized-score fallback (CPU tests, short sequences),
                # checkpointed flash-style: only q/k/v and the dropout key
                # are saved for backward; the [B,h,S,S] softmax weights and
                # mask are recomputed (bitwise-identically — the PRNG is
                # keyed) instead of being stored as S²-sized residuals.
                # Mask math is nn.Dropout's (bernoulli(keep_prob), inverted
                # scaling); the realized mask differs from nn.Dropout's
                # only through the rng derivation path (parent make_rng vs
                # the child Dropout module's) — mean-identical, pinned by
                # the expectation test.
                rate = self.dropout

                def _attn_dropout_core(q, k, v, key):
                    d = q.shape[-1]
                    logits = jnp.einsum(
                        "bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32,
                    ) * (d**-0.5)
                    weights = jax.nn.softmax(logits, axis=-1)
                    keep = jax.random.bernoulli(key, 1.0 - rate, weights.shape)
                    weights = jnp.where(keep, weights / (1.0 - rate), 0.0)
                    return jnp.einsum(
                        "bhst,bhtd->bhsd", weights.astype(v.dtype), v
                    )

                out = jax.checkpoint(_attn_dropout_core)(
                    q, k, v, self.make_rng("dropout")
                )
        elif use_fused:
            out = fused_multi_head_attention(q, k, v)
        else:
            out = attn_ops.multi_head_attention(
                q, k, v, use_flash=self.use_flash
            )
        out = out.transpose(0, 2, 1, 3)  # [B, S, h, d]
        # Head-major output projection (kernel [h, d, D]): row-sharded under
        # TP, partial products psum-reduced by XLA.
        out = nn.DenseGeneral(
            self.embed_dim,
            axis=(-2, -1),
            kernel_init=dense_init,
            dtype=self.dtype,
            name="proj",
        )(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class HeadQKVProj(nn.Module):
    """Fused qkv projection emitted directly in per-head ``[B, h, S, d]``
    layout by a single einsum (``bsD,Dthd->tbhsd``).

    Parameter-compatible with ``nn.DenseGeneral(features=(3, h, d))``
    (kernel ``[D, 3, h, d]``, bias ``[3, h, d]``) so checkpoints and the
    torch converter are unaffected. Used at long S, where the separate
    ``[B,S,3,h,d] → [3,B,h,S,d]`` transpose is a major relayout (~215
    ms/step of the ViT-B/4 S=3137 step, BASELINE.md round-3 bisect);
    folding it into the matmul's output layout lets XLA emit the relayout
    as part of the contraction.
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d_in = x.shape[-1]
        kernel = self.param(
            "kernel", dense_init, (d_in, 3, self.num_heads, self.head_dim)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (3, self.num_heads, self.head_dim),
        )
        y = jnp.einsum(
            "bsD,Dthd->tbhsd", x.astype(self.dtype), kernel.astype(self.dtype)
        )
        y = y + bias.astype(self.dtype)[:, None, :, None, :]
        # Static slices (integer indexing would lower to gathers).
        return (
            jax.lax.index_in_dim(y, 0, axis=0, keepdims=False),
            jax.lax.index_in_dim(y, 1, axis=0, keepdims=False),
            jax.lax.index_in_dim(y, 2, axis=0, keepdims=False),
        )


class HeadMergeProj(nn.Module):
    """Output projection consuming ``[B, h, S, d]`` directly
    (``bhsd,hdD->bsD``), parameter-compatible with
    ``nn.DenseGeneral(features=D, axis=(-2, -1))`` applied to the
    ``[B, S, h, d]`` transpose (kernel ``[h, d, D]``, bias ``[D]``).
    The long-S partner of :class:`HeadQKVProj`."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, d = x.shape[1], x.shape[3]
        kernel = self.param("kernel", dense_init, (h, d, self.embed_dim))
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.embed_dim,)
        )
        return (
            jnp.einsum(
                "bhsd,hdD->bsD",
                x.astype(self.dtype),
                kernel.astype(self.dtype),
            )
            + bias.astype(self.dtype)
        )


class HeadQKVProjDS(nn.Module):
    """Fused qkv projection emitted directly in the S-minor per-head
    ``[B, h, d, S]`` layout (``bsD,Dthd->tbhds``) — the native layout of
    the v5 lane-roll band kernel (ops/mhla_band_roll.py). Parameter-
    compatible with :class:`HeadQKVProj` / ``nn.DenseGeneral`` (kernel
    ``[D, 3, h, d]``, bias ``[3, h, d]``)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        d_in = x.shape[-1]
        kernel = self.param(
            "kernel", dense_init, (d_in, 3, self.num_heads, self.head_dim)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (3, self.num_heads, self.head_dim),
        )
        y = jnp.einsum(
            "bsD,Dthd->tbhds", x.astype(self.dtype), kernel.astype(self.dtype)
        )
        y = y + bias.astype(self.dtype)[:, None, :, :, None]
        return (
            jax.lax.index_in_dim(y, 0, axis=0, keepdims=False),
            jax.lax.index_in_dim(y, 1, axis=0, keepdims=False),
            jax.lax.index_in_dim(y, 2, axis=0, keepdims=False),
        )


class LatentProjDS(nn.Module):
    """The MHLA latent projection applied in the S-minor ``[B, h, d, S]``
    layout (``de,bhds->bhes``). Parameter-compatible with
    ``nn.Dense(head_dim)`` (kernel ``[d, e]``, bias ``[e]``) so the
    checkpoint/converter surface is unchanged."""

    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", dense_init, (x.shape[2], self.head_dim))
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.head_dim,)
        )
        return (
            jnp.einsum("de,bhds->bhes", kernel.astype(self.dtype), x)
            + bias.astype(self.dtype)[None, None, :, None]
        )


class HeadMergeProjDS(nn.Module):
    """Output projection consuming S-minor ``[B, h, d, S]`` directly
    (``bhds,hdD->bsD``) — :class:`HeadMergeProj`'s partner for the
    lane-roll band path; same params (kernel ``[h, d, D]``, bias ``[D]``)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, d = x.shape[1], x.shape[2]
        kernel = self.param("kernel", dense_init, (h, d, self.embed_dim))
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.embed_dim,)
        )
        return (
            jnp.einsum(
                "bhds,hdD->bsD", x, kernel.astype(self.dtype)
            )
            + bias.astype(self.dtype)
        )


class MultiHeadLatentAttention(nn.Module):
    """Windowed latent attention (reference: models/mhla.py:17-161).

    A shared ``latent_proj: Dense(head_dim → head_dim)`` is applied to K and
    V of every head before window-local attention with the reference's
    edge-padding rule (see ops/window.py).
    """

    embed_dim: int
    num_heads: int
    window_size: int = 7
    dropout: float = 0.0
    use_fused_kernel: Optional[bool] = None
    sp_mesh: Optional[object] = None  # jax.sharding.Mesh — sequence parallel
    sp_axis: str = "seq"
    # SP composed under PP (round 5): inside the pipeline's
    # {'stage'}-manual shard_map a NESTED manual shard_map over 'seq' is
    # rejected by the Shardy lowering ("operates on axis ... already
    # bound by a parent sdy.manual_computation"), so the composition
    # keeps 'seq' AUTO: tokens are sharding-constrained over sp_axis and
    # the band runs the plain XLA shift formulation — the SPMD
    # partitioner inserts the boundary collectives for the W shifted
    # slices. Set by VisionTransformerMHLA when both meshes are given.
    sp_gspmd: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        head_dim = self.embed_dim // self.num_heads
        long_s = x.shape[1] > window_ops.DENSE_BAND_MAX_SEQ

        impl_env = os.environ.get("FAVIT_MHLA_IMPL", "auto")
        if (
            long_s
            and attention_mask is None
            and x.shape[1] > 2 * self.window_size
            and self.sp_mesh is None
            and (
                impl_env == "roll"
                # Production auto: long-S on the real TPU takes the roll
                # kernel for BOTH eval and training. Eval: 1.33× band fwd
                # / +7% end-to-end (125.2 vs 117.0 img/s at S=3137 b32,
                # BASELINE.md "attack #5"). Training: under the
                # attack-#6 production config (no-remat, microbatch 4)
                # the custom-VJP fusion barrier that sank the round-3
                # hybrid no longer bites — measured 49.8 vs 48.0 img/s
                # end-to-end (BASELINE.md round-4 "attack #8"); the
                # in-kernel PRNG window-slot dropout replaces the
                # [B,h,W,S] mask traffic of nn.Dropout on the shift
                # band's weights.
                or (
                    impl_env == "auto"
                    and jax.default_backend() == "tpu"
                )
            )
        ):
            # v5 lane-roll band path (ops/mhla_band_roll.py): the whole
            # attention sublayer stays in the kernel's native S-minor
            # [B, h, d, S] layout — qkv/latent/merge as param-compatible
            # einsums, the band as one Pallas kernel reading K/V once
            # (vs the shift path's 7×), train-mode window-slot dropout
            # drawn by the in-kernel PRNG (seed from the flax RNG).
            q, k, v = HeadQKVProjDS(
                self.num_heads, head_dim, dtype=self.dtype, name="qkv"
            )(x)
            lat = LatentProjDS(head_dim, dtype=self.dtype, name="latent_proj")
            k = lat(k)
            v = lat(v)
            if self.dropout > 0.0 and not deterministic:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1,
                    dtype=jnp.int32,
                )
                dropout = (self.dropout, seed)
            else:
                dropout = (0.0, None)
            from focused_attention_vit_tpu.ops.mhla_band_roll import (
                roll_banded_attention,
            )

            out = roll_banded_attention(q, k, v, self.window_size, dropout)
            out = HeadMergeProjDS(
                self.embed_dim, dtype=self.dtype, name="proj"
            )(out)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

        latent = nn.Dense(
            self.embed_dim // self.num_heads,
            kernel_init=dense_init,
            dtype=self.dtype,
            name="latent_proj",
        )

        if long_s:
            # Long S: einsum projections straight into/out of [B, h, S, d]
            # — no [B,S,3,h,d]→[3,B,h,S,d] relayout (param-compatible with
            # the DenseGeneral path; see HeadQKVProj).
            q, k, v = HeadQKVProj(
                self.num_heads, head_dim, dtype=self.dtype, name="qkv"
            )(x)
        else:
            qkv = nn.DenseGeneral(
                features=(3, self.num_heads, head_dim),
                kernel_init=dense_init,
                dtype=self.dtype,
                name="qkv",
            )(x)
            q, k, v = attn_ops.qkv_split_heads(qkv)  # [B, h, S, d]
        k = latent(k)
        v = latent(v)

        b, h, s, d = q.shape
        if (
            self.sp_mesh is not None
            and self.sp_gspmd
            and s > 2 * self.window_size
        ):
            # SP×PP: GSPMD sequence sharding (see the sp_gspmd field doc).
            # Deterministic numerics are EXACTLY the single-device shift
            # band — the constraint only tells the partitioner where the
            # token axis lives; attention masks ride the same _banded_mask
            # path. Train-mode dropout keeps the reference's rate and
            # per-slot semantics via the shift band's weights_transform,
            # but its MASK STREAM is its own: at 2W < S ≤ 512 the
            # single-device train path draws one Bernoulli per MERGED
            # edge weight (_dense_band_attention) vs per duplicated slot
            # here — same rate, different stream. RNG stream parity
            # across shardings is explicitly not promised (SURVEY §7;
            # the manual-halo SP path folds per-shard keys for the same
            # reason), so trajectory-equality twins run dropout=0.
            amesh = jax.sharding.get_abstract_mesh()
            if amesh is not None and self.sp_axis in getattr(
                amesh, "axis_names", ()
            ):
                spec = jax.sharding.NamedSharding(
                    amesh,
                    jax.sharding.PartitionSpec(
                        None, None, self.sp_axis, None
                    ),
                )
                q, k, v = (
                    jax.lax.with_sharding_constraint(t, spec)
                    for t in (q, k, v)
                )
            wt = None
            if self.dropout > 0.0 and not deterministic:
                drop = nn.Dropout(self.dropout)
                wt = lambda w_: drop(w_, deterministic=deterministic)
            out = window_ops._shift_banded_attention(
                q, k, v, self.window_size, wt, attention_mask
            )
        elif (
            self.sp_mesh is not None
            and attention_mask is None
            and s > 2 * self.window_size
        ):
            # Sequence-parallel windowed attention: token axis sharded over
            # the mesh's sp axis, W//2-row halo exchanged by ppermute —
            # see parallel/sequence.py. Exact same numerics as the
            # single-device band, including the reference edge rule.
            from focused_attention_vit_tpu.parallel.sequence import (
                sp_windowed_attention,
            )

            key = (
                self.make_rng("dropout")
                if self.dropout > 0.0 and not deterministic
                else None
            )
            out = sp_windowed_attention(
                q, k, v, self.window_size, self.sp_mesh, self.sp_axis,
                dropout_rate=self.dropout, dropout_key=key,
            )
        elif (
            self.dropout > 0.0
            and not deterministic
            and attention_mask is None
            and 2 * self.window_size < s <= window_ops.DENSE_BAND_MAX_SEQ
        ):
            # Train-mode dropout on the dense band-masked formulation: the
            # same two MXU matmuls as dense attention (microbatch lever
            # applies — BASELINE.md round 3), with inverted dropout on the
            # [B,h,S,S] masked weights. Matches the reference's window-
            # weight dropout (models/mhla.py:146-147) in rate and
            # expectation; at the 2·(W//2) edge rows a duplicated key draws
            # ONE Bernoulli for its merged weight instead of one per
            # duplicated slot — same mean, negligibly different variance.
            # Shares ops/window's single definition via the
            # weights_transform hook (a copy here could silently diverge
            # from the eval path on a numerics fix).
            drop = nn.Dropout(self.dropout)
            out = window_ops._dense_band_attention(
                q, k, v, self.window_size,
                weights_transform=lambda wts: drop(
                    wts, deterministic=deterministic
                ),
            )
        elif (
            self.dropout > 0.0
            and not deterministic
            and s > 2 * self.window_size
        ):
            # Banded-S train-mode dropout (masked or not): the halo-shift
            # band with inverted dropout applied to its [B,h,W,S] window
            # weights — one Bernoulli per window slot including duplicated
            # edge slots, exactly the reference's dropout on the
            # [B,h,S,W] weights (models/mhla.py:146-147). A mask rides the
            # band layout too (ops/window._banded_mask), so the gather
            # formulation's 7× K/V materialization + scatter backward is
            # never paid at long S — masked or unmasked (the masked
            # gather path cost ~2.2 GB/tensor at S=3137 b32 f32).
            drop = nn.Dropout(self.dropout)
            out = window_ops.windowed_latent_attention(
                q,
                k,
                v,
                self.window_size,
                attention_mask,
                weights_transform=lambda wts: drop(
                    wts, deterministic=deterministic
                ),
            )
        elif self.dropout > 0.0 and not deterministic:
            # Train-mode attention-weight dropout at tiny S (≤ 2W, where
            # the halo construction degenerates): gather formulation with
            # per-slot dropout on the [B,h,S,W] weights, sharing
            # ops/window's single definition via the weights_transform
            # hook.
            drop = nn.Dropout(self.dropout)
            out = window_ops._gather_windowed_attention(
                q, k, v, self.window_size, attention_mask,
                weights_transform=lambda wts: drop(
                    wts, deterministic=deterministic
                ),
            )
        else:
            out = window_ops.windowed_latent_attention(
                q, k, v, self.window_size, attention_mask
            )
        if long_s:
            out = HeadMergeProj(
                self.embed_dim, dtype=self.dtype, name="proj"
            )(out)
        else:
            out = out.transpose(0, 2, 1, 3)  # [B, S, h, d]
            out = nn.DenseGeneral(
                self.embed_dim,
                axis=(-2, -1),
                kernel_init=dense_init,
                dtype=self.dtype,
                name="proj",
            )(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class TransformerBlock(nn.Module):
    """Pre-LN block: x += attn(LN(x)); x += mlp(LN(x))
    (reference: models/vit.py:142-179)."""

    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    use_flash: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.embed_dim,
            self.num_heads,
            dropout=self.attn_dropout,
            use_flash=self.use_flash,
            dtype=self.dtype,
            name="attn",
        )(y, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + MLP(
            int(self.embed_dim * self.mlp_ratio),
            self.embed_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        return x


class MHLATransformerBlock(nn.Module):
    """Pre-LN block wrapping MHLA (reference: models/mhla.py:164-222)."""

    embed_dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    sp_mesh: Optional[object] = None
    sp_axis: str = "seq"
    sp_gspmd: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadLatentAttention(
            self.embed_dim,
            self.num_heads,
            window_size=self.window_size,
            dropout=self.attn_dropout,
            sp_mesh=self.sp_mesh,
            sp_axis=self.sp_axis,
            sp_gspmd=self.sp_gspmd,
            dtype=self.dtype,
            name="attn",
        )(y, attention_mask, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + MLP(
            int(self.embed_dim * self.mlp_ratio),
            self.embed_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        return x


class SwitchableTransformerBlock(nn.Module):
    """MHA/MHLA-switchable block (reference: models/vit_mhla.py:20-109;
    duplicated at models/sppp_mhla.py:21-110 — deduplicated here)."""

    embed_dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    use_mhla: bool = True
    use_flash: Optional[bool] = None
    sp_mesh: Optional[object] = None
    sp_axis: str = "seq"
    sp_gspmd: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if self.use_mhla:
            attn_out = MultiHeadLatentAttention(
                self.embed_dim,
                self.num_heads,
                window_size=self.window_size,
                dropout=self.attn_dropout,
                sp_mesh=self.sp_mesh,
                sp_axis=self.sp_axis,
                sp_gspmd=self.sp_gspmd,
                dtype=self.dtype,
                name="attn",
            )(y, deterministic=deterministic)
        else:
            attn_out = MultiHeadAttention(
                self.embed_dim,
                self.num_heads,
                dropout=self.attn_dropout,
                use_flash=self.use_flash,
                dtype=self.dtype,
                name="attn",
            )(y, deterministic=deterministic)
        x = x + attn_out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + MLP(
            int(self.embed_dim * self.mlp_ratio),
            self.embed_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        return x


class CrossAttention(nn.Module):
    """Single-head cross-attention with FULL-dim scaling
    (reference: models/attention.py:17-78 — note ``embed_dim**0.5`` scale at
    line 63-64, not head-dim; reproduced faithfully)."""

    embed_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key_value: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = nn.Dense(self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="k_proj")(key_value)
        v = nn.Dense(self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="v_proj")(key_value)
        if self.dropout > 0.0 and not deterministic:
            # Weight dropout (reference: models/attention.py:71-72).
            logits = jnp.einsum(
                "bsd,btd->bst", q, k, preferred_element_type=jnp.float32
            ) * (self.embed_dim**-0.5)
            if attention_mask is not None:
                logits = jnp.where(
                    attention_mask == 0, jnp.finfo(logits.dtype).min, logits
                )
            weights = nn.Dropout(self.dropout)(
                jax.nn.softmax(logits, axis=-1), deterministic=deterministic
            )
            out = jnp.einsum("bst,btd->bsd", weights.astype(v.dtype), v)
        else:
            out = attn_ops.scaled_dot_product_attention(
                q, k, v, mask=attention_mask, scale=self.embed_dim**-0.5
            )
        return nn.Dense(
            self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="out_proj"
        )(out)


class MultiHeadCrossAttention(nn.Module):
    """Multi-head cross-attention with head-dim scaling
    (reference: models/attention.py:81-148)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key_value: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = nn.Dense(self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="k_proj")(key_value)
        v = nn.Dense(self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="v_proj")(key_value)
        q = attn_ops.split_heads(q, self.num_heads)
        k = attn_ops.split_heads(k, self.num_heads)
        v = attn_ops.split_heads(v, self.num_heads)
        mask = attention_mask[:, None] if attention_mask is not None else None
        if self.dropout > 0.0 and not deterministic:
            # Weight dropout (reference: models/attention.py:140-141).
            d = q.shape[-1]
            logits = jnp.einsum(
                "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
            ) * (d**-0.5)
            if mask is not None:
                logits = jnp.where(
                    mask == 0, jnp.finfo(logits.dtype).min, logits
                )
            weights = nn.Dropout(self.dropout)(
                jax.nn.softmax(logits, axis=-1), deterministic=deterministic
            )
            out = jnp.einsum("bhst,bhtd->bhsd", weights.astype(v.dtype), v)
        else:
            out = attn_ops.scaled_dot_product_attention(q, k, v, mask=mask)
        out = attn_ops.merge_heads(out)
        return nn.Dense(
            self.embed_dim, kernel_init=dense_init, dtype=self.dtype, name="out_proj"
        )(out)


class CrossAttentionTransformerBlock(nn.Module):
    """Cross-attention block with separate query/kv input norms
    (reference: models/attention.py:151-219)."""

    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    use_multi_head: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key_value: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        qn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1_query")(query)
        kvn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1_kv")(key_value)
        if self.use_multi_head:
            attn_out = MultiHeadCrossAttention(
                self.embed_dim, self.num_heads, dropout=self.attn_dropout,
                dtype=self.dtype, name="attn",
            )(qn, kvn, attention_mask, deterministic=deterministic)
        else:
            attn_out = CrossAttention(
                self.embed_dim, dropout=self.attn_dropout, dtype=self.dtype,
                name="attn",
            )(qn, kvn, attention_mask, deterministic=deterministic)
        query = query + attn_out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(query)
        query = query + MLP(
            int(self.embed_dim * self.mlp_ratio),
            self.embed_dim,
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        return query


def resolve_remat_policy(policy):
    """Map a model's ``remat_policy`` string to a ``jax.checkpoint``
    policy callable (``None`` = save nothing, i.e. classic full remat).

    ``'band_weights'`` saves the MHLA band's post-softmax weights — tagged
    ``mhla_band_weights`` in every band formulation (ops/window: shift,
    dense band-masked, gather, ds; parallel/sequence.py's halo band) —
    across fwd→bwd so the backward pass skips recomputing the band
    logits + softmax. Memory cost depends on the active path: f32
    [B,h,W,S] per layer (~34 MB at ViT-B/4 b32) on the long-S shift
    band, the full masked [B,h,S,S] on the short-S dense band. Everything
    else still remats. Measured neutral at the S=3137 bench config
    (BASELINE.md) — a memory/geometry tuning knob, not a default. The
    Pallas roll band (FAVIT_MHLA_IMPL=roll) manages its own residuals via
    custom_vjp and ignores this policy.

    Contract for custom callers: the short-S dense band wraps its core in
    an inner flash-style ``jax.checkpoint`` that would hide the
    ``mhla_band_weights`` tag from any OUTER checkpoint's
    ``save_only_these_names`` policy, silently turning this knob into a
    no-op. Models that apply this policy (``VisionTransformerMHLA``)
    therefore trace under ``ops.window.saving_band_weights(True)``, which
    skips the inner checkpoint; any new caller that wraps
    ``windowed_latent_attention`` in its own band_weights-policy
    checkpoint must do the same.
    """
    if policy in (None, "full"):
        return None
    if policy == "band_weights":
        return jax.checkpoint_policies.save_only_these_names(
            "mhla_band_weights"
        )
    raise ValueError(
        f"unknown remat_policy {policy!r} (expected None, 'full', or "
        "'band_weights')"
    )


def scanned_blocks(block_cls, depth: int, remat: bool, name: str,
                   remat_policy=None, **block_kwargs):
    """``lax.scan``-over-depth block stack (``scan_layers`` option).

    Rolls ``depth`` identical transformer blocks into ONE scanned XLA
    region with stacked params (leading axis = depth) instead of unrolling
    12 copies of the layer graph. At very long S (reference default
    patch 4 → S=3137, /root/reference/models/vit.py:33) XLA's scheduling
    degrades with the size of the live activation set across the unrolled
    program (BASELINE.md "reference-default geometry"); the scanned form
    keeps the program 12× smaller.

    Params land under ``{name}/block/...`` with a leading depth axis; use
    :func:`stack_block_params` to convert a loop-form checkpoint.
    """
    inner = (
        nn.remat(block_cls, static_argnums=(2,),
                 policy=resolve_remat_policy(remat_policy))
        if remat else block_cls
    )

    class _Body(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic):
            return inner(**block_kwargs, name="block")(x, deterministic), None

    scan = nn.scan(
        _Body,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=nn.broadcast,
        length=depth,
    )
    return scan(name=name)


def apply_pipelined_blocks(model, template, x, deterministic: bool):
    """Run the model's scan-form stacked block params through the SPMD
    pipeline (parallel/pipeline.spmd_pipeline) over ``model.pp_mesh``.

    ``template`` is an UNBOUND block module constructed with the same
    kwargs as the scanned blocks, applied functionally per layer — the
    parameters are exactly the ``scan_layers`` stacked form
    (``blocks/block`` with a leading depth axis), so checkpoints are
    interchangeable between the scanned and pipelined execution paths.
    """
    import jax as _jax

    from focused_attention_vit_tpu.parallel.pipeline import spmd_pipeline

    stacked = model.blocks_scan.variables["params"]["block"]

    def apply_block(p, xx, key):
        rngs = None if key is None else {"dropout": key}
        return template.apply({"params": p}, xx, deterministic, rngs=rngs)

    if model.remat:
        # Honor the model's remat_policy exactly like the scan/loop paths
        # (plain jax.checkpoint here silently dropped a user-selected
        # --remat_policy band_weights under --pp).
        apply_block = _jax.checkpoint(
            apply_block,
            policy=resolve_remat_policy(getattr(model, "remat_policy", None)),
        )
    key = None
    if not deterministic and (
        model.dropout > 0 or model.attn_dropout > 0
    ):
        key = model.make_rng("dropout")
    return spmd_pipeline(
        apply_block,
        stacked,
        x,
        model.pp_mesh,
        axis=model.pp_axis,
        microbatches=model.pp_microbatches,
        dropout_key=key,
    )


def stack_block_params(params: dict, depth: int, prefix: str = "blocks_",
                       scan_name: str = "blocks") -> dict:
    """Loop-form params (``blocks_0..blocks_{depth-1}``) → scan-form
    (``{scan_name}/block`` with a leading depth axis). Inverse:
    :func:`unstack_block_params`. Non-block entries pass through."""
    out = {k: v for k, v in params.items()
           if not k.startswith(prefix) or not k[len(prefix):].isdigit()}
    blocks = [params[f"{prefix}{i}"] for i in range(depth)]
    out[scan_name] = {
        "block": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    }
    return out


def unstack_block_params(params: dict, depth: int, prefix: str = "blocks_",
                         scan_name: str = "blocks") -> dict:
    """Scan-form params → loop-form (inverse of stack_block_params)."""
    out = {k: v for k, v in params.items() if k != scan_name}
    stacked = params[scan_name]["block"]
    for i in range(depth):
        out[f"{prefix}{i}"] = jax.tree.map(lambda a: a[i], stacked)
    return out
