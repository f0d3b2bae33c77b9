"""Pretrained-surgery MHLA model variants
(reference: models/mhla_models.py:22-396).

``PretrainedViTWithMHLA`` is the ViT skeleton hard-wired to MHLA blocks
(default window_size=4, reference: models/mhla_models.py:31) and
``PretrainedSPPPViTWithMHLA`` is the SPPP pipeline hard-wired to MHLA blocks.
Both are targets of the torch→JAX weight-conversion path
(see convert/torch_to_jax.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from focused_attention_vit_tpu.models.layers import (
    PatchEmbedding,
    MHLATransformerBlock,
    dense_init,
)
from focused_attention_vit_tpu.models.sppp_common import sppp_tokens

param_init = nn.initializers.normal(stddev=0.02)


class PretrainedViTWithMHLA(nn.Module):
    """ViT skeleton with MHLA blocks (reference: models/mhla_models.py:22-175)."""

    img_size: int = 224
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 4
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    embed_dropout: float = 0.0
    # Sequence parallelism (parallel/sequence.py) — this model's default
    # geometry is the long-S one (patch 4 → S=3137).
    sp_mesh: Optional[object] = None  # jax.sharding.Mesh
    sp_axis: str = "seq"
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        self.patch_embed = PatchEmbedding(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", param_init, (1, 1, self.embed_dim), jnp.float32
        )
        self.pos_embed = self.param(
            "pos_embed",
            param_init,
            (1, self.num_patches + 1, self.embed_dim),
            jnp.float32,
        )
        self.pos_drop = nn.Dropout(self.embed_dropout)
        self.blocks = [
            MHLATransformerBlock(
                self.embed_dim,
                self.num_heads,
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                sp_mesh=self.sp_mesh,
                sp_axis=self.sp_axis,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        self.head = nn.Dense(
            self.num_classes, kernel_init=dense_init, dtype=self.dtype, name="head"
        )

    def forward_features(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        b = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.embed_dim)).astype(
            x.dtype
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        x = self.pos_drop(x, deterministic=deterministic)
        if self.sp_mesh is not None and not self.is_initializing():
            from focused_attention_vit_tpu.parallel.sequence import (
                token_sharding_constraint,
            )

            x = token_sharding_constraint(x, self.sp_mesh, self.sp_axis)
        for block in self.blocks:
            x = block(x, deterministic=deterministic)
        x = self.norm(x)
        return x[:, 0]

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.head(self.forward_features(x, deterministic=deterministic))


class PretrainedSPPPViTWithMHLA(nn.Module):
    """SPPP pipeline with MHLA blocks (reference: models/mhla_models.py:178-396)."""

    img_size: int = 224
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 4
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    embed_dropout: float = 0.0
    num_superpixels: int = 16
    compactness: float = 0.1
    pooling_type: str = "mean"
    slic_iters: int = 10
    # SLIC connectivity policy: 'auto' (on ≤64² px), True, False —
    # see ops/slic.slic_segment
    slic_connectivity: "bool | str" = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbedding(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", param_init, (1, 1, self.embed_dim), jnp.float32
        )
        self.pos_drop = nn.Dropout(self.embed_dropout)
        self.blocks = [
            MHLATransformerBlock(
                self.embed_dim,
                self.num_heads,
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        self.head = nn.Dense(
            self.num_classes, kernel_init=dense_init, dtype=self.dtype, name="head"
        )

    def forward_features(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        patch_embeddings = self.patch_embed(x)
        tokens = sppp_tokens(
            x,
            patch_embeddings,
            self.cls_token,
            patch_size=self.patch_size,
            num_superpixels=self.num_superpixels,
            compactness=self.compactness,
            slic_connectivity=self.slic_connectivity,
            pooling_type=self.pooling_type,
            slic_iters=self.slic_iters,
        )
        tokens = self.pos_drop(tokens, deterministic=deterministic)
        for block in self.blocks:
            tokens = block(tokens, deterministic=deterministic)
        tokens = self.norm(tokens)
        return tokens[:, 0]

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.head(self.forward_features(x, deterministic=deterministic))
