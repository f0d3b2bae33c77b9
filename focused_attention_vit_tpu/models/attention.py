"""Cross-attention ViT variants (reference: models/attention.py:222-609).

Both reference models are unconstructible as shipped — they build their
patch embedder with the non-existent ``nn.Transpose``
(models/attention.py:275, 454; SURVEY.md §2.1). The rebuild performs the
conv-patchify + flatten + transpose as a plain op. The reference's Conv2d
patch embedding is mathematically identical to the linear patch embedding
used elsewhere (a p×p/stride-p conv is a reshaped GEMM), so the shared
``PatchEmbedding`` module is used; the converter maps Conv2d weights onto it.

Self-attention is emulated by passing the same tokens as query and key/value
(reference: models/attention.py:349-350).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from focused_attention_vit_tpu.models.layers import (
    PatchEmbedding,
    CrossAttentionTransformerBlock,
    dense_init,
)
from focused_attention_vit_tpu.models.sppp_common import sppp_tokens

param_init = nn.initializers.normal(stddev=0.02)


class CrossAttentionViT(nn.Module):
    """ViT with cross-attention blocks (reference: models/attention.py:222-380)."""

    img_size: int = 224
    patch_size: int = 4
    in_channels: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    embed_dropout: float = 0.0
    use_multi_head: bool = False
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
            CrossAttentionTransformerBlock(
                self.embed_dim,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                use_multi_head=self.use_multi_head,
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
        for block in self.blocks:
            x = block(x, x, deterministic=deterministic)
        x = self.norm(x)
        return x[:, 0]

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.head(self.forward_features(x, deterministic=deterministic))


class CrossAttentionSPPPViT(nn.Module):
    """SPPP pipeline with cross-attention blocks
    (reference: models/attention.py:383-609; note the patch_size=16 default
    at models/attention.py:410, unlike 4 elsewhere)."""

    img_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    embed_dropout: float = 0.0
    num_superpixels: int = 16
    compactness: float = 0.1
    pooling_type: str = "mean"
    use_multi_head: bool = False
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
            CrossAttentionTransformerBlock(
                self.embed_dim,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                use_multi_head=self.use_multi_head,
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
            tokens = block(tokens, tokens, deterministic=deterministic)
        tokens = self.norm(tokens)
        return tokens[:, 0]

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.head(self.forward_features(x, deterministic=deterministic))
