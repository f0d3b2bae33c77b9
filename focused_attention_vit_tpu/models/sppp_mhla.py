"""SPPP + MHLA combined model (reference: models/sppp_mhla.py:113-334)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from focused_attention_vit_tpu.models.layers import (
    PatchEmbedding,
    SwitchableTransformerBlock,
    dense_init,
)
from focused_attention_vit_tpu.models.sppp_common import sppp_tokens

param_init = nn.initializers.normal(stddev=0.02)


class SPPPViTMHLA(nn.Module):
    """SPPP token pipeline with switchable MHA/MHLA blocks; attributes mirror
    the reference constructor (models/sppp_mhla.py:136-153)."""

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
    num_superpixels: int = 16
    compactness: float = 0.1
    pooling_type: str = "mean"
    window_size: int = 7
    use_mhla: bool = False
    use_flash: Optional[bool] = None
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
            SwitchableTransformerBlock(
                self.embed_dim,
                self.num_heads,
                window_size=self.window_size,
                mlp_ratio=self.mlp_ratio,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                use_mhla=self.use_mhla,
                use_flash=False,  # R+1 tokens: tiny attention
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
