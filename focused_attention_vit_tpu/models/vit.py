"""Vision Transformer (reference: models/vit.py:182-331), TPU-native.

Input layout is NHWC. The full forward compiles to one XLA program; the
per-block attention uses the flash-attention Pallas kernel for long
sequences (patch_size 4 at 224² → S = 3137 tokens).

Use ``model.apply(vars, x)`` for logits and
``model.apply(vars, x, method="forward_features")`` for cls-token features
(mirroring the reference ``forward`` / ``forward_features`` pair,
models/vit.py:276-322).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from focused_attention_vit_tpu.models.layers import (
    PatchEmbedding,
    TransformerBlock,
    dense_init,
    scanned_blocks,
)

param_init = nn.initializers.normal(stddev=0.02)


class VisionTransformer(nn.Module):
    """ViT classifier; attributes mirror the reference constructor
    (models/vit.py:199-212)."""

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
    use_flash: Optional[bool] = None
    # Rematerialize each block's activations in the backward pass — trades
    # ~33% more FLOPs for O(depth)× less activation memory; essential for
    # training the reference's default patch-4 geometry (S = 3137) at
    # large batch.
    remat: bool = False
    # Roll the depth loop into one lax.scan region (stacked block params,
    # see layers.scanned_blocks). Shrinks the XLA program 12× — the lever
    # for the very-long-S scheduling wall (BASELINE.md "reference-default
    # geometry"). Param layout differs from the loop form; convert with
    # layers.stack_block_params / unstack_block_params.
    scan_layers: bool = False
    # Pipeline parallelism over ``pp_axis`` of ``pp_mesh`` (GPipe
    # fill-drain, parallel/pipeline.py); requires scan_layers=True —
    # consumes the scan-form stacked block params.
    pp_mesh: Optional[object] = None  # jax.sharding.Mesh
    pp_axis: str = "stage"
    pp_microbatches: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self):
        if self.pp_mesh is not None and not self.scan_layers:
            raise ValueError(
                "pp_mesh (pipeline parallelism) requires scan_layers=True "
                "(the pipeline consumes the stacked block params)"
            )
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
        # Single source of truth for block construction — the scan, loop,
        # and pipeline paths must all build identical blocks.
        self.block_kwargs = block_kwargs = dict(
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            attn_dropout=self.attn_dropout,
            use_flash=self.use_flash,
            dtype=self.dtype,
        )
        if self.scan_layers:
            self.blocks_scan = scanned_blocks(
                TransformerBlock, self.depth, self.remat, name="blocks",
                **block_kwargs,
            )
            self.blocks = None
        else:
            block_cls = (
                nn.remat(TransformerBlock, static_argnums=(2,))
                if self.remat
                else TransformerBlock
            )
            self.blocks = [
                block_cls(**block_kwargs, name=f"blocks_{i}")
                for i in range(self.depth)
            ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        self.head = nn.Dense(
            self.num_classes, kernel_init=dense_init, dtype=self.dtype, name="head"
        )

    def forward_features(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """[B, H, W, C] images → [B, D] cls-token features."""
        b = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(
            self.cls_token, (b, 1, self.embed_dim)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        x = self.pos_drop(x, deterministic=deterministic)
        if self.pp_mesh is not None and not self.is_initializing():
            from focused_attention_vit_tpu.models.layers import (
                apply_pipelined_blocks,
            )

            x = apply_pipelined_blocks(
                self,
                TransformerBlock(
                    **self.block_kwargs,
                    parent=None,  # unbound template, applied functionally
                ),
                x,
                deterministic,
            )
        elif self.scan_layers:
            x, _ = self.blocks_scan(x, deterministic)
        else:
            for block in self.blocks:
                # Positional `deterministic` so nn.remat can treat it as
                # static.
                x = block(x, deterministic)
        x = self.norm(x)
        return x[:, 0]

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """[B, H, W, C] → [B, num_classes] logits."""
        return self.head(self.forward_features(x, deterministic=deterministic))
