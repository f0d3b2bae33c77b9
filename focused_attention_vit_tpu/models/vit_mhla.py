"""ViT with switchable MHA/MHLA blocks (reference: models/vit_mhla.py:112-267)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from focused_attention_vit_tpu.models.layers import (
    PatchEmbedding,
    SwitchableTransformerBlock,
    dense_init,
    resolve_remat_policy,
    scanned_blocks,
)

param_init = nn.initializers.normal(stddev=0.02)


class VisionTransformerMHLA(nn.Module):
    """ViT whose blocks use MHLA windowed latent attention when
    ``use_mhla=True`` and dense MHA otherwise; attributes mirror the
    reference constructor (models/vit_mhla.py:131-146)."""

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
    window_size: int = 7
    use_mhla: bool = False
    use_flash: Optional[bool] = None
    remat: bool = False  # see models/vit.py remat note
    # Optional jax.checkpoint policy under remat: None/'full' saves
    # nothing (classic remat); 'band_weights' additionally saves the MHLA
    # band softmax weights so bwd skips the band recompute
    # (models/layers.resolve_remat_policy).
    remat_policy: Optional[str] = None
    scan_layers: bool = False  # see models/vit.py scan_layers note
    # Sequence parallelism: shard the token axis of activations over
    # ``sp_axis`` of ``sp_mesh`` (GSPMD for the token-local ops; explicit
    # halo-exchange shard_map for the windowed attention —
    # parallel/sequence.py). MHLA only (dense MHA is not window-local).
    sp_mesh: Optional[object] = None  # jax.sharding.Mesh
    sp_axis: str = "seq"
    # Pipeline parallelism: blocks sharded over ``pp_axis`` of ``pp_mesh``
    # (GPipe fill-drain schedule, parallel/pipeline.py). Requires
    # ``scan_layers=True`` — the pipeline consumes the scan-form stacked
    # block params, so checkpoints are interchangeable.
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
        # SP×PP (round 5): a shard_map nested inside the pipeline's
        # manual region is rejected by the Shardy lowering ("operates on
        # axis ... already bound by a parent sdy.manual_computation"), so
        # under PP the sequence axis stays AUTO — blocks run the XLA
        # shift band with tokens sharding-constrained over sp_axis and
        # GSPMD inserts the halo collectives (MultiHeadLatentAttention
        # sp_gspmd). Same numerics as the manual halo path (it is the
        # single-device band, partitioned); pinned by
        # tests/test_parallel.py::TestPipelineParallel sp×pp twins.
        sp_gspmd = self.pp_mesh is not None and self.sp_mesh is not None
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
            window_size=self.window_size,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            attn_dropout=self.attn_dropout,
            use_mhla=self.use_mhla,
            use_flash=self.use_flash,
            sp_mesh=self.sp_mesh,
            sp_axis=self.sp_axis,
            sp_gspmd=sp_gspmd,
            dtype=self.dtype,
        )
        if self.scan_layers:
            self.blocks_scan = scanned_blocks(
                SwitchableTransformerBlock, self.depth, self.remat,
                name="blocks", remat_policy=self.remat_policy,
                **block_kwargs,
            )
            self.blocks = None
        else:
            block_cls = (
                nn.remat(SwitchableTransformerBlock, static_argnums=(2,),
                         policy=resolve_remat_policy(self.remat_policy))
                if self.remat
                else SwitchableTransformerBlock
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
        b = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.embed_dim)).astype(
            x.dtype
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        x = self.pos_drop(x, deterministic=deterministic)
        if self.sp_mesh is not None and not self.is_initializing():
            # Token axis over the sp axis, batch over 'data': token-local
            # ops partition with zero communication under GSPMD; the
            # windowed attention exchanges its halo via the shard_map in
            # parallel/sequence.py (which also owns this constraint).
            from focused_attention_vit_tpu.parallel.sequence import (
                token_sharding_constraint,
            )

            x = token_sharding_constraint(x, self.sp_mesh, self.sp_axis)
        # Under remat_policy='band_weights' the short-S dense band must
        # skip its inner flash-style checkpoint so the tagged weights stay
        # visible to the outer remat policy (ops/window.saving_band_weights).
        from focused_attention_vit_tpu.ops.window import saving_band_weights

        with saving_band_weights(
            self.remat and self.remat_policy == "band_weights"
        ):
            if self.pp_mesh is not None and not self.is_initializing():
                from focused_attention_vit_tpu.models.layers import (
                    apply_pipelined_blocks,
                )

                x = apply_pipelined_blocks(
                    self,
                    SwitchableTransformerBlock(
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
                    x = block(x, deterministic)  # positional for nn.remat
        x = self.norm(x)
        return x[:, 0]

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.head(self.forward_features(x, deterministic=deterministic))
