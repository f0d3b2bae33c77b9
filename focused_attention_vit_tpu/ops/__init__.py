"""Functional compute primitives (jnp + Pallas TPU kernels)."""

from focused_attention_vit_tpu.ops.patch_embed import extract_patches, patch_embed
from focused_attention_vit_tpu.ops.attention import (
    multi_head_attention,
    scaled_dot_product_attention,
)
from focused_attention_vit_tpu.ops.mhla_band_roll import (
    roll_banded_attention,
)
from focused_attention_vit_tpu.ops.window import (
    window_index_table,
    windowed_latent_attention,
)
from focused_attention_vit_tpu.ops.posenc import (
    sinusoidal_positional_encoding,
    centroid_positional_encoding,
)
from focused_attention_vit_tpu.ops.segment_pool import (
    dominant_superpixel_per_patch,
    segment_pool,
    superpixel_centroids,
)
from focused_attention_vit_tpu.ops.slic import slic_segment
from focused_attention_vit_tpu.ops.mha_kernel import (
    fused_multi_head_attention,
    fused_mha_supported,
)

__all__ = [
    "extract_patches",
    "patch_embed",
    "multi_head_attention",
    "scaled_dot_product_attention",
    "roll_banded_attention",
    "window_index_table",
    "windowed_latent_attention",
    "sinusoidal_positional_encoding",
    "centroid_positional_encoding",
    "dominant_superpixel_per_patch",
    "segment_pool",
    "superpixel_centroids",
    "slic_segment",
    "fused_multi_head_attention",
    "fused_mha_supported",
]
