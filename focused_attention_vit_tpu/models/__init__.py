"""Flax model zoo mirroring the reference model families.

Reference → rebuild mapping (all reference paths under /root/reference):

* ``VisionTransformer``            ← models/vit.py:182
* ``VisionTransformerMHLA``        ← models/vit_mhla.py:112
* ``SPPPViT``                      ← models/sppp.py:303
* ``SPPPViTMHLA``                  ← models/sppp_mhla.py:113
* ``PretrainedViTWithMHLA``        ← models/mhla_models.py:22
* ``PretrainedSPPPViTWithMHLA``    ← models/mhla_models.py:178
* ``CrossAttentionViT``            ← models/attention.py:222
* ``CrossAttentionSPPPViT``        ← models/attention.py:383
"""

from focused_attention_vit_tpu.models.layers import (
    MLP,
    MultiHeadAttention,
    MultiHeadLatentAttention,
    TransformerBlock,
    MHLATransformerBlock,
    SwitchableTransformerBlock,
    CrossAttention,
    MultiHeadCrossAttention,
    CrossAttentionTransformerBlock,
    PatchEmbedding,
)
from focused_attention_vit_tpu.models.vit import VisionTransformer
from focused_attention_vit_tpu.models.vit_mhla import VisionTransformerMHLA
from focused_attention_vit_tpu.models.sppp import SPPPViT
from focused_attention_vit_tpu.models.sppp_mhla import SPPPViTMHLA
from focused_attention_vit_tpu.models.mhla_models import (
    PretrainedViTWithMHLA,
    PretrainedSPPPViTWithMHLA,
)
from focused_attention_vit_tpu.models.attention import (
    CrossAttentionViT,
    CrossAttentionSPPPViT,
)

__all__ = [
    "MLP",
    "MultiHeadAttention",
    "MultiHeadLatentAttention",
    "TransformerBlock",
    "MHLATransformerBlock",
    "SwitchableTransformerBlock",
    "CrossAttention",
    "MultiHeadCrossAttention",
    "CrossAttentionTransformerBlock",
    "PatchEmbedding",
    "VisionTransformer",
    "VisionTransformerMHLA",
    "SPPPViT",
    "SPPPViTMHLA",
    "PretrainedViTWithMHLA",
    "PretrainedSPPPViTWithMHLA",
    "CrossAttentionViT",
    "CrossAttentionSPPPViT",
]
