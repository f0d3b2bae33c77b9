"""torch/HF checkpoint → Flax param-pytree conversion."""

from focused_attention_vit_tpu.convert.torch_to_jax import (
    reference_vit_to_flax,
    reference_mhla_vit_to_flax,
    reference_vit_mhla_to_flax,
    reference_cross_block_to_flax,
    reference_cross_vit_to_flax,
    torchvision_vit_to_flax,
    hf_vit_to_flax,
    vit_params_to_mhla,
    vit_params_to_sppp,
    vit_params_to_cross,
    split_fused_qkv,
)

__all__ = [
    "reference_vit_to_flax",
    "reference_mhla_vit_to_flax",
    "reference_vit_mhla_to_flax",
    "reference_cross_block_to_flax",
    "reference_cross_vit_to_flax",
    "torchvision_vit_to_flax",
    "hf_vit_to_flax",
    "vit_params_to_mhla",
    "vit_params_to_sppp",
    "vit_params_to_cross",
    "split_fused_qkv",
]
