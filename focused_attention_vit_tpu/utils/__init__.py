"""Utilities: analytical complexity, timing/memory measurement, patchify,
visualization."""

from focused_attention_vit_tpu.utils.metrics import (
    count_parameters,
    calculate_model_size,
    calculate_vit_complexity,
    measure_inference_time,
    measure_training_time,
    measure_memory_usage,
    benchmark_model,
)
from focused_attention_vit_tpu.utils.patchify import (
    patchify_image,
    unpatchify_image,
)

__all__ = [
    "count_parameters",
    "calculate_model_size",
    "calculate_vit_complexity",
    "measure_inference_time",
    "measure_training_time",
    "measure_memory_usage",
    "benchmark_model",
    "patchify_image",
    "unpatchify_image",
]
