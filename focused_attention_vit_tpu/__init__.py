"""focused_attention_vit_tpu — a TPU-native JAX/Flax/Pallas framework.

A ground-up rebuild of the capabilities of the Focused-Attention ViT stack
(reference: zser092/Focused-Attention-ViT) designed TPU-first:

* ``ops``      — functional compute primitives (patch embedding, attention,
                 MHLA banded attention, SLIC superpixel segmentation, segment
                 pooling, positional encodings) with Pallas TPU kernels for
                 the hot paths.
* ``models``   — Flax modules: VisionTransformer, VisionTransformerMHLA,
                 SPPPViT, SPPPViTMHLA, PretrainedViTWithMHLA,
                 PretrainedSPPPViTWithMHLA, CrossAttentionViT,
                 CrossAttentionSPPPViT.
* ``parallel`` — device-mesh construction and sharding rules (DP/TP via
                 ``jax.sharding`` + ``jit``; collectives ride ICI).
* ``data``     — CIFAR-10/100 pipeline with on-device augmentation.
* ``train``    — TrainState, jitted train/eval steps, metric accumulation,
                 Orbax checkpointing.
* ``convert``  — torch/HF ViT checkpoint → Flax-param-pytree converter.
* ``experiments`` — the eight experiment pipelines matching the reference
                 CLI surface and CSV schemas (reference: main.py:64-149).
* ``utils``    — analytical complexity model, timing, memory, visualization.
"""

__version__ = "0.1.0"
