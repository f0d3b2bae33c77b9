"""Experiment pipelines — 1:1 with the reference CLI surface.

Reference → rebuild mapping (SURVEY.md §2.2):

* E1 traditional                → experiments/traditional.py
* E2 sppp                       → experiments/sppp.py
* E3 traditional_pretrained     → experiments/traditional_pretrained.py
* E4 sppp_pretrained            → experiments/sppp_pretrained.py
* E5 mhla_pretrained            → experiments/mhla_pretrained.py
* E6 sppp_mhla_pretrained       → experiments/sppp_mhla_pretrained.py
* E7/E8 cross-attention (+ batch runners) → experiments/attention.py
"""

from focused_attention_vit_tpu.experiments.traditional import (
    TraditionalViTExperiment,
)
from focused_attention_vit_tpu.experiments.sppp import SPPPExperiment
from focused_attention_vit_tpu.experiments.traditional_pretrained import (
    PretrainedTraditionalViTExperiment,
)
from focused_attention_vit_tpu.experiments.sppp_pretrained import (
    PretrainedSPPPExperiment,
)
from focused_attention_vit_tpu.experiments.mhla_pretrained import (
    PretrainedMHLAViTExperiment,
)
from focused_attention_vit_tpu.experiments.sppp_mhla_pretrained import (
    PretrainedSPPPMHLAExperiment,
)
from focused_attention_vit_tpu.experiments.attention import (
    CrossAttentionExperiment,
    run_cross_attention_experiments,
    run_multihead_cross_attention_experiments,
)

__all__ = [
    "TraditionalViTExperiment",
    "SPPPExperiment",
    "PretrainedTraditionalViTExperiment",
    "PretrainedSPPPExperiment",
    "PretrainedMHLAViTExperiment",
    "PretrainedSPPPMHLAExperiment",
    "CrossAttentionExperiment",
    "run_cross_attention_experiments",
    "run_multihead_cross_attention_experiments",
]
