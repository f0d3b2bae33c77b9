"""E4 — pretrained ViT → SPPP fine-tune (reference: experiments/sppp_pretrained.py).

Surgery: converted ViT weights minus the learned pos_embed (SPPP uses the
dynamic centroid encoding; reference copies everything else, :177-232, and
copies the head only when num_classes==1000, :230-232 — here the
shape-checked merge implements the same rule). CSV: exp3_pretrained_sppp.csv
(reference: :487-521).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

from focused_attention_vit_tpu.convert import vit_params_to_sppp
from focused_attention_vit_tpu.experiments.base import ExperimentBase
from focused_attention_vit_tpu.experiments.pretrained_common import PretrainedMixin
from focused_attention_vit_tpu.experiments.sppp import SPPPExperiment
from focused_attention_vit_tpu.models import SPPPViT


@dataclass
class PretrainedSPPPExperiment(PretrainedMixin, SPPPExperiment):
    model_display_name: str = "Pretrained SPPP ViT"
    csv_filename: str = "exp3_pretrained_sppp.csv"
    auto_microbatch: "int | None" = None  # windowed-MHLA/SPPP: chunking hurts (see base)

    def build_model(self):
        return SPPPViT(
            img_size=self.img_size,
            patch_size=self.patch_size,
            in_channels=self.in_channels,
            num_classes=self.num_classes,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            attn_dropout=self.attn_dropout,
            embed_dropout=self.embed_dropout,
            num_superpixels=self.num_superpixels,
            compactness=self.compactness,
            pooling_type=self.pooling_type,
            slic_connectivity=self._slic_connectivity(),
            slic_iters=self.slic_iters,
            dtype=self.jnp_dtype,
        )

    def surgery(self, vit_params: Dict[str, Any]) -> Dict[str, Any]:
        return vit_params_to_sppp(vit_params)

    def results_row(self) -> Dict[str, Any]:
        row = super().results_row()  # SPPP row with token-reduction cols
        row.pop("parameters", None)
        out = {
            "model": self.model_display_name,
            "pretrained_source": self.pretrained_source,
            "pretrained_model_variant": self.pretrained_model_variant,
            "freeze_layers": str(self.freeze_layers),
        }
        for k, v in row.items():
            if k == "model":
                continue
            out[k] = v
            if k == "token_reduction_factor":
                out["total_parameters"] = self.param_counts["total_params"]
                out["trainable_parameters"] = self.param_counts["trainable_params"]
                out["frozen_parameters"] = self.param_counts["frozen_params"]
        return out


# Reference spelling kept importable (main.py:43 imports this name).
SPPPPretrainedViTExperiment = PretrainedSPPPExperiment
