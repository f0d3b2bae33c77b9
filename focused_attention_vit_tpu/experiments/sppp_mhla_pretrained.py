"""E6 — pretrained ViT → SPPP+MHLA fine-tune
(reference: experiments/sppp_mhla_pretrained.py).

Surgery: drop pos_embed (SPPP) + identity latent_proj (MHLA). Four LR
groups (body 1×, latent 5×, SPPP components 2×, head; reference: :348-362 —
the SPPP components carry no parameters in either implementation, so that
group is structurally empty). Combined complexity ratio token_ratio ×
window_ratio (reference: :281-306). CSV: exp5_pretrained_sppp_mhla.csv
(reference: :525-562).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

from focused_attention_vit_tpu.convert import (
    vit_params_to_mhla,
    vit_params_to_sppp,
)
from focused_attention_vit_tpu.experiments.pretrained_common import PretrainedMixin
from focused_attention_vit_tpu.experiments.sppp import SPPPExperiment
from focused_attention_vit_tpu.models import SPPPViTMHLA
from focused_attention_vit_tpu.utils.metrics import calculate_vit_complexity


@dataclass
class PretrainedSPPPMHLAExperiment(PretrainedMixin, SPPPExperiment):
    window_size: int = 7
    model_display_name: str = "Pretrained ViT + SPPP + MHLA"
    csv_filename: str = "exp5_pretrained_sppp_mhla.csv"
    auto_microbatch: "int | None" = None  # windowed-MHLA/SPPP: chunking hurts (see base)

    def build_model(self):
        return SPPPViTMHLA(
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
            window_size=self.window_size,
            use_mhla=True,
            dtype=self.jnp_dtype,
        )

    def surgery(self, vit_params: Dict[str, Any]) -> Dict[str, Any]:
        p = vit_params_to_sppp(vit_params)
        return vit_params_to_mhla(
            p, self.depth, self.embed_dim // self.num_heads,
            keep_pos_embed=False,
        )

    def label_fn(self, path: str) -> str:
        if path.startswith("head"):
            return "head"
        if "latent_proj" in path:
            return "latent"
        if any(x in path for x in ("segmentation", "patch_mapper", "pooling")):
            return "sppp"  # structurally empty — parameter-free ops
        return "frozen" if self._is_frozen_path(path, True) else "body"

    def group_lrs(self) -> Dict[str, float]:
        return {
            "body": self.learning_rate,
            "latent": self.learning_rate * 5,
            "sppp": self.learning_rate * 2,  # reference: :356-358
            "head": self.head_learning_rate,
        }

    def theoretical_metrics(self) -> Dict[str, Any]:
        traditional = calculate_vit_complexity(
            img_size=self.img_size,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            in_channels=self.in_channels,
        )
        num_patches = (self.img_size // self.patch_size) ** 2
        tokens_traditional = num_patches + 1
        tokens_sppp = self.num_superpixels + 1
        token_ratio = tokens_sppp / tokens_traditional
        window_ratio = self.window_size / tokens_sppp
        combined = token_ratio * window_ratio  # reference: :294
        slic_overhead = self.img_size * self.img_size * 10
        pooling_overhead = num_patches * self.embed_dim

        self.metrics["traditional_complexity"] = traditional
        self.metrics["token_reduction"] = {
            "traditional_tokens": tokens_traditional,
            "sppp_tokens": tokens_sppp,
            "reduction_factor": tokens_traditional / tokens_sppp,
        }
        self.metrics["complexity_reduction"] = {
            "token_ratio": token_ratio,
            "window_ratio": window_ratio,
            "combined_ratio": combined,
        }
        return {
            "parameters": traditional["parameters"] + self.depth * self.embed_dim,
            "flops": traditional["flops"] * combined
            + slic_overhead + pooling_overhead,
            "time_complexity": traditional["time_complexity"] * combined
            + slic_overhead + pooling_overhead,
            "space_complexity_bytes": traditional["space_complexity_bytes"]
            * token_ratio,
            "space_complexity_mb": traditional["space_complexity_bytes"]
            * token_ratio / (1024 * 1024),
        }

    def results_row(self) -> Dict[str, Any]:
        row = super().results_row()
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
            if k == "num_superpixels":
                out["window_size"] = self.window_size
            if k == "token_reduction_factor":
                out["complexity_reduction_ratio"] = self.metrics[
                    "complexity_reduction"
                ]["combined_ratio"]
                out["total_parameters"] = self.param_counts["total_params"]
                out["trainable_parameters"] = self.param_counts["trainable_params"]
                out["frozen_parameters"] = self.param_counts["frozen_params"]
        return out
