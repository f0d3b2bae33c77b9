"""E5 — pretrained ViT → MHLA fine-tune (reference: experiments/mhla_pretrained.py).

Surgery: converted ViT weights + identity latent_proj (reference:
:224-225). LR groups: body 1×, latent_proj 5×, head at head_learning_rate
(reference: :319-327); freeze keeps head + latent_proj trainable
(reference: :237-247). Complexity ratio W/(N+1) (reference: :264-283).
CSV: exp4_pretrained_mhla.csv (reference: :490-524).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

from focused_attention_vit_tpu.convert import vit_params_to_mhla
from focused_attention_vit_tpu.experiments.base import ExperimentBase
from focused_attention_vit_tpu.experiments.pretrained_common import PretrainedMixin
from focused_attention_vit_tpu.models import VisionTransformerMHLA
from focused_attention_vit_tpu.utils.metrics import calculate_vit_complexity


@dataclass
class PretrainedMHLAViTExperiment(PretrainedMixin, ExperimentBase):
    window_size: int = 7
    model_display_name: str = "Pretrained ViT + MHLA"
    csv_filename: str = "exp4_pretrained_mhla.csv"
    # Round 3: MHLA at S=197 runs the dense band-masked formulation, which
    # has dense attention's working set — the microbatch lever applies
    # again (977 vs 715 img/s on the flagship, BASELINE.md round 3).
    auto_microbatch: "int | None" = 16

    def _auto_microbatch_value(self):
        # Long S (roll-kernel band path): measured best at microbatch 1 —
        # 61.9 img/s vs 58.8 (mb2) / 53.6 (mb4) / 50.5 (mb8) at S=3137
        # b32 no-remat with the round-4 in-kernel-accumulation backward
        # (BASELINE.md "S=3137 attack #8"; the round-3 shift-band best
        # was mb4 at 48.0, attack #6). mb=1 divides every batch, so no
        # divisibility fallback is needed at long S.
        from focused_attention_vit_tpu.ops.window import DENSE_BAND_MAX_SEQ

        s = (self.img_size // self.patch_size) ** 2 + 1
        if s > DENSE_BAND_MAX_SEQ:
            return 1
        return self.auto_microbatch

    def build_model(self):
        return VisionTransformerMHLA(
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
            window_size=self.window_size,
            use_mhla=True,
            remat=self.remat,
            remat_policy=self.remat_policy,
            scan_layers=self.scan_layers,
            dtype=self.jnp_dtype,
        )

    def surgery(self, vit_params: Dict[str, Any]) -> Dict[str, Any]:
        return vit_params_to_mhla(
            vit_params, self.depth, self.embed_dim // self.num_heads
        )

    def label_fn(self, path: str) -> str:
        if path.startswith("head"):
            return "head"
        if "latent_proj" in path:
            return "latent"
        return "frozen" if self._is_frozen_path(path, True) else "body"

    def group_lrs(self) -> Dict[str, float]:
        return {
            "body": self.learning_rate,
            "latent": self.learning_rate * 5,  # reference: :320-327
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
        num_tokens = (self.img_size // self.patch_size) ** 2 + 1
        ratio = self.window_size / num_tokens  # reference: :274
        self.metrics["traditional_complexity"] = traditional
        self.metrics["complexity_reduction"] = {
            "ratio": ratio,
            "window_size": self.window_size,
            "num_tokens": num_tokens,
        }
        return {
            # Reference adds depth·D latent params (:280 — per-head latent
            # proj is shared, d×d + d per block; reference approximates).
            "parameters": traditional["parameters"] + self.depth * self.embed_dim,
            "flops": traditional["flops"] * ratio,
            "time_complexity": traditional["time_complexity"] * ratio,
            "space_complexity_bytes": traditional["space_complexity_bytes"],
            "space_complexity_mb": traditional["space_complexity_bytes"]
            / (1024 * 1024),
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
            if k == "num_heads":
                out["window_size"] = self.window_size
                out["complexity_reduction_ratio"] = self.metrics[
                    "complexity_reduction"
                ]["ratio"]
                out["total_parameters"] = self.param_counts["total_params"]
                out["trainable_parameters"] = self.param_counts["trainable_params"]
                out["frozen_parameters"] = self.param_counts["frozen_params"]
        return out
