"""E2 — scratch SPPP ViT (reference: experiments/sppp.py).

Adds token-reduction accounting: FLOPs scaled by the squared token ratio
plus SLIC/pooling overhead estimates (reference: experiments/sppp.py:150-191).
CSV: exp2_sppp.csv (reference: experiments/sppp.py:365-397). Note the
reference default batch_size=124 (experiments/sppp.py:53).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

from focused_attention_vit_tpu.experiments.base import ExperimentBase
from focused_attention_vit_tpu.models import SPPPViT
from focused_attention_vit_tpu.utils.metrics import calculate_vit_complexity


@dataclass
class SPPPExperiment(ExperimentBase):
    num_superpixels: int = 16
    compactness: float = 0.1
    pooling_type: str = "mean"
    slic_connectivity: str = "auto"  # 'auto'|'on'|'off' (ops/slic)
    slic_iters: int = 10  # skimage-faithful default; CLI --slic_iters
    batch_size: int = 124  # reference default (experiments/sppp.py:53)
    model_display_name: str = "SPPP ViT"
    csv_filename: str = "exp2_sppp.csv"
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
        attention_scaling = token_ratio**2
        # Reference overhead estimates (experiments/sppp.py:171-174).
        slic_overhead = self.img_size * self.img_size * 10
        pooling_overhead = num_patches * self.embed_dim

        self.metrics["traditional_complexity"] = traditional
        self.metrics["token_reduction"] = {
            "traditional_tokens": tokens_traditional,
            "sppp_tokens": tokens_sppp,
            "reduction_factor": tokens_traditional / tokens_sppp,
        }
        return {
            "parameters": traditional["parameters"],
            "flops": traditional["flops"] * attention_scaling
            + slic_overhead + pooling_overhead,
            "time_complexity": traditional["time_complexity"] * attention_scaling
            + slic_overhead + pooling_overhead,
            "space_complexity_bytes": traditional["space_complexity_bytes"]
            * token_ratio,
            "space_complexity_mb": traditional["space_complexity_bytes"]
            * token_ratio / (1024 * 1024),
        }

    def results_row(self) -> Dict[str, Any]:
        row = super().results_row()
        tr = self.metrics["token_reduction"]
        extra = {
            "num_superpixels": self.num_superpixels,
            "traditional_tokens": tr["traditional_tokens"],
            "sppp_tokens": tr["sppp_tokens"],
            "token_reduction_factor": tr["reduction_factor"],
        }
        # Schema order per reference: insert after num_heads.
        out = {}
        for k, v in row.items():
            out[k] = v
            if k == "num_heads":
                out.update(extra)
        return out


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="SPPP ViT Experiment")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--patch_size", type=int, default=4)
    p.add_argument("--num_superpixels", type=int, default=16)
    p.add_argument("--pooling_type", type=str, default="mean",
                   choices=["mean", "max", "attention"])
    p.add_argument("--batch_size", type=int, default=124)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--subset_size", type=int, default=None)
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--results_dir", type=str, default="./results")
    args = p.parse_args(argv)

    SPPPExperiment(
        img_size=args.img_size,
        patch_size=args.patch_size,
        num_superpixels=args.num_superpixels,
        pooling_type=args.pooling_type,
        batch_size=args.batch_size,
        epochs=args.epochs,
        subset_size=args.subset_size,
        data_dir=args.data_dir,
        results_dir=args.results_dir,
    ).run()


if __name__ == "__main__":
    main()
