"""E7/E8 — cross-attention experiments + batch runners
(reference: experiments/attention.py:32-819).

One parameterized experiment over (use_sppp × use_pretrained ×
use_multi_head) with the reference's dynamic CSV naming
(exp{4,5}_{experiment_type}[_pretrained]_{model_type}.csv,
reference: :558-562) and the two batch runners 4A-4D / 5A-5D
(reference: :628-819). The pretrained branch splits the fused qkv into
separate q/k/v projections (reference: :245-266) — done by
convert.vit_params_to_cross.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

from focused_attention_vit_tpu.convert import vit_params_to_cross, vit_params_to_sppp
from focused_attention_vit_tpu.experiments.base import ExperimentBase
from focused_attention_vit_tpu.experiments.pretrained_common import PretrainedMixin
from focused_attention_vit_tpu.models import CrossAttentionViT, CrossAttentionSPPPViT
from focused_attention_vit_tpu.utils.metrics import calculate_vit_complexity


@dataclass
class CrossAttentionExperiment(PretrainedMixin, ExperimentBase):
    use_sppp: bool = False
    num_superpixels: int = 16
    compactness: float = 0.1
    pooling_type: str = "mean"
    slic_connectivity: str = "auto"  # 'auto'|'on'|'off' (ops/slic)
    slic_iters: int = 10  # skimage-faithful default; CLI --slic_iters
    use_pretrained: bool = False
    use_multi_head: bool = False
    # Cross-attention models mix SPPP/dense paths; auto-chunking is only a
    # measured win for the plain dense-ViT geometry, so keep it off.
    auto_microbatch: "int | None" = None

    @property
    def experiment_type(self) -> str:
        return (
            "multihead_cross_attention" if self.use_multi_head else "cross_attention"
        )

    @property
    def model_type(self) -> str:
        return "sppp" if self.use_sppp else "traditional"

    @property
    def csv_filename(self) -> str:  # type: ignore[override]
        n = 5 if self.use_multi_head else 4
        if self.use_pretrained:
            return f"exp{n}_{self.experiment_type}_pretrained_{self.model_type}.csv"
        return f"exp{n}_{self.experiment_type}_{self.model_type}.csv"

    @csv_filename.setter
    def csv_filename(self, _value):  # dataclass assigns the default; ignore
        pass

    @property
    def model_display_name(self) -> str:  # type: ignore[override]
        mh = "MultiHead " if self.use_multi_head else ""
        sp = "SPPP " if self.use_sppp else ""
        return f"{mh}CrossAttention {sp}ViT"

    @model_display_name.setter
    def model_display_name(self, _value):
        pass

    def build_model(self):
        common = dict(
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
            use_multi_head=self.use_multi_head,
            dtype=self.jnp_dtype,
        )
        if self.use_sppp:
            return CrossAttentionSPPPViT(
                num_superpixels=self.num_superpixels,
                compactness=self.compactness,
                pooling_type=self.pooling_type,
                slic_connectivity=self._slic_connectivity(),
                slic_iters=self.slic_iters,
                **common,
            )
        return CrossAttentionViT(**common)

    # ---- pretrained handling --------------------------------------------
    def build_params(self, model, rng, sample):
        if not self.use_pretrained:
            self.pretrained_loaded = False
            variables = model.init(rng, sample)
            params = variables["params"]
            self._record_param_counts(params)
            return params
        return super().build_params(model, rng, sample)

    def surgery(self, vit_params: Dict[str, Any]) -> Dict[str, Any]:
        p = vit_params
        if self.use_sppp:
            p = vit_params_to_sppp(p)
        return vit_params_to_cross(
            p, self.depth, keep_pos_embed=not self.use_sppp
        )

    def label_fn(self, path: str) -> str:
        if path.startswith("head"):
            return "head"
        frozen = self.use_pretrained and self._is_frozen_path(path, True)
        return "frozen" if frozen else "body"

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
        if not self.use_sppp:
            return traditional
        num_patches = (self.img_size // self.patch_size) ** 2
        tokens_traditional = num_patches + 1
        tokens_sppp = self.num_superpixels + 1
        token_ratio = tokens_sppp / tokens_traditional
        self.metrics["token_reduction"] = {
            "traditional_tokens": tokens_traditional,
            "sppp_tokens": tokens_sppp,
            "reduction_factor": tokens_traditional / tokens_sppp,
        }
        return {
            "parameters": traditional["parameters"],
            "flops": traditional["flops"] * token_ratio**2,
            "time_complexity": traditional["time_complexity"] * token_ratio**2,
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
            "use_pretrained": self.use_pretrained,
            "pretrained_source": self.pretrained_source if self.use_pretrained else "None",
            "pretrained_model_variant": self.pretrained_model_variant
            if self.use_pretrained else "None",
            "freeze_layers": str(self.freeze_layers) if self.use_pretrained else "False",
        }
        for k, v in row.items():
            if k == "model":
                continue
            out[k] = v
            if k == "num_heads":
                out["use_multi_head"] = self.use_multi_head
                out["total_parameters"] = self.param_counts["total_params"]
                out["trainable_parameters"] = self.param_counts["trainable_params"]
                out["frozen_parameters"] = self.param_counts["frozen_params"]
        if self.use_sppp:
            tr = self.metrics["token_reduction"]
            out.update(
                num_superpixels=self.num_superpixels,
                traditional_tokens=tr["traditional_tokens"],
                sppp_tokens=tr["sppp_tokens"],
                token_reduction_factor=tr["reduction_factor"],
            )
        return out


def _args_to_kwargs(args) -> Dict[str, Any]:
    return dict(
        img_size=args.img_size,
        patch_size=args.patch_size,
        num_classes=10 if args.dataset == "cifar10" else 100,
        embed_dim=args.embed_dim,
        depth=args.depth,
        num_heads=args.num_heads,
        mlp_ratio=args.mlp_ratio,
        dropout=args.dropout,
        attn_dropout=args.attn_dropout,
        embed_dropout=args.embed_dropout,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        data_dir=args.data_dir,
        results_dir=args.results_dir,
        subset_size=args.subset_size,
        num_superpixels=args.num_superpixels,
        compactness=args.compactness,
        pooling_type=args.pooling_type,
        slic_connectivity=getattr(args, "slic_connectivity", "auto"),
        slic_iters=getattr(args, "slic_iters", 10),
        pretrained_model_variant=args.pretrained_model_variant,
        pretrained_source=args.pretrained_source,
        freeze_layers=args.freeze_layers,
        dataset=args.dataset,
        seed=args.seed,
        num_devices=getattr(args, "num_devices", None),
        tp=getattr(args, "tp", 1),
        microbatch=getattr(args, "microbatch", None),
    )


def _run_suite(args, use_multi_head: bool):
    """The 4 sub-experiments A-D (reference: experiments/attention.py:628-819):
    scratch, SPPP, pretrained, SPPP+pretrained."""
    base = _args_to_kwargs(args)
    letter = "5" if use_multi_head else "4"
    configs = [
        ("A: scratch", dict(use_sppp=False, use_pretrained=False)),
        ("B: SPPP", dict(use_sppp=True, use_pretrained=False)),
        ("C: pretrained", dict(use_sppp=False, use_pretrained=True)),
        ("D: SPPP+pretrained", dict(use_sppp=True, use_pretrained=True)),
    ]
    for name, cfg in configs:
        print(f"=== Experiment {letter}{name} ===")
        CrossAttentionExperiment(
            **base, use_multi_head=use_multi_head, **cfg
        ).run()


def run_cross_attention_experiments(args):
    """Batch runner 4A-4D (reference: experiments/attention.py:628-722)."""
    _run_suite(args, use_multi_head=False)


def run_multihead_cross_attention_experiments(args):
    """Batch runner 5A-5D (reference: experiments/attention.py:725-819)."""
    _run_suite(args, use_multi_head=True)
