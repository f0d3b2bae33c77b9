"""Shared machinery for the four pretrained fine-tune experiments.

Replaces the reference's per-experiment tensor-by-tensor "weight surgery"
blocks (e.g. experiments/mhla_pretrained.py:166-234) with one path:

  checkpoint → convert (convert/torch_to_jax) → variant surgery transform
  → shape-checked merge into the freshly-initialized model pytree.

The shape-checked merge copies every converted tensor whose shape matches
the target and keeps random init otherwise (logged) — the robust version of
the reference's ``load_state_dict(strict=False)`` + head stripping
(utils/data_utils.py:408-426). This also absorbs geometry mismatches the
reference crashes on (e.g. its default patch_size=4 models against
vit_b_16's 16×16 patch embedding).

Learning-rate groups and freezing are expressed as one
``optax.multi_transform`` (see train/state.make_grouped_optimizer).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import numpy as np

from focused_attention_vit_tpu.data.pretrained import load_pretrained_vit_params
from focused_attention_vit_tpu.train.state import (
    make_adamw,
    make_grouped_optimizer,
)

logger = logging.getLogger(__name__)


def merge_matching(init_params, ckpt_params, prefix="") -> Tuple[Any, int, int]:
    """Recursively copy ckpt leaves into init where shapes match.

    Returns (merged, n_copied, n_skipped).
    """
    copied = skipped = 0

    def rec(init, ckpt, path):
        nonlocal copied, skipped
        if isinstance(init, Mapping):
            out = {}
            for k, v in init.items():
                if isinstance(ckpt, Mapping) and k in ckpt:
                    out[k] = rec(v, ckpt[k], f"{path}/{k}")
                else:
                    out[k] = v
            return out
        ck = np.asarray(ckpt)
        if tuple(ck.shape) == tuple(np.asarray(init).shape):
            copied += 1
            return ck.astype(np.asarray(init).dtype)
        logger.info(
            "pretrained merge: shape mismatch at %s (ckpt %s vs model %s) — "
            "keeping random init",
            path, ck.shape, np.asarray(init).shape,
        )
        skipped += 1
        return init

    merged = rec(init_params, ckpt_params, prefix)
    return merged, copied, skipped


@dataclass
class PretrainedMixin:
    """Extra config fields shared by the pretrained experiments
    (reference constructor kwargs, e.g.
    experiments/mhla_pretrained.py:33-68)."""

    pretrained_model_variant: str = "vit_b_16"
    pretrained_source: str = "torchvision"
    pretrained_cache_dir: str = "./pretrained_weights"
    # bool: freeze the whole pretrained body; list[str]: freeze parameters
    # whose path contains any listed substring (reference semantics:
    # utils/data_utils.py:529-539).
    freeze_layers: Any = False
    head_learning_rate: float = 1e-3
    strict_pretrained: bool = False

    def _is_frozen_path(self, path: str, body_frozen_default: bool) -> bool:
        if isinstance(self.freeze_layers, (list, tuple)):
            return any(name in path for name in self.freeze_layers)
        return bool(self.freeze_layers) and body_frozen_default

    # Subclasses set this to transform a plain-ViT pytree into the variant
    # layout (identity for traditional_pretrained).
    def surgery(self, vit_params: Dict[str, Any]) -> Dict[str, Any]:
        return vit_params

    # ---- ExperimentBase hooks -------------------------------------------
    def build_params(self, model, rng, sample):
        # Pretrained checkpoints and the surgery transforms are loop-form
        # (blocks_0..blocks_{depth-1}); with --scan_layers (or --pp, which
        # needs the scan-form stacked stack) init/merge in loop form and
        # stack at the end.
        scan_form = bool(getattr(model, "scan_layers", False))
        init_model = (
            model.clone(scan_layers=False, pp_mesh=None)
            if scan_form
            else model
        )
        variables = init_model.init(rng, sample)
        init_params = variables["params"]

        ckpt, _cfg = load_pretrained_vit_params(
            variant=self.pretrained_model_variant,
            source=self.pretrained_source,
            cache_dir=self.pretrained_cache_dir,
            num_classes=self.num_classes,
            strict=self.strict_pretrained,
        )
        self.pretrained_loaded = ckpt is not None
        if ckpt is None:
            params = init_params
        else:
            adapted = self.surgery(ckpt)
            params, copied, skipped = merge_matching(init_params, adapted)
            logger.info(
                "pretrained merge: %d tensors copied, %d kept at random init",
                copied, skipped,
            )

        if scan_form:
            from focused_attention_vit_tpu.models.layers import (
                stack_block_params,
            )

            params = stack_block_params(params, self.depth)
        self._record_param_counts(params)
        return params

    def _record_param_counts(self, params):
        label_tree = self._label_tree(params)
        total = trainable = 0
        for label, leaf in zip(
            jax.tree.leaves(label_tree), jax.tree.leaves(params)
        ):
            n = int(np.prod(np.asarray(leaf).shape))
            total += n
            if label != "frozen":
                trainable += n
        self.param_counts = {
            "total_params": total,
            "trainable_params": trainable,
            "frozen_params": total - trainable,
        }
        print(
            f"Model setup complete. Total parameters: {total:,}, "
            f"Trainable: {trainable:,}"
        )

    # ---- optimizer groups ------------------------------------------------
    def label_fn(self, path: str) -> str:
        """Default two-group policy (traditional_pretrained,
        reference: experiments/traditional_pretrained.py:196-209):
        head at head_learning_rate, body at learning_rate; with
        freeze_layers=True the body is frozen; with a list, matching
        parameter paths are frozen."""
        if path.startswith("head"):
            return "head"
        return "frozen" if self._is_frozen_path(path, True) else "body"

    def group_lrs(self) -> Dict[str, float]:
        return {"body": self.learning_rate, "head": self.head_learning_rate}

    def _label_tree(self, params):
        from focused_attention_vit_tpu.train.state import _path_labels

        return _path_labels(params, self.label_fn)

    def build_optimizer(self, params):
        # Each group's base LR rides the same schedule shape (lr_for is
        # identity under the reference's constant-LR protocol).
        group_lrs = {k: self.lr_for(v) for k, v in self.group_lrs().items()}
        return make_grouped_optimizer(
            params,
            self.label_fn,
            group_lrs,
            weight_decay=self.weight_decay,
            grad_clip_norm=self.grad_clip_norm,
            mu_dtype=self._mu_dtype(),
        )
