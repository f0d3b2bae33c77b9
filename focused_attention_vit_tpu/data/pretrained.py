"""Pretrained ViT weight acquisition + conversion cache.

The reference downloads torchvision/HF ViT checkpoints at run time and
caches the state dict to disk (utils/data_utils.py:247-384). This rebuild:

* looks for a cached checkpoint under ``cache_dir`` —
  ``<variant>_weights.pth`` (torch state dict, the reference's own cache
  file name, utils/data_utils.py:291-303), a HuggingFace local snapshot, or
  a pre-converted ``<variant>_flax.msgpack``;
* converts to a Flax param pytree via convert/torch_to_jax.py and caches
  the converted pytree;
* attempts a live download only when the environment allows it (this
  machine has zero egress), and otherwise either raises
  (``strict=True``) or falls back to random initialization with a loud
  warning so every pipeline remains runnable offline.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from focused_attention_vit_tpu.convert import (
    torchvision_vit_to_flax,
    hf_vit_to_flax,
)

logger = logging.getLogger(__name__)

# torchvision variant table mirrored from the reference
# (utils/data_utils.py:275-281).
TORCHVISION_VARIANTS = {
    "vit_b_16": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "vit_b_32": dict(patch_size=32, embed_dim=768, depth=12, num_heads=12),
    "vit_l_16": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16),
    "vit_l_32": dict(patch_size=32, embed_dim=1024, depth=24, num_heads=16),
    "vit_h_14": dict(patch_size=14, embed_dim=1280, depth=32, num_heads=16),
}


def variant_config(variant: str) -> Dict[str, int]:
    if variant not in TORCHVISION_VARIANTS:
        raise ValueError(
            f"Unknown pretrained variant {variant!r}; known: "
            f"{sorted(TORCHVISION_VARIANTS)}"
        )
    return dict(TORCHVISION_VARIANTS[variant], img_size=224)


def _load_torch_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj


def _msgpack_path(cache_dir: str, variant: str) -> str:
    return os.path.join(cache_dir, f"{variant}_flax.msgpack")


def _write_msgpack_cache(path: str, params: Dict[str, Any]) -> None:
    """Write-through cache of the converted pytree (checkpoint's own head
    kept), generalizing the reference's save-the-downloaded-state-dict cache
    (utils/data_utils.py:291-303) to the converted form: subsequent loads
    never touch torch."""
    # One atomic-msgpack writer in the codebase: save_params already does
    # the pid-unique temp + os.replace discipline (and its to_bytes output
    # is msgpack_restore-compatible for a plain dict pytree — flax
    # to_state_dict is the identity there).
    from focused_attention_vit_tpu.train.checkpoint import save_params

    save_params(path, params)
    logger.info("Cached converted params to %s", path)


def _read_msgpack_cache(path: str) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _apply_head_rule(
    params: Dict[str, Any], num_classes: Optional[int]
) -> Dict[str, Any]:
    """Drop the classifier head when its class count mismatches
    ``num_classes`` — the reference's strip-head-keys behaviour
    (utils/data_utils.py:408-426). The caller random-inits the new head."""
    if (
        num_classes is not None
        and "head" in params
        and int(np.asarray(params["head"]["kernel"]).shape[-1]) != num_classes
    ):
        params = dict(params)
        params.pop("head")
    return params


def load_pretrained_vit_params(
    variant: str = "vit_b_16",
    source: str = "torchvision",
    cache_dir: str = "./pretrained_weights",
    num_classes: Optional[int] = None,
    strict: bool = False,
) -> Tuple[Optional[Dict[str, Any]], Dict[str, int]]:
    """Return (flax_params_or_None, variant_config).

    ``None`` params mean no checkpoint was obtainable and ``strict`` was
    False — the caller should random-init (a warning has been logged). When
    ``num_classes`` differs from the checkpoint head, the head is dropped,
    matching the reference's strip-head-keys behaviour
    (utils/data_utils.py:408-426).
    """
    cfg = variant_config(variant)
    os.makedirs(cache_dir, exist_ok=True)
    # Cache entries are keyed on SOURCE as well as variant: torchvision
    # in1k and HF in21k are different pretrainings with different
    # numerics — a cache written by one must never satisfy a request for
    # the other. (The torchvision names keep the reference's own cache
    # filename convention, utils/data_utils.py:291-303.)
    msg = (
        _msgpack_path(cache_dir, f"{variant}_hf")
        if source == "huggingface"
        else _msgpack_path(cache_dir, variant)
    )

    # 0. Pre-converted Flax pytree cache: fastest, torch-free.
    if os.path.exists(msg):
        params = _read_msgpack_cache(msg)
        logger.info("Loaded converted msgpack cache %s", msg)
        return _apply_head_rule(params, num_classes), cfg

    # 1. Reference-style torch cache file (converted full, then cached) —
    #    torchvision-sourced only.
    pth = os.path.join(cache_dir, f"{variant}_weights.pth")
    if source != "huggingface" and os.path.exists(pth):
        sd = _load_torch_state_dict(pth)
        logger.info("Loaded cached torch checkpoint %s", pth)
        params = torchvision_vit_to_flax(
            sd,
            depth=cfg["depth"],
            num_classes=None,
            num_heads=cfg["num_heads"],
        )
        _write_msgpack_cache(msg, params)
        return _apply_head_rule(params, num_classes), cfg

    # 2. HuggingFace local snapshot (source='huggingface',
    #    reference: utils/data_utils.py:327-381).
    if source == "huggingface":
        try:
            from transformers import ViTModel

            hf_name = {
                "vit_b_16": "google/vit-base-patch16-224-in21k",
                "vit_l_16": "google/vit-large-patch16-224-in21k",
            }.get(variant, variant)
            model = ViTModel.from_pretrained(hf_name, local_files_only=True)
        except Exception as e:  # no snapshot / no network — ONLY this is
            # a legitimate miss; conversion errors below must propagate
            # (a mapping bug mislabeled as a cache miss silently
            # random-inits the whole fine-tune).
            logger.info("No local HF snapshot (%s)", e)
            model = None
        if model is not None:
            sd = model.state_dict()
            logger.info("Loaded local HF snapshot %s", hf_name)
            params = hf_vit_to_flax(
                sd,
                depth=cfg["depth"],
                num_classes=None,
                num_heads=cfg["num_heads"],
            )
            _write_msgpack_cache(msg, params)
            return _apply_head_rule(params, num_classes), cfg

    # 3. Live torchvision download — unavailable in this environment (no
    #    torchvision, zero egress); kept for API completeness.
    try:
        import torchvision.models as tvm  # noqa: F401

        fn = getattr(tvm, variant)
        model = fn(weights="DEFAULT")
        sd = model.state_dict()
        import torch

        torch.save(sd, pth)
        params = torchvision_vit_to_flax(
            sd,
            depth=cfg["depth"],
            num_classes=None,
            num_heads=cfg["num_heads"],
        )
        _write_msgpack_cache(msg, params)
        return _apply_head_rule(params, num_classes), cfg
    except Exception as e:
        msg = (
            f"Pretrained weights for {variant!r} unavailable "
            f"(no cache under {cache_dir}, no network egress): {e}"
        )
        if strict:
            raise FileNotFoundError(msg) from e
        logger.warning("%s — falling back to RANDOM INITIALIZATION.", msg)
        return None, cfg
