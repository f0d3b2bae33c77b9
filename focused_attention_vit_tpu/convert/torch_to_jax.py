"""Checkpoint conversion: torch state dicts → Flax param pytrees.

One correct, tested converter replaces the reference's four ad-hoc
tensor-by-tensor "weight surgery" blocks, which contain indexing bugs
(e.g. reading weights off a weightless Rearrange,
experiments/mhla_pretrained.py:188; SURVEY.md §2.1). Covered formats:

* the reference's own ``VisionTransformer`` state dict (golden-parity tests);
* the reference's MHLA / cross-attention module state dicts;
* torchvision ``vit_b_16``-style checkpoints (utils/data_utils.py:275-314);
* HuggingFace ``ViTModel`` checkpoints with separate q/k/v, concatenated
  into the fused qkv layout (utils/data_utils.py:442-519).

Plus the "surgery" transforms that adapt a converted ViT pytree into the
MHLA / SPPP / cross-attention variants (experiments/*_pretrained.py),
including the identity ``latent_proj`` init so MHLA starts as a faithful
windowed approximation of the pretrained MHA
(experiments/mhla_pretrained.py:224-225).

Linear-layer convention: torch stores [out, in]; Flax Dense kernels are
[in, out] — every weight is transposed on the way through.

Self-attention layout: the Flax modules project qkv with a head-shaped
``nn.DenseGeneral`` — kernel ``[D, 3, h, d]``, bias ``[3, h, d]`` — and the
output projection with kernel ``[h, d, D]`` (see models/layers.py). The
torch fused layout ([q|k|v]-major rows with contiguous heads inside each,
reference models/vit.py:90-92) reshapes into this exactly: row index
``= qkv*D + head*d + i``.
"""

from __future__ import annotations

import logging

from typing import Any, Dict, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    """torch tensor / array-like → numpy (no torch import required).

    Half-precision checkpoints (e.g. the fp16 fixture
    tools/make_pretrained_fixture.py writes) are upcast to f32 — params
    are kept in f32 throughout this framework."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    t = np.asarray(t)
    if t.dtype in (np.float16, np.float64):
        t = t.astype(np.float32)
    return t


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _fused_qkv_heads(
    weight: Any, bias: Any | None, num_heads: int
) -> Dict[str, np.ndarray]:
    """torch fused qkv ``[3D, D_in]`` (+bias ``[3D]``) → head-shaped kernel
    ``[D_in, 3, h, d]`` / bias ``[3, h, d]``."""
    w = _np(weight).T  # [D_in, 3D]
    d_in = w.shape[0]
    head_dim = w.shape[1] // 3 // num_heads
    out = {"kernel": w.reshape(d_in, 3, num_heads, head_dim)}
    if bias is not None:
        out["bias"] = _np(bias).reshape(3, num_heads, head_dim)
    return out


def _head_proj(
    weight: Any, bias: Any | None, num_heads: int
) -> Dict[str, np.ndarray]:
    """torch out-projection ``[D_out, D_in]`` → head-major kernel
    ``[h, d, D_out]`` (rows of D_in are head-contiguous)."""
    w = _np(weight).T  # [D_in, D_out]
    d_out = w.shape[1]
    head_dim = w.shape[0] // num_heads
    out = {"kernel": w.reshape(num_heads, head_dim, d_out)}
    if bias is not None:
        out["bias"] = _np(bias)
    return out


def _attn_qkv(sd: Mapping[str, Any], prefix: str, num_heads: int):
    return _fused_qkv_heads(
        sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"), num_heads
    )


def _attn_proj(sd: Mapping[str, Any], prefix: str, num_heads: int):
    return _head_proj(
        sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"), num_heads
    )


def _conv_patch_to_linear(weight: Any) -> np.ndarray:
    """Conv2d patch embed [D, C, p, p] → linear kernel [p*p*C, D].

    The flattened-patch ordering is (p1, p2, c) — see ops/patch_embed.py —
    so the conv kernel is permuted to (p1, p2, c, d) before flattening.
    """
    w = _np(weight)  # [D, C, p, p]
    d = w.shape[0]
    w = w.transpose(2, 3, 1, 0)  # [p, p, C, D]
    return w.reshape(-1, d)


def _mlp_from(sd, fc1: str, fc2: str) -> Dict[str, Any]:
    return {"fc1": _linear(sd, fc1), "fc2": _linear(sd, fc2)}


# ---------------------------------------------------------------------------
# Reference-format converters
# ---------------------------------------------------------------------------

def reference_vit_to_flax(
    sd: Mapping[str, Any], depth: int, num_heads: int = 12
) -> Dict[str, Any]:
    """Reference ``VisionTransformer`` state dict → Flax params.

    Reference module layout: models/vit.py:182-274 (patch_embed.projection
    is a Sequential whose index 1 is the Linear).
    """
    params: Dict[str, Any] = {
        "patch_embed": {"projection": _linear(sd, "patch_embed.projection.1")},
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "norm": _layernorm(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "attn": {
                "qkv": _attn_qkv(sd, f"{p}.attn.qkv", num_heads),
                "proj": _attn_proj(sd, f"{p}.attn.proj", num_heads),
            },
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "mlp": _mlp_from(sd, f"{p}.mlp.fc1", f"{p}.mlp.fc2"),
        }
    return params


def reference_mhla_vit_to_flax(
    sd: Mapping[str, Any], depth: int, num_heads: int = 12
) -> Dict[str, Any]:
    """Reference MHLA-block models (models/mhla_models.py:22-175 layout;
    MHLA block MLP is an anonymous Sequential: mlp.0 / mlp.3,
    models/mhla.py:197-203)."""
    params: Dict[str, Any] = {
        "patch_embed": {"projection": _linear(sd, "patch_embed.projection.1")},
        "cls_token": _np(sd["cls_token"]),
        "norm": _layernorm(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    if "pos_embed" in sd:
        params["pos_embed"] = _np(sd["pos_embed"])
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "attn": {
                "qkv": _attn_qkv(sd, f"{p}.attn.qkv", num_heads),
                "latent_proj": _linear(sd, f"{p}.attn.latent_proj"),
                "proj": _attn_proj(sd, f"{p}.attn.proj", num_heads),
            },
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "mlp": _mlp_from(sd, f"{p}.mlp.0", f"{p}.mlp.3"),
        }
    return params


def reference_vit_mhla_to_flax(
    sd: Mapping[str, Any], depth: int, use_mhla: bool, num_heads: int = 12
) -> Dict[str, Any]:
    """Reference ``VisionTransformerMHLA`` state dict → Flax params.

    With ``use_mhla=True`` blocks carry qkv/latent_proj/proj
    (models/vit_mhla.py:48-55); with ``use_mhla=False`` they carry a torch
    ``nn.MultiheadAttention`` (in_proj_weight/out_proj,
    models/vit_mhla.py:57-62) which maps onto the fused qkv layout. The MLP
    uses named fc1/fc2 (models/vit.py:117-122 via models/vit_mhla.py:68-73).
    """
    params: Dict[str, Any] = {
        "patch_embed": {"projection": _linear(sd, "patch_embed.projection.1")},
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "norm": _layernorm(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        if use_mhla:
            attn = {
                "qkv": _attn_qkv(sd, f"{p}.attn.qkv", num_heads),
                "latent_proj": _linear(sd, f"{p}.attn.latent_proj"),
                "proj": _attn_proj(sd, f"{p}.attn.proj", num_heads),
            }
        else:
            attn = {
                "qkv": _fused_qkv_heads(
                    sd[f"{p}.attn.in_proj_weight"],
                    sd[f"{p}.attn.in_proj_bias"],
                    num_heads,
                ),
                "proj": _attn_proj(sd, f"{p}.attn.out_proj", num_heads),
            }
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "attn": attn,
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "mlp": _mlp_from(sd, f"{p}.mlp.fc1", f"{p}.mlp.fc2"),
        }
    return params


def reference_cross_block_to_flax(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """One CrossAttentionTransformerBlock (models/attention.py:151-219)."""
    p = prefix
    return {
        "norm1_query": _layernorm(sd, f"{p}norm1_query"),
        "norm1_kv": _layernorm(sd, f"{p}norm1_kv"),
        "attn": {
            "q_proj": _linear(sd, f"{p}attn.q_proj"),
            "k_proj": _linear(sd, f"{p}attn.k_proj"),
            "v_proj": _linear(sd, f"{p}attn.v_proj"),
            "out_proj": _linear(sd, f"{p}attn.out_proj"),
        },
        "norm2": _layernorm(sd, f"{p}norm2"),
        "mlp": _mlp_from(sd, f"{p}mlp.0", f"{p}mlp.3"),
    }


def reference_cross_vit_to_flax(
    sd: Mapping[str, Any], depth: int, conv_patch: bool = True
) -> Dict[str, Any]:
    """Reference CrossAttention*ViT state dict → Flax params.

    The reference patch embed is Conv2d-based (models/attention.py:271-276);
    its kernel is folded into the linear patch embedding.
    """
    if conv_patch:
        proj = {
            "kernel": _conv_patch_to_linear(sd["patch_embed.0.weight"]),
            "bias": _np(sd["patch_embed.0.bias"]),
        }
    else:
        proj = _linear(sd, "patch_embed.projection.1")
    params: Dict[str, Any] = {
        "patch_embed": {"projection": proj},
        "cls_token": _np(sd["cls_token"]),
        "norm": _layernorm(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    if "pos_embed" in sd:
        params["pos_embed"] = _np(sd["pos_embed"])
    for i in range(depth):
        params[f"blocks_{i}"] = reference_cross_block_to_flax(sd, f"blocks.{i}.")
    return params


# ---------------------------------------------------------------------------
# External pretrained formats
# ---------------------------------------------------------------------------

def torchvision_vit_to_flax(
    sd: Mapping[str, Any],
    depth: int = 12,
    num_classes: int | None = None,
    num_heads: int = 12,
) -> Dict[str, Any]:
    """torchvision ``vit_b_16``-family state dict → Flax params.

    Key layout per torchvision VisionTransformer; the fused
    ``in_proj_weight`` of nn.MultiheadAttention is already [3D, D] in
    [q|k|v] order, matching our qkv layout. When ``num_classes`` differs
    from the checkpoint's head, the head is freshly shaped and must be
    re-initialized by the caller (the reference strips head keys the same
    way, utils/data_utils.py:408-426).
    """
    params: Dict[str, Any] = {
        "patch_embed": {
            "projection": {
                "kernel": _conv_patch_to_linear(sd["conv_proj.weight"]),
                "bias": _np(sd["conv_proj.bias"]),
            }
        },
        "cls_token": _np(sd["class_token"]),
        "pos_embed": _np(sd["encoder.pos_embedding"]),
        "norm": _layernorm(sd, "encoder.ln"),
    }
    head_w_key = "heads.head.weight"
    if head_w_key in sd and (
        num_classes is None or _np(sd[head_w_key]).shape[0] == num_classes
    ):
        params["head"] = _linear(sd, "heads.head")
    for i in range(depth):
        p = f"encoder.layers.encoder_layer_{i}"
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{p}.ln_1"),
            "attn": {
                "qkv": _fused_qkv_heads(
                    sd[f"{p}.self_attention.in_proj_weight"],
                    sd[f"{p}.self_attention.in_proj_bias"],
                    num_heads,
                ),
                "proj": _attn_proj(sd, f"{p}.self_attention.out_proj", num_heads),
            },
            "norm2": _layernorm(sd, f"{p}.ln_2"),
            "mlp": _mlp_from(sd, f"{p}.mlp.linear_1", f"{p}.mlp.linear_2"),
        }
    return params


def hf_vit_to_flax(
    sd: Mapping[str, Any],
    depth: int = 12,
    num_classes: int | None = None,
    num_heads: int = 12,
) -> Dict[str, Any]:
    """HuggingFace ``ViTModel`` state dict → Flax params.

    Separate q/k/v projections are concatenated into the fused qkv layout
    — the same mapping the reference performs at
    utils/data_utils.py:461-519.
    """
    def cat_qkv(p: str) -> Dict[str, np.ndarray]:
        qw = _np(sd[f"{p}.attention.attention.query.weight"])
        kw = _np(sd[f"{p}.attention.attention.key.weight"])
        vw = _np(sd[f"{p}.attention.attention.value.weight"])
        qb = _np(sd[f"{p}.attention.attention.query.bias"])
        kb = _np(sd[f"{p}.attention.attention.key.bias"])
        vb = _np(sd[f"{p}.attention.attention.value.bias"])
        return _fused_qkv_heads(
            np.concatenate([qw, kw, vw], axis=0),
            np.concatenate([qb, kb, vb], axis=0),
            num_heads,
        )

    params: Dict[str, Any] = {
        "patch_embed": {
            "projection": {
                "kernel": _conv_patch_to_linear(
                    sd["embeddings.patch_embeddings.projection.weight"]
                ),
                "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
            }
        },
        "cls_token": _np(sd["embeddings.cls_token"]),
        "pos_embed": _np(sd["embeddings.position_embeddings"]),
        "norm": _layernorm(sd, "layernorm"),
    }
    for i in range(depth):
        p = f"encoder.layer.{i}"
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{p}.layernorm_before"),
            "attn": {
                "qkv": cat_qkv(p),
                "proj": _attn_proj(sd, f"{p}.attention.output.dense", num_heads),
            },
            "norm2": _layernorm(sd, f"{p}.layernorm_after"),
            "mlp": _mlp_from(sd, f"{p}.intermediate.dense", f"{p}.output.dense"),
        }
    if "classifier.weight" in sd and (
        num_classes is None or _np(sd["classifier.weight"]).shape[0] == num_classes
    ):
        params["head"] = _linear(sd, "classifier")
    return params


def split_fused_qkv(qkv_kernel: np.ndarray, qkv_bias=None):
    """Head-shaped fused qkv kernel [D, 3, h, d] → (q, k, v) kernels
    [D, D] + biases [D].

    Used when adapting a standard ViT into the cross-attention models,
    which keep separate flat q/k/v projections — the inverse of the HF
    concat (the reference does this split at
    experiments/attention.py:245-266). Flat [D, 3D] input (the torch fused
    layout transposed) is also accepted. ``qkv_bias`` may be None
    (qkv_bias=False checkpoints) — the returned biases are then zeros,
    mirroring the fuse path's tolerance of missing biases.
    """
    qkv_kernel = np.asarray(qkv_kernel)
    d_in = qkv_kernel.shape[0]
    d_out = (
        qkv_kernel.shape[1] // 3
        if qkv_kernel.ndim == 2
        else qkv_kernel.shape[2] * qkv_kernel.shape[3]
    )
    if qkv_bias is None:
        qkv_bias = (
            np.zeros((3 * d_out,), np.float32)
            if qkv_kernel.ndim == 2
            else np.zeros((3,) + qkv_kernel.shape[2:], np.float32)
        )
    qkv_bias = np.asarray(qkv_bias)
    if qkv_kernel.ndim == 2:  # flat [D, 3D]
        qw, kw, vw = np.split(qkv_kernel, 3, axis=1)
        qb, kb, vb = np.split(qkv_bias, 3, axis=0)
        return (qw, qb), (kw, kb), (vw, vb)
    ws = [qkv_kernel[:, i].reshape(d_in, -1) for i in range(3)]
    bs = [qkv_bias[i].reshape(-1) for i in range(3)]
    return (ws[0], bs[0]), (ws[1], bs[1]), (ws[2], bs[2])


# ---------------------------------------------------------------------------
# Surgery transforms (ViT params → variant params)
# ---------------------------------------------------------------------------

def _check_depth(vit_params: Mapping[str, Any], depth: int) -> None:
    """Validate the checkpoint's block stack and surface depth mismatches.

    A checkpoint deeper than the target model is legitimate (the
    shape-checked merge copies the matching prefix — e.g. a 2-block test
    model fine-tuning from ViT-B/12), and a shallower one random-inits
    the tail; both are logged. A stack with HOLES (blocks_0, blocks_2 but
    no blocks_1) can only be corruption — that is an error."""
    have = sorted(
        int(k.split("_", 1)[1])
        for k in vit_params
        if k.startswith("blocks_")
    )
    if have != list(range(len(have))):
        raise ValueError(
            f"checkpoint block stack has holes: {have}"
        )
    if have and len(have) != depth:
        logging.getLogger(__name__).info(
            "surgery: checkpoint has %d blocks, target model depth %d — "
            "the merge copies the matching prefix",
            len(have), depth,
        )


def vit_params_to_mhla(
    vit_params: Mapping[str, Any],
    depth: int,
    head_dim: int,
    keep_pos_embed: bool = True,
) -> Dict[str, Any]:
    """ViT pytree → MHLA-block pytree with identity latent_proj.

    Identity init makes MHLA(W→∞) ≈ the pretrained MHA at load time
    (reference: experiments/mhla_pretrained.py:224-225).
    """
    _check_depth(vit_params, depth)
    out: Dict[str, Any] = {}
    for key, val in vit_params.items():
        if key == "pos_embed" and not keep_pos_embed:
            continue
        if key.startswith("blocks_"):
            blk = dict(val)
            attn = dict(blk["attn"])
            attn["latent_proj"] = {
                "kernel": np.eye(head_dim, dtype=np.float32),
                "bias": np.zeros((head_dim,), dtype=np.float32),
            }
            blk["attn"] = attn
            out[key] = blk
        else:
            out[key] = val
    return out


def vit_params_to_sppp(vit_params: Mapping[str, Any]) -> Dict[str, Any]:
    """ViT pytree → SPPP pytree: drop the learned pos_embed (SPPP uses the
    parameter-free dynamic positional encoding,
    reference: experiments/sppp_pretrained.py:177-232 copies everything but
    the position embeddings)."""
    return {k: v for k, v in vit_params.items() if k != "pos_embed"}


def vit_params_to_cross(
    vit_params: Mapping[str, Any], depth: int, keep_pos_embed: bool = True
) -> Dict[str, Any]:
    """ViT pytree → cross-attention pytree.

    The fused qkv is split into q/k/v projections and norm1 is duplicated
    into norm1_query / norm1_kv (both normalize the same tokens when the
    block is called as self-attention) — the reference surgery at
    experiments/attention.py:203-293.
    """
    _check_depth(vit_params, depth)
    out: Dict[str, Any] = {}
    for key, val in vit_params.items():
        if key == "pos_embed" and not keep_pos_embed:
            continue
        if key.startswith("blocks_"):
            blk = dict(val)
            attn_in = blk["attn"]
            (qw, qb), (kw, kb), (vw, vb) = split_fused_qkv(
                np.asarray(attn_in["qkv"]["kernel"]),
                attn_in["qkv"].get("bias"),
            )
            out_proj = dict(attn_in["proj"])
            out_k = np.asarray(out_proj["kernel"])
            if out_k.ndim == 3:  # head-major [h, d, D] → flat [D, D]
                out_proj["kernel"] = out_k.reshape(-1, out_k.shape[-1])
            blk = {
                "norm1_query": blk["norm1"],
                "norm1_kv": {
                    "scale": np.array(blk["norm1"]["scale"]),
                    "bias": np.array(blk["norm1"]["bias"]),
                },
                "attn": {
                    "q_proj": {"kernel": qw, "bias": qb},
                    "k_proj": {"kernel": kw, "bias": kb},
                    "v_proj": {"kernel": vw, "bias": vb},
                    "out_proj": out_proj,
                },
                "norm2": blk["norm2"],
                "mlp": blk["mlp"],
            }
            out[key] = blk
        else:
            out[key] = val
    return out
