"""Converter-format tests: torchvision and HuggingFace layouts, merge rules."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from focused_attention_vit_tpu import models as fmodels
from focused_attention_vit_tpu.convert import (
    torchvision_vit_to_flax,
    hf_vit_to_flax,
    split_fused_qkv,
)
from focused_attention_vit_tpu.experiments.pretrained_common import merge_matching

D, DEPTH, HEADS, P, IMG = 32, 2, 4, 8, 32


def _tv_state_dict(rng, num_classes=1000):
    """Synthesized torchvision-vit_b_16-layout state dict (shapes per the
    torchvision VisionTransformer key schema the converter targets)."""
    n_tokens = (IMG // P) ** 2 + 1
    sd = {
        "conv_proj.weight": rng.normal(size=(D, 3, P, P)).astype(np.float32),
        "conv_proj.bias": rng.normal(size=(D,)).astype(np.float32),
        "class_token": rng.normal(size=(1, 1, D)).astype(np.float32),
        "encoder.pos_embedding": rng.normal(size=(1, n_tokens, D)).astype(np.float32),
        "encoder.ln.weight": np.ones(D, np.float32),
        "encoder.ln.bias": np.zeros(D, np.float32),
        "heads.head.weight": rng.normal(size=(num_classes, D)).astype(np.float32),
        "heads.head.bias": np.zeros(num_classes, np.float32),
    }
    for i in range(DEPTH):
        p = f"encoder.layers.encoder_layer_{i}"
        sd.update({
            f"{p}.ln_1.weight": np.ones(D, np.float32),
            f"{p}.ln_1.bias": np.zeros(D, np.float32),
            f"{p}.self_attention.in_proj_weight": rng.normal(size=(3 * D, D)).astype(np.float32),
            f"{p}.self_attention.in_proj_bias": np.zeros(3 * D, np.float32),
            f"{p}.self_attention.out_proj.weight": rng.normal(size=(D, D)).astype(np.float32),
            f"{p}.self_attention.out_proj.bias": np.zeros(D, np.float32),
            f"{p}.ln_2.weight": np.ones(D, np.float32),
            f"{p}.ln_2.bias": np.zeros(D, np.float32),
            f"{p}.mlp.linear_1.weight": rng.normal(size=(4 * D, D)).astype(np.float32),
            f"{p}.mlp.linear_1.bias": np.zeros(4 * D, np.float32),
            f"{p}.mlp.linear_2.weight": rng.normal(size=(D, 4 * D)).astype(np.float32),
            f"{p}.mlp.linear_2.bias": np.zeros(D, np.float32),
        })
    return sd


def test_torchvision_layout_roundtrip(rng):
    sd = _tv_state_dict(rng)
    params = torchvision_vit_to_flax(sd, depth=DEPTH, num_classes=1000, num_heads=HEADS)
    model = fmodels.VisionTransformer(
        img_size=IMG, patch_size=P, num_classes=1000,
        embed_dim=D, depth=DEPTH, num_heads=HEADS,
    )
    x = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32))
    logits = model.apply({"params": params}, x)
    assert logits.shape == (2, 1000)
    assert np.isfinite(np.asarray(logits)).all()
    # Conv kernel folded in (p1, p2, c) order.
    k = params["patch_embed"]["projection"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(k)[0 * 3 + 0, 5],  # (p1=0,p2=0,c=0) → out 5
        sd["conv_proj.weight"][5, 0, 0, 0],
    )


def test_torchvision_head_dropped_on_class_mismatch(rng):
    sd = _tv_state_dict(rng, num_classes=1000)
    params = torchvision_vit_to_flax(sd, depth=DEPTH, num_classes=10, num_heads=HEADS)
    assert "head" not in params  # caller keeps its random head (reference
    # strip-head behaviour, utils/data_utils.py:408-426)


def test_hf_layout_conversion():
    """Real HF ViTModel (random init, local) → converted params produce
    features close to HF's own forward (differences bounded by the
    layernorm-eps mismatch: HF 1e-12 vs the reference's 1e-5)."""
    transformers = pytest.importorskip("transformers")
    import torch

    cfg = transformers.ViTConfig(
        hidden_size=D, num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        intermediate_size=4 * D, image_size=IMG, patch_size=P,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.ViTModel(cfg, add_pooling_layer=False).eval()
    params = hf_vit_to_flax(hf.state_dict(), depth=DEPTH, num_heads=HEADS)

    rng = np.random.default_rng(0)
    nchw = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        expect = hf(torch.from_numpy(nchw)).last_hidden_state[:, 0].numpy()

    model = fmodels.VisionTransformer(
        img_size=IMG, patch_size=P, num_classes=5,
        embed_dim=D, depth=DEPTH, num_heads=HEADS,
    )
    # head is not in the converted params; merge into random init.
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3))
    )["params"]
    merged, copied, skipped = merge_matching(init, params)
    assert copied > 0
    feats = model.apply(
        {"params": merged},
        jnp.asarray(nchw.transpose(0, 2, 3, 1)),
        method="forward_features",
    )
    np.testing.assert_allclose(
        np.asarray(feats), expect, atol=5e-3, rtol=5e-3
    )


def test_split_fused_qkv_roundtrip(rng):
    k = rng.normal(size=(D, 3 * D)).astype(np.float32)
    b = rng.normal(size=(3 * D,)).astype(np.float32)
    (qw, qb), (kw, kb), (vw, vb) = split_fused_qkv(k, b)
    np.testing.assert_array_equal(np.concatenate([qw, kw, vw], axis=1), k)
    np.testing.assert_array_equal(np.concatenate([qb, kb, vb]), b)


def test_split_fused_qkv_head_shaped(rng):
    """Head-shaped [D, 3, h, d] input splits identically to the flat
    layout it reshapes from."""
    flat_k = rng.normal(size=(D, 3 * D)).astype(np.float32)
    flat_b = rng.normal(size=(3 * D,)).astype(np.float32)
    k4 = flat_k.reshape(D, 3, HEADS, D // HEADS)
    b3 = flat_b.reshape(3, HEADS, D // HEADS)
    flat = split_fused_qkv(flat_k, flat_b)
    headed = split_fused_qkv(k4, b3)
    for (fw, fb), (hw, hb) in zip(flat, headed):
        np.testing.assert_array_equal(fw, hw)
        np.testing.assert_array_equal(fb, hb)


def test_merge_matching_shapes(rng):
    init = {"a": np.zeros((2, 3), np.float32), "b": {"c": np.zeros(4, np.float32)}}
    ckpt = {"a": np.ones((2, 3), np.float32), "b": {"c": np.ones(5, np.float32)}}
    merged, copied, skipped = merge_matching(init, ckpt)
    assert copied == 1 and skipped == 1
    np.testing.assert_array_equal(merged["a"], 1.0)
    np.testing.assert_array_equal(merged["b"]["c"], 0.0)


def test_split_fused_qkv_biasless():
    """qkv_bias=False checkpoints: the split path must tolerate a missing
    bias like the fuse path does (zeros out)."""
    rng = np.random.default_rng(3)
    kern = rng.normal(size=(8, 3, 2, 4)).astype(np.float32)
    (qw, qb), (kw, kb), (vw, vb) = split_fused_qkv(kern, None)
    assert qw.shape == (8, 8) and qb.shape == (8,)
    assert (qb == 0).all() and (kb == 0).all() and (vb == 0).all()


def test_surgery_block_holes_raise():
    """A checkpoint whose block stack has holes can only be corruption;
    depth mismatches (deeper/shallower checkpoint) are legitimate merge
    cases and stay allowed."""
    from focused_attention_vit_tpu.convert.torch_to_jax import (
        vit_params_to_mhla,
    )

    params = {"blocks_0": {"attn": {}}, "blocks_2": {"attn": {}}}
    with pytest.raises(ValueError, match="holes"):
        vit_params_to_mhla(params, depth=4, head_dim=8)
    # deeper checkpoint than model: allowed (prefix merge)
    ok = {f"blocks_{i}": {"attn": {}} for i in range(3)}
    out = vit_params_to_mhla(ok, depth=2, head_dim=8)
    assert "latent_proj" in out["blocks_0"]["attn"]


def test_pretrained_cache_keyed_on_source(tmp_path):
    """A torchvision-derived msgpack cache must NOT satisfy an HF request
    (different pretrainings, different numerics)."""
    from focused_attention_vit_tpu.data import pretrained as P

    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    # Plant a fake torchvision-keyed msgpack cache.
    from focused_attention_vit_tpu.train.checkpoint import save_params

    fake = {"cls_token": np.zeros((1, 1, 4), np.float32)}
    save_params(P._msgpack_path(cache, "vit_b_16"), fake)
    # torchvision request hits it; HF request must MISS it (and, with no
    # local HF snapshot in this environment, fall back to None).
    params_tv, _ = P.load_pretrained_vit_params(
        "vit_b_16", source="torchvision", cache_dir=cache
    )
    assert params_tv is not None
    params_hf, _ = P.load_pretrained_vit_params(
        "vit_b_16", source="huggingface", cache_dir=cache
    )
    assert params_hf is None
