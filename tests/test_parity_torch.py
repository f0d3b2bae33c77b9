"""Golden-parity tests: converted reference-torch weights → identical logits.

The reference's *constructible* modules (models/vit.py, models/mhla.py,
models/vit_mhla.py, models/attention.py block level) are executed on CPU in
eval mode and compared against this framework with converted weights at
1e-4 (BASELINE.json pretrained-parity target). Unconstructible reference
paths (SPPPViT, CrossAttention*ViT — SURVEY.md §2.1) are covered by the
semantics tests in test_ops.py instead.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from focused_attention_vit_tpu import models as fmodels
from focused_attention_vit_tpu.convert import (
    reference_vit_to_flax,
    reference_vit_mhla_to_flax,
    reference_cross_block_to_flax,
)

ATOL = 1e-4

TINY = dict(
    img_size=16,
    patch_size=4,
    in_channels=3,
    num_classes=7,
    embed_dim=32,
    depth=2,
    num_heads=4,
    mlp_ratio=4.0,
    dropout=0.0,
    attn_dropout=0.0,
    embed_dropout=0.0,
)


def _rand_images(b=2, s=16, c=3, seed=0):
    rng = np.random.default_rng(seed)
    nchw = rng.normal(size=(b, c, s, s)).astype(np.float32)
    return nchw, nchw.transpose(0, 2, 3, 1)  # torch NCHW, jax NHWC


class TestVisionTransformerParity:
    def test_logits_match(self):
        from models.vit import VisionTransformer as TorchViT

        torch.manual_seed(0)
        tm = TorchViT(**TINY).eval()
        nchw, nhwc = _rand_images()
        with torch.no_grad():
            expect = tm(torch.from_numpy(nchw)).numpy()

        jm = fmodels.VisionTransformer(**TINY)
        params = reference_vit_to_flax(
            tm.state_dict(), TINY["depth"], num_heads=TINY["num_heads"]
        )
        got = np.asarray(jm.apply({"params": params}, jnp.asarray(nhwc)))
        np.testing.assert_allclose(got, expect, atol=ATOL)

    def test_forward_features_match(self):
        from models.vit import VisionTransformer as TorchViT

        torch.manual_seed(1)
        tm = TorchViT(**TINY).eval()
        nchw, nhwc = _rand_images(seed=1)
        with torch.no_grad():
            expect = tm.forward_features(torch.from_numpy(nchw)).numpy()

        jm = fmodels.VisionTransformer(**TINY)
        params = reference_vit_to_flax(
            tm.state_dict(), TINY["depth"], num_heads=TINY["num_heads"]
        )
        got = np.asarray(
            jm.apply(
                {"params": params}, jnp.asarray(nhwc), method="forward_features"
            )
        )
        np.testing.assert_allclose(got, expect, atol=ATOL)


class TestMHLAParity:
    @pytest.mark.parametrize("window,seq", [(5, 11), (7, 17), (7, 5)])
    def test_mhla_module(self, window, seq):
        """Bare MultiHeadLatentAttention vs reference (models/mhla.py:17-161),
        including edge windows (seq < window in the last case)."""
        from models.mhla import MultiHeadLatentAttention as TorchMHLA

        torch.manual_seed(2)
        d, h = 32, 4
        tm = TorchMHLA(embed_dim=d, num_heads=h, window_size=window).eval()
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, seq, d)).astype(np.float32)
        with torch.no_grad():
            expect = tm(torch.from_numpy(x)).numpy()

        jm = fmodels.MultiHeadLatentAttention(
            embed_dim=d, num_heads=h, window_size=window
        )
        sd = tm.state_dict()

        def lin(p):
            return {
                "kernel": sd[f"{p}.weight"].numpy().T,
                "bias": sd[f"{p}.bias"].numpy(),
            }

        hd = d // h
        params = {
            # Head-shaped projections (kernel [D,3,h,d] / [h,d,D] —
            # models/layers.py).
            "qkv": {
                "kernel": sd["qkv.weight"].numpy().T.reshape(d, 3, h, hd),
                "bias": sd["qkv.bias"].numpy().reshape(3, h, hd),
            },
            "latent_proj": lin("latent_proj"),
            "proj": {
                "kernel": sd["proj.weight"].numpy().T.reshape(h, hd, d),
                "bias": sd["proj.bias"].numpy(),
            },
        }
        got = np.asarray(jm.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, expect, atol=ATOL)

    @pytest.mark.parametrize("use_mhla", [True, False])
    def test_vit_mhla_model(self, use_mhla):
        """Full VisionTransformerMHLA parity in both attention modes
        (models/vit_mhla.py:112-267; the use_mhla=False mode exercises the
        torch nn.MultiheadAttention → fused-qkv mapping)."""
        from models.vit_mhla import VisionTransformerMHLA as TorchModel

        torch.manual_seed(3)
        cfg = dict(TINY, window_size=5)
        tm = TorchModel(**cfg, use_mhla=use_mhla).eval()
        nchw, nhwc = _rand_images(seed=3)
        with torch.no_grad():
            expect = tm(torch.from_numpy(nchw)).numpy()

        jm = fmodels.VisionTransformerMHLA(**cfg, use_mhla=use_mhla)
        params = reference_vit_mhla_to_flax(
            tm.state_dict(), cfg["depth"], use_mhla, num_heads=cfg["num_heads"]
        )
        got = np.asarray(jm.apply({"params": params}, jnp.asarray(nhwc)))
        np.testing.assert_allclose(got, expect, atol=ATOL)


class TestComplexityFormulaParity:
    @pytest.mark.parametrize(
        "cfg",
        [
            dict(img_size=224, patch_size=16, embed_dim=768, depth=12, num_heads=12),
            dict(img_size=224, patch_size=4, embed_dim=768, depth=12, num_heads=12),
            dict(img_size=32, patch_size=4, embed_dim=64, depth=2, num_heads=4,
                 mlp_ratio=2.0),
        ],
    )
    def test_matches_reference(self, cfg):
        """The analytical complexity model must match the reference's
        closed form number-for-number (utils/metrics.py:54-149) — the
        experiment CSVs carry these values."""
        from utils.metrics import calculate_vit_complexity as ref_fn

        from focused_attention_vit_tpu.utils.metrics import (
            calculate_vit_complexity as our_fn,
        )

        expect = ref_fn(**cfg)
        got = our_fn(**cfg)
        for key in ("parameters", "flops", "time_complexity",
                    "space_complexity_bytes", "space_complexity_mb"):
            assert got[key] == pytest.approx(expect[key]), key


class TestCrossAttentionParity:
    @pytest.mark.parametrize("use_multi_head", [False, True])
    def test_cross_block(self, use_multi_head):
        """CrossAttentionTransformerBlock parity in both modes — covers the
        full-dim vs head-dim scaling split
        (models/attention.py:63-64 vs :131)."""
        from models.attention import CrossAttentionTransformerBlock as TorchBlock

        torch.manual_seed(4)
        d, h = 32, 4
        tm = TorchBlock(
            embed_dim=d, num_heads=h, use_multi_head=use_multi_head
        ).eval()
        rng = np.random.default_rng(4)
        q = rng.normal(size=(2, 9, d)).astype(np.float32)
        kv = rng.normal(size=(2, 13, d)).astype(np.float32)
        with torch.no_grad():
            expect = tm(torch.from_numpy(q), torch.from_numpy(kv)).numpy()

        jm = fmodels.CrossAttentionTransformerBlock(
            embed_dim=d, num_heads=h, use_multi_head=use_multi_head
        )
        params = reference_cross_block_to_flax(tm.state_dict(), "")
        got = np.asarray(
            jm.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv))
        )
        np.testing.assert_allclose(got, expect, atol=ATOL)


def _fuzz_geometries(seed, n, mhla):
    """Seeded random model geometries (locally seeded rng so a failing
    id reproduces under ``pytest -k`` regardless of test order)."""
    rng = np.random.default_rng(seed)
    geoms = []
    for _ in range(n):
        patch = int(rng.choice([2, 4, 8]))
        grid = int(rng.integers(2, 6))  # S = grid² + 1 ∈ [5, 26]
        heads = int(rng.choice([1, 2, 4]))
        head_dim = int(rng.choice([4, 8, 16]))
        cfg = dict(
            img_size=patch * grid,
            patch_size=patch,
            in_channels=3,
            num_classes=int(rng.integers(2, 13)),
            embed_dim=heads * head_dim,
            depth=int(rng.integers(1, 4)),
            num_heads=heads,
            mlp_ratio=float(rng.choice([1.0, 2.0, 4.0])),
            dropout=0.0,
            attn_dropout=0.0,
            embed_dropout=0.0,
        )
        if mhla:
            # Odd windows only (the reference crashes on even W —
            # SURVEY §2.1); include S < W cases, which it does define.
            cfg["window_size"] = int(rng.choice([1, 3, 5, 7, 29]))
            cfg["use_mhla"] = bool(rng.integers(0, 2))
        geoms.append(cfg)
    return geoms


class TestGeometryFuzzParity:
    """Converted-weights logit parity fuzzed across random geometries.

    The fixed-geometry tests above pin one shape per module; this sweep
    drives the same state_dict→convert→apply path across seeded random
    (img, patch, D, h, depth, mlp_ratio, classes[, window]) tuples so a
    conversion or attention bug that only bites at particular head dims,
    token counts, or window/sequence relations cannot hide behind the
    fixed shapes."""

    @pytest.mark.parametrize(
        "cfg",
        _fuzz_geometries(seed=20260819, n=6, mhla=False),
        ids=lambda c: (
            f"img{c['img_size']}p{c['patch_size']}d{c['embed_dim']}"
            f"h{c['num_heads']}x{c['depth']}c{c['num_classes']}"
        ),
    )
    def test_vit_fuzz(self, cfg):
        from models.vit import VisionTransformer as TorchViT

        torch.manual_seed(11)
        tm = TorchViT(**cfg).eval()
        nchw, nhwc = _rand_images(s=cfg["img_size"], seed=11)
        with torch.no_grad():
            expect = tm(torch.from_numpy(nchw)).numpy()

        jm = fmodels.VisionTransformer(**cfg)
        params = reference_vit_to_flax(
            tm.state_dict(), cfg["depth"], num_heads=cfg["num_heads"]
        )
        got = np.asarray(jm.apply({"params": params}, jnp.asarray(nhwc)))
        np.testing.assert_allclose(got, expect, atol=ATOL)

    @pytest.mark.parametrize(
        "cfg",
        _fuzz_geometries(seed=20260820, n=6, mhla=True),
        ids=lambda c: (
            f"img{c['img_size']}p{c['patch_size']}d{c['embed_dim']}"
            f"h{c['num_heads']}x{c['depth']}w{c['window_size']}"
            f"{'M' if c['use_mhla'] else 'A'}"
        ),
    )
    def test_vit_mhla_fuzz(self, cfg):
        from models.vit_mhla import VisionTransformerMHLA as TorchModel

        use_mhla = cfg.pop("use_mhla")
        torch.manual_seed(12)
        tm = TorchModel(**cfg, use_mhla=use_mhla).eval()
        nchw, nhwc = _rand_images(s=cfg["img_size"], seed=12)
        with torch.no_grad():
            expect = tm(torch.from_numpy(nchw)).numpy()

        jm = fmodels.VisionTransformerMHLA(**cfg, use_mhla=use_mhla)
        params = reference_vit_mhla_to_flax(
            tm.state_dict(), cfg["depth"], use_mhla,
            num_heads=cfg["num_heads"],
        )
        got = np.asarray(jm.apply({"params": params}, jnp.asarray(nhwc)))
        np.testing.assert_allclose(got, expect, atol=ATOL)
