"""Full-geometry golden parity vs the torch reference (slow; in the
regular cadence — VERDICT round 1 weak #7).

Executes the reference VisionTransformer at ViT-B/16 @224 on torch CPU and
compares converted-weight logits at 1e-4 (the BASELINE.json
pretrained-parity bar) at the real production geometry, plus the remat
flag's output-invariance. Opt OUT with FAVIT_FAST_TESTS=1 for quick local
iteration (it is one torch-CPU forward, ~minutes).
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("FAVIT_FAST_TESTS") == "1",
    reason="full-scale parity skipped (FAVIT_FAST_TESTS=1)",
)

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from focused_attention_vit_tpu import models as fmodels
from focused_attention_vit_tpu.convert import reference_vit_to_flax

CFG = dict(
    img_size=224, patch_size=16, in_channels=3, num_classes=10,
    embed_dim=768, depth=12, num_heads=12,
    dropout=0.0, attn_dropout=0.0, embed_dropout=0.0,
)


def test_vit_b16_full_scale_parity():
    from models.vit import VisionTransformer as TorchViT

    torch.manual_seed(0)
    tm = TorchViT(**CFG).eval()
    rng = np.random.default_rng(0)
    nchw = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        expect = tm(torch.from_numpy(nchw)).numpy()

    params = reference_vit_to_flax(tm.state_dict(), CFG["depth"])
    jm = fmodels.VisionTransformer(**CFG, use_flash=False)
    got = np.asarray(
        jm.apply({"params": params}, jnp.asarray(nchw.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, expect, atol=1e-4)

    # remat must be output-invariant.
    jm_remat = fmodels.VisionTransformer(**CFG, use_flash=False, remat=True)
    got_r = np.asarray(
        jm_remat.apply(
            {"params": params}, jnp.asarray(nchw.transpose(0, 2, 3, 1))
        )
    )
    np.testing.assert_allclose(got_r, got, atol=1e-5, rtol=1e-5)
