"""Construction / shape / jit-stability tests for the model zoo."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from focused_attention_vit_tpu import models as fmodels

TINY = dict(
    img_size=16,
    patch_size=4,
    num_classes=5,
    embed_dim=32,
    depth=2,
    num_heads=4,
)

SPPP_EXTRA = dict(num_superpixels=4, slic_iters=3)


def _images(b=2):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(b, 16, 16, 3)).astype(np.float32))


ALL_MODELS = [
    ("vit", lambda: fmodels.VisionTransformer(**TINY)),
    ("vit_mhla_on", lambda: fmodels.VisionTransformerMHLA(**TINY, window_size=5, use_mhla=True)),
    ("vit_mhla_off", lambda: fmodels.VisionTransformerMHLA(**TINY, use_mhla=False)),
    ("sppp", lambda: fmodels.SPPPViT(**TINY, **SPPP_EXTRA)),
    ("sppp_mhla", lambda: fmodels.SPPPViTMHLA(**TINY, **SPPP_EXTRA, window_size=3, use_mhla=True)),
    ("pre_mhla", lambda: fmodels.PretrainedViTWithMHLA(**TINY, window_size=4)),
    ("pre_sppp_mhla", lambda: fmodels.PretrainedSPPPViTWithMHLA(**TINY, **SPPP_EXTRA, window_size=4)),
    ("cross", lambda: fmodels.CrossAttentionViT(**TINY, use_multi_head=False)),
    ("cross_mh", lambda: fmodels.CrossAttentionViT(**TINY, use_multi_head=True)),
    ("cross_sppp", lambda: fmodels.CrossAttentionSPPPViT(**TINY, **SPPP_EXTRA)),
]


@pytest.mark.parametrize("name,make", ALL_MODELS, ids=[m[0] for m in ALL_MODELS])
def test_forward_shapes(name, make):
    model = make()
    x = _images()
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (2, TINY["num_classes"])
    assert np.isfinite(np.asarray(logits)).all()
    feats = model.apply(variables, x, method="forward_features")
    assert feats.shape == (2, TINY["embed_dim"])


def test_vit_param_count_matches_formula():
    """Parameter count equals the analytical model (reference formula at
    utils/metrics.py:78-101 — embeddings + per-block attn/MLP/LN + head)."""
    model = fmodels.VisionTransformer(**TINY)
    variables = model.init(jax.random.PRNGKey(0), _images())
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    d, depth, p, ncls = 32, 2, 4, 5
    n_patches = (16 // 4) ** 2
    expect = (
        (p * p * 3 + 1) * d          # patch embed
        + (n_patches + 1) * d + d    # pos embed + cls
        + depth * (
            3 * d * d + 3 * d        # qkv
            + d * d + d              # proj
            + 2 * (2 * d)            # two layernorms
            + d * 4 * d + 4 * d      # fc1
            + 4 * d * d + d          # fc2
        )
        + 2 * d                      # final norm
        + d * ncls + ncls            # head
    )
    assert n_params == expect


def test_jit_no_recompile_across_batches():
    """Same shapes → one compilation; new batch data must not retrace."""
    model = fmodels.VisionTransformer(**TINY)
    x = _images()
    variables = model.init(jax.random.PRNGKey(0), x)

    traces = 0

    @jax.jit
    def fwd(v, x):
        nonlocal traces
        traces += 1
        return model.apply(v, x)

    fwd(variables, x)
    fwd(variables, x + 1.0)
    assert traces == 1


@pytest.mark.parametrize("maker", [
    lambda: fmodels.VisionTransformer(**TINY, attn_dropout=0.5),
    lambda: fmodels.VisionTransformerMHLA(
        **TINY, window_size=5, use_mhla=True, attn_dropout=0.5
    ),
    lambda: fmodels.CrossAttentionViT(**TINY, use_multi_head=True, attn_dropout=0.5),
    lambda: fmodels.CrossAttentionViT(**TINY, use_multi_head=False, attn_dropout=0.5),
], ids=["mha", "mhla", "xattn_mh", "xattn"])
def test_attention_weight_dropout(maker):
    """Attention-weight dropout is stochastic in train mode (reference
    applies dropout to softmax weights) and absent in eval mode."""
    model = maker()
    x = _images()
    variables = model.init(jax.random.PRNGKey(0), x)
    t1 = model.apply(variables, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(variables, x, False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    e1 = model.apply(variables, x)
    e2 = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_dropout_training_mode_differs():
    model = fmodels.VisionTransformer(**TINY, dropout=0.5)
    x = _images()
    variables = model.init(jax.random.PRNGKey(0), x)
    out1 = model.apply(
        variables, x, False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    out2 = model.apply(
        variables, x, False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # Eval mode is deterministic.
    e1 = model.apply(variables, x)
    e2 = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
