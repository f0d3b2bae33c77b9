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


def test_attention_core_checkpoint_is_identity():
    """The flash-style ``jax.checkpoint`` on the short-S attention cores
    (ops/attention.multi_head_attention, ops/window._dense_band_attention,
    and the MHA train-mode dropout branch) changes ONLY backward memory
    behavior: forward values and gradients are bitwise the recompute of
    the same ops. Pins (a) grads through the checkpointed dense core ==
    grads through the raw (non-checkpointed) core, and (b) the
    checkpointed manual-Bernoulli dropout branch == the pre-change
    einsum + flax nn.Dropout formulation on the same make_rng stream."""
    from flax import linen as nn
    from focused_attention_vit_tpu.models.layers import (
        MultiHeadAttention, dense_init,
    )
    from focused_attention_vit_tpu.ops import attention as attn_ops

    rng = np.random.default_rng(11)
    b, h, s, d = 2, 4, 23, 8
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        for _ in range(3)
    )

    # (a) value + grad identity of the checkpointed no-dropout core.
    def loss_ckpt(q, k, v):
        return attn_ops.multi_head_attention(q, k, v, use_flash=False).sum()

    def loss_raw(q, k, v):
        return attn_ops.scaled_dot_product_attention(q, k, v).sum()

    (l1, g1), (l2, g2) = (
        jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
        for f in (loss_ckpt, loss_raw)
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for a, b_ in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    # (b) the train-mode materialized-dropout branch: structural twin of
    # MultiHeadAttention whose attention core is the same manual-Bernoulli
    # formulation WITHOUT the jax.checkpoint wrap — pins that the
    # checkpoint is value-transparent and that the branch's mask math is
    # nn.Dropout's (keep-prob Bernoulli from the parent make_rng, inverted
    # scaling, applied to the softmax weights). Same submodule names/order
    # and the same single parent-level make_rng call → identical params
    # and key, so the comparison is bitwise. (nn.Dropout itself derives
    # its rng on the child-module path, so its realized mask differs —
    # mean-identical, covered by the expectation tests.)
    class OldBranchMHA(nn.Module):
        embed_dim: int
        num_heads: int
        dropout: float

        @nn.compact
        def __call__(self, x, deterministic=False):
            hd = self.embed_dim // self.num_heads
            qkv = nn.DenseGeneral(
                features=(3, self.num_heads, hd), kernel_init=dense_init,
                name="qkv",
            )(x)
            q, k, v = attn_ops.qkv_split_heads(qkv)
            logits = jnp.einsum(
                "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
            ) * (hd**-0.5)
            weights = jax.nn.softmax(logits, axis=-1)
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout, weights.shape
            )
            weights = jnp.where(keep, weights / (1.0 - self.dropout), 0.0)
            out = jnp.einsum("bhst,bhtd->bhsd", weights.astype(v.dtype), v)
            out = out.transpose(0, 2, 1, 3)
            out = nn.DenseGeneral(
                self.embed_dim, axis=(-2, -1), kernel_init=dense_init,
                name="proj",
            )(out)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

    x = jnp.asarray(rng.normal(size=(2, 23, 32)).astype(np.float32))
    new = MultiHeadAttention(embed_dim=32, num_heads=4, dropout=0.3)
    old = OldBranchMHA(embed_dim=32, num_heads=4, dropout=0.3)
    variables = new.init(jax.random.PRNGKey(0), x)
    dkey = jax.random.PRNGKey(7)
    out_new = new.apply(
        variables, x, deterministic=False, rngs={"dropout": dkey}
    )
    out_old = old.apply(
        variables, x, deterministic=False, rngs={"dropout": dkey}
    )
    np.testing.assert_array_equal(np.asarray(out_new), np.asarray(out_old))


def test_mhla_dense_band_dropout_expectation():
    """The train-mode dense band-masked dropout branch (short S) is
    unbiased: averaging over many dropout keys approaches the eval-mode
    attention output (inverted dropout preserves expectation; VERDICT
    round-2 task 3 formulation change)."""
    from focused_attention_vit_tpu.models.layers import (
        MultiHeadLatentAttention,
    )

    rng = np.random.default_rng(5)
    b, s, dim, heads, w = 1, 40, 16, 2, 5
    m = MultiHeadLatentAttention(
        embed_dim=dim, num_heads=heads, window_size=w, dropout=0.25
    )
    x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)

    eval_out = m.apply(variables, x, deterministic=True)

    def one(key):
        return m.apply(
            variables, x, deterministic=False, rngs={"dropout": key}
        )

    keys = jax.random.split(jax.random.PRNGKey(1), 512)
    mean_out = jnp.mean(jax.vmap(one)(keys), axis=0)
    # Attention-weight + output dropout are both inverted, so the mean
    # converges to the eval output; 512 samples → loose tolerance.
    np.testing.assert_allclose(
        np.asarray(mean_out), np.asarray(eval_out), atol=0.15, rtol=0.25
    )


@pytest.mark.parametrize("make", [
    lambda **kw: fmodels.VisionTransformer(**TINY, **kw),
    lambda **kw: fmodels.VisionTransformerMHLA(
        **TINY, window_size=5, use_mhla=True, **kw
    ),
], ids=["vit", "vit_mhla"])
def test_scan_layers_matches_loop(make):
    """scan_layers=True (lax.scan over depth, stacked params) produces the
    SAME logits as the unrolled loop given stack_block_params-converted
    weights — the S=3137 scheduling-wall lever is numerically free."""
    from focused_attention_vit_tpu.models.layers import (
        stack_block_params,
        unstack_block_params,
    )

    loop_model = make()
    scan_model = make(scan_layers=True)
    x = _images()
    params = loop_model.init(jax.random.PRNGKey(0), x)["params"]
    stacked = stack_block_params(params, TINY["depth"])

    out_loop = loop_model.apply({"params": params}, x)
    out_scan = scan_model.apply({"params": stacked}, x)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), atol=1e-5, rtol=1e-5
    )

    # Round-trip converter.
    back = unstack_block_params(stacked, TINY["depth"])
    for a, b_ in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    # scan-form init has the stacked layout (leading depth axis).
    init_scan = scan_model.init(jax.random.PRNGKey(0), x)["params"]
    assert "blocks" in init_scan and "block" in init_scan["blocks"]
    leaf = jax.tree.leaves(init_scan["blocks"]["block"])[0]
    assert leaf.shape[0] == TINY["depth"]


def test_mhla_long_s_einsum_projections_match_densegeneral(monkeypatch):
    """At long S the MHLA layer swaps nn.DenseGeneral head projections for
    param-compatible einsum forms (HeadQKVProj/HeadMergeProj — no
    [B,S,3,h,d]→[3,B,h,S,d] relayout). Same params through both branches
    must give the same output: force the branch flip via
    DENSE_BAND_MAX_SEQ around a fixed S (both sides of the flip use exact
    window formulations, so any difference is projection math)."""
    from focused_attention_vit_tpu.models.layers import (
        MultiHeadLatentAttention,
    )
    from focused_attention_vit_tpu.ops import window as window_ops

    rng = np.random.default_rng(0)
    s, dim, heads, w = 96, 32, 4, 7
    m = MultiHeadLatentAttention(embed_dim=dim, num_heads=heads, window_size=w)
    x = jnp.asarray(rng.normal(size=(2, s, dim)).astype(np.float32))

    monkeypatch.setattr(window_ops, "DENSE_BAND_MAX_SEQ", s + 1)
    params = m.init(jax.random.PRNGKey(0), x)  # short-S branch (DenseGeneral)
    out_dense = m.apply(params, x)

    monkeypatch.setattr(window_ops, "DENSE_BAND_MAX_SEQ", s - 1)
    out_einsum = m.apply(params, x)  # long-S branch (einsum projections)

    np.testing.assert_allclose(
        np.asarray(out_einsum), np.asarray(out_dense), atol=1e-5, rtol=1e-5
    )


def test_mhla_roll_path_matches_default(monkeypatch):
    """FAVIT_MHLA_IMPL=roll routes the long-S MHLA sublayer through the
    S-minor lane-roll band kernel (param-compatible DS einsum projections
    + ops/mhla_band_roll.py). Same params, same output as the default
    long-S path — fwd and grads; train-mode dropout stays finite and
    differs from deterministic (in-kernel PRNG)."""
    from focused_attention_vit_tpu.models.layers import (
        MultiHeadLatentAttention,
    )
    from focused_attention_vit_tpu.ops import window as window_ops

    rng = np.random.default_rng(0)
    s, dim, heads, w = 96, 32, 4, 7
    m = MultiHeadLatentAttention(
        embed_dim=dim, num_heads=heads, window_size=w, dropout=0.3
    )
    x = jnp.asarray(rng.normal(size=(2, s, dim)).astype(np.float32))

    monkeypatch.setattr(window_ops, "DENSE_BAND_MAX_SEQ", s - 1)
    params = m.init(jax.random.PRNGKey(0), x)
    out_default = m.apply(params, x)
    g_default = jax.grad(
        lambda p: (m.apply(p, x) ** 2).sum()
    )(params)

    monkeypatch.setenv("FAVIT_MHLA_IMPL", "roll")
    out_roll = m.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_roll), np.asarray(out_default), atol=1e-5, rtol=1e-5
    )
    g_roll = jax.grad(lambda p: (m.apply(p, x) ** 2).sum())(params)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3
        ),
        g_roll,
        g_default,
    )

    # Train-mode: in-kernel window-slot dropout (seed from the flax RNG).
    out_train = m.apply(
        params, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(np.asarray(out_train)).all()
    assert np.abs(np.asarray(out_train) - np.asarray(out_roll)).max() > 1e-6
    g_train = jax.grad(
        lambda p: (
            m.apply(
                p, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)},
            ) ** 2
        ).sum()
    )(params)
    assert all(
        bool(jnp.isfinite(leaf).all()) for leaf in jax.tree.leaves(g_train)
    )


@pytest.mark.parametrize("scan", [False, True], ids=["loop", "scan"])
def test_remat_policy_band_weights_grads_identical(scan):
    """remat_policy='band_weights' (save the tagged band softmax weights
    across fwd→bwd instead of recomputing the band under full remat —
    the S=3137 wall lever) must not change gradients: same params, same
    dropout key → bit-identical grads vs remat_policy=None. Also pins
    that an unknown policy name errors loudly."""
    kw = dict(
        **TINY, window_size=5, use_mhla=True, remat=True, dropout=0.1,
        scan_layers=scan,
    )
    x = _images(4)
    y = jnp.asarray([0, 1, 2, 3])

    def grads(model, params):
        def loss(p):
            logits = model.apply(
                {"params": p}, x, False,
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            return -jnp.mean(
                jax.nn.log_softmax(logits)[jnp.arange(4), y]
            )

        return jax.grad(loss)(params)

    m0 = fmodels.VisionTransformerMHLA(**kw)
    m1 = fmodels.VisionTransformerMHLA(**kw, remat_policy="band_weights")
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    g0, g1 = grads(m0, params), grads(m1, params)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    with pytest.raises(ValueError, match="remat_policy"):
        fmodels.VisionTransformerMHLA(**kw, remat_policy="bogus").init(
            jax.random.PRNGKey(0), x
        )


def test_band_weights_policy_saves_dense_band_residual():
    """remat_policy='band_weights' must actually SAVE the tagged softmax
    weights on the short-S dense band path, not just not-crash: the
    band's inner flash-style checkpoint (attack #7) would hide the
    checkpoint_name tag from the outer nn.remat policy and silently
    recompute, so models trace the band with the inner checkpoint
    disabled under this policy (ops/window.saving_band_weights). Pinned
    by inspecting the fwd→bwd residuals: the f32 [B,h,S,S] weights are a
    residual under the policy and absent under plain full remat."""
    try:
        from jax._src.ad_checkpoint import saved_residuals
    except ImportError:
        pytest.skip("saved_residuals not available in this jax")

    kw = dict(**TINY, window_size=5, use_mhla=True, remat=True)
    x = _images(2)

    def residual_shapes(model, params):
        def loss(p):
            return model.apply({"params": p}, x).sum()

        return [
            getattr(r[0], "shape", None)
            for r in saved_residuals(loss, params)
        ]

    m0 = fmodels.VisionTransformerMHLA(**kw)
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    s = m0.num_patches + 1
    sxs = (2, TINY["num_heads"], s, s)
    assert sxs not in residual_shapes(m0, params)
    m1 = fmodels.VisionTransformerMHLA(**kw, remat_policy="band_weights")
    assert sxs in residual_shapes(m1, params)
