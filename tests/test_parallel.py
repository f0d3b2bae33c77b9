"""Multi-device sharding tests on the simulated 8-CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from focused_attention_vit_tpu import models as fmodels
from focused_attention_vit_tpu.parallel import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    shard_state,
    make_sharded_train_step,
)
from focused_attention_vit_tpu.train.state import TrainState, make_adamw
from focused_attention_vit_tpu.train.steps import make_train_step, make_eval_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)

TINY = dict(img_size=16, patch_size=4, num_classes=5, embed_dim=32, depth=2, num_heads=4)


def _setup(tp):
    mesh = make_mesh(8, tp=tp)
    model = fmodels.VisionTransformer(**TINY)
    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(rng.integers(0, 255, size=(16, 16, 16, 3)), dtype=jnp.uint8)
    y = jnp.asarray(rng.integers(0, 5, size=(16,)))
    sample = jnp.zeros((2, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample)["params"]
    return mesh, model, params, x_u8, y


@pytest.mark.parametrize("tp", [1, 2])
def test_sharded_train_step_runs(tp):
    mesh, model, params, x_u8, y = _setup(tp)
    tx = optax.adamw(1e-3)
    params = shard_params(params, mesh)
    opt_state = tx.init(params)
    step = make_sharded_train_step(model, tx, mesh, img_size=16)

    x_u8 = jax.device_put(x_u8, NamedSharding(mesh, P("data")))
    y = jax.device_put(y, NamedSharding(mesh, P("data")))
    key = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))

    params, opt_state, m = step(params, opt_state, x_u8, y, key)
    loss1 = float(m["loss"])
    params, opt_state, m = step(params, opt_state, x_u8, y, key)
    assert np.isfinite(loss1) and np.isfinite(float(m["loss"]))


def test_tp_rules_shard_mlp_and_attention():
    mesh, model, params, *_ = _setup(tp=2)
    rules = param_sharding_rules(params, mesh)
    assert rules["blocks_0"]["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert rules["blocks_0"]["mlp"]["fc2"]["kernel"] == P("model", None)
    # Per-head attention TP (head-shaped projections, models/layers.py).
    assert rules["blocks_0"]["attn"]["qkv"]["kernel"] == P(
        None, None, "model", None
    )
    assert rules["blocks_0"]["attn"]["qkv"]["bias"] == P(None, "model", None)
    assert rules["blocks_0"]["attn"]["proj"]["kernel"] == P(
        "model", None, None
    )

    sharded = shard_params(params, mesh)
    shard_shape = (
        sharded["blocks_0"]["mlp"]["fc1"]["kernel"]
        .addressable_shards[0]
        .data.shape
    )
    assert shard_shape == (32, 128 // 2)
    # 4 heads of dim 8: each TP shard holds 2 whole heads.
    qkv_shard = (
        sharded["blocks_0"]["attn"]["qkv"]["kernel"]
        .addressable_shards[0]
        .data.shape
    )
    assert qkv_shard == (32, 3, 2, 8)


def test_tp_rules_scan_form_stacked_leaves():
    """--scan_layers --tp WITHOUT --pp: the stacked [depth, ...] block
    leaves must get the per-layer Megatron rule shifted one dim right
    (review finding: the per-layer rule matched the stacked fc1 kernel at
    the EMBED dim — which also divides tp, so the fit check accepted the
    wrong layout — and the 5-D stacked qkv/proj leaves silently
    replicated)."""
    mesh = make_mesh(8, tp=2)
    model = fmodels.VisionTransformer(**TINY, scan_layers=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3))
    )["params"]
    rules = param_sharding_rules(params, mesh)
    blk = rules["blocks"]["block"]
    assert blk["mlp"]["fc1"]["kernel"] == P(None, None, "model")
    assert blk["mlp"]["fc1"]["bias"] == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"] == P(None, "model", None)
    assert blk["attn"]["qkv"]["kernel"] == P(None, None, None, "model", None)
    assert blk["attn"]["qkv"]["bias"] == P(None, None, "model", None)
    assert blk["attn"]["proj"]["kernel"] == P(None, "model", None, None)

    # Per-shard shapes: depth axis intact, hidden/head dims halved.
    sharded = shard_params(params, mesh)
    d = TINY["depth"]
    fc1 = sharded["blocks"]["block"]["mlp"]["fc1"]["kernel"]
    assert fc1.addressable_shards[0].data.shape == (d, 32, 128 // 2)
    qkv = sharded["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape == (d, 32, 3, 2, 8)


def test_tp_rules_fall_back_when_indivisible():
    """num_heads=4 does not divide tp=8 → heads replicate, no error."""
    mesh = make_mesh(8, tp=8)
    model = fmodels.VisionTransformer(**TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3))
    )["params"]
    rules = param_sharding_rules(params, mesh)
    assert rules["blocks_0"]["attn"]["qkv"]["kernel"] == P(
        None, None, None, None
    )
    # MLP hidden 128 still divides by 8.
    assert rules["blocks_0"]["mlp"]["fc1"]["kernel"] == P(None, "model")


def test_sppp_model_shards_over_data_axis():
    """The SPPP pipeline (vmapped SLIC + segment pooling) must compile and
    run under batch sharding — the shape-static design exists exactly for
    this."""
    mesh = make_mesh(8, tp=1)
    model = fmodels.SPPPViT(**TINY, num_superpixels=4, slic_iters=2)
    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(rng.integers(0, 255, size=(16, 16, 16, 3)), dtype=jnp.uint8)
    y = jnp.asarray(rng.integers(0, 5, size=(16,)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)))["params"]

    tx = optax.adamw(1e-3)
    params = shard_params(params, mesh)
    opt_state = tx.init(params)
    step = make_sharded_train_step(model, tx, mesh, img_size=16)
    x_u8 = jax.device_put(x_u8, NamedSharding(mesh, P("data")))
    y = jax.device_put(y, NamedSharding(mesh, P("data")))
    key = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))
    _, _, m = step(params, opt_state, x_u8, y, key)
    assert np.isfinite(float(m["loss"]))


def test_dp_matches_single_device():
    """DP-sharded step must produce the same loss as an unsharded run."""
    mesh, model, params, x_u8, y = _setup(tp=1)
    tx = optax.adamw(1e-3)
    key = jax.random.PRNGKey(0)

    # Single-device run first — shard_params may alias these buffers and
    # the sharded step donates (deletes) them.
    from focused_attention_vit_tpu.data.pipeline import prepare_eval_batch

    imgs = prepare_eval_batch(x_u8, 16)

    def loss_fn(p):
        logits = model.apply(
            {"params": p}, imgs, False, rngs={"dropout": jax.random.fold_in(key, 1)}
        )
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    loss_single = float(loss_fn(params))

    # Sharded run.
    sp = shard_params(params, mesh)
    opt_state = tx.init(sp)
    step = make_sharded_train_step(model, tx, mesh, img_size=16, augment=False)
    _, _, m_sharded = step(
        sp,
        opt_state,
        jax.device_put(x_u8, NamedSharding(mesh, P("data"))),
        jax.device_put(y, NamedSharding(mesh, P("data"))),
        key,
    )
    np.testing.assert_allclose(float(m_sharded["loss"]), loss_single, rtol=1e-5)


def _fresh_state(model, params):
    copied = jax.tree.map(jnp.array, params)
    return TrainState.create(
        apply_fn=model.apply, params=copied, tx=make_adamw(1e-3)
    )


def test_tp2_forward_matches_replicated():
    """tp=2 head-sharded attention must reproduce the replicated forward
    at 1e-5 (VERDICT r1 item 4 done-criterion)."""
    mesh, model, params, x_u8, y = _setup(tp=2)
    from focused_attention_vit_tpu.data.pipeline import prepare_eval_batch

    imgs = prepare_eval_batch(x_u8, 16)
    expect = model.apply({"params": params}, imgs)

    sharded = shard_params(jax.tree.map(jnp.array, params), mesh)

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x)

    got = fwd(sharded, jax.device_put(imgs, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("tp", [1, 2])
def test_dp_trajectory_matches_single_device(tp):
    """3 training steps with augmentation ON: the mesh path must track the
    single-device parameter trajectory (same keys, same batches)."""
    mesh, model, params, x_u8, y = _setup(tp=tp)
    key = jax.random.PRNGKey(3)

    single = _fresh_state(model, params)
    step1 = make_train_step(16, augment=True)
    meshed = shard_state(_fresh_state(model, params), mesh)
    step2 = make_train_step(16, augment=True, mesh=mesh)

    for i in range(3):
        k = jax.random.fold_in(key, i)
        single, m1 = step1(single, x_u8, y, k)
        meshed, m2 = step2(meshed, x_u8, y, k)
        np.testing.assert_allclose(
            float(m1["loss_sum"]), float(m2["loss_sum"]), rtol=1e-4
        )

    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_flatten_with_path(single.params)[0],
        jax.tree_util.tree_flatten_with_path(meshed.params)[0],
    ):
        assert p1 == p2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, err_msg=str(p1)
        )


def test_dp_through_train_and_evaluate():
    """The full epoch loop (train_and_evaluate) on the mesh matches the
    single-device loss curve (VERDICT r1 item 1 done-criterion)."""
    from focused_attention_vit_tpu.train.loop import train_and_evaluate

    mesh, model, params, *_ = _setup(tp=1)
    rng = np.random.default_rng(1)
    data = {
        "train_images": rng.integers(0, 255, size=(64, 16, 16, 3)).astype(
            np.uint8
        ),
        "train_labels": rng.integers(0, 5, size=(64,)).astype(np.int32),
        "test_images": rng.integers(0, 255, size=(32, 16, 16, 3)).astype(
            np.uint8
        ),
        "test_labels": rng.integers(0, 5, size=(32,)).astype(np.int32),
        "num_classes": 5,
    }

    def run(mesh_arg):
        state = _fresh_state(model, params)
        if mesh_arg is not None:
            state = shard_state(state, mesh_arg)
        return train_and_evaluate(
            state,
            make_train_step(16, mesh=mesh_arg),
            make_eval_step(16, mesh=mesh_arg),
            data,
            epochs=2,
            batch_size=16,
            seed=7,
            log_fn=lambda s: None,
        )

    r_single = run(None)
    r_mesh = run(mesh)
    np.testing.assert_allclose(
        r_single["train_losses"], r_mesh["train_losses"], rtol=1e-4
    )
    np.testing.assert_allclose(
        r_single["val_losses"], r_mesh["val_losses"], rtol=1e-4
    )


def test_tp2_forward_matches_replicated_mhla():
    """tp=2 on the flagship windowed-MHLA model: head-sharded qkv/proj +
    per-head banded attention must reproduce the replicated forward."""
    mesh = make_mesh(8, tp=2)
    model = fmodels.VisionTransformerMHLA(
        img_size=16, patch_size=4, num_classes=5, embed_dim=32,
        depth=2, num_heads=4, window_size=5, use_mhla=True,
    )
    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(
        rng.integers(0, 255, size=(16, 16, 16, 3)), dtype=jnp.uint8
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3), jnp.float32)
    )["params"]

    from focused_attention_vit_tpu.data.pipeline import prepare_eval_batch

    imgs = prepare_eval_batch(x_u8, 16)
    expect = model.apply({"params": params}, imgs)

    sharded = shard_params(jax.tree.map(jnp.array, params), mesh)

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x)

    got = fwd(sharded, jax.device_put(imgs, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), atol=1e-5, rtol=1e-5
    )


def test_detailed_eval_on_mesh_sharded_and_equal():
    """evaluate_detailed(mesh=...) computes probs DP-sharded over the mesh
    (VERDICT round-2 task 7): the jitted probs fn emits P('data')-sharded
    activations, and the detailed metrics equal the un-meshed run."""
    from focused_attention_vit_tpu.train.loop import (
        _cached_probs_fn,
        evaluate_detailed,
    )

    mesh, model, params, *_ = _setup(tp=1)
    state = _fresh_state(model, params)
    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, size=(40, 16, 16, 3)).astype(np.uint8)
    labels = rng.integers(0, 5, size=(40,)).astype(np.int32)

    # The mesh-keyed probs fn shards its batch over the data axis.
    probs_fn = _cached_probs_fn(model, 16, mesh)
    p = probs_fn(state.params, jnp.asarray(images[:16]))
    assert p.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data")), p.ndim
    ), p.sharding

    det_mesh = evaluate_detailed(
        state, model, images, labels, 16, 16, 5, mesh=mesh
    )
    det_single = evaluate_detailed(state, model, images, labels, 16, 16, 5)
    assert det_mesh["accuracy"] == det_single["accuracy"]
    np.testing.assert_allclose(
        det_mesh["auc_macro_ovr"], det_single["auc_macro_ovr"], rtol=1e-6
    )
    np.testing.assert_array_equal(
        det_mesh["confusion_matrix"], det_single["confusion_matrix"]
    )


# --- Sequence parallelism (parallel/sequence.py) ---------------------------


class TestSequenceParallel:
    """SP windowed attention: halo-exchange shard_map band vs the
    single-device oracle (ops/window). The op is exact — including the
    reference's circular edge rule (left-edge windows pad with key S-1,
    right-edge with key 0, models/mhla.py:72-79), which SP reproduces by
    psum-broadcasting the two global edge rows."""

    @pytest.mark.parametrize("n,s", [(2, 64), (4, 65), (8, 197)])
    def test_matches_oracle_fwd_and_grad(self, n, s):
        from focused_attention_vit_tpu.parallel.sequence import (
            sp_windowed_attention,
        )
        from focused_attention_vit_tpu.ops.window import (
            _shift_banded_attention,
        )
        from jax.sharding import Mesh

        rng = np.random.default_rng(0)
        b, h, d, w = 2, 3, 8, 7
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
            for _ in range(3)
        )
        mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))

        got = jax.jit(
            lambda q, k, v: sp_windowed_attention(q, k, v, w, mesh)
        )(q, k, v)
        want = _shift_banded_attention(q, k, v, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )

        g_sp = jax.jit(
            jax.grad(
                lambda q, k, v: (
                    sp_windowed_attention(q, k, v, w, mesh) ** 2
                ).sum(),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
        g_or = jax.grad(
            lambda q, k, v: (_shift_banded_attention(q, k, v, w) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b_ in zip(g_sp, g_or):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4
            )

    def test_shard_too_small_raises(self):
        from focused_attention_vit_tpu.parallel.sequence import (
            sp_windowed_attention,
        )
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
        q = jnp.zeros((1, 1, 17, 8))  # ceil(17/8)=3 < W=7
        with pytest.raises(ValueError, match="too small"):
            sp_windowed_attention(q, q, q, 7, mesh)

    def test_model_forward_and_grads_match_unsharded(self):
        """VisionTransformerMHLA(sp_mesh=...) on a ('data','seq') mesh ==
        the unsharded model, fwd + grads (dropout off)."""
        from jax.sharding import Mesh

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 56, 56, 3)).astype(np.float32))
        kw = dict(
            img_size=56, patch_size=4, num_classes=10, embed_dim=32,
            depth=2, num_heads=4, window_size=7, use_mhla=True,
        )
        base = fmodels.VisionTransformerMHLA(**kw)
        params = base.init(jax.random.PRNGKey(0), x[:1])
        ref = jax.jit(lambda p, x: base.apply(p, x))(params, x)

        mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "seq"))
        sp_model = fmodels.VisionTransformerMHLA(**kw, sp_mesh=mesh)
        got = jax.jit(lambda p, x: sp_model.apply(p, x))(params, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4
        )

        def loss(model):
            return lambda p, x: (model.apply(p, x) ** 2).sum()

        g_ref = jax.jit(jax.grad(loss(base)))(params, x)
        g_sp = jax.jit(jax.grad(loss(sp_model)))(params, x)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4
            ),
            g_ref,
            g_sp,
        )

    @pytest.mark.parametrize("tp,sp", [(1, 4), (2, 2)])
    def test_sp_train_step_trajectory_matches_single_device(self, tp, sp):
        """Two sharded AdamW steps on a DP×TP×SP mesh produce the same
        parameters as the unsharded step (dropout off, same data).
        tp=2 exercises SP×TP composition: the manual 'seq' shard_map's
        auto axes leave the TP-sharded head dim to GSPMD."""
        from jax.sharding import Mesh

        kw = dict(
            img_size=56, patch_size=4, num_classes=5, embed_dim=32,
            depth=2, num_heads=4, window_size=7, use_mhla=True,
        )
        rng = np.random.default_rng(1)
        x_u8 = jnp.asarray(
            rng.integers(0, 255, size=(8, 56, 56, 3)), dtype=jnp.uint8
        )
        y = jnp.asarray(rng.integers(0, 5, size=(8,)))
        sample = jnp.zeros((1, 56, 56, 3), jnp.float32)

        mesh = make_mesh(8, tp=tp, sp=sp)
        assert mesh.axis_names == ("data", "model", "seq")
        sp_model = fmodels.VisionTransformerMHLA(**kw, sp_mesh=mesh)
        base = fmodels.VisionTransformerMHLA(**kw)
        params0 = base.init(jax.random.PRNGKey(0), sample)["params"]
        tx = optax.adamw(1e-3)

        def run(model, use_mesh):
            params = jax.tree.map(jnp.copy, params0)
            if use_mesh:
                params = shard_params(params, mesh)
                opt_state = tx.init(params)
                step = make_sharded_train_step(
                    model, tx, mesh, img_size=56, augment=False
                )
                xs = jax.device_put(x_u8, NamedSharding(mesh, P("data")))
                ys = jax.device_put(y, NamedSharding(mesh, P("data")))
                key = jax.device_put(
                    jax.random.PRNGKey(0), NamedSharding(mesh, P())
                )
            else:
                opt_state = tx.init(params)
                step = make_sharded_train_step(
                    model,
                    tx,
                    make_mesh(1),
                    img_size=56,
                    augment=False,
                )
                xs, ys, key = x_u8, y, jax.random.PRNGKey(0)
            for _ in range(2):
                params, opt_state, m = step(params, opt_state, xs, ys, key)
            return params, float(m["loss"])

        p_sp, loss_sp = run(sp_model, True)
        p_1, loss_1 = run(base, False)
        assert np.isfinite(loss_sp)
        np.testing.assert_allclose(loss_sp, loss_1, atol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-5
            ),
            p_sp,
            p_1,
        )

    @pytest.mark.slow
    def test_sp_band_dropout_trains_finite(self):
        """Train-mode attention-weight dropout under SP (per-shard folded
        keys) produces finite outputs that differ from deterministic."""
        from jax.sharding import Mesh

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
        mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "seq"))
        model = fmodels.VisionTransformerMHLA(
            img_size=56, patch_size=4, num_classes=10, embed_dim=32,
            depth=2, num_heads=4, window_size=7, use_mhla=True,
            attn_dropout=0.3, sp_mesh=mesh,
        )
        params = model.init(jax.random.PRNGKey(0), x[:1])
        det = jax.jit(lambda p, x: model.apply(p, x))(params, x)
        out = jax.jit(
            lambda p, x: model.apply(
                p, x, False, rngs={"dropout": jax.random.PRNGKey(7)}
            )
        )(params, x)
        assert np.isfinite(np.asarray(out)).all()
        assert np.abs(np.asarray(out) - np.asarray(det)).max() > 1e-6


# --- Pipeline parallelism (parallel/pipeline.py) ---------------------------


class TestPipelineParallel:
    """GPipe-style SPMD pipeline over a 'stage' mesh axis: stacked
    (scan-form) block params sharded by layer, microbatches rotating by
    ppermute. Forward is bit-identical to the sequential scan (same
    microbatch decomposition — batch-independent layers); backward flows
    through the ppermute transposes (the reverse pipeline for free)."""

    KW = dict(
        img_size=32, patch_size=4, num_classes=10, embed_dim=32, depth=4,
        num_heads=4, window_size=7, use_mhla=True, scan_layers=True,
    )

    def _data(self):
        rng = np.random.default_rng(0)
        return jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))

    def test_raw_pipeline_matches_sequential(self):
        from focused_attention_vit_tpu.parallel.pipeline import spmd_pipeline
        from jax.sharding import Mesh

        rng = np.random.default_rng(0)
        depth, b, s, dm = 8, 8, 12, 16
        x = jnp.asarray(rng.normal(size=(b, s, dm)).astype(np.float32))
        params = {
            "w": jnp.asarray(
                rng.normal(size=(depth, dm, dm)).astype(np.float32) * 0.1
            ),
            "b": jnp.asarray(
                rng.normal(size=(depth, dm)).astype(np.float32) * 0.1
            ),
        }

        def apply_block(p, xx, key):
            return jnp.tanh(xx @ p["w"] + p["b"]) + xx

        def seq(params, x):
            out, _ = jax.lax.scan(
                lambda c, p: (apply_block(p, c, None), None), x, params
            )
            return out

        want = jax.jit(seq)(params, x)
        for n, m in [(2, 2), (4, 8), (8, 8)]:
            mesh = Mesh(np.array(jax.devices()[:n]), ("stage",))
            got = jax.jit(
                lambda p, x: spmd_pipeline(
                    apply_block, p, x, mesh, microbatches=m
                )
            )(params, x)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5
            )
            g1 = jax.jit(jax.grad(lambda p: (seq(p, x) ** 2).sum()))(params)
            g2 = jax.jit(
                jax.grad(
                    lambda p: (
                        spmd_pipeline(
                            apply_block, p, x, mesh, microbatches=m
                        )
                        ** 2
                    ).sum()
                )
            )(params)
            for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), atol=1e-3
                )

    def test_pp_model_matches_scan_model(self):
        from jax.sharding import Mesh

        x = self._data()
        base = fmodels.VisionTransformerMHLA(**self.KW)
        params = base.init(jax.random.PRNGKey(0), x[:1])
        ref = jax.jit(lambda p, x: base.apply(p, x))(params, x)

        mesh = Mesh(np.array(jax.devices()[:4]), ("stage",))
        pp = fmodels.VisionTransformerMHLA(**self.KW, pp_mesh=mesh)
        got = jax.jit(lambda p, x: pp.apply(p, x))(params, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5
        )

        g_ref = jax.jit(
            jax.grad(lambda p: (base.apply(p, x) ** 2).sum())
        )(params)
        g_pp = jax.jit(jax.grad(lambda p: (pp.apply(p, x) ** 2).sum()))(
            params
        )
        for a, b_ in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-3
            )

    def test_pp_requires_scan_layers(self):
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[:4]), ("stage",))
        model = fmodels.VisionTransformerMHLA(
            **{**self.KW, "scan_layers": False}, pp_mesh=mesh
        )
        with pytest.raises(ValueError, match="scan_layers"):
            model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
            )

    def test_stage_sharding_rules_shard_block_stack(self):
        mesh = make_mesh(8, tp=2, pp=2)
        assert mesh.axis_names == ("data", "model", "stage")
        model = fmodels.VisionTransformerMHLA(
            **{**self.KW, "embed_dim": 64}
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )["params"]
        rules = param_sharding_rules(params, mesh)
        assert rules["blocks"]["block"]["mlp"]["fc1"]["kernel"] == P(
            "stage", None, "model"
        )
        assert rules["blocks"]["block"]["mlp"]["fc2"]["kernel"] == P(
            "stage", "model", None
        )
        assert rules["blocks"]["block"]["norm1"]["scale"] == P("stage", None)
        # Non-block params untouched by 'stage'.
        assert rules["pos_embed"] == P(None, None, None)
        sharded = shard_params(params, mesh)
        fc1 = sharded["blocks"]["block"]["mlp"]["fc1"]["kernel"]
        # depth 4 over 2 stages, hidden 256 over 2-way TP.
        assert fc1.addressable_shards[0].data.shape == (2, 64, 128)

    @pytest.mark.parametrize("tp,pp", [(1, 4), (2, 2)])
    def test_pp_train_trajectory_matches_single_device(self, tp, pp):
        """Two AdamW steps with DP × TP × PP == the unsharded steps.
        tp=2 exercises PP×TP composition: the stage-sharded block stack
        keeps its inner Megatron dims on 'model' inside the pipeline."""
        x_u8 = jnp.asarray(
            np.random.default_rng(1).integers(0, 255, size=(8, 32, 32, 3)),
            dtype=jnp.uint8,
        )
        y = jnp.asarray(
            np.random.default_rng(2).integers(0, 10, size=(8,))
        )
        mesh = make_mesh(8, tp=tp, pp=pp)
        base = fmodels.VisionTransformerMHLA(**self.KW)
        pp_model = fmodels.VisionTransformerMHLA(**self.KW, pp_mesh=mesh)
        params0 = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )["params"]
        tx = optax.adamw(1e-3)

        def run(model, mesh_):
            params = shard_params(
                jax.tree.map(jnp.copy, params0), mesh_
            )
            opt_state = tx.init(params)
            step = make_sharded_train_step(
                model, tx, mesh_, img_size=32, augment=False
            )
            xs = jax.device_put(x_u8, NamedSharding(mesh_, P("data")))
            ys = jax.device_put(y, NamedSharding(mesh_, P("data")))
            key = jax.device_put(
                jax.random.PRNGKey(0), NamedSharding(mesh_, P())
            )
            for _ in range(2):
                params, opt_state, m = step(params, opt_state, xs, ys, key)
            return params, float(m["loss"])

        p_pp, loss_pp = run(pp_model, mesh)
        p_1, loss_1 = run(base, make_mesh(1))
        assert np.isfinite(loss_pp)
        np.testing.assert_allclose(loss_pp, loss_1, atol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-5
            ),
            p_pp,
            p_1,
        )

    @pytest.mark.slow
    def test_pp_honors_remat_policy(self, monkeypatch):
        """--remat_policy must reach jax.checkpoint in the pipelined path
        (review finding: apply_pipelined_blocks used plain jax.checkpoint,
        silently dropping a user-selected band_weights policy under --pp)
        and must not change gradients."""
        from focused_attention_vit_tpu.models import layers as L

        mesh = make_mesh(8, pp=2)
        kw = dict(
            img_size=16, patch_size=4, num_classes=5, embed_dim=32,
            depth=2, num_heads=4, window_size=5, use_mhla=True,
            scan_layers=True, remat=True,
        )
        x = jnp.asarray(
            np.random.default_rng(0)
            .normal(size=(4, 16, 16, 3))
            .astype(np.float32)
        )
        m0 = fmodels.VisionTransformerMHLA(**kw, pp_mesh=mesh)
        params = m0.init(jax.random.PRNGKey(0), x)["params"]

        seen = []
        orig = L.resolve_remat_policy
        monkeypatch.setattr(
            L, "resolve_remat_policy",
            lambda p: (seen.append(p), orig(p))[1],
        )

        def grads(model):
            def loss(p):
                out = model.apply(
                    {"params": p}, x, False,
                    rngs={"dropout": jax.random.PRNGKey(7)},
                )
                return (out ** 2).sum()

            return jax.grad(loss)(params)

        g0 = grads(m0)
        m1 = fmodels.VisionTransformerMHLA(
            **kw, pp_mesh=mesh, remat_policy="band_weights"
        )
        g1 = grads(m1)
        assert "band_weights" in seen, "policy never reached the PP path"
        for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    @pytest.mark.parametrize("tp", [1, 2])
    def test_sp_pp_forward_and_grads_match_unsharded(self, tp):
        """SP×PP (round 5): under PP the sequence axis stays AUTO — the
        block runs the XLA shift band with a GSPMD 'seq' constraint
        instead of the manual halo shard_map (Shardy rejects a nested
        manual region: "operates on axis ... already bound by a parent
        sdy.manual_computation"). Forward and grads must equal the
        unsharded model. tp=2 exercises the full TP×SP×PP stack (Megatron
        head/MLP dims on 'model' inside the pipeline, tokens on 'seq')."""
        mesh = make_mesh(8, tp=tp, sp=2, pp=2)
        model = fmodels.VisionTransformerMHLA(
            **self.KW, sp_mesh=mesh, pp_mesh=mesh
        )
        base = fmodels.VisionTransformerMHLA(**self.KW)
        x = self._data()[:4]
        params = base.init(jax.random.PRNGKey(0), x[:1])["params"]

        def loss(model):
            return lambda p: (
                model.apply({"params": p}, x).astype(jnp.float32) ** 2
            ).sum()

        ref = jax.jit(lambda p: base.apply({"params": p}, x))(params)
        g_ref = jax.jit(jax.grad(loss(base)))(params)
        ps = shard_params(jax.tree.map(jnp.copy, params), mesh)
        got = jax.jit(lambda p: model.apply({"params": p}, x))(ps)
        # grad under jit, as every production path runs it: eagerly each
        # op is its own pjit and the uneven token constraint (S=65 over
        # 2 'seq' shards) would be enforced as a pjit OUTPUT sharding.
        g_got = jax.jit(jax.grad(loss(model)))(ps)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
        for a, b_ in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3
            )

    def test_sp_pp_train_trajectory_matches_single_device(self):
        """Two AdamW steps with DP × SP × PP == the unsharded steps."""
        x_u8 = jnp.asarray(
            np.random.default_rng(1).integers(0, 255, size=(8, 32, 32, 3)),
            dtype=jnp.uint8,
        )
        y = jnp.asarray(
            np.random.default_rng(2).integers(0, 10, size=(8,))
        )
        mesh = make_mesh(8, tp=1, sp=2, pp=2)
        base = fmodels.VisionTransformerMHLA(**self.KW)
        sp_pp_model = fmodels.VisionTransformerMHLA(
            **self.KW, sp_mesh=mesh, pp_mesh=mesh
        )
        params0 = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )["params"]
        tx = optax.adamw(1e-3)

        def run(model, mesh_):
            params = shard_params(
                jax.tree.map(jnp.copy, params0), mesh_
            )
            opt_state = tx.init(params)
            step = make_sharded_train_step(
                model, tx, mesh_, img_size=32, augment=False
            )
            xs = jax.device_put(x_u8, NamedSharding(mesh_, P("data")))
            ys = jax.device_put(y, NamedSharding(mesh_, P("data")))
            key = jax.device_put(
                jax.random.PRNGKey(0), NamedSharding(mesh_, P())
            )
            for _ in range(2):
                params, opt_state, m = step(params, opt_state, xs, ys, key)
            return params, float(m["loss"])

        p_n, loss_n = run(sp_pp_model, mesh)
        p_1, loss_1 = run(base, make_mesh(1))
        np.testing.assert_allclose(loss_n, loss_1, rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(p_n), jax.tree.leaves(p_1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3
            )

    def test_pretrained_mhla_model_sp_matches_unsharded(self):
        """PretrainedViTWithMHLA (M16 — default geometry patch 4, the
        long-S model) with sp_mesh == unsharded forward."""
        from jax.sharding import Mesh
        from focused_attention_vit_tpu.models.mhla_models import (
            PretrainedViTWithMHLA,
        )

        kw = dict(
            img_size=56, patch_size=4, num_classes=10, embed_dim=32,
            depth=2, num_heads=4, window_size=7,
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 56, 56, 3)).astype(np.float32))
        base = PretrainedViTWithMHLA(**kw)
        params = base.init(jax.random.PRNGKey(0), x[:1])
        ref = jax.jit(lambda p, x: base.apply(p, x))(params, x)
        mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "seq"))
        sp_model = PretrainedViTWithMHLA(**kw, sp_mesh=mesh)
        got = jax.jit(lambda p, x: sp_model.apply(p, x))(params, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4
        )


class TestFSDP:
    """ZeRO-3-style parameter/optimizer sharding over 'data'
    (parallel/sharding._add_fsdp) — a TPU-native scaling addition with no
    reference counterpart (SURVEY.md §2.4: the reference has zero
    distributed code)."""

    def test_rules_add_data_axis_and_compose_with_tp(self):
        mesh, model, params, *_ = _setup(tp=2)
        rules = param_sharding_rules(params, mesh, fsdp=True)
        blk = rules["blocks_0"]
        # TP dims keep 'model'; FSDP claims the largest free divisible dim.
        # fc1 kernel [32, 128]: dim1 = 'model' (TP), dim0 32 % dp(4) == 0.
        assert blk["mlp"]["fc1"]["kernel"] == P("data", "model")
        # fc2 kernel [128, 32]: dim0 = 'model', dim1 32 % 4 == 0.
        assert blk["mlp"]["fc2"]["kernel"] == P("model", "data")
        # qkv kernel [D, 3, h, d] = [32, 3, 4, 8]: head dim = 'model';
        # largest free divisible dim is D.
        assert blk["attn"]["qkv"]["kernel"] == P("data", None, "model", None)
        # LayerNorm scale [32] divides dp=4 → sharded, not replicated.
        assert blk["norm1"]["scale"] == P("data")
        # fc1 bias [128] is fully TP-owned (P('model')); FSDP extends the
        # dim to the ('model','data') product — H/(tp*dp) per device.
        assert blk["mlp"]["fc1"]["bias"] == P(("model", "data"))
        # Indivisible leaves fall back: cls token [1, 1, 32] → last dim.
        assert rules["cls_token"] == P(None, None, "data")

    def test_state_memory_is_sharded(self):
        """Per-device addressable shard of every divisible param/moment
        leaf is 1/dp of the full leaf — the FSDP memory claim."""
        mesh, model, params, *_ = _setup(tp=1)  # dp = 8
        state = shard_state(_fresh_state(model, params), mesh, fsdp=True)
        checked = 0
        for leaf in jax.tree.leaves((state.params, state.opt_state)):
            if not hasattr(leaf, "addressable_shards") or leaf.ndim == 0:
                continue
            if all(d % 8 for d in leaf.shape):
                continue  # indivisible → replicated fallback
            shard = leaf.addressable_shards[0].data
            assert shard.size * 8 == leaf.size, leaf.shape
            checked += 1
        assert checked > 10  # the rule actually fired across the tree

    @pytest.mark.parametrize("tp", [1, 2])
    def test_fsdp_trajectory_matches_single_device(self, tp):
        """3 augmented training steps under FSDP (×TP) track the
        single-device parameter trajectory — ZeRO resharding must not
        change the math."""
        from focused_attention_vit_tpu.parallel import state_shardings

        mesh, model, params, x_u8, y = _setup(tp=tp)
        key = jax.random.PRNGKey(3)

        single = _fresh_state(model, params)
        step1 = make_train_step(16, augment=True)
        meshed = shard_state(_fresh_state(model, params), mesh, fsdp=True)
        sh = state_shardings(meshed, mesh, fsdp=True)
        step2 = make_train_step(16, augment=True, mesh=mesh, state_sharding=sh)

        for i in range(3):
            k = jax.random.fold_in(key, i)
            single, m1 = step1(single, x_u8, y, k)
            meshed, m2 = step2(meshed, x_u8, y, k)
            np.testing.assert_allclose(
                float(m1["loss_sum"]), float(m2["loss_sum"]), rtol=1e-4
            )

        # The updated state kept the FSDP layout (out_shardings pin).
        fc1 = meshed.params["blocks_0"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec == param_sharding_rules(
            meshed.params, mesh, fsdp=True
        )["blocks_0"]["mlp"]["fc1"]["kernel"]
        # fc1 is sharded over 'data' AND 'model', so the per-device shard
        # is 1/8 of the leaf at either tp (dp*tp = 8).
        assert fc1.addressable_shards[0].data.size * 8 == fc1.size
        self._assert_params_close(single, meshed)

    @staticmethod
    def _assert_params_close(single, meshed):
        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(single.params)[0],
            jax.tree_util.tree_flatten_with_path(meshed.params)[0],
        ):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, err_msg=str(p1)
            )

    def test_fsdp_sp_trajectory_matches_single_device(self):
        """FSDP × SP (round 5 — the one pairwise composition previously
        untested): ZeRO-3 params/moments over 'data' + halo-exchange band
        attention over 'seq' track the single-device trajectory. img 32 /
        patch 4 → S=65 > 2W so the banded SP path actually runs."""
        from focused_attention_vit_tpu.parallel import state_shardings

        mesh = make_mesh(8, tp=1, sp=2)
        kw = dict(
            img_size=32, patch_size=4, num_classes=5, embed_dim=32,
            depth=2, num_heads=4, window_size=7, use_mhla=True,
        )
        base = fmodels.VisionTransformerMHLA(**kw)
        sp_model = fmodels.VisionTransformerMHLA(**kw, sp_mesh=mesh)
        rng = np.random.default_rng(0)
        x_u8 = jnp.asarray(
            rng.integers(0, 255, size=(8, 32, 32, 3)), dtype=jnp.uint8
        )
        y = jnp.asarray(rng.integers(0, 5, size=(8,)))
        params = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )["params"]
        key = jax.random.PRNGKey(3)

        single = _fresh_state(base, params)
        step1 = make_train_step(32, augment=True)
        meshed = shard_state(
            _fresh_state(sp_model, params), mesh, fsdp=True
        )
        sh = state_shardings(meshed, mesh, fsdp=True)
        step2 = make_train_step(
            32, augment=True, mesh=mesh, state_sharding=sh
        )

        for i in range(2):
            k = jax.random.fold_in(key, i)
            single, m1 = step1(single, x_u8, y, k)
            meshed, m2 = step2(meshed, x_u8, y, k)
            np.testing.assert_allclose(
                float(m1["loss_sum"]), float(m2["loss_sum"]), rtol=1e-4
            )
        self._assert_params_close(single, meshed)

    def test_fsdp_pp_trajectory_matches_single_device(self):
        """FSDP × pipeline parallelism EXECUTED (not just rule-pinned):
        2 AdamW steps on a dp4×pp2 mesh with fsdp=True track the
        single-device scan-form trajectory, and the stacked block leaves
        keep the composed P('stage','data',...) layout (1/8 of the leaf
        per device) through the donated step."""
        from focused_attention_vit_tpu.parallel import state_shardings

        kw = dict(
            img_size=16, patch_size=4, num_classes=5, embed_dim=32,
            depth=2, num_heads=4, window_size=5, use_mhla=True,
            scan_layers=True,
        )
        mesh = make_mesh(8, pp=2)  # dp=4 × stage=2
        base = fmodels.VisionTransformerMHLA(**kw)
        pp_model = fmodels.VisionTransformerMHLA(**kw, pp_mesh=mesh)
        rng = np.random.default_rng(0)
        x_u8 = jnp.asarray(
            rng.integers(0, 255, size=(16, 16, 16, 3)), dtype=jnp.uint8
        )
        y = jnp.asarray(rng.integers(0, 5, size=(16,)))
        params = base.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
        )["params"]
        key = jax.random.PRNGKey(11)

        single = _fresh_state(base, params)
        step1 = make_train_step(16, augment=True)
        meshed = shard_state(_fresh_state(pp_model, params), mesh, fsdp=True)
        sh = state_shardings(meshed, mesh, fsdp=True)
        step2 = make_train_step(16, augment=True, mesh=mesh, state_sharding=sh)

        for i in range(2):
            k = jax.random.fold_in(key, i)
            single, m1 = step1(single, x_u8, y, k)
            meshed, m2 = step2(meshed, x_u8, y, k)
            np.testing.assert_allclose(
                float(m1["loss_sum"]), float(m2["loss_sum"]), rtol=1e-4
            )

        # Stacked fc1 kernel [depth, D, H]: depth on 'stage', the embed
        # dim claimed by FSDP's 'data', hidden on 'model' (size 1 here) —
        # the composed ZeRO-3 + PP layout survived the donated step.
        fc1 = meshed.params["blocks"]["block"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec == param_sharding_rules(
            meshed.params, mesh, fsdp=True
        )["blocks"]["block"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec[0] == "stage"
        assert "data" in fc1.sharding.spec
        assert fc1.addressable_shards[0].data.size * 8 == fc1.size

        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(single.params)[0],
            jax.tree_util.tree_flatten_with_path(meshed.params)[0],
        ):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, err_msg=str(p1)
            )

    @pytest.mark.slow
    def test_fsdp_requires_mesh(self):
        import focused_attention_vit_tpu.experiments.traditional as tr

        e = tr.TraditionalViTExperiment(
            img_size=16, patch_size=4, num_classes=5, embed_dim=32,
            depth=1, num_heads=2, batch_size=8, epochs=1, subset_size=16,
            fsdp=True,
        )
        with pytest.raises(ValueError, match="fsdp requires a device mesh"):
            e.setup()


class TestMeshMicrobatch:
    """Gradient accumulation under a mesh: each scan chunk keeps its batch
    dim sharded over 'data' (train/steps.make_train_step) — global batch
    can exceed device memory on any mesh shape."""

    @pytest.mark.parametrize("fsdp", [False, True])
    def test_mesh_microbatch_matches_single_device_microbatch(self, fsdp):
        """2 steps at microbatch=8 on the dp8 mesh track the single-device
        microbatch=8 trajectory (identical chunking ⇒ identical math)."""
        from focused_attention_vit_tpu.parallel import state_shardings

        mesh, model, params, x_u8, y = _setup(tp=1)
        key = jax.random.PRNGKey(5)

        single = _fresh_state(model, params)
        step1 = make_train_step(16, augment=True, microbatch=8)
        meshed = shard_state(_fresh_state(model, params), mesh, fsdp=fsdp)
        sh = state_shardings(meshed, mesh, fsdp=True) if fsdp else None
        step2 = make_train_step(
            16, augment=True, mesh=mesh, microbatch=8, state_sharding=sh
        )

        for i in range(2):
            k = jax.random.fold_in(key, i)
            single, m1 = step1(single, x_u8, y, k)
            meshed, m2 = step2(meshed, x_u8, y, k)
            np.testing.assert_allclose(
                float(m1["loss_sum"]), float(m2["loss_sum"]), rtol=1e-4
            )

        for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(single.params)[0],
            jax.tree_util.tree_flatten_with_path(meshed.params)[0],
        ):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, err_msg=str(p1)
            )

    def test_indivisible_microbatch_rejected_at_build(self):
        mesh, *_ = _setup(tp=1)
        with pytest.raises(ValueError, match="data-parallel axis"):
            make_train_step(16, mesh=mesh, microbatch=4)


def test_fsdp_checkpoint_roundtrip_and_continue(tmp_path):
    """Orbax save of an FSDP-sharded TrainState, restore into a sharded
    template, and a further step: resume-after-crash works with ZeRO-3
    placement (the experiments/base.py resume path re-shards with
    fsdp=True after restore)."""
    from focused_attention_vit_tpu.parallel import state_shardings
    from focused_attention_vit_tpu.train.checkpoint import CheckpointManager

    mesh, model, params, x_u8, y = _setup(tp=1)
    meshed = shard_state(_fresh_state(model, params), mesh, fsdp=True)
    sh = state_shardings(meshed, mesh, fsdp=True)
    step = make_train_step(16, augment=True, mesh=mesh, state_sharding=sh)
    meshed, _ = step(meshed, x_u8, y, jax.random.PRNGKey(0))

    m = CheckpointManager(str(tmp_path / "ckpt"))
    m.save(1, meshed)
    assert m.latest_step() == 1

    template = shard_state(_fresh_state(model, params), mesh, fsdp=True)
    restored = m.restore(template)
    m.close()
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_flatten_with_path(meshed.params)[0],
        jax.tree_util.tree_flatten_with_path(restored.params)[0],
    ):
        assert k1 == k2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The restored state trains on. A resume process builds its own jitted
    # step (experiments/base.py does exactly this: the restore template is
    # the state the step was built around), so rebuild here too — the
    # sharding tree's TrainState metadata must come from THIS state's
    # tx/apply_fn instances.
    restored = shard_state(restored, mesh, fsdp=True)
    sh2 = state_shardings(restored, mesh, fsdp=True)
    step2 = make_train_step(16, augment=True, mesh=mesh, state_sharding=sh2)
    restored, metrics = step2(restored, x_u8, y, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_sum"]))


def test_elastic_restore_across_topologies(tmp_path):
    """A checkpoint is topology-portable: Orbax stores the *logical*
    arrays, and ``StandardRestore(template)`` lays them out per the
    template's shardings — so a run saved on one mesh resumes on another
    (pod-slice resize), on a single device, or vice versa. The reference
    has no checkpointing at all (SURVEY.md §5); this pins the elastic
    half of the TPU-native superset: 8-dev FSDP save → 4-dev FSDP
    restore + continued training, mesh → single-device, and
    single-device → mesh, all bit-equal."""
    from focused_attention_vit_tpu.parallel import state_shardings
    from focused_attention_vit_tpu.train.checkpoint import CheckpointManager

    mesh8, model, params, x_u8, y = _setup(tp=1)
    state8 = shard_state(_fresh_state(model, params), mesh8, fsdp=True)
    sh8 = state_shardings(state8, mesh8, fsdp=True)
    step8 = make_train_step(16, augment=True, mesh=mesh8, state_sharding=sh8)
    state8, _ = step8(state8, x_u8, y, jax.random.PRNGKey(0))

    m = CheckpointManager(str(tmp_path / "ckpt"))
    m.save(1, state8)
    want = jax.tree_util.tree_map(np.asarray, state8.params)

    def _check(restored_params):
        for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(want)[0],
            jax.tree_util.tree_flatten_with_path(restored_params)[0],
        ):
            assert k1 == k2
            np.testing.assert_array_equal(a, np.asarray(b))

    # (a) restore onto a SMALLER mesh (8 → 4 devices) and train on.
    mesh4 = make_mesh(4)
    tmpl4 = shard_state(_fresh_state(model, params), mesh4, fsdp=True)
    restored4 = m.restore(tmpl4)
    _check(restored4.params)
    leaf = jax.tree_util.tree_leaves(restored4.params)[0]
    assert len(leaf.sharding.mesh.devices.flatten()) == 4
    restored4 = shard_state(restored4, mesh4, fsdp=True)
    sh4 = state_shardings(restored4, mesh4, fsdp=True)
    step4 = make_train_step(16, augment=True, mesh=mesh4, state_sharding=sh4)
    x4 = jax.device_put(x_u8, NamedSharding(mesh4, P("data")))
    y4 = jax.device_put(y, NamedSharding(mesh4, P("data")))
    restored4, metrics = step4(restored4, x4, y4, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_sum"]))

    # (b) mesh checkpoint → plain single-device template.
    single = m.restore(_fresh_state(model, params))
    _check(single.params)

    # (c) single-device checkpoint → mesh template (scale-up resume).
    m.save(2, single)
    back_on_mesh = m.restore(
        shard_state(_fresh_state(model, params), mesh8, fsdp=True), step=2
    )
    m.close()
    _check(back_on_mesh.params)
    leaf = jax.tree_util.tree_leaves(back_on_mesh.params)[0]
    assert len(leaf.sharding.mesh.devices.flatten()) == 8


def test_fsdp_rules_compose_with_scan_and_pp():
    """FSDP on scan-form stacked leaves and under a 'stage' (PP) mesh:
    the depth axis keeps its PP owner, TP dims keep 'model', and 'data'
    lands on the largest remaining divisible dim."""
    mesh = make_mesh(8, tp=2)  # ('data','model') = (4, 2)
    model = fmodels.VisionTransformer(**TINY, scan_layers=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3))
    )["params"]
    rules = param_sharding_rules(params, mesh, fsdp=True)
    blk = rules["blocks"]["block"]
    # Stacked fc1 [depth=2, 32, 128]: TP on the hidden dim; 'data' (4)
    # fits only the embed dim (depth 2 % 4 != 0).
    assert blk["mlp"]["fc1"]["kernel"] == P(None, "data", "model")
    # Stacked qkv [2, 32, 3, 4, 8]: heads → 'model', embed → 'data'.
    assert blk["attn"]["qkv"]["kernel"] == P(None, "data", None, "model", None)

    pp_mesh = make_mesh(8, tp=2, pp=2)  # ('data','model','stage') = (2,2,2)
    rules = param_sharding_rules(params, pp_mesh, fsdp=True)
    blk = rules["blocks"]["block"]
    # Depth axis owned by 'stage'; FSDP takes the hidden dim? No — TP has
    # it; largest free divisible dim is the embed dim (32 % 2 == 0).
    assert blk["mlp"]["fc1"]["kernel"] == P("stage", "data", "model")
    assert blk["attn"]["qkv"]["kernel"] == P(
        "stage", "data", None, "model", None
    )
