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
    make_sharded_train_step,
)

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


def test_tp_rules_shard_mlp():
    mesh, model, params, *_ = _setup(tp=2)
    rules = param_sharding_rules(params, mesh)
    assert rules["blocks_0"]["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert rules["blocks_0"]["mlp"]["fc2"]["kernel"] == P("model", None)
    assert rules["blocks_0"]["attn"]["qkv"]["kernel"] == P(None, None)

    sharded = shard_params(params, mesh)
    shard_shape = (
        sharded["blocks_0"]["mlp"]["fc1"]["kernel"]
        .addressable_shards[0]
        .data.shape
    )
    assert shard_shape == (32, 128 // 2)


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
