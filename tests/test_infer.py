"""Serving-path tests: fixed-shape predictor, padding, checkpoint load."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from focused_attention_vit_tpu import models as fmodels
from focused_attention_vit_tpu.infer import Predictor

TINY = dict(img_size=16, patch_size=4, num_classes=5, embed_dim=32, depth=1, num_heads=2)


def _model_params():
    model = fmodels.VisionTransformer(**TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))[
        "params"
    ]
    return model, params


def test_predict_arbitrary_sizes():
    model, params = _model_params()
    pred = Predictor(
        model, params, img_size=16, batch_size=8, compute_dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    for n in (1, 7, 8, 13):
        imgs = rng.integers(0, 256, size=(n, 16, 16, 3), dtype=np.uint8)
        ids, conf = pred.predict(imgs)
        probs = pred.predict_proba(imgs)
        assert ids.shape == (n,) and probs.shape == (n, 5)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        assert (conf <= 1.0).all()

    # Padding must not change results: chunked vs whole.
    imgs = rng.integers(0, 256, size=(13, 16, 16, 3), dtype=np.uint8)
    p_all = pred.predict_proba(imgs)
    p_one = np.concatenate([pred.predict_proba(imgs[i : i + 1]) for i in range(13)])
    np.testing.assert_allclose(p_all, p_one, atol=1e-5)


def test_from_checkpoint(tmp_path):
    from focused_attention_vit_tpu.train.checkpoint import CheckpointManager
    from focused_attention_vit_tpu.train.state import TrainState

    model, params = _model_params()
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adamw(1e-3)
    )
    mngr = CheckpointManager(str(tmp_path / "ck"))
    mngr.save(1, state)
    mngr.close()

    pred = Predictor.from_checkpoint(
        model,
        str(tmp_path / "ck"),
        jnp.zeros((1, 16, 16, 3)),
        img_size=16,
        batch_size=4,
        compute_dtype=jnp.float32,
    )
    imgs = np.zeros((3, 16, 16, 3), dtype=np.uint8)
    ids, _ = pred.predict(imgs)
    assert ids.shape == (3,)


def test_predictor_on_mesh():
    """Multi-chip serving: Predictor with a ('data','model') mesh — DP
    batch sharding + TP params produce the same probabilities as the
    single-device predictor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from focused_attention_vit_tpu.infer import Predictor
    from focused_attention_vit_tpu.models import VisionTransformer
    from focused_attention_vit_tpu.parallel import make_mesh

    model = VisionTransformer(
        img_size=32, patch_size=4, num_classes=10,
        embed_dim=64, depth=2, num_heads=4,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )["params"]
    imgs = np.random.default_rng(0).integers(
        0, 255, size=(40, 32, 32, 3)
    ).astype(np.uint8)

    single = Predictor(
        model, params, img_size=32, batch_size=16, compute_dtype=jnp.float32
    )
    mesh = make_mesh(8, tp=2)
    sharded = Predictor(
        model, params, img_size=32, batch_size=16,
        compute_dtype=jnp.float32, mesh=mesh,
    )
    p1 = single.predict_proba(imgs)
    p2 = sharded.predict_proba(imgs)
    np.testing.assert_allclose(p1, p2, atol=2e-5, rtol=1e-4)

    import pytest

    with pytest.raises(ValueError):
        Predictor(model, params, img_size=32, batch_size=15, mesh=mesh)


def test_padded_predict_proba_pipelining_equivalence():
    """Multi-chunk requests run max_in_flight deep (async-dispatch
    pipelining, BASELINE.md 'serving-stack throughput'); results must be
    identical to the fully serial collection order for any depth."""
    import jax
    import jax.numpy as jnp

    from focused_attention_vit_tpu.infer import (
        Predictor,
        padded_predict_proba,
    )
    from focused_attention_vit_tpu.models import VisionTransformer

    model = VisionTransformer(
        img_size=32, patch_size=8, num_classes=10,
        embed_dim=64, depth=1, num_heads=4,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )["params"]
    pred = Predictor(
        model, params, img_size=32, batch_size=8, compute_dtype=jnp.float32
    )
    imgs = np.random.default_rng(3).integers(
        0, 255, size=(37, 32, 32, 3)  # 5 chunks, ragged tail
    ).astype(np.uint8)

    outs = [
        padded_predict_proba(
            pred._fwd, pred.params, 8, 10, imgs, max_in_flight=k
        )
        for k in (1, 2, 4)
    ]
    assert outs[0].shape == (37, 10)
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
