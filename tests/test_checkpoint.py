"""Checkpoint save/restore round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from focused_attention_vit_tpu import models as fmodels
from focused_attention_vit_tpu.train.state import TrainState, make_adamw
from focused_attention_vit_tpu.train.checkpoint import (
    CheckpointManager,
    save_params,
    load_params,
)

TINY = dict(img_size=16, patch_size=4, num_classes=5, embed_dim=32, depth=1, num_heads=2)


def _state():
    model = fmodels.VisionTransformer(**TINY)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, TrainState.create(
        apply_fn=model.apply, params=params, tx=make_adamw(1e-3)
    ), x


def test_trainstate_roundtrip(tmp_path):
    model, state, x = _state()
    # advance one step so opt_state is non-trivial
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads=grads)

    mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mngr.save(1, state)
    assert mngr.latest_step() == 1

    _, template, _ = _state()
    restored = mngr.restore(template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]),
    )
    assert int(restored.step) == 1
    mngr.close()


def test_params_msgpack_roundtrip(tmp_path):
    model, state, x = _state()
    path = save_params(str(tmp_path / "params.msgpack"), state.params)
    _, template, _ = _state()
    loaded = load_params(path, template.params)
    out1 = model.apply({"params": state.params}, x)
    out2 = model.apply({"params": loaded}, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
