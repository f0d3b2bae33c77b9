"""Checkpoint save/restore round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

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


def _donating_step(state):
    """A jitted step that donates the state, like the production train
    step (train/steps.py) — the hazard async snapshots must survive."""
    return jax.jit(
        lambda s: s.apply_gradients(
            grads=jax.tree.map(jnp.ones_like, s.params)
        ),
        donate_argnums=0,
    )(state)


def test_async_save_snapshots_at_call_time(tmp_path):
    """An async save records the state AS OF the save() call even though
    training continues (and donates the live buffers) while the
    background writer is still pulling the snapshot to host."""
    model, state, x = _state()
    state = _donating_step(state)
    want_head = np.asarray(state.params["head"]["kernel"]).copy()

    mngr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    mngr.save(1, state)
    # keep training immediately — 3 more donated steps on the live state
    for _ in range(3):
        state = _donating_step(state)
    mngr.close()  # barrier: flushes the in-flight save

    mngr2 = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    assert mngr2.latest_step() == 1
    _, template, _ = _state()
    restored = mngr2.restore(template)
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]), want_head
    )
    assert int(restored.step) == 1
    # params sidecar was written by the background writer too
    loaded = load_params(mngr2.params_path(), template.params)
    np.testing.assert_array_equal(
        np.asarray(loaded["head"]["kernel"]), want_head
    )
    mngr2.close()


def test_async_snapshot_is_a_distinct_copy():
    """The on-device snapshot must be real copies (never input-forwarded
    buffers) and bit-exact incl. -0.0 — the properties the donation
    safety argument rests on."""
    from focused_attention_vit_tpu.train.checkpoint import _device_snapshot

    x = jnp.asarray(np.array([1.0, -0.0, 2.5], np.float32))
    tree = {"a": x, "b": 7, "c": jnp.arange(4)}
    snap = _device_snapshot(tree)
    assert snap["a"].unsafe_buffer_pointer() != x.unsafe_buffer_pointer()
    np.testing.assert_array_equal(np.asarray(snap["a"]), np.asarray(x))
    assert bool(np.signbit(np.asarray(snap["a"])[1]))  # -0.0 kept
    assert snap["b"] == 7  # non-array leaves pass through
    np.testing.assert_array_equal(np.asarray(snap["c"]), np.arange(4))


def test_async_save_failure_surfaces_at_next_sync_point(tmp_path):
    model, state, x = _state()
    mngr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)

    def boom(*a, **k):
        raise OSError("disk full")

    mngr._mngr.save = boom
    mngr.save(1, state)  # returns immediately; failure is in-flight
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        mngr.close()
    # the failure is consumed — the manager is usable again
    mngr2 = CheckpointManager(str(tmp_path / "ckpt2"), async_save=True)
    mngr2.save(1, state)
    mngr2.close()


def test_async_saves_serialize_and_retention_applies(tmp_path):
    model, state, x = _state()
    mngr = CheckpointManager(
        str(tmp_path / "ckpt"), max_to_keep=2, async_save=True
    )
    for step in (1, 2, 3):
        state = _donating_step(state)
        mngr.save(step, state)
    assert mngr.latest_step() == 3  # waits for the in-flight save
    _, template, _ = _state()
    assert int(mngr.restore(template).step) == 3
    assert mngr.restore(template, step=2) is not None
    mngr.close()


def test_cli_threads_sync_checkpoint():
    """--sync_checkpoint maps to the config (async is the default)."""
    from focused_attention_vit_tpu.cli import _common_kwargs, parse_args

    kw = _common_kwargs(parse_args(
        ["--experiment", "traditional", "--sync_checkpoint"]
    ))
    assert kw["sync_checkpoint"] is True
    kw = _common_kwargs(parse_args(["--experiment", "traditional"]))
    assert kw["sync_checkpoint"] is False


def test_params_msgpack_roundtrip(tmp_path):
    model, state, x = _state()
    path = save_params(str(tmp_path / "params.msgpack"), state.params)
    _, template, _ = _state()
    loaded = load_params(path, template.params)
    out1 = model.apply({"params": state.params}, x)
    out2 = model.apply({"params": loaded}, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
