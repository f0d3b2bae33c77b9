"""jax.export serving artifacts (focused_attention_vit_tpu/export.py).

The artifact must reproduce the live Predictor bit-for-bit (it serializes
the very program the Predictor serves with), load without any model class,
and round-trip through the serve CLI's --export_artifact/--from_export
surface. The reference has no deployment format at all (it re-constructs
Python modules around .pth state dicts, utils/data_utils.py:247-384).
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from focused_attention_vit_tpu import models as fmodels
from focused_attention_vit_tpu.infer import Predictor
from focused_attention_vit_tpu.export import (
    ExportedPredictor,
    load_serving_artifact,
    save_serving_artifact,
)

TINY = dict(img_size=16, patch_size=4, num_classes=5, embed_dim=32,
            depth=1, num_heads=2)


def _predictor(batch_size=8, **kw):
    model = fmodels.VisionTransformer(**TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))[
        "params"
    ]
    return Predictor(
        model, params, img_size=16, batch_size=batch_size,
        compute_dtype=jnp.float32, **kw,
    )


def test_artifact_round_trip_matches_live(tmp_path):
    pred = _predictor()
    out = save_serving_artifact(pred, str(tmp_path / "art"))
    loaded = load_serving_artifact(out)
    assert isinstance(loaded, ExportedPredictor)

    rng = np.random.default_rng(0)
    for n in (1, 8, 13):  # padding path included
        imgs = rng.integers(0, 256, size=(n, 16, 16, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            loaded.predict_proba(imgs), pred.predict_proba(imgs)
        )
    ids, conf = loaded.predict(imgs)
    assert ids.shape == (13,) and (conf <= 1.0).all()


def test_long_s_mhla_artifact_round_trip(tmp_path):
    """Long-S windowed-MHLA export (round 5): S=785 > DENSE_BAND_MAX_SEQ
    exercises the banded dispatch inside jax.export. Kernel dispatch
    resolves at TRACE time — exporting from a CPU process lowers the XLA
    shift band for BOTH platforms (the TPU-only Pallas roll kernel is
    never baked into a multi-platform artifact), so the artifact loads
    and reproduces the live Predictor everywhere."""
    model = fmodels.VisionTransformerMHLA(
        img_size=112, patch_size=4, num_classes=5, embed_dim=32,
        depth=1, num_heads=2, window_size=7, use_mhla=True,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3))
    )["params"]
    pred = Predictor(
        model, params, img_size=112, batch_size=4,
        compute_dtype=jnp.float32,
    )
    out = save_serving_artifact(pred, str(tmp_path / "art"))
    loaded = load_serving_artifact(out)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(4, 112, 112, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        loaded.predict_proba(imgs), pred.predict_proba(imgs)
    )


def test_artifact_loads_without_model_code(tmp_path):
    """The loader touches only jax/flax-serialization — no framework model
    classes. Pin that by checking the artifact contents are sufficient:
    program bytes + plain-dict params + meta."""
    pred = _predictor()
    out = save_serving_artifact(pred, str(tmp_path / "art"))

    assert sorted(os.listdir(out)) == [
        "meta.json", "params.msgpack", "serving_fn.jaxexport"
    ]
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["batch_size"] == 8
    assert meta["num_classes"] == 5
    assert meta["input_hw"] == [16, 16]
    assert "tpu" in meta["platforms"] and "cpu" in meta["platforms"]

    from flax import serialization

    params = serialization.msgpack_restore(
        open(os.path.join(out, "params.msgpack"), "rb").read()
    )
    assert isinstance(params, dict)  # plain pytree, no Flax class wrappers

    rehydrated = jax.export.deserialize(
        open(os.path.join(out, "serving_fn.jaxexport"), "rb").read()
    )
    imgs = np.zeros((8, 16, 16, 3), dtype=np.uint8)
    probs = np.asarray(rehydrated.call(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_artifact_chunked_program_exported(tmp_path):
    """batch 16 / chunk 8 exercises the chunk-scan serving schedule
    through export (the scan is inside the exported program)."""
    pred = _predictor(batch_size=16, chunk=8)
    out = save_serving_artifact(pred, str(tmp_path / "art"))
    loaded = load_serving_artifact(out)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(19, 16, 16, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        loaded.predict_proba(imgs), pred.predict_proba(imgs)
    )


def test_mesh_predictor_refused(tmp_path):
    from focused_attention_vit_tpu.parallel import make_mesh

    pred = _predictor(batch_size=8, mesh=make_mesh(2, tp=1))
    with pytest.raises(ValueError, match="mesh-sharded"):
        save_serving_artifact(pred, str(tmp_path / "art"))


def test_serve_cli_export_and_reload(tmp_path):
    """--export_artifact writes the artifact from a training checkpoint;
    --from_export then reconstructs a server-ready predictor. (The HTTP
    part itself is covered by test_serve.py; here we stop at the
    predictor by invoking main()'s building blocks via the flags.)"""
    import optax

    from focused_attention_vit_tpu import serve
    from focused_attention_vit_tpu.train.checkpoint import CheckpointManager
    from focused_attention_vit_tpu.train.state import TrainState

    model = fmodels.VisionTransformer(**TINY)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))[
        "params"
    ]
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.sgd(0.1)
    )
    ckdir = tmp_path / "ck"
    mgr = CheckpointManager(str(ckdir))
    mgr.save(1, state)
    mgr.close()

    art = tmp_path / "art"
    args = [
        "--checkpoint_dir", str(ckdir),
        "--model", "vit", "--img_size", "16", "--patch_size", "4",
        "--num_classes", "5", "--embed_dim", "32", "--depth", "1",
        "--num_heads", "2", "--compute_dtype", "float32",
        "--batch_size", "4", "--export_artifact", str(art),
    ]
    serve.main(args)  # returns after writing the artifact

    loaded = load_serving_artifact(str(art))
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, size=(5, 16, 16, 3), dtype=np.uint8)
    live = Predictor(
        model, state.params, img_size=16, batch_size=4,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(
        loaded.predict_proba(imgs), live.predict_proba(imgs)
    )


def test_reexport_overwrites_atomically(tmp_path):
    """Re-exporting into an existing artifact dir replaces it whole-dir
    (temp-dir + directory swap): the loader can never observe a MIXED
    artifact (new program + old params), and no temp dirs are left."""
    model = fmodels.VisionTransformer(**TINY)
    p1 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))[
        "params"
    ]
    p2 = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 16, 16, 3)))[
        "params"
    ]
    mk = lambda p: Predictor(
        model, p, img_size=16, batch_size=8, compute_dtype=jnp.float32
    )
    art = str(tmp_path / "art")
    save_serving_artifact(mk(p1), art)
    save_serving_artifact(mk(p2), art)  # overwrite with different params

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, size=(8, 16, 16, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        load_serving_artifact(art).predict_proba(imgs),
        mk(p2).predict_proba(imgs),
    )
    leftovers = [d for d in os.listdir(tmp_path) if ".tmp" in d]
    assert not leftovers, leftovers


def test_serve_cli_flag_conflicts(tmp_path):
    """--from_export is exclusive with --export_artifact and with
    --checkpoint_dir (the artifact carries its own program+params; a
    silently ignored checkpoint would serve stale predictions)."""
    from focused_attention_vit_tpu import serve

    with pytest.raises(SystemExit):
        serve.main(["--from_export", str(tmp_path),
                    "--export_artifact", str(tmp_path / "x")])
    with pytest.raises(SystemExit):
        serve.main(["--from_export", str(tmp_path),
                    "--checkpoint_dir", str(tmp_path / "ck")])
    with pytest.raises(SystemExit):
        serve.main([])  # neither source given


def test_exported_predictor_through_batching_server(tmp_path):
    """The --from_export serving stack: ExportedPredictor behind
    serve.BatchingServer must coalesce and answer like the live path."""
    from focused_attention_vit_tpu.serve import BatchingServer

    pred = _predictor()
    art = save_serving_artifact(pred, str(tmp_path / "art"))
    loaded = load_serving_artifact(art)
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, size=(11, 16, 16, 3), dtype=np.uint8)
    with BatchingServer(loaded, max_delay_ms=1.0) as srv:
        probs = srv.predict_proba(imgs)
    np.testing.assert_array_equal(probs, pred.predict_proba(imgs))


def test_load_missing_or_partial_artifact_fails_loudly(tmp_path):
    """A missing or partial artifact directory (e.g. a crash before the
    directory swap completed) must fail with a clear FileNotFoundError,
    never load a half-artifact."""
    with pytest.raises(FileNotFoundError):
        load_serving_artifact(str(tmp_path / "nope"))

    partial = tmp_path / "partial"
    partial.mkdir()
    (partial / "serving_fn.jaxexport").write_bytes(b"")
    with pytest.raises(FileNotFoundError):
        load_serving_artifact(str(partial))  # params/meta absent
