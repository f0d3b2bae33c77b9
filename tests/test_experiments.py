"""Smoke-train tests for the experiment pipelines (tiny configs, CPU).

The reference's de-facto smoke mode is ``subset_size`` (SURVEY.md §4);
these tests run each pipeline for one epoch on tiny synthetic data and
assert the CSV contract (filenames + schema columns) the reference
produces.
"""

import os

import pandas as pd
import pytest

from focused_attention_vit_tpu import experiments as exp

TINY = dict(
    img_size=16,
    patch_size=4,
    num_classes=10,
    embed_dim=32,
    depth=1,
    num_heads=2,
    batch_size=32,
    epochs=1,
    subset_size=64,
)


@pytest.fixture()
def dirs(tmp_path):
    return dict(data_dir=str(tmp_path / "data"), results_dir=str(tmp_path / "results"))


def _cols(path):
    return list(pd.read_csv(path).columns)


@pytest.mark.slow
def test_traditional(dirs):
    e = exp.TraditionalViTExperiment(**TINY, **dirs)
    e.run()
    csv = os.path.join(dirs["results_dir"], "exp1_traditional.csv")
    assert _cols(csv) == [
        "model", "img_size", "patch_size", "embed_dim", "depth", "num_heads",
        "parameters", "flops", "time_complexity", "space_complexity_mb",
        "model_size_mb", "avg_epoch_time", "total_training_time",
        "final_val_acc", "final_val_loss", "test_acc", "test_loss",
        "avg_inference_time_per_image", "peak_gpu_memory_mb",
    ]


@pytest.mark.slow
def test_sppp(dirs):
    e = exp.SPPPExperiment(**TINY, **dirs, num_superpixels=4)
    e.run()
    csv = os.path.join(dirs["results_dir"], "exp2_sppp.csv")
    cols = _cols(csv)
    for c in ["num_superpixels", "traditional_tokens", "sppp_tokens",
              "token_reduction_factor"]:
        assert c in cols
    row = pd.read_csv(csv).iloc[0]
    assert row["sppp_tokens"] == 5  # R+1
    assert row["traditional_tokens"] == 17  # (16/4)²+1


@pytest.mark.slow
def test_mhla_pretrained_offline_fallback(dirs):
    """Without a cached checkpoint the experiment must fall back to random
    init (logged) and still produce the exp4 CSV with LR-group counts.
    (The repo's own pretrained_weights/ may hold the generated fixture, so
    point the cache at an empty dir to exercise the fallback.)"""
    e = exp.PretrainedMHLAViTExperiment(
        **TINY, **dirs, window_size=5, head_learning_rate=1e-3,
        pretrained_cache_dir=os.path.join(dirs["results_dir"], "empty_cache"),
    )
    e.run()
    assert e.pretrained_loaded is False
    csv = os.path.join(dirs["results_dir"], "exp4_pretrained_mhla.csv")
    cols = _cols(csv)
    for c in ["pretrained_source", "pretrained_model_variant", "freeze_layers",
              "window_size", "complexity_reduction_ratio", "total_parameters",
              "trainable_parameters", "frozen_parameters"]:
        assert c in cols
    row = pd.read_csv(csv).iloc[0]
    assert row["trainable_parameters"] == row["total_parameters"]


@pytest.mark.slow
def test_mhla_pretrained_freeze(dirs):
    e = exp.PretrainedMHLAViTExperiment(
        **TINY, **dirs, window_size=5, freeze_layers=True
    )
    e.run()
    row = pd.read_csv(
        os.path.join(dirs["results_dir"], "exp4_pretrained_mhla.csv")
    ).iloc[0]
    # Frozen: only head + latent_proj trainable
    # (reference: experiments/mhla_pretrained.py:237-247).
    assert 0 < row["trainable_parameters"] < row["total_parameters"]


@pytest.mark.slow
def test_cross_attention_sppp_multihead(dirs):
    e = exp.CrossAttentionExperiment(
        **TINY, **dirs, use_sppp=True, use_multi_head=True, num_superpixels=4
    )
    e.run()
    csv = os.path.join(
        dirs["results_dir"], "exp5_multihead_cross_attention_sppp.csv"
    )
    cols = _cols(csv)
    assert "use_multi_head" in cols and "num_superpixels" in cols


@pytest.mark.slow
def test_sppp_mhla_cifar100(dirs):
    """BASELINE.json config #4: combined SPPP+MHLA on CIFAR-100 (synthetic
    fallback here — 100-class shape contract)."""
    cfg = dict(TINY, num_classes=100)
    e = exp.PretrainedSPPPMHLAExperiment(
        **cfg, **dirs, dataset="cifar100", num_superpixels=4, window_size=3
    )
    e.run()
    csv = os.path.join(dirs["results_dir"], "exp5_pretrained_sppp_mhla.csv")
    row = pd.read_csv(csv).iloc[0]
    assert row["num_superpixels"] == 4 and row["window_size"] == 3
    assert e.data["num_classes"] == 100


@pytest.mark.slow
def test_freeze_layers_list(dirs):
    """List-valued freeze_layers freezes matching parameter paths
    (reference: utils/data_utils.py:535-539)."""
    cfg = dict(TINY, epochs=0)
    e = exp.PretrainedMHLAViTExperiment(
        **cfg, **dirs, window_size=5, freeze_layers=["blocks_0"]
    )
    e.setup()
    labels = e._label_tree(e.state.params)
    import jax

    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    for path, label in flat:
        p = "/".join(str(getattr(x, "key", "")) for x in path)
        if p.startswith("blocks_0") and "latent_proj" not in p:
            assert label == "frozen", p
        elif p.startswith("blocks_0") and "latent_proj" in p:
            assert label == "latent"


@pytest.mark.slow
def test_visualize_outputs(dirs):
    from focused_attention_vit_tpu.cli import _save_visualizations, parse_args

    args = parse_args([
        "--experiment", "traditional", "--patch_size", "8",
        "--subset_size", "32",
        "--data_dir", dirs["data_dir"], "--results_dir", dirs["results_dir"],
    ])
    os.makedirs(dirs["results_dir"], exist_ok=True)
    _save_visualizations(args)
    assert os.path.exists(os.path.join(dirs["results_dir"], "sample_images.png"))
    assert os.path.exists(os.path.join(dirs["results_dir"], "sample_patches.png"))


def test_batch_runners_construct_all_four_configs(dirs, monkeypatch):
    """The 4A-D / 5A-D batch runners must instantiate the reference's four
    sub-configurations (experiments/attention.py:628-819)."""
    from types import SimpleNamespace

    from focused_attention_vit_tpu.experiments import attention as attn_mod

    seen = []
    monkeypatch.setattr(
        attn_mod.CrossAttentionExperiment,
        "run",
        lambda self: seen.append(
            (self.use_sppp, self.use_pretrained, self.use_multi_head,
             self.csv_filename)
        ),
    )
    args = SimpleNamespace(
        img_size=16, patch_size=4, dataset="cifar10", embed_dim=32, depth=1,
        num_heads=2, mlp_ratio=4.0, dropout=0.1, attn_dropout=0.0,
        embed_dropout=0.0, batch_size=32, learning_rate=1e-4,
        weight_decay=0.05, epochs=1, data_dir=dirs["data_dir"],
        results_dir=dirs["results_dir"], subset_size=64, num_superpixels=4,
        compactness=0.1, pooling_type="mean",
        pretrained_model_variant="vit_b_16", pretrained_source="torchvision",
        freeze_layers=False, seed=0,
    )
    attn_mod.run_cross_attention_experiments(args)
    assert [s[:3] for s in seen] == [
        (False, False, False), (True, False, False),
        (False, True, False), (True, True, False),
    ]
    assert seen[0][3] == "exp4_cross_attention_traditional.csv"
    assert seen[3][3] == "exp4_cross_attention_pretrained_sppp.csv"

    seen.clear()
    attn_mod.run_multihead_cross_attention_experiments(args)
    assert all(s[2] for s in seen) and len(seen) == 4
    assert seen[1][3] == "exp5_multihead_cross_attention_sppp.csv"


@pytest.mark.slow
def test_cli_dispatch(dirs, capsys):
    """The CLI must dispatch every experiment name without the reference's
    import crashes (main.py:41-43)."""
    from focused_attention_vit_tpu.cli import main

    main([
        "--experiment", "traditional",
        "--img_size", "16", "--patch_size", "4", "--embed_dim", "32",
        "--depth", "1", "--num_heads", "2", "--batch_size", "32",
        "--epochs", "1", "--subset_size", "64",
        "--data_dir", dirs["data_dir"], "--results_dir", dirs["results_dir"],
    ])
    assert os.path.exists(
        os.path.join(dirs["results_dir"], "exp1_traditional.csv")
    )


def test_microbatch_accumulation_matches_single_batch():
    """Gradient accumulation (microbatch) ≡ monolithic batch step: same
    loss, same parameter trajectory to Adam-noise tolerance (augment and
    dropout off so the math is deterministic)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from focused_attention_vit_tpu.models import VisionTransformer
    from focused_attention_vit_tpu.train.state import TrainState, make_adamw
    from focused_attention_vit_tpu.train.steps import make_train_step

    rng = np.random.default_rng(0)
    b = 16
    model = VisionTransformer(
        img_size=32, patch_size=4, num_classes=10,
        embed_dim=64, depth=2, num_heads=4, dropout=0.0,
    )
    x = jnp.asarray(rng.integers(0, 255, size=(b, 32, 32, 3)), dtype=jnp.uint8)
    y = jnp.asarray(rng.integers(0, 10, size=(b,)))
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )["params"]

    def run(mb):
        p = jax.tree.map(lambda a: a.copy(), params0)  # donation-safe
        state = TrainState.create(
            apply_fn=model.apply, params=p, tx=make_adamw(1e-3)
        )
        step = make_train_step(32, augment=False, microbatch=mb)
        key = jax.random.PRNGKey(0)
        for i in range(3):
            state, m = step(state, x, y, jax.random.fold_in(key, i))
        return state, m

    s1, m1 = run(None)
    s2, m2 = run(4)
    np.testing.assert_allclose(
        float(m1["loss_sum"]), float(m2["loss_sum"]), rtol=1e-5
    )
    assert int(m2["count"]) == b
    diffs = jax.tree.map(
        lambda a, c: float(jnp.abs(a - c).max()), s1.params, s2.params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4  # Adam-amplified float reorder


def test_f64_microbatch_step_traces_and_matches_monolithic(tmp_path):
    """Gradient accumulation composes with a float64 run (the
    training-dynamics parity harness): the scan carry accumulators take
    promote(param_dtype, f32), so an f64 step with microbatch set traces
    (a forced-f32 carry made lax.scan reject the f64 chunk grads at
    trace time) and reproduces the monolithic step's update to f64
    precision. Subprocess: enabling x64 is process-global."""
    import subprocess
    import sys
    import textwrap

    script = tmp_path / "mb64.py"
    script.write_text(textwrap.dedent("""
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        from focused_attention_vit_tpu import models as fmodels
        from focused_attention_vit_tpu.train.state import (
            make_adamw, create_train_state)
        from focused_attention_vit_tpu.train.steps import make_train_step

        TINY = dict(img_size=16, patch_size=4, num_classes=5,
                    embed_dim=32, depth=1, num_heads=2)
        model = fmodels.VisionTransformer(**TINY, dtype=jnp.float64)
        rng = np.random.default_rng(0)
        u8 = jnp.asarray(rng.integers(0, 256, size=(8, 16, 16, 3)),
                         dtype=jnp.uint8)
        y = jnp.asarray(rng.integers(0, 5, size=(8,)))

        def fresh():
            st = create_train_state(
                model, jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                make_adamw(1e-3, 0.05))
            return st.replace(params=jax.tree.map(
                lambda p: p.astype(jnp.float64), st.params))

        kw = dict(augment=False, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                  compute_dtype=jnp.float64)
        key = jax.random.PRNGKey(3)
        s_mono, _ = make_train_step(16, **kw)(fresh(), u8, y, key)
        s_mb, _ = make_train_step(16, microbatch=4, **kw)(fresh(), u8, y, key)
        worst = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(jax.tree.leaves(s_mono.params),
                            jax.tree.leaves(s_mb.params)))
        assert jax.tree.leaves(s_mb.params)[0].dtype == jnp.float64
        print("WORST", worst)
        assert worst < 1e-9, worst
        print("MB64 OK")
    """))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MB64 OK" in out.stdout


def test_effective_microbatch_rules(dirs):
    data_dir, results_dir = dirs["data_dir"], dirs["results_dir"]
    e = exp.TraditionalViTExperiment(
        batch_size=128, data_dir=data_dir, results_dir=results_dir
    )
    e.mesh = None
    assert e._effective_microbatch() == 16  # auto for dense ViT
    e.microbatch = 0
    assert e._effective_microbatch() is None  # 0 disables
    e.microbatch = 50  # not a divisor of 128: explicit flag errors loudly
    with pytest.raises(ValueError, match="divisor"):
        e._effective_microbatch()
    e.microbatch = 128  # == batch_size: no chunking possible, also loud
    with pytest.raises(ValueError, match="divisor"):
        e._effective_microbatch()
    e.microbatch = 64
    assert e._effective_microbatch() == 64

    s = exp.SPPPExperiment(
        batch_size=128, data_dir=data_dir, results_dir=results_dir
    )
    s.mesh = None
    assert s._effective_microbatch() is None  # SPPP opts out of auto


def test_slic_connectivity_flag_mapping(dirs):
    data_dir, results_dir = dirs["data_dir"], dirs["results_dir"]
    e = exp.SPPPExperiment(data_dir=data_dir, results_dir=results_dir)
    assert e._slic_connectivity() == "auto"
    e.slic_connectivity = "on"
    assert e._slic_connectivity() is True
    e.slic_connectivity = "off"
    assert e._slic_connectivity() is False
    e.slic_connectivity = "host"
    assert e._slic_connectivity() == "host"
    e.slic_connectivity = "bogus"
    with pytest.raises(ValueError):
        e._slic_connectivity()


def test_slic_iters_threads_to_model(dirs):
    """--slic_iters reaches the SPPP model (opt-in fidelity/speed knob;
    default 10 = skimage-faithful, BASELINE.md 'SPPP SLIC iteration
    count')."""
    e = exp.SPPPExperiment(**dirs)
    assert e.build_model().slic_iters == 10
    e.slic_iters = 7
    assert e.build_model().slic_iters == 7
    # CLI wiring: the flag lands in the experiment config.
    from focused_attention_vit_tpu.cli import parse_args

    args = parse_args(["--experiment", "sppp", "--slic_iters", "6"])
    assert args.slic_iters == 6


@pytest.mark.slow
def test_remat_policy_flag_mapping(dirs):
    """--remat_policy threads to the MHLA model; requires --remat; errors
    clearly on models without the knob (dense ViT has no band)."""
    data_dir, results_dir = dirs["data_dir"], dirs["results_dir"]
    common = dict(data_dir=data_dir, results_dir=results_dir,
                  subset_size=64,  # setup() loads data; keep it tiny
                  img_size=32, patch_size=4, embed_dim=64, depth=2,
                  num_heads=4)

    e = exp.PretrainedMHLAViTExperiment(
        remat=True, remat_policy="band_weights", **common
    )
    assert e.build_model().remat_policy == "band_weights"

    with pytest.raises(ValueError, match="--remat"):
        exp.PretrainedMHLAViTExperiment(
            remat_policy="band_weights", **common
        ).setup()

    with pytest.raises(ValueError, match="remat_policy"):
        exp.TraditionalViTExperiment(
            remat=True, remat_policy="band_weights", **common
        ).setup()

    # 'full' is the explicit spelling of plain --remat — valid on any
    # remat-capable model, including dense ViT (review finding: the
    # truthy string tripped the hasattr check and errored the control
    # arm of a full-vs-band_weights sweep).
    exp.TraditionalViTExperiment(
        remat=True, remat_policy="full", **common
    ).setup()


@pytest.mark.slow
def test_mhla_pretrained_scan_layers_pp(dirs):
    """--scan_layers on a pretrained experiment: loop-form merge is stacked
    to the scan form (pretrained_common.build_params), enabling --pp; a
    DP×PP run trains and writes the reference CSV."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 simulated devices")
    e = exp.PretrainedMHLAViTExperiment(
        **{**TINY, "depth": 2, "batch_size": 8, "subset_size": 16},
        **dirs,
        window_size=5,
        scan_layers=True,
        num_devices=4,
        pp=2,
    )
    e.run()
    # Scan-form stacked params with a leading depth axis.
    blk = e.state.params["blocks"]["block"]
    assert blk["mlp"]["fc1"]["kernel"].shape[0] == 2
    assert os.path.exists(
        os.path.join(dirs["results_dir"], "exp4_pretrained_mhla.csv")
    )


@pytest.mark.slow
def test_mhla_pretrained_sp_pp_composition(dirs):
    """--sp 2 --pp 2 through the full experiment path (round 5): under
    the pipeline the sequence axis rides GSPMD (models/layers.py
    sp_gspmd — Shardy rejects nested manual regions), composed with DP.
    img 32 / patch 4 → S=65 > 2W so the banded path is actually
    exercised, not the tiny-S gather fallback."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    e = exp.PretrainedMHLAViTExperiment(
        **{**TINY, "img_size": 32, "depth": 2, "batch_size": 8,
           "subset_size": 16},
        **dirs,
        window_size=5,
        scan_layers=True,
        num_devices=8,
        sp=2,
        pp=2,
    )
    e.run()
    assert dict(e.mesh.shape) == {
        "data": 2, "model": 1, "seq": 2, "stage": 2
    }
    assert os.path.exists(
        os.path.join(dirs["results_dir"], "exp4_pretrained_mhla.csv")
    )


def test_mhla_auto_microbatch_geometry_rule(dirs):
    """MHLA experiments: auto-microbatch is 16 at short S (dense band
    path) and 1 at long S (roll-kernel band path — measured best at
    S=3137 b32, divides every batch) — BASELINE.md attacks #3/#6/#8."""
    e = exp.PretrainedMHLAViTExperiment(**TINY, **dirs)  # img16/p4 → S=17
    assert e._auto_microbatch_value() == 16
    e.img_size, e.patch_size = 224, 4  # S=3137
    assert e._auto_microbatch_value() == 1
    e.batch_size = 124
    assert e._auto_microbatch_value() == 1
    e.batch_size = 30  # mb1 divides every batch — no fallback needed
    assert e._auto_microbatch_value() == 1
    e.microbatch = None
    e.mesh = None
    e.batch_size = 32
    assert e._effective_microbatch() == 1


@pytest.mark.slow
def test_elastic_resume_across_mesh_sizes(dirs, tmp_path):
    """Auto-resume is topology-elastic end-to-end through the experiment
    pipeline: a segment trained on an 8-device FSDP mesh resumes on a
    4-device FSDP mesh (the restore template is built on the CURRENT
    mesh, so Orbax lays the stored logical arrays out for it), and a
    final single-device segment restores the mesh-saved checkpoint too
    (pod-slice resize / scale-down resume, the CLI-level counterpart of
    tests/test_parallel.py::test_elastic_restore_across_topologies)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    ckpt = str(tmp_path / "ckpt")
    e1 = exp.TraditionalViTExperiment(
        **TINY, **dirs, checkpoint_dir=ckpt, num_devices=8, fsdp=True
    )
    e1.run()
    from focused_attention_vit_tpu.train.checkpoint import CheckpointManager

    m = CheckpointManager(ckpt)
    assert m.latest_step() == 1
    m.close()

    e2 = exp.TraditionalViTExperiment(
        **dict(TINY, epochs=2), **dirs, checkpoint_dir=ckpt,
        num_devices=4, fsdp=True,
    )
    e2.run()
    m = CheckpointManager(ckpt)
    assert m.latest_step() == 2
    m.close()
    # the resumed segment trained exactly 1 further epoch on the new mesh
    assert len(e2.metrics["training"]["train_losses"]) == 1
    leaf = jax.tree_util.tree_leaves(e2.state.params)[0]
    assert len(leaf.sharding.mesh.devices.flatten()) == 4

    # Scale-down to a single device: nothing left to train, the restored
    # model's val metrics must fill the CSV columns (same contract as
    # test_checkpoint_resume_continues_global_step's third segment).
    e3 = exp.TraditionalViTExperiment(
        **dict(TINY, epochs=2), **dirs, checkpoint_dir=ckpt
    )
    e3.run()
    assert len(e3.metrics["training"]["train_losses"]) == 0
    assert e3.metrics["training"]["final_val_loss"] > 0.0
    assert abs(
        e3.metrics["training"]["final_val_loss"]
        - e2.metrics["training"]["val_losses"][-1]
    ) < 1e-5


@pytest.mark.slow
def test_checkpoint_resume_continues_global_step(dirs, tmp_path):
    """Auto-resume continues the GLOBAL checkpoint numbering: a 2-epoch
    run leaves steps {1,2}; rerunning the same config at 4 epochs resumes
    from 2 and must save steps 3 and 4 (not rewrite 1..2, which would
    strand latest_step at the old maximum and make a third restart
    restore stale weights)."""
    ckpt = str(tmp_path / "ckpt")
    kw = dict(TINY, epochs=2)
    e1 = exp.TraditionalViTExperiment(**kw, **dirs, checkpoint_dir=ckpt)
    e1.run()
    from focused_attention_vit_tpu.train.checkpoint import CheckpointManager

    m = CheckpointManager(ckpt)
    assert m.latest_step() == 2
    m.close()

    kw = dict(TINY, epochs=4)
    e2 = exp.TraditionalViTExperiment(**kw, **dirs, checkpoint_dir=ckpt)
    e2.run()
    m = CheckpointManager(ckpt)
    assert m.latest_step() == 4
    m.close()
    # the resumed segment trained only 2 epochs
    assert len(e2.metrics["training"]["train_losses"]) == 2

    # Resume with nothing left to train (start_epoch >= epochs): the run
    # must still report the restored model's val metrics in the CSV
    # columns instead of final_val_acc=0.0 from the empty segment.
    e3 = exp.TraditionalViTExperiment(
        **dict(TINY, epochs=4), **dirs, checkpoint_dir=ckpt
    )
    e3.run()
    assert len(e3.metrics["training"]["train_losses"]) == 0
    tr = e3.metrics["training"]
    ev = e3.metrics["evaluation"]
    # The filled-in metrics must describe the RESTORED model, i.e. match the
    # previous run's final val metrics, not the 0.0 defaults of an empty
    # segment. (final_val_acc itself may legitimately be 0.0 on this tiny
    # synthetic set, so the non-vacuous guard is the loss.)
    tr2 = e2.metrics["training"]
    assert tr["final_val_loss"] > 0.0
    assert abs(tr["final_val_loss"] - tr2["val_losses"][-1]) < 1e-5
    assert abs(tr["final_val_acc"] - tr2["val_accs"][-1]) < 1e-5
    # val set == test set in this pipeline, so the filled-in final_val
    # metrics must agree with evaluate()'s.
    assert abs(tr["final_val_acc"] - ev["test_acc"]) < 1e-6
    assert abs(tr["final_val_loss"] - ev["test_loss"]) < 1e-6


def test_predictor_empty_batch_returns_empty(dirs):
    from focused_attention_vit_tpu.infer import Predictor
    from focused_attention_vit_tpu.models import VisionTransformer
    import jax
    import jax.numpy as jnp
    import numpy as np

    model = VisionTransformer(
        img_size=16, patch_size=4, num_classes=7, embed_dim=32, depth=1,
        num_heads=2, dtype=jnp.float32,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )["params"]
    p = Predictor(model, params, img_size=16, batch_size=4,
                  compute_dtype=jnp.float32)
    out = p.predict_proba(np.zeros((0, 16, 16, 3), np.uint8))
    assert out.shape == (0, 7)


@pytest.mark.slow
def test_fsdp_experiment_end_to_end(dirs):
    """--fsdp through the full experiment pipeline: train + eval + detailed
    metrics + CSV on an 8-device mesh with ZeRO-3-sharded state. The
    updated state must KEEP the FSDP layout after training (the
    out_shardings pin in make_train_step), not densify."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    e = exp.TraditionalViTExperiment(**TINY, **dirs, num_devices=8, fsdp=True)
    e.run()
    assert os.path.exists(
        os.path.join(dirs["results_dir"], "exp1_traditional.csv")
    )
    fc1 = e.state.params["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec("data", "model")
    assert fc1.addressable_shards[0].data.size * 8 == fc1.size


@pytest.mark.slow
def test_mesh_microbatch_indivisible_rejected(dirs):
    """--microbatch composes with a mesh (gradient accumulation with
    batch-sharded chunks), but a chunk that does not split evenly over
    the 'data' axis must error loudly, not silently reshard."""
    e = exp.TraditionalViTExperiment(
        **TINY, **dirs, num_devices=8, microbatch=4
    )
    with pytest.raises(ValueError, match="data-parallel axis"):
        e.run()


@pytest.mark.slow
def test_negative_microbatch_rejected(dirs):
    e = exp.TraditionalViTExperiment(**TINY, **dirs, microbatch=-1)
    with pytest.raises(ValueError, match="positive"):
        e.run()


@pytest.mark.slow
def test_sppp_scan_layers_rejected(dirs):
    """SPPP models have no scan/remat support — the flag must error, not
    silently no-op (the --pp error message even told users to pass it)."""
    e = exp.SPPPExperiment(
        **{**TINY, "batch_size": 16}, **dirs, num_superpixels=4,
        scan_layers=True,
    )
    with pytest.raises(ValueError, match="scan_layers"):
        e.run()


def test_dataset_class_count_overrides_config(dirs, tmp_path, monkeypatch):
    """An ImageFolder tree with N class dirs must produce an N-way head
    regardless of the config default (out-of-range labels train garbage
    and mis-shape the detailed metrics)."""
    import numpy as np
    import PIL.Image as Image

    root = tmp_path / "data" / "imagenet"
    for split in ("train", "val"):
        for cls in ("a", "b", "c"):
            d = root / split / cls
            d.mkdir(parents=True)
            Image.fromarray(
                np.zeros((8, 8, 3), np.uint8)
            ).save(d / "x.png")
    e = exp.TraditionalViTExperiment(
        **{**TINY, "num_classes": 10, "subset_size": 0, "batch_size": 2},
        data_dir=str(tmp_path / "data"),
        results_dir=dirs["results_dir"],
        dataset="imagenet",
    )
    e.setup()
    assert e.num_classes == 3
    assert e.model.num_classes == 3
