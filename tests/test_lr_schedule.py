"""LR schedules + gradient clipping (TPU extensions).

The reference trains at a constant LR with no clipping
(/root/reference/experiments/traditional.py:152-157); these are opt-in
supersets: --lr_schedule {constant,cosine}, --warmup_epochs,
--grad_clip_norm. The default path must stay bit-identical to the
reference protocol (constant float LR, no chain).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from focused_attention_vit_tpu.train.state import (
    make_adamw,
    make_grouped_optimizer,
    make_lr_schedule,
)


class TestMakeLRSchedule:
    def test_constant_no_warmup_is_bare_float(self):
        assert make_lr_schedule(3e-4, "constant") == 3e-4

    def test_constant_with_warmup(self):
        s = make_lr_schedule(1e-3, "constant", warmup_steps=10)
        assert float(s(0)) == 0.0
        assert float(s(5)) == pytest.approx(5e-4)
        assert float(s(10)) == pytest.approx(1e-3)
        assert float(s(1000)) == pytest.approx(1e-3)

    def test_cosine(self):
        s = make_lr_schedule(1e-3, "cosine", total_steps=100, warmup_steps=10)
        assert float(s(0)) == 0.0
        assert float(s(10)) == pytest.approx(1e-3)  # peak at end of warmup
        mid, end = float(s(55)), float(s(100))
        assert 0.0 <= end < mid < 1e-3
        assert end == pytest.approx(0.0, abs=1e-5)

    def test_cosine_needs_total_steps(self):
        with pytest.raises(ValueError, match="total_steps"):
            make_lr_schedule(1e-3, "cosine", total_steps=5, warmup_steps=10)

    def test_unknown_kind(self):
        with pytest.raises(ValueError, match="unknown lr schedule"):
            make_lr_schedule(1e-3, "linear")


class TestOptimizerWiring:
    def test_cosine_updates_decay_to_zero(self):
        tx = make_adamw(make_lr_schedule(1e-2, "cosine", total_steps=20))
        p = {"w": jnp.ones((4,))}
        st = tx.init(p)
        g = {"w": jnp.full((4,), 0.5)}
        first = None
        for i in range(20):
            up, st = tx.update(g, st, p)
            if i == 0:
                first = float(jnp.abs(up["w"]).max())
        # final-step update rides an LR near 0 (adamw evaluates the
        # schedule at count=19 on the 20th step: s(19) ≈ peak·0.6%)
        assert float(jnp.abs(up["w"]).max()) < 1e-2 * first

    def test_grad_clip_norm_bounds_the_applied_grad(self):
        # Clip chained BEFORE adamw: with sgd-like inspection impossible
        # through adamw, pin the wiring with a plain schedule-free check —
        # a clipped optimizer must be insensitive to gradient rescaling
        # above the clip threshold (both collapse to the same clipped g).
        p = {"w": jnp.ones((3,))}
        g1 = {"w": jnp.array([3.0, 4.0, 0.0])}  # norm 5
        g2 = jax.tree.map(lambda a: a * 100.0, g1)
        tx = make_adamw(1e-3, grad_clip_norm=1.0)
        up1, _ = tx.update(g1, tx.init(p), p)
        up2, _ = tx.update(g2, tx.init(p), p)
        np.testing.assert_allclose(up1["w"], up2["w"], rtol=1e-6)
        # and without clipping the two differ (Adam eps breaks exact
        # scale-invariance only slightly — compare the *clipped* pair's
        # exact equality against unclipped inequality at eps-scale grads)
        small1 = {"w": jnp.array([3e-9, 4e-9, 0.0])}
        small2 = jax.tree.map(lambda a: a * 100.0, small1)
        tx0 = make_adamw(1e-3)
        u1, _ = tx0.update(small1, tx0.init(p), p)
        u2, _ = tx0.update(small2, tx0.init(p), p)
        assert not np.allclose(u1["w"], u2["w"], rtol=1e-3)

    def test_grouped_with_schedule_keeps_frozen_frozen(self):
        params = {"head": {"kernel": jnp.ones((2, 2))},
                  "body": {"kernel": jnp.ones((2, 2))}}

        def label_fn(path):
            return "head" if path.startswith("head") else "frozen"

        tx = make_grouped_optimizer(
            params, label_fn,
            {"head": make_lr_schedule(1e-3, "cosine", total_steps=10)},
            grad_clip_norm=1.0,
        )
        st = tx.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        up, _ = tx.update(g, st, params)
        assert float(jnp.abs(up["body"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(up["head"]["kernel"]).max()) > 0.0

    def test_grouped_clip_norm_excludes_frozen_grads(self):
        """Frozen-group gradients update nothing, so they must not count
        toward the global clip norm — else a huge frozen backbone grad
        crushes the head's update. Pin: head update is identical whether
        the frozen grad is tiny or enormous."""
        params = {"head": {"kernel": jnp.ones((2, 2))},
                  "body": {"kernel": jnp.ones((2, 2))}}

        def label_fn(path):
            return "head" if path.startswith("head") else "frozen"

        tx = make_grouped_optimizer(
            params, label_fn, {"head": 1e-3}, grad_clip_norm=1.0
        )
        g_small = {"head": {"kernel": jnp.full((2, 2), 10.0)},
                   "body": {"kernel": jnp.zeros((2, 2))}}
        g_huge = {"head": {"kernel": jnp.full((2, 2), 10.0)},
                  "body": {"kernel": jnp.full((2, 2), 1e6)}}
        up_s, _ = tx.update(g_small, tx.init(params), params)
        up_h, _ = tx.update(g_huge, tx.init(params), params)
        np.testing.assert_allclose(
            np.asarray(up_s["head"]["kernel"]),
            np.asarray(up_h["head"]["kernel"]),
            rtol=1e-6,
        )
        assert float(jnp.abs(up_h["body"]["kernel"]).max()) == 0.0

    def test_grad_clip_norm_zero_or_negative_rejected(self):
        with pytest.raises(ValueError, match="grad_clip_norm"):
            make_adamw(1e-3, grad_clip_norm=0.0)
        with pytest.raises(ValueError, match="grad_clip_norm"):
            make_grouped_optimizer(
                {"a": jnp.ones(2)}, lambda p: "g", {"g": 1e-3},
                grad_clip_norm=-1.0,
            )


class TestExperimentIntegration:
    @pytest.mark.slow
    def test_traditional_with_schedule_and_clip(self, tmp_path):
        from focused_attention_vit_tpu import experiments as exp

        e = exp.TraditionalViTExperiment(
            img_size=16, patch_size=4, num_classes=10, embed_dim=32,
            depth=1, num_heads=2, batch_size=32, epochs=1, subset_size=64,
            lr_schedule="cosine", warmup_epochs=0.5, grad_clip_norm=1.0,
            data_dir=str(tmp_path / "d"), results_dir=str(tmp_path / "r"),
        )
        e.run()
        assert (tmp_path / "r" / "exp1_traditional.csv").exists()

    @pytest.mark.slow
    def test_lr_for_uses_run_length(self, tmp_path):
        from focused_attention_vit_tpu import experiments as exp

        e = exp.TraditionalViTExperiment(
            img_size=16, patch_size=4, num_classes=10, embed_dim=32,
            depth=1, num_heads=2, batch_size=32, epochs=4, subset_size=64,
            lr_schedule="cosine", warmup_epochs=1.0,
            data_dir=str(tmp_path / "d"), results_dir=str(tmp_path / "r"),
        )
        e.setup()
        spe = e._steps_per_epoch()
        assert spe == 64 // 32
        s = e.lr_for(1e-3)
        assert float(s(spe)) == pytest.approx(1e-3)  # peak after 1 epoch
        assert float(s(4 * spe)) == pytest.approx(0.0, abs=1e-6)

    def test_default_protocol_unchanged(self, tmp_path):
        """Default config must produce the reference's constant-LR AdamW
        (a bare optax.adamw, no chain) — protocol parity guard."""
        from focused_attention_vit_tpu import experiments as exp

        e = exp.TraditionalViTExperiment(
            img_size=16, patch_size=4, num_classes=10, embed_dim=32,
            depth=1, num_heads=2, batch_size=32, epochs=1, subset_size=64,
            data_dir=str(tmp_path / "d"), results_dir=str(tmp_path / "r"),
        )
        assert e.lr_for(e.learning_rate) == e.learning_rate
        ref = optax.adamw(learning_rate=e.learning_rate, weight_decay=0.05)
        tx = e.build_optimizer({"w": jnp.ones((2,))})
        p = {"w": jnp.ones((2,))}
        g = {"w": jnp.full((2,), 0.3)}
        u_ref, _ = ref.update(g, ref.init(p), p)
        u_tx, _ = tx.update(g, tx.init(p), p)
        np.testing.assert_array_equal(u_ref["w"], u_tx["w"])


def test_cli_threads_schedule_flags():
    from focused_attention_vit_tpu.cli import _common_kwargs, parse_args

    args = parse_args([
        "--experiment", "traditional", "--lr_schedule", "cosine",
        "--warmup_epochs", "2.5", "--grad_clip_norm", "1.0",
    ])
    kw = _common_kwargs(args)
    assert kw["lr_schedule"] == "cosine"
    assert kw["warmup_epochs"] == 2.5
    assert kw["grad_clip_norm"] == 1.0
    kw = _common_kwargs(parse_args(["--experiment", "traditional"]))
    assert kw["lr_schedule"] == "constant" and kw["grad_clip_norm"] is None


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState (has .mu/.nu) inside an optax state,
    recursing through chains, multi_transform and masked wrappers."""
    if hasattr(opt_state, "mu") and hasattr(opt_state, "nu"):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        children = list(opt_state)
    elif isinstance(opt_state, dict):
        children = list(opt_state.values())
    elif hasattr(opt_state, "inner_states"):
        children = list(opt_state.inner_states.values())
    elif hasattr(opt_state, "inner_state"):
        children = [opt_state.inner_state]
    else:
        children = []
    for s in children:
        r = _find_adam_state(s)
        if r is not None:
            return r
    return None


class TestMuDtype:
    """--mu_dtype bfloat16 (optax mu_dtype, TPU extension): the AdamW
    FIRST moment is stored in bf16 (half the memory), the second moment
    and params stay f32, the trajectory stays close to the f32-mu run,
    and the bf16 moment leaves shard under FSDP like any other."""

    def _tiny(self):
        from focused_attention_vit_tpu import models as fmodels

        model = fmodels.VisionTransformer(
            img_size=16, patch_size=4, num_classes=5, embed_dim=32,
            depth=1, num_heads=2,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
        )["params"]
        return model, params

    def test_moment_dtypes_and_trajectory(self):
        from focused_attention_vit_tpu.train.state import TrainState
        from focused_attention_vit_tpu.train.steps import make_train_step

        model, params = self._tiny()
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.integers(0, 255, size=(8, 16, 16, 3)), dtype=jnp.uint8
        )
        y = jnp.asarray(rng.integers(0, 5, size=(8,)))

        def fresh(mu_dtype):
            return TrainState.create(
                apply_fn=model.apply,
                params=jax.tree.map(jnp.array, params),
                tx=make_adamw(1e-3, mu_dtype=mu_dtype),
            )

        st16, st32 = fresh(jnp.bfloat16), fresh(None)
        adam = _find_adam_state(st16.opt_state)
        assert adam is not None
        assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam.mu))
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(adam.nu))

        step = make_train_step(16, augment=True)
        key = jax.random.PRNGKey(1)
        for i in range(3):
            k = jax.random.fold_in(key, i)
            st16, m16 = step(st16, x, y, k)
            st32, m32 = step(st32, x, y, k)

        # Params stay f32; mu stays bf16 through the donated step.
        assert all(
            l.dtype == jnp.float32 for l in jax.tree.leaves(st16.params)
        )
        adam = _find_adam_state(st16.opt_state)
        assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam.mu))
        # bf16 mu rounding perturbs the update at ~0.4% relative — after 3
        # steps at lr 1e-3 the trajectories must still agree to ~1e-4.
        for a, b in zip(
            jax.tree.leaves(st16.params), jax.tree.leaves(st32.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )

    def test_composes_with_fsdp_sharding(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 simulated devices")
        from focused_attention_vit_tpu.parallel import make_mesh, shard_state
        from focused_attention_vit_tpu.train.state import TrainState

        model, params = self._tiny()
        st = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=make_adamw(1e-3, mu_dtype=jnp.bfloat16),
        )
        mesh = make_mesh(8, tp=1)
        st = shard_state(st, mesh, fsdp=True)
        adam = _find_adam_state(st.opt_state)
        mu_fc1 = adam.mu["blocks_0"]["mlp"]["fc1"]["kernel"]
        assert mu_fc1.dtype == jnp.bfloat16
        assert mu_fc1.addressable_shards[0].data.size * 8 == mu_fc1.size

    @pytest.mark.slow
    def test_experiment_and_grouped_wiring(self, tmp_path):
        from focused_attention_vit_tpu import experiments as exp
        from focused_attention_vit_tpu.train.state import (
            make_grouped_optimizer,
        )

        e = exp.TraditionalViTExperiment(
            img_size=16, patch_size=4, num_classes=10, embed_dim=32,
            depth=1, num_heads=2, batch_size=32, epochs=1, subset_size=64,
            mu_dtype="bfloat16",
            data_dir=str(tmp_path / "d"), results_dir=str(tmp_path / "r"),
        )
        e.setup()
        adam = _find_adam_state(e.state.opt_state)
        assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam.mu))

        bad = exp.TraditionalViTExperiment(
            img_size=16, patch_size=4, num_classes=10, embed_dim=32,
            depth=1, num_heads=2, batch_size=32, epochs=1, subset_size=64,
            mu_dtype="float16",
            data_dir=str(tmp_path / "d2"), results_dir=str(tmp_path / "r2"),
        )
        with pytest.raises(ValueError, match="mu_dtype"):
            bad.setup()

        # Grouped (pretrained-experiment) optimizer threads it too.
        p = {"body": {"w": jnp.ones((4,))}, "head": {"w": jnp.ones((4,))}}
        tx = make_grouped_optimizer(
            p, lambda path: "head" if path.startswith("head") else "body",
            {"body": 1e-4, "head": 1e-3}, mu_dtype=jnp.bfloat16,
        )
        adam = _find_adam_state(tx.init(p))
        assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(adam.mu))

    def test_cli_threads_mu_dtype(self):
        from focused_attention_vit_tpu.cli import _common_kwargs, parse_args

        kw = _common_kwargs(parse_args(
            ["--experiment", "traditional", "--mu_dtype", "bfloat16"]
        ))
        assert kw["mu_dtype"] == "bfloat16"
        kw = _common_kwargs(parse_args(["--experiment", "traditional"]))
        assert kw["mu_dtype"] == "float32"
