"""Preemption-safe training (train/resilience.py + loop should_stop +
experiment/CLI wiring): SIGTERM → checkpoint → exit 143 → resume."""

import os
import signal
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focused_attention_vit_tpu import models as fmodels
from focused_attention_vit_tpu.train.resilience import GracefulShutdown
from focused_attention_vit_tpu.train.state import TrainState, make_adamw
from focused_attention_vit_tpu.train.steps import (
    make_eval_step,
    make_train_step,
)
from focused_attention_vit_tpu.train.loop import train_and_evaluate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestGracefulShutdown:
    def test_latches_and_restores(self):
        before = signal.getsignal(signal.SIGTERM)
        with GracefulShutdown() as stop:
            assert not stop.triggered
            os.kill(os.getpid(), signal.SIGTERM)
            # signal delivery is checked at the next bytecode boundary
            for _ in range(100):
                if stop.triggered:
                    break
                time.sleep(0.01)
            assert stop.triggered  # latched, no exception
            assert stop() is True  # usable as should_stop callable
        assert signal.getsignal(signal.SIGTERM) is before

    def test_second_signal_exits(self):
        with GracefulShutdown() as stop:
            os.kill(os.getpid(), signal.SIGTERM)
            for _ in range(100):
                if stop.triggered:
                    break
                time.sleep(0.01)
            with pytest.raises(SystemExit) as e:
                os.kill(os.getpid(), signal.SIGTERM)
                for _ in range(100):
                    time.sleep(0.01)
            assert e.value.code == 128 + signal.SIGTERM


def _tiny_loop_fixture():
    model = fmodels.VisionTransformer(
        img_size=16, patch_size=4, num_classes=5,
        embed_dim=32, depth=1, num_heads=2,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=make_adamw(1e-3)
    )
    rng = np.random.default_rng(0)
    data = {
        "train_images": rng.integers(0, 255, size=(64, 16, 16, 3)).astype(
            np.uint8
        ),
        "train_labels": rng.integers(0, 5, size=(64,)).astype(np.int32),
        "test_images": rng.integers(0, 255, size=(16, 16, 16, 3)).astype(
            np.uint8
        ),
        "test_labels": rng.integers(0, 5, size=(16,)).astype(np.int32),
    }
    return state, make_train_step(16), make_eval_step(16), data


class TestLoopShouldStop:
    def test_mid_epoch_stop(self):
        """should_stop flipping mid-epoch stops at a batch boundary: the
        partial epoch's metrics are NOT recorded and the returned state
        reflects the batches that did run."""
        state, train_step, eval_step, data = _tiny_loop_fixture()
        calls = {"n": 0}

        def stop_after_3_polls():
            calls["n"] += 1
            return calls["n"] > 3

        before = np.asarray(state.params["head"]["kernel"]).copy()
        r = train_and_evaluate(
            state, train_step, eval_step, data,
            epochs=4, batch_size=16, log_fn=lambda s: None,
            should_stop=stop_after_3_polls,
        )
        assert r["interrupted"] is True
        assert r["interrupted_mid_epoch"] is True
        assert r["train_losses"] == []  # partial epoch 0 not recorded
        after = np.asarray(r["state"].params["head"]["kernel"])
        assert not np.array_equal(before, after)  # some batches DID run

    def test_boundary_stop(self):
        """should_stop flipping between epochs stops without a mid-epoch
        marker (the state is at an already-checkpointed boundary)."""
        state, train_step, eval_step, data = _tiny_loop_fixture()
        seen_epochs = []

        def stop_after_first_epoch():
            # becomes True only once an epoch completed
            return len(seen_epochs) >= 1

        r = train_and_evaluate(
            state, train_step, eval_step, data,
            epochs=4, batch_size=16, log_fn=lambda s: None,
            epoch_callback=lambda e, s: seen_epochs.append(e),
            should_stop=stop_after_first_epoch,
        )
        assert r["interrupted"] is True
        assert r["interrupted_mid_epoch"] is False
        assert len(r["train_losses"]) == 1

    def test_no_stop_keys_default_false(self):
        state, train_step, eval_step, data = _tiny_loop_fixture()
        r = train_and_evaluate(
            state, train_step, eval_step, data,
            epochs=1, batch_size=16, log_fn=lambda s: None,
        )
        assert r["interrupted"] is False
        assert r["interrupted_mid_epoch"] is False


CLI_ARGS = [
    "--experiment", "traditional", "--subset_size", "192",
    "--epochs", "4", "--img_size", "16", "--patch_size", "4",
    "--embed_dim", "32", "--depth", "1", "--num_heads", "2",
    "--batch_size", "32", "--seed", "3",
]


@pytest.mark.slow
def test_cli_sigterm_preemption_and_resume(tmp_path):
    """End-to-end: SIGTERM mid-training → exit 143 with a committed
    checkpoint → rerunning the same command resumes and completes."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONUNBUFFERED"] = "1"
    env.pop("XLA_FLAGS", None)
    args = CLI_ARGS + [
        "--results_dir", str(tmp_path / "results"),
        "--data_dir", str(tmp_path / "data"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ]
    cmd = [sys.executable, "-m", "focused_attention_vit_tpu.cli"] + args

    p = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env, cwd=str(tmp_path),
    )
    # Wait for epoch 1 to finish (its checkpoint exists), then SIGTERM.
    lines = []
    deadline = time.time() + 600
    for line in p.stdout:
        lines.append(line)
        if line.startswith("Epoch 1/"):
            p.send_signal(signal.SIGTERM)
            break
        assert time.time() < deadline, "".join(lines)
    rest, _ = p.communicate(timeout=600)
    lines.append(rest)
    out = "".join(lines)
    assert p.returncode == 143, out
    assert "Preempted (SIGTERM)" in out, out
    assert "Experiment preempted" in out, out
    # No results CSV from the preempted run.
    assert not (tmp_path / "results" / "exp1_traditional.csv").exists()

    out2 = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert out2.returncode == 0, out2.stdout[-2000:] + out2.stderr[-2000:]
    assert "Resumed from checkpoint epoch" in out2.stdout
    assert "Experiment completed!" in out2.stdout
    assert (tmp_path / "results" / "exp1_traditional.csv").exists()
