"""E3's setup loads a real on-disk checkpoint instead of silently random.

Uses the frozen-seed torchvision-layout fixture written by
tools/make_pretrained_fixture.py (the reference's own cache-file name and
schema, /root/reference/utils/data_utils.py:275-314). The fixture is
generated on first use if absent (deterministic, seed 2026) so the test
never silently skips.
"""

import logging
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, "pretrained_weights")
FIXTURE = os.path.join(FIXTURE_DIR, "vit_b_16_weights.pth")


@pytest.fixture(scope="session")
def fixture_ckpt():
    if not os.path.exists(FIXTURE):
        import torch

        from tools.make_pretrained_fixture import make_state_dict

        os.makedirs(FIXTURE_DIR, exist_ok=True)
        torch.save(make_state_dict("vit_b_16"), FIXTURE)
    return FIXTURE


def test_e3_setup_loads_fixture(fixture_ckpt, tmp_path, caplog):
    from focused_attention_vit_tpu.experiments.traditional_pretrained import (
        PretrainedTraditionalViTExperiment,
    )

    exp = PretrainedTraditionalViTExperiment(
        img_size=224,
        patch_size=16,  # vit_b_16 geometry so every body tensor merges
        num_classes=10,
        subset_size=64,
        epochs=1,
        batch_size=8,
        data_dir=str(tmp_path / "data"),
        results_dir=str(tmp_path / "results"),
        pretrained_cache_dir=FIXTURE_DIR,
    )
    with caplog.at_level(logging.INFO):
        exp.setup()

    assert exp.pretrained_loaded, "fixture checkpoint was not loaded"
    assert any(
        "Loaded cached torch checkpoint" in r.getMessage()
        for r in caplog.records
    ), "load path did not report the cache hit"

    # Weight check: checkpoint tensors landed in the train state (not random
    # init) — cls token and a mid-stack layernorm, loaded from disk fresh.
    import torch

    sd = torch.load(fixture_ckpt, map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(
        np.asarray(exp.state.params["cls_token"], dtype=np.float32),
        sd["class_token"].float().numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(exp.state.params["blocks_7"]["norm1"]["scale"]),
        sd["encoder.layers.encoder_layer_7.ln_1.weight"].float().numpy(),
    )
    # The 1000-class head must have been dropped (class-count mismatch) —
    # the model keeps its 10-class random head.
    assert exp.state.params["head"]["kernel"].shape == (768, 10)


def test_missing_cache_falls_back_loudly(tmp_path, caplog):
    from focused_attention_vit_tpu.data.pretrained import (
        load_pretrained_vit_params,
    )

    with caplog.at_level(logging.WARNING):
        params, _cfg = load_pretrained_vit_params(
            variant="vit_b_16", cache_dir=str(tmp_path / "empty")
        )
    assert params is None
    assert any("RANDOM INITIALIZATION" in r.getMessage() for r in caplog.records)
