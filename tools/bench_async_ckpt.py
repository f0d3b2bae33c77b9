#!/usr/bin/env python
"""Measure per-epoch checkpoint overhead: sync vs async saves, on chip.

The async design (train/checkpoint.py): ``save()`` takes an on-device
snapshot (one jitted buffer copy) and returns; the device→host pull +
Orbax/sidecar writes overlap the next epoch's compute. On this
environment's remote axon tunnel the pull of a ViT-B/16 ``TrainState``
(params + AdamW mu/nu ≈ 1.03 GB f32) costs ~30+ s at the measured
~30 MB/s, so a sync save adds that to EVERY epoch; a CIFAR-sized epoch
(50k images at ~980 img/s ≈ 51 s compute) fully hides it.

Protocol: production ViT-B/16 b128 bf16 microbatch-16 train step
(donating, like bench.py), EPOCH_STEPS steps per epoch. For each mode
run 2 "epochs" each ending in a save; report per-epoch wall. The async
steady state pays max(compute, pull) + snapshot; sync pays
compute + pull. Also asserts on-chip snapshot isolation: the restored
epoch-1 checkpoint equals the params AS OF that save call, despite the
donating steps that ran while the pull was in flight.

Usage: python tools/bench_async_ckpt.py [EPOCH_STEPS]  (default 150)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCH_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 150
BATCH = 128


def main():
    from focused_attention_vit_tpu.utils.tpu_setup import configure

    configure()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from focused_attention_vit_tpu import models as fmodels
    from focused_attention_vit_tpu.train.state import TrainState, make_adamw
    from focused_attention_vit_tpu.train.steps import make_train_step
    from focused_attention_vit_tpu.train.checkpoint import CheckpointManager

    model = fmodels.VisionTransformer(
        img_size=224, patch_size=16, num_classes=10,
        embed_dim=768, depth=12, num_heads=12,
    )
    rng = np.random.default_rng(0)
    x_u8 = jnp.asarray(
        rng.integers(0, 255, size=(BATCH, 32, 32, 3)), dtype=jnp.uint8
    )
    y = jnp.asarray(rng.integers(0, 10, size=(BATCH,)))
    sample = jnp.zeros((1, 224, 224, 3), jnp.float32)
    step = make_train_step(224, compute_dtype=jnp.bfloat16, microbatch=16)
    key = jax.random.PRNGKey(0)

    def fresh_state():
        params = model.init(jax.random.PRNGKey(0), sample)["params"]
        return TrainState.create(
            apply_fn=model.apply, params=params, tx=make_adamw(1e-4)
        )

    def run_epoch(state, base):
        m = None
        for i in range(EPOCH_STEPS):
            state, m = step(state, x_u8, y, jax.random.fold_in(key, base + i))
        float(m["loss_sum"])  # host transfer = the only real sync here
        return state

    # Warm the step compile + measure bare compute per epoch.
    state = fresh_state()
    state = run_epoch(state, 0)  # includes compile
    t0 = time.time()
    state = run_epoch(state, 10_000)
    compute_s = time.time() - t0
    print(f"bare epoch compute ({EPOCH_STEPS} steps b{BATCH}): "
          f"{compute_s:.1f} s", flush=True)

    results = {"epoch_steps": EPOCH_STEPS, "batch": BATCH,
               "bare_epoch_compute_s": round(compute_s, 2)}

    for mode, async_save in (("sync", False), ("async", True)):
        ckpt_dir = tempfile.mkdtemp(prefix=f"ckpt_{mode}_")
        mngr = CheckpointManager(ckpt_dir, async_save=async_save)
        st = fresh_state()
        st = run_epoch(st, 20_000)  # epoch 0, unmeasured (steady entry)
        head_at_save = None
        walls = []
        for e in (1, 2):
            t0 = time.time()
            mngr.save(e, st)
            if e == 1 and async_save:
                # value AS OF this save (head kernel is small/cheap)
                head_at_save = np.asarray(st.params["head"]["kernel"]).copy()
            st = run_epoch(st, 30_000 * e)
            walls.append(time.time() - t0)
        t0 = time.time()
        mngr.wait_until_finished()
        tail = time.time() - t0
        if async_save:
            restored = mngr.restore(fresh_state(), step=1)
            np.testing.assert_array_equal(
                np.asarray(restored.params["head"]["kernel"]), head_at_save
            )
            print("async snapshot isolation on chip: OK "
                  "(epoch-1 restore == save-time params)", flush=True)
        mngr.close()
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        print(f"{mode}: epoch walls {[round(w, 1) for w in walls]} s "
              f"(final drain {tail:.1f} s)", flush=True)
        results[f"{mode}_epoch_wall_s"] = [round(w, 2) for w in walls]
        results[f"{mode}_final_drain_s"] = round(tail, 2)

    results["sync_overhead_per_epoch_s"] = round(
        results["sync_epoch_wall_s"][-1] - compute_s, 2)
    results["async_overhead_per_epoch_s"] = round(
        results["async_epoch_wall_s"][-1] - compute_s, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
