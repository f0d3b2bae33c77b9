"""Profile the production S=3137 train step (b32) with an xplane trace.

The capture harness behind the round-5 step decompositions (BASELINE.md
"attack #9" and "dense roofline"): builds the exact bench-leg train step,
measures wall img/s over 10 steps, then traces PROF_STEPS steps. Read
the trace with tools/xplane_top.py [--by-category].

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_s3137_step.py
Env: PROF_MB (default 1), PROF_MODEL (mhla|dense, default mhla),
PROF_STEPS (default 5; 0 = measure only), PROF_DIR (trace output dir).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
import jax
import jax.numpy as jnp
import numpy as np

from focused_attention_vit_tpu.models import (
    VisionTransformer,
    VisionTransformerMHLA,
)
from focused_attention_vit_tpu.train.state import TrainState, make_adamw
from focused_attention_vit_tpu.train.steps import make_train_step

mb = int(os.environ.get("PROF_MB", "1"))
which = os.environ.get("PROF_MODEL", "mhla")
steps = int(os.environ.get("PROF_STEPS", "5"))
outdir = os.environ.get("PROF_DIR", f"/tmp/prof_{which}_mb{mb}")

common = dict(
    img_size=224, patch_size=4, num_classes=10, embed_dim=768,
    depth=12, num_heads=12, dropout=0.1, dtype=jnp.bfloat16, remat=False,
)
if which == "mhla":
    model = VisionTransformerMHLA(**common, window_size=7, use_mhla=True)
else:
    model = VisionTransformer(**common)

batch = 32
rng = np.random.default_rng(0)
x_u8 = jnp.asarray(rng.integers(0, 255, size=(batch, 32, 32, 3)), jnp.uint8)
y = jnp.asarray(rng.integers(0, 10, size=(batch,)))
sample = jnp.zeros((1, 224, 224, 3), jnp.float32)
params = model.init(jax.random.PRNGKey(0), sample)["params"]
state = TrainState.create(apply_fn=model.apply, params=params,
                          tx=make_adamw(1e-4))
step = make_train_step(224, compute_dtype=jnp.bfloat16,
                       microbatch=mb if mb else None)
key = jax.random.PRNGKey(0)
for i in range(3):
    state, m = step(state, x_u8, y, jax.random.fold_in(key, i))
float(m["loss_sum"])

t0 = time.time()
for i in range(10):
    state, m = step(state, x_u8, y, jax.random.fold_in(key, 100 + i))
float(m["loss_sum"])
dt = time.time() - t0
print(f"{which} mb={mb}: {batch*10/dt:.2f} img/s ({dt/10*1000:.1f} ms/step)",
      flush=True)

jax.profiler.start_trace(outdir)
for i in range(steps):
    state, m = step(state, x_u8, y, jax.random.fold_in(key, 200 + i))
float(m["loss_sum"])
jax.profiler.stop_trace()
print(f"trace -> {outdir}", flush=True)
