"""Multi-host scaffolding exercised in a single-process jax.distributed
"cluster" (num_processes=1) — validates the initialize → host slice →
global-array-assembly → sharded-step path end to end without real
multi-host hardware (SURVEY §2.4 communication-backend row).

jax.distributed.initialize mutates process-global state, so this runs in a
subprocess (also keeps the 8-device CPU config of the main suite intact).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from focused_attention_vit_tpu.parallel import multihost, make_mesh

multihost.initialize(
    coordinator_address="localhost:12391", num_processes=1, process_id=0
)
assert jax.process_count() == 1 and jax.process_index() == 0

# host slice arithmetic (single process owns the whole batch)
start, size = multihost.host_batch_slice(32)
assert (start, size) == (0, 32)

# per-process data -> global array -> one sharded train step
mesh = make_mesh(len(jax.devices()), tp=1)
local = np.arange(32 * 8 * 8 * 3, dtype=np.uint8).reshape(32, 8, 8, 3)
global_x = multihost.global_batch_from_host_data(local, mesh, P("data"))
assert global_x.shape == (32, 8, 8, 3)
np.testing.assert_array_equal(np.asarray(global_x), local)

from focused_attention_vit_tpu.models import VisionTransformer
from focused_attention_vit_tpu.parallel import shard_params, make_sharded_train_step
import optax

model = VisionTransformer(img_size=8, patch_size=4, num_classes=4,
                          embed_dim=32, depth=1, num_heads=2)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
params = shard_params(params, mesh)
tx = optax.adamw(1e-3)
opt_state = tx.init(params)
step = make_sharded_train_step(model, tx, mesh, img_size=8, augment=False)
y = multihost.global_batch_from_host_data(
    np.zeros(32, dtype=np.int32), mesh, P("data"))
key = jax.device_put(jax.random.PRNGKey(0),
                     jax.sharding.NamedSharding(mesh, P()))
params, opt_state, metrics = step(params, opt_state, global_x, y, key)
assert bool(jnp.isfinite(metrics["loss"]))
print("MULTIHOST_OK")
"""


def test_single_process_distributed_cluster(tmp_path):
    script = tmp_path / "mh.py"
    script.write_text(SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MULTIHOST_OK" in out.stdout
