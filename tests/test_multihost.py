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


MH2_SCRIPT = r"""
import sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from focused_attention_vit_tpu.parallel import (
    multihost, make_mesh, shard_params, make_sharded_train_step,
)

multihost.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc and jax.process_index() == pid
assert len(jax.local_devices()) == 2
assert len(jax.devices()) == 2 * nproc  # global view spans both processes

GLOBAL = 32
start, size = multihost.host_batch_slice(GLOBAL)
assert (start, size) == (pid * (GLOBAL // nproc), GLOBAL // nproc)

# Deterministic full dataset; each process feeds ONLY its own slice, so a
# correct assembly is observable in the shared global loss below.
full_x = np.arange(GLOBAL * 8 * 8 * 3, dtype=np.uint8).reshape(GLOBAL, 8, 8, 3)
full_y = (np.arange(GLOBAL) % 4).astype(np.int32)

mesh = make_mesh(len(jax.devices()), tp=1)
gx = multihost.global_batch_from_host_data(
    full_x[start:start + size], mesh, P("data"))
gy = multihost.global_batch_from_host_data(
    full_y[start:start + size], mesh, P("data"))
assert gx.shape == (GLOBAL, 8, 8, 3)
# The addressable shards of the assembled global array must hold exactly
# the rows this process contributed, at the right global offsets.
for shard in gx.addressable_shards:
    rows = shard.index[0]
    np.testing.assert_array_equal(np.asarray(shard.data), full_x[rows])
    assert start <= rows.start and rows.stop <= start + size

from focused_attention_vit_tpu.models import VisionTransformer
import optax

model = VisionTransformer(img_size=8, patch_size=4, num_classes=4,
                          embed_dim=32, depth=1, num_heads=2)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
params = shard_params(params, mesh)
tx = optax.adamw(1e-3)
opt_state = tx.init(params)
step = make_sharded_train_step(model, tx, mesh, img_size=8, augment=False)
key = multihost.global_batch_from_host_data(
    np.asarray(jax.random.PRNGKey(0)), mesh, P())
params, opt_state, metrics = step(params, opt_state, gx, gy, key)
print(f"MH2_LOSS {pid} {float(metrics['loss']):.10f}", flush=True)

# FSDP across processes: params + moments sharded over the GLOBAL 'data'
# axis (4 devices, 2 per process) — each process holds only its quarter of
# every divisible leaf; the loss must equal the DP loss above (same init,
# same batch, augment=False ⇒ the forward is placement-independent).
params2 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
params2 = shard_params(params2, mesh, fsdp=True)
fc1 = params2["blocks_0"]["mlp"]["fc1"]["kernel"]
assert fc1.addressable_shards[0].data.size * 4 == fc1.size
opt2 = tx.init(params2)
step2 = make_sharded_train_step(model, tx, mesh, img_size=8, augment=False)
_, _, m2 = step2(params2, opt2, gx, gy, key)
print(f"MH2_FSDP_LOSS {pid} {float(m2['loss']):.10f}", flush=True)
"""


def test_two_process_distributed_cluster(tmp_path):
    """Real cross-process array assembly: 2 jax.distributed processes ×
    2 CPU devices each run ONE sharded step on per-process host data
    (VERDICT round-2 task 6). Both processes must agree on the global
    loss, and each assembled shard must hold the contributing process's
    rows at the right global offsets."""
    import subprocess as sp

    script = tmp_path / "mh2.py"
    script.write_text(MH2_SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_NUM_PROCESSES", None)
    port = "12397"
    procs = [
        sp.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            stdout=sp.PIPE, stderr=sp.PIPE, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except sp.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    losses, fsdp_losses = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MH2_LOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
            elif line.startswith("MH2_FSDP_LOSS"):
                _, pid, loss = line.split()
                fsdp_losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, f"missing process output: {outs}"
    assert losses[0] == losses[1], losses
    import math
    assert math.isfinite(losses[0])
    # FSDP step ran on both processes and reproduced the DP loss (same
    # init/batch; ZeRO placement must not change the math).
    assert set(fsdp_losses) == {0, 1}, f"missing FSDP output: {outs}"
    assert fsdp_losses[0] == fsdp_losses[1], fsdp_losses
    assert abs(fsdp_losses[0] - losses[0]) < 1e-5, (fsdp_losses, losses)


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
