"""Device-mesh parallelism (DP + FSDP + TP + SP + PP) via jax.sharding + jit.

The reference is strictly single-process single-device (SURVEY.md §2.4 —
zero distributed code). This layer is the rebuild's TPU-native scaling
path: a ('data', 'model'[, 'seq']) mesh, batch sharded over 'data',
Megatron-style tensor parallelism over 'model' for the MLP and attention
heads, sequence parallelism over 'seq' for the windowed attention's token
axis (halo exchange over ICI — parallel/sequence.py), and XLA-inserted
collectives for everything else.
"""

from focused_attention_vit_tpu.parallel.mesh import make_mesh
from focused_attention_vit_tpu.parallel.multihost import (
    initialize as distributed_initialize,
    host_batch_slice,
)
from focused_attention_vit_tpu.parallel.sequence import sp_windowed_attention
from focused_attention_vit_tpu.parallel.sharding import (
    param_sharding_rules,
    shard_params,
    shard_state,
    state_shardings,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "distributed_initialize",
    "host_batch_slice",
    "sp_windowed_attention",
    "param_sharding_rules",
    "shard_params",
    "shard_state",
    "state_shardings",
    "make_sharded_train_step",
]
