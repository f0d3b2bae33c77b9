"""Sweep Pallas flash-attention block sizes at the dense S=3137 geometry.

The production wrapper (ops/flash_attention_pallas.py) tuned the FORWARD
blocks on v5e (small q blocks + full-K resident: 34.5 TFLOP/s) but fixed
the backward tiles at 512² without a sweep — and training is
backward-dominated. BASELINE.md pins the dense ViT-B/4 path as
attention-bound, so any flash fwd+bwd win moves the end-to-end number
nearly 1:1.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/flash_bwd_sweep.py
Env: SWEEP_BH (default 384 = b32·h12), SWEEP_ITERS (default 10).
"""
import itertools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    flash_attention,
)

BH = int(os.environ.get("SWEEP_BH", "384"))
ITERS = int(os.environ.get("SWEEP_ITERS", "10"))
S, D = 3137, 64
SP = 3584  # 3137 -> next 512 multiple (pad semantics checked by the
           # production wrapper's segment ids; raw-pad timing is an upper
           # bound within ~1% here and keeps the sweep simple)
B, H = BH // 12, 12

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, SP, D)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, H, SP, D)), dtype=jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, H, SP, D)), dtype=jnp.bfloat16)


def timeit(f, *args):
    # Arrays must flow through run's parameters, not a closure: jit embeds
    # closed-over device arrays as HLO constants and the axon remote
    # compile rejects the 3x154 MB literal payload with HTTP 413.
    @jax.jit
    def run(*args):
        def body(c, _):
            outs = f(*[a + c for a in args])
            leaf = jax.tree_util.tree_leaves(outs)[0]
            return c + leaf.ravel()[0].astype(c.dtype) * 0, leaf.ravel()[0]

        c0 = jnp.zeros((), jnp.float32)
        _, outs = jax.lax.scan(body, c0, None, length=ITERS)
        return outs.sum()

    r = run(*args)
    _ = float(r)  # sync (block_until_ready is a no-op on axon)
    t0 = time.perf_counter()
    _ = float(run(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def make_fn(bq, bk, bbwd_q, bbwd_k):
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bbwd_q, block_k_major_dkv=bbwd_k,
        block_k_dkv=bbwd_k, block_q_dkv=bbwd_q,
        block_k_major_dq=bbwd_k, block_k_dq=bbwd_k, block_q_dq=bbwd_q,
    )

    def fwd(q, k, v):
        return flash_attention(q, k, v, causal=False, sm_scale=D**-0.5,
                               block_sizes=sizes)

    def loss(q, k, v):
        return (fwd(q, k, v).astype(jnp.float32) ** 2).sum()

    grad = jax.grad(loss, argnums=(0, 1, 2))
    return fwd, grad


print(f"BH={BH} S_pad={SP} d={D} bf16, {ITERS} iters inside jit")
results = []
# fwd blocks: production (256, full-K) held fixed; sweep bwd tiles.
for bbq, bbk in itertools.product((256, 512, 1024), (256, 512, 1024)):
    try:
        fwd, grad = make_fn(256, SP, bbq, bbk)
        t = timeit(grad, q, k, v)
        print(f"bwd_q={bbq:5d} bwd_k={bbk:5d}: fwd+bwd {t:8.2f} ms",
              flush=True)
        results.append((t, bbq, bbk))
    except Exception as e:  # noqa: BLE001 - sweep survives bad configs
        print(f"bwd_q={bbq:5d} bwd_k={bbk:5d}: FAILED "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
if results:
    t, bbq, bbk = min(results)
    print(f"best: bwd_q={bbq} bwd_k={bbk} at {t:.2f} ms "
          f"(production 512/512)")
