"""Flash FORWARD block sweep at the dense S=3137 geometry.

Round-5 record (BASELINE.md "dense roofline"): block_q=512 + full-K
resident beats the round-3-tuned 256 at BOTH regimes — 1.80 vs 2.12 ms
per call at FB=1 (the mb1 per-image-launch production regime) and 23.64
vs 24.27 ms at FB=32; production bumped to 512
(ops/flash_attention_pallas.py). Backward tiles held at the separately
swept 512² (tools/flash_bwd_sweep.py — 512² best at SWEEP_BH 384 AND 12).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/flash_fwd_sweep.py
Env: FB (batch, default 1 → BH=12).
"""
import itertools
import sys
import time

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention,
)

ITERS = 20
import os
SP, D, B, H = 3584, 64, int(os.environ.get("FB","1")), 12
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, SP, D)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, H, SP, D)), dtype=jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, H, SP, D)), dtype=jnp.bfloat16)


def timeit(f, *args):
    @jax.jit
    def run(*args):
        def body(c, _):
            out = f(*[a + c for a in args])
            return c + out.ravel()[0].astype(c.dtype) * 0, out.ravel()[0]
        _, outs = jax.lax.scan(body, jnp.zeros((), jnp.bfloat16), None,
                               length=ITERS)
        return outs.sum()
    _ = float(run(*args).astype(jnp.float32))
    t0 = time.perf_counter()
    _ = float(run(*args).astype(jnp.float32))
    return (time.perf_counter() - t0) / ITERS * 1e3


for bq, bk in itertools.product((128, 256, 512, 1024), (512, 1024, 3584)):
    try:
        sizes = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=512, block_k_major_dkv=512,
            block_k_dkv=512, block_q_dkv=512,
            block_k_major_dq=512, block_k_dq=512, block_q_dq=512,
        )
        def fwd(q, k, v, sizes=sizes):
            return flash_attention(q, k, v, causal=False, sm_scale=D**-0.5,
                                   block_sizes=sizes)
        t = timeit(fwd, q, k, v)
        print(f"fwd_q={bq:5d} fwd_k={bk:5d}: {t:7.2f} ms", flush=True)
    except Exception as e:
        print(f"fwd_q={bq:5d} fwd_k={bk:5d}: FAILED {str(e)[:90]}",
              flush=True)
