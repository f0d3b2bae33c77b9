"""Flash launch-granularity A/B (dense-leg analog of
tools/band_granularity_ab.py — BASELINE.md "dense roofline", round 5).

Measured: mb1 1054 / mb2 1115 / mb4 1158 / mb8 1178 ms/step — per-image
launches are the fastest granularity for the MXU-bound flash kernel too
once XLA surroundings are included, despite the isolated per-call sweep
showing ~1.9× worse per-unit-work at BH=12. The monolithic mb32 chain
fails the remote compile (the round-3 large-program limit).

12 chained flash calls per chunk (x -> flash(x, x+k eps, x+v eps)),
fwd+bwd via grad, scan over 32//mb chunks: identical total flash work at
every mb. B=32 h=12 d=64 S_pad=3584 bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/flash_granularity_ab.py
Env: GRAN_MBS, GRAN_STEPS (default 5), GRAN_PROF=<mb> for an xplane trace.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
import jax
import jax.numpy as jnp

from focused_attention_vit_tpu.ops.flash_attention_pallas import (
    flash_attention_tpu,
)

B, H, D, S, L = 32, 12, 64, 3584, 12
MBS = [int(x) for x in os.environ.get("GRAN_MBS", "1,2,4,8,32").split(",")]
STEPS = int(os.environ.get("GRAN_STEPS", "5"))
PROF = os.environ.get("GRAN_PROF", "")

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
x0 = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
k0 = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
v0 = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)


def chunk_loss(x, k, v):
    for l in range(L):
        x = flash_attention_tpu(x, x + k * 0.01, x + v * 0.01)
    return jnp.sum(x.astype(jnp.float32))


def make_step(mb):
    n = B // mb

    @jax.jit
    def step(x, k, v):
        xs = x.reshape(n, mb, H, S, D)
        ks = k.reshape(n, mb, H, S, D)
        vs = v.reshape(n, mb, H, S, D)

        def body(acc, inp):
            xc, kc, vc = inp
            g = jax.grad(chunk_loss, argnums=(0, 1, 2))(xc, kc, vc)
            return (
                acc
                + jnp.sum(g[0].astype(jnp.float32))
                + jnp.sum(g[1].astype(jnp.float32)),
                None,
            )

        acc, _ = jax.lax.scan(body, jnp.zeros(()), (xs, ks, vs))
        return acc

    return step


for mb in MBS:
    step = make_step(mb)
    out = float(step(x0, k0, v0))
    t0 = time.perf_counter()
    for i in range(STEPS):
        r = step(x0, k0, v0)
    float(r)
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(
        f"mb={mb:2d}  BH={mb*H:4d}  flash_chain={dt:8.2f} ms/step",
        flush=True,
    )
    if PROF == str(mb):
        d = f"/tmp/prof_flashgran_mb{mb}"
        jax.profiler.start_trace(d)
        for i in range(2):
            r = step(x0, k0, v0)
        float(r)
        jax.profiler.stop_trace()
        print(f"trace -> {d}", flush=True)
