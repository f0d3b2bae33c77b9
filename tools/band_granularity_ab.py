"""Roll-band launch-granularity A/B (BASELINE.md "attack #9", round 5).

Identical-work chained A/B — the measurement pattern that falsified the
round-4 "mb1 launch-granularity loss" claim: per-unit-work Pallas time
is FLAT in BH (66 vs 69.5 ms/step kernel time at mb1 vs mb32) and
end-to-end the SMALLEST granularity wins once the XLA surroundings are
included (114.5 → 172.8 ms/step from mb1 to mb32). Use this pattern
(N chained calls per chunk, fwd+bwd via grad, scan over chunks, sweep
mb) for any batching/granularity question — isolated per-call benches
and xplane kernel totals both mislead (CLAUDE.md round-5 lessons).

Holds total band work fixed at the bench geometry's step total:
12 layers × 32 images × (fwd+bwd), B=32 h=12 d=64 S=3137 W=7 bf16
dropout 0.1. Per chunk: 12 chained band calls (x -> band(x, f(x), g(x))
so halo-extends cannot CSE across layers), grads wrt (x,k,v) —
12 fwd + 12 bwd launches at BH=mb·12.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/band_granularity_ab.py
Env: GRAN_MBS (default "1,2,4,8,32"), GRAN_STEPS (default 10),
GRAN_PROF=<mb> to also write an xplane trace for that mb.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
import jax
import jax.numpy as jnp

from focused_attention_vit_tpu.ops.mhla_band_roll import roll_banded_attention

B, H, D, S, W, L = 32, 12, 64, 3137, 7, 12
RATE = 0.1
MBS = [int(x) for x in os.environ.get("GRAN_MBS", "1,2,4,8,32").split(",")]
STEPS = int(os.environ.get("GRAN_STEPS", "10"))

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
x0 = jax.random.normal(kq, (B, H, D, S), jnp.bfloat16)
k0 = jax.random.normal(kk, (B, H, D, S), jnp.bfloat16)
v0 = jax.random.normal(kv, (B, H, D, S), jnp.bfloat16)


def chunk_loss(x, k, v, seed):
    # k/v derive from x per layer (like the model's per-layer projections)
    # so the halo-extends cannot be CSE'd across layers.
    for l in range(L):
        x = roll_banded_attention(
            x, x + k * 0.01, x + v * 0.01, W, (RATE, seed + l)
        )
    return jnp.sum(x.astype(jnp.float32))


def make_step(mb):
    n = B // mb

    @jax.jit
    def step(x, k, v, seed):
        xs = x.reshape(n, mb, H, D, S)
        ks = k.reshape(n, mb, H, D, S)
        vs = v.reshape(n, mb, H, D, S)

        def body(acc, inp):
            xc, kc, vc, i = inp
            g = jax.grad(chunk_loss, argnums=(0, 1, 2))(
                xc, kc, vc, seed + i * 100
            )
            return (
                acc
                + jnp.sum(g[0].astype(jnp.float32))
                + jnp.sum(g[1].astype(jnp.float32)),
                None,
            )

        acc, _ = jax.lax.scan(
            body, jnp.zeros(()), (xs, ks, vs, jnp.arange(n))
        )
        return acc

    return step


PROF = os.environ.get("GRAN_PROF", "")  # mb value to xplane-trace

for mb in MBS:
    step = make_step(mb)
    out = float(step(x0, k0, v0, jnp.int32(7)))  # compile + warm
    t0 = time.perf_counter()
    for i in range(STEPS):
        r = step(x0, k0, v0, jnp.int32(i))
    float(r)
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(
        f"mb={mb:2d}  BH={mb*H:4d}  launches/step={2*L*(B//mb):4d}  "
        f"band_total={dt:8.2f} ms/step",
        flush=True,
    )
    if PROF == str(mb):
        d = f"/tmp/prof_gran_mb{mb}"
        jax.profiler.start_trace(d)
        for i in range(3):
            r = step(x0, k0, v0, jnp.int32(50 + i))
        float(r)
        jax.profiler.stop_trace()
        print(f"trace -> {d}", flush=True)
