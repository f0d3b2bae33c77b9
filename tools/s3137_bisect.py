import os, sys, time
sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure
configure()
import numpy as np
import jax, jax.numpy as jnp
import focused_attention_vit_tpu.ops.window as W

B, S, D, H, DEPTH, NH = 32, 3137, 768, 3072, 12, 12
HD = D // NH

def make_params(key):
    ks = jax.random.split(key, DEPTH)
    ps = []
    for i in range(DEPTH):
        k = jax.random.split(ks[i], 8)
        ps.append(dict(
            w1=jax.random.normal(k[0], (D, H), jnp.float32) * 0.02,
            b1=jnp.zeros((H,), jnp.float32),
            w2=jax.random.normal(k[1], (H, D), jnp.float32) * 0.02,
            b2=jnp.zeros((D,), jnp.float32),
            g1=jnp.ones((D,), jnp.float32), bb1=jnp.zeros((D,), jnp.float32),
            wqkv=jax.random.normal(k[2], (D, 3 * D), jnp.float32) * 0.02,
            wo=jax.random.normal(k[3], (D, D), jnp.float32) * 0.02,
            wl=jax.random.normal(k[4], (HD, HD), jnp.float32) * 0.02,
            g2=jnp.ones((D,), jnp.float32), bb2=jnp.zeros((D,), jnp.float32),
        ))
    return ps

def ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(jnp.bfloat16)

def mlp(p, y):
    y = y @ p["w1"].astype(jnp.bfloat16) + p["b1"].astype(jnp.bfloat16)
    y = jax.nn.gelu(y, approximate=False)
    return y @ p["w2"].astype(jnp.bfloat16) + p["b2"].astype(jnp.bfloat16)

def block(p, x, attn_fn):
    y = ln(x, p["g2"], p["bb2"])
    qkv = y @ p["wqkv"].astype(jnp.bfloat16)
    qkv = qkv.reshape(B, S, 3, NH, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    k = k @ p["wl"].astype(jnp.bfloat16)
    v = v @ p["wl"].astype(jnp.bfloat16)
    o = attn_fn(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
    o = o @ p["wo"].astype(jnp.bfloat16)
    x = x + o
    return x + mlp(p, ln(x, p["g1"], p["bb1"]))

def bench(name, attn_fn, steps=4):
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.bfloat16)

    def loss(params, x):
        f = lambda p, x: block(p, x, attn_fn)
        for p in params:
            x = jax.checkpoint(f)(p, x)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    try:
        r = g(params, x); float(r[0]["w1"][0, 0])
        t0 = time.time()
        for _ in range(steps):
            r = g(params, x)
        float(r[0]["w1"][0, 0])
        dt = (time.time() - t0) / steps
        print(f"{name}: {dt*1000:.0f} ms/step = {B/dt:.1f} img/s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:120]}", flush=True)

bench("no-attn (o=v)        ", lambda q, k, v: v)
# (blocked tile-band sweep removed with the path itself, round 4 —
# measured numbers preserved in BASELINE.md "round-3 bisect")
bench("shift (no edge fix)  ", lambda q, k, v: W._shift_banded_attention(q, k, v, 7))
bench("full windowed (shift+edges)", lambda q, k, v: W.windowed_latent_attention(q, k, v, 7))
