"""S=3137 attack #3: band byte-traffic and batch-scaling variants.

Follow-up to tools/s3137_bisect.py (BASELINE.md "S=3137 attack #2"): the
DS-layout A/B (tools/s3137_ds_layout.py) measured layout-neutral, so the
remaining levers are (a) the band's HBM bytes — the shift band reads Q
and K 7x, and the production op casts both to f32 first, which doubles
every one of those bytes if XLA materializes the cast — and (b) batch /
accumulation scheduling.

  PYTHONPATH=/root/repo:/root/.axon_site python tools/s3137_attack3.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

S, D, H, DEPTH, NH = 3137, 768, 3072, 12, 12
HD = D // NH
WIN = 7
HW = WIN // 2


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
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(
        jnp.bfloat16
    )


def halo_pad(x):
    last = jax.lax.slice_in_dim(x, S - 1, S, axis=2)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=2)
    return jnp.concatenate(
        [last] * HW + [x] + [first] * (WIN - 1 - HW), axis=2
    )


def band_f32(q, k, v):
    """Production form: f32 casts on Q and every K/V slice."""
    b = q.shape[0]
    kp, vp = halo_pad(k), halo_pad(v)
    qf = q.astype(jnp.float32)
    logits = jnp.stack(
        [
            jnp.einsum(
                "bhsd,bhsd->bhs",
                qf,
                jax.lax.dynamic_slice_in_dim(kp, o, S, axis=2).astype(
                    jnp.float32
                ),
            )
            for o in range(WIN)
        ],
        axis=2,
    ) * (HD ** -0.5)
    w = jax.nn.softmax(logits, axis=2)
    out = sum(
        jax.lax.slice_in_dim(w, o, o + 1, axis=2).reshape(b, NH, S, 1)
        * jax.lax.dynamic_slice_in_dim(vp, o, S, axis=2).astype(jnp.float32)
        for o in range(WIN)
    )
    return out.astype(q.dtype)


def band_bf16(q, k, v):
    """bf16 products, f32 reduction/softmax only."""
    b = q.shape[0]
    kp, vp = halo_pad(k), halo_pad(v)
    logits = jnp.stack(
        [
            (q * jax.lax.dynamic_slice_in_dim(kp, o, S, axis=2)).sum(
                axis=-1, dtype=jnp.float32
            )
            for o in range(WIN)
        ],
        axis=2,
    ) * (HD ** -0.5)
    w = jax.nn.softmax(logits, axis=2).astype(jnp.bfloat16)
    out = sum(
        jax.lax.slice_in_dim(w, o, o + 1, axis=2).reshape(b, NH, S, 1)
        * jax.lax.dynamic_slice_in_dim(vp, o, S, axis=2)
        for o in range(WIN)
    )
    return out


def make_block(band):
    def block(p, x):
        b = x.shape[0]
        y = ln(x, p["g2"], p["bb2"])
        qkv = y @ p["wqkv"].astype(jnp.bfloat16)
        qkv = qkv.reshape(b, S, 3, NH, HD).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        k = k @ p["wl"].astype(jnp.bfloat16)
        v = v @ p["wl"].astype(jnp.bfloat16)
        o = band(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, S, D)
        o = o @ p["wo"].astype(jnp.bfloat16)
        x = x + o
        y = ln(x, p["g1"], p["bb1"])
        y = y @ p["w1"].astype(jnp.bfloat16) + p["b1"].astype(jnp.bfloat16)
        y = jax.nn.gelu(y, approximate=False)
        y = y @ p["w2"].astype(jnp.bfloat16) + p["b2"].astype(jnp.bfloat16)
        return x + y

    return block


def bench(name, band, batch, steps=4, accum=1):
    params = make_params(jax.random.PRNGKey(0))
    block = make_block(band)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, S, D), jnp.bfloat16
    )

    def loss_one(params, x):
        f = jax.checkpoint(block)
        for p in params:
            x = f(p, x)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    if accum > 1:
        def loss(params, x):
            xs = x.reshape(accum, batch // accum, S, D)
            def body(c, xc):
                return c + loss_one(params, xc), None
            t, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return t
    else:
        loss = loss_one

    g = jax.jit(jax.grad(loss))
    try:
        r = g(params, x)
        float(r[0]["w1"][0, 0])
        t0 = time.time()
        for _ in range(steps):
            r = g(params, x)
        float(r[0]["w1"][0, 0])
        dt = (time.time() - t0) / steps
        print(
            f"{name}: {dt*1000:.0f} ms/step = {batch/dt:.1f} img/s",
            flush=True,
        )
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    bench("b32  band f32 (production)", band_f32, 32)
    bench("b32  band bf16            ", band_bf16, 32)
    bench("b16  band bf16            ", band_bf16, 16)
    bench("b64  band bf16            ", band_bf16, 64)
    bench("b32  bf16 accum 2x16      ", band_bf16, 32, accum=2)
