"""S=3137 attack #4: selective rematerialization policies at microbatch 8.

Attack #3 (BASELINE.md) closed at 36.6 img/s with FULL remat
(``jax.checkpoint`` on each block, nothing saved) + microbatch 8; no-remat
measured worse (32.1 at mb=4) because XLA scheduling degrades with large
live activation sets.  Untried middle ground (VERDICT r2 task 1): policies
that save only the expensive-to-recompute tensors (matmul outputs) while
recomputing the cheap bandwidth-bound ones (LN, softmax, band shifts).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/s3137_remat_policy.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
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


def band_bf16(q, k, v):
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


def block(p, x):
    b = x.shape[0]
    y = ln(x, p["g2"], p["bb2"])
    qkv = y @ p["wqkv"].astype(jnp.bfloat16)
    qkv = qkv.reshape(b, S, 3, NH, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    k = k @ p["wl"].astype(jnp.bfloat16)
    v = v @ p["wl"].astype(jnp.bfloat16)
    o = band_bf16(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, S, D)
    o = o @ p["wo"].astype(jnp.bfloat16)
    x = x + o
    y = ln(x, p["g1"], p["bb1"])
    y = y @ p["w1"].astype(jnp.bfloat16) + p["b1"].astype(jnp.bfloat16)
    y = jax.nn.gelu(y, approximate=False)
    y = y @ p["w2"].astype(jnp.bfloat16) + p["b2"].astype(jnp.bfloat16)
    return x + y


def attn_sublayer(p, x):
    b = x.shape[0]
    y = ln(x, p["g2"], p["bb2"])
    qkv = y @ p["wqkv"].astype(jnp.bfloat16)
    qkv = qkv.reshape(b, S, 3, NH, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    k = k @ p["wl"].astype(jnp.bfloat16)
    v = v @ p["wl"].astype(jnp.bfloat16)
    o = band_bf16(q, k, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, S, D)
    return x + o @ p["wo"].astype(jnp.bfloat16)


def mlp_sublayer(p, x):
    y = ln(x, p["g1"], p["bb1"])
    y = y @ p["w1"].astype(jnp.bfloat16) + p["b1"].astype(jnp.bfloat16)
    y = jax.nn.gelu(y, approximate=False)
    y = y @ p["w2"].astype(jnp.bfloat16) + p["b2"].astype(jnp.bfloat16)
    return x + y


def split_block_mlp_remat(p, x):
    """Attention saved (no recompute of the band in bwd); MLP remat'd."""
    x = attn_sublayer(p, x)
    return jax.checkpoint(mlp_sublayer)(p, x)


def split_block_both_remat(p, x):
    """Both sublayers remat'd separately: saves the mid-block residual,
    so bwd of the MLP region no longer re-runs the attention sublayer."""
    x = jax.checkpoint(attn_sublayer)(p, x)
    return jax.checkpoint(mlp_sublayer)(p, x)


def bench(name, wrap, batch=32, accum=4, steps=4):
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, S, D), jnp.bfloat16
    )
    f = wrap(block)

    def loss_one(params, x):
        for p in params:
            x = f(p, x)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    def loss(params, x):
        xs = x.reshape(accum, batch // accum, S, D)

        def body(c, xc):
            return c + loss_one(params, xc), None

        t, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return t

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
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    import os

    which = os.environ.get("SWEEP", "policies")
    if which == "policies":
        cp = jax.checkpoint_policies
        bench("mb8 full remat (prod)   ", lambda b: jax.checkpoint(b))
        bench("mb8 no remat            ", lambda b: b)
        bench("mb8 dots_no_batch_saved ",
              lambda b: jax.checkpoint(
                  b, policy=cp.dots_with_no_batch_dims_saveable))
        bench("mb8 dots_saveable       ",
              lambda b: jax.checkpoint(b, policy=cp.dots_saveable))
        bench("mb16 dots_no_batch_saved",
              lambda b: jax.checkpoint(
                  b, policy=cp.dots_with_no_batch_dims_saveable), accum=2)
        bench("mb4 dots_no_batch_saved ",
              lambda b: jax.checkpoint(
                  b, policy=cp.dots_with_no_batch_dims_saveable), accum=8)
    if which == "split":
        # Split-remat: the remat recompute of the attention sublayer (the
        # band fwd) is the target — save it, remat only the MLP.
        bench("mb8 split attn-saved    ", lambda b: split_block_mlp_remat)
        bench("mb4 split attn-saved    ", lambda b: split_block_mlp_remat,
              accum=8)
        bench("mb16 split attn-saved   ", lambda b: split_block_mlp_remat,
              accum=2)
        bench("mb8 split both remat    ", lambda b: split_block_both_remat)
    if which == "isolate":
        # b8 accum=1 has the same live set as mb8 accumulation without the
        # scan — does the compiler reject the saved-attn residuals or the
        # scan interaction?
        bench("b8 accum1 full remat    ", lambda b: jax.checkpoint(b),
              batch=8, accum=1)
        bench("b8 accum1 split attn-svd", lambda b: split_block_mlp_remat,
              batch=8, accum=1)
        bench("b8 accum1 no remat      ", lambda b: b, batch=8, accum=1)
