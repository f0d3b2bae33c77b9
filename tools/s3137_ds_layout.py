"""A/B: S-minor (D-major) residual stream for the S=3137 geometry.

The round-3 bisect (tools/s3137_bisect.py, BASELINE.md "S=3137 attack")
attributes ~215 ms/step to head-layout relayouts around the band: the qkv
matmul's natural output is d-minor ``[B,S,3,h,d]`` while the band's
logits/weights live s-minor ``[B,h,W,S]`` — every block round-trips
between the two. This harness keeps the WHOLE residual stream s-minor
``[B, D, S]``:

* qkv:   einsum Dk,bDs->bks  (contracts D on the MXU, S stays on lanes)
* band:  q[b,h,d,s] · k_pad[b,h,d,s+o] summed over d (sublane reduce),
         softmax over the W offsets (sublane axis, 7→8 pad only)
* out:   einsum hdD,bhds->bDs
* MLP:   DH,bDs->bHs / HD,bHs->bDs
* LN:    over D (the major axis)

No relayout anywhere between patch embed and the head. Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/s3137_ds_layout.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import focused_attention_vit_tpu.ops.window as W  # noqa: E402

B, S, D, H, DEPTH, NH = 32, 3137, 768, 3072, 12, 12
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


def ln_ds(x, g, b):
    """LayerNorm over D for [B, D, S] (major-axis reduce)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(1, keepdims=True)
    var = ((xf - mu) ** 2).mean(1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g[None, :, None]
            + b[None, :, None]).astype(jnp.bfloat16)


def halo_pad_s(x):
    """Reference edge halo on the minor S axis of [B, h, d, S]."""
    last = jax.lax.slice_in_dim(x, S - 1, S, axis=3)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=3)
    return jnp.concatenate(
        [last] * HW + [x] + [first] * (WIN - 1 - HW), axis=3
    )


def band_ds(q, k, v):
    """[B, h, d, S] s-minor shift band (exact halo edge rule)."""
    kp = halo_pad_s(k)
    vp = halo_pad_s(v)
    qf = q.astype(jnp.float32)
    logits = jnp.stack(
        [
            (qf * jax.lax.dynamic_slice_in_dim(kp, o, S, axis=3)
             .astype(jnp.float32)).sum(axis=2)
            for o in range(WIN)
        ],
        axis=2,
    ) * (HD ** -0.5)  # [B, h, W, S]
    wts = jax.nn.softmax(logits, axis=2)
    out = sum(
        jax.lax.slice_in_dim(wts, o, o + 1, axis=2)  # [B,h,1,S]
        * jax.lax.dynamic_slice_in_dim(vp, o, S, axis=3).astype(jnp.float32)
        for o in range(WIN)
    )
    return out.astype(q.dtype)  # [B, h, d, S]


def block_ds(p, x):
    y = ln_ds(x, p["g2"], p["bb2"])
    qkv = jnp.einsum(
        "Dk,bDs->bks", p["wqkv"].astype(jnp.bfloat16), y
    ).reshape(B, 3, NH, HD, S)
    q = jax.lax.index_in_dim(qkv, 0, axis=1, keepdims=False)
    k = jax.lax.index_in_dim(qkv, 1, axis=1, keepdims=False)
    v = jax.lax.index_in_dim(qkv, 2, axis=1, keepdims=False)
    wl = p["wl"].astype(jnp.bfloat16)
    k = jnp.einsum("de,bhds->bhes", wl, k)
    v = jnp.einsum("de,bhds->bhes", wl, v)
    o = band_ds(q, k, v)
    o = jnp.einsum(
        "hdD,bhds->bDs", p["wo"].reshape(NH, HD, D).astype(jnp.bfloat16), o
    )
    x = x + o
    y = ln_ds(x, p["g1"], p["bb1"])
    y = jnp.einsum("DH,bDs->bHs", p["w1"].astype(jnp.bfloat16), y)
    y = y + p["b1"].astype(jnp.bfloat16)[None, :, None]
    y = jax.nn.gelu(y, approximate=False)
    y = jnp.einsum("HD,bHs->bDs", p["w2"].astype(jnp.bfloat16), y)
    y = y + p["b2"].astype(jnp.bfloat16)[None, :, None]
    return x + y


# Baseline block (the current production layout, from s3137_bisect).
def ln_sd(x, g, b):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(
        jnp.bfloat16
    )


def block_sd(p, x):
    y = ln_sd(x, p["g2"], p["bb2"])
    qkv = y @ p["wqkv"].astype(jnp.bfloat16)
    qkv = qkv.reshape(B, S, 3, NH, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    k = k @ p["wl"].astype(jnp.bfloat16)
    v = v @ p["wl"].astype(jnp.bfloat16)
    o = W._shift_banded_attention(q, k, v, WIN)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
    o = o @ p["wo"].astype(jnp.bfloat16)
    x = x + o
    return x + mlp_sd(p, ln_sd(x, p["g1"], p["bb1"]))


def mlp_sd(p, y):
    y = y @ p["w1"].astype(jnp.bfloat16) + p["b1"].astype(jnp.bfloat16)
    y = jax.nn.gelu(y, approximate=False)
    return y @ p["w2"].astype(jnp.bfloat16) + p["b2"].astype(jnp.bfloat16)


def bench(name, block_fn, x, steps=4, scan=False):
    params = make_params(jax.random.PRNGKey(0))

    def loss(params, x):
        f = jax.checkpoint(block_fn)
        if scan:
            stacked = jax.tree.map(
                lambda *ls: jnp.stack(ls), *params
            )
            x, _ = jax.lax.scan(
                lambda c, p: (f(p, c), None), x, stacked
            )
        else:
            for p in params:
                x = f(p, x)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss))
    try:
        r = g(params, x)
        float(r[0]["w1"][0, 0] if not scan else r[0]["w1"][0, 0])
        t0 = time.time()
        for _ in range(steps):
            r = g(params, x)
        float(r[0]["w1"][0, 0])
        dt = (time.time() - t0) / steps
        print(f"{name}: {dt*1000:.0f} ms/step = {B/dt:.1f} img/s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    x_sd = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.bfloat16)
    x_ds = jnp.swapaxes(x_sd, 1, 2)
    # numerics sanity at tiny scale is covered by construction (same math);
    # timing is the question here.
    bench("baseline [B,S,D] shift band ", block_sd, x_sd)
    bench("DS layout [B,D,S] band      ", block_ds, x_ds)
    bench("baseline + scan_layers      ", block_sd, x_sd, scan=True)
    bench("DS layout + scan_layers     ", block_ds, x_ds, scan=True)
