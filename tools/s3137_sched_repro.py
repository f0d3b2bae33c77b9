"""Minimal XLA repro of the S=3137 scheduling wall (VERDICT r2 task 1).

BASELINE.md ("Reference-default geometry") measures in-context
elementwise ops running ~10x below their standalone bandwidth inside
the ViT-B/4 train step and attributes the 5-7x roofline gap to XLA
scheduling at large live activation sets. This script is the smallest
program pair that isolates the phenomenon — no framework code, just a
12-layer chain, grad'd monolithically vs microbatched (identical FLOPs
and bytes; only the live saved-activation set differs, 12 x [32,3137,D]
vs 12 x [8,3137,D]).

Three chain bodies, selected per run:
  - "ln":    x = x + LN_i(x)                  (bandwidth-only chain)
  - "mlp":   x = x + gelu(LN_i(x) @ W1) @ W2  (the transformer mix)
  - "block": full transformer block — qkv proj, shift-band windowed
             attention (the production W=7 band from ops/window),
             out proj, MLP — the real step minus data/optimizer.
  - "block_sminor": the same block math with the residual stream held
             in the S-minor [B, D, S] layout end-to-end — every matmul
             contracts a non-minor axis (so the qkv/merge head
             relayouts the bisect charges ~215 ms for cannot exist),
             the band runs on [B, h, d, S] operands, LN reduces over
             sublanes. A/B against "block" isolates the value of an
             S-minor residual stream before committing it to the model.

Hardware results (2026-08-18, v5e, b32 bf16):
  - "ln" does NOT reproduce the wall: grad runs at ~700 GB/s effective
    and microbatching is neutral (0.89x).
  - "mlp" does NOT reproduce it either: 154.5 ms/step monolithic
    = ~221 TFLOP/s on the matmul FLOPs (at/above the bf16 nameplate
    convention), microbatch-8 neutral at 1.03x.
  So the round-2 hypothesis "XLA scheduling degrades with large live
  activation sets" is NOT confirmed for plain LN/matmul chains — the
  live-set size alone is harmless. Whatever the real model's
  microbatch lever exploits must involve the band attention's
  slice/stack/softmax traffic ("block" body) — see BASELINE.md
  "round-3 scheduling-wall repro". Run on the TPU:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/s3137_sched_repro.py block

All timing loops ITERS steps INSIDE one jit (per-dispatch tunnel
overhead is ~2.5 ms) and syncs via host transfer (block_until_ready is
a no-op on the axon plugin — CLAUDE.md).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

BODY = sys.argv[1] if len(sys.argv) > 1 else "mlp"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
B, S, D, H, L = 32, 3137, 768, 3072, 12
NH, W = 12, 7
HD = D // NH
DTYPE = jnp.bfloat16

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, S, D)), dtype=DTYPE)
params = {
    "scale": jnp.asarray(1 + 0.01 * rng.normal(size=(L, D)), jnp.float32),
    "bias": jnp.asarray(0.01 * rng.normal(size=(L, D)), jnp.float32),
}
if BODY in ("mlp", "block", "block_sminor"):
    params["w1"] = jnp.asarray(
        rng.normal(size=(L, D, H)) / np.sqrt(D), DTYPE
    )
    params["w2"] = jnp.asarray(
        rng.normal(size=(L, H, D)) / np.sqrt(H), DTYPE
    )
if BODY in ("block", "block_sminor"):
    params["wqkv"] = jnp.asarray(
        rng.normal(size=(L, D, 3 * D)) / np.sqrt(D), DTYPE
    )
    params["wo"] = jnp.asarray(
        rng.normal(size=(L, D, D)) / np.sqrt(D), DTYPE
    )
if BODY == "block_sminor":
    x = x.transpose(0, 2, 1)  # residual stream lives as [B, D, S]


def ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * scale + bias).astype(x.dtype)


def ln_sminor(x, scale, bias):
    # LN over the D (sublane) axis of the S-minor [B, D, S] stream.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * scale[None, :, None] + bias[None, :, None]).astype(x.dtype)


def shift_band_sminor(q, k, v, w):
    # The library's S-minor band (the A/B twin this tool's measurement
    # motivated) — one definition, no drift between what the repro times
    # and what ops/window ships.
    from focused_attention_vit_tpu.ops.window import (
        _shift_banded_attention_ds,
    )

    return _shift_banded_attention_ds(q, k, v, w)


def layer_sminor(pi, x):
    b = x.shape[0]
    y = ln_sminor(x, pi["scale"], pi["bias"])
    qkv = jnp.einsum("bds,de->bes", y, pi["wqkv"],
                     preferred_element_type=jnp.float32).astype(DTYPE)
    qkv = qkv.reshape(b, 3, NH, HD, S)
    o = shift_band_sminor(qkv[:, 0], qkv[:, 1], qkv[:, 2], W)
    x = x + jnp.einsum("bds,de->bes", o.reshape(b, D, S), pi["wo"],
                       preferred_element_type=jnp.float32).astype(DTYPE)
    y = ln_sminor(x, pi["scale"], pi["bias"])
    y = jax.nn.gelu(
        jnp.einsum("bds,dh->bhs", y, pi["w1"],
                   preferred_element_type=jnp.float32).astype(DTYPE)
    )
    y = jnp.einsum("bhs,hd->bds", y, pi["w2"],
                   preferred_element_type=jnp.float32).astype(DTYPE)
    return x + y


def layer(pi, x):
    if BODY == "block_sminor":
        return layer_sminor(pi, x)
    b = x.shape[0]
    y = ln(x, pi["scale"], pi["bias"])
    if BODY == "block":
        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention,
        )
        qkv = jnp.einsum("bsd,de->bse", y, pi["wqkv"],
                         preferred_element_type=jnp.float32).astype(DTYPE)
        qkv = qkv.reshape(b, S, 3, NH, HD).transpose(2, 0, 3, 1, 4)
        o = windowed_latent_attention(qkv[0], qkv[1], qkv[2], W)
        o = o.transpose(0, 2, 1, 3).reshape(b, S, D)
        x = x + jnp.einsum(
            "bsd,de->bse", o, pi["wo"],
            preferred_element_type=jnp.float32).astype(DTYPE)
        y = ln(x, pi["scale"], pi["bias"])
    if BODY in ("mlp", "block"):
        y = jax.nn.gelu(
            jnp.einsum("bsd,dh->bsh", y, pi["w1"],
                       preferred_element_type=jnp.float32).astype(DTYPE)
        )
        y = jnp.einsum("bsh,hd->bsd", y, pi["w2"],
                       preferred_element_type=jnp.float32).astype(DTYPE)
    return x + y


def chain_loss(params, x):
    # "block" needs per-layer remat exactly like the real model (the
    # no-remat monolithic chain OOMs 16G HBM at b32 — itself evidence
    # that the production remat requirement is memory, not scheduling).
    f = jax.checkpoint(layer) if BODY.startswith("block") else layer
    for i in range(L):
        x = f(jax.tree.map(lambda p: p[i], params), x)
    return jnp.mean(x.astype(jnp.float32) ** 2)


def grad_step(params, x, micro: int):
    if micro:
        def body(carry, xc):
            g = jax.grad(chain_loss)(params, xc)
            return jax.tree.map(jnp.add, carry, g), None

        zero = jax.tree.map(jnp.zeros_like, params)
        g, _ = jax.lax.scan(
            body, zero, x.reshape(B // micro, micro, *x.shape[1:])
        )
        return g
    return jax.grad(chain_loss)(params, x)


@functools.partial(jax.jit, static_argnames=("micro",))
def bench(params, x, micro: int):
    # ITERS dependent grad steps inside one program: fold each grad's
    # sum back into a scalar perturbation so XLA cannot hoist the grad
    # out of the loop. 1e-30*acc is exactly 0 ulp at f32/bf16 (eps ~1e-7)
    # so per-step numerics are identical, but acc is dynamic so the
    # compiler cannot prove loop-invariance.
    def body(i, acc):
        g = grad_step(
            jax.tree.map(lambda p: p * (1 + 1e-30 * acc).astype(p.dtype),
                         params),
            x, micro,
        )
        return acc + jax.tree.leaves(g)[0].astype(jnp.float32).sum()

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))


def timeit(micro):
    _ = float(bench(params, x, micro))  # compile + warm
    t0 = time.perf_counter()
    _ = float(bench(params, x, micro))
    return (time.perf_counter() - t0) / ITERS


t_mono = timeit(0)
t_micro = timeit(8)
if BODY in ("mlp", "block", "block_sminor"):
    flops = 3 * L * 2 * 2 * B * S * D * H  # fwd+bwd(2x) MLP matmul FLOPs
    if BODY.startswith("block"):
        # qkv + out-proj matmuls (band attention FLOPs excluded: they
        # are O(S·W·d), ~1% — the number below is matmul-normalized so
        # runs are comparable to the "mlp" body, not an MFU claim)
        flops += 3 * L * 2 * B * S * D * 4 * D
    print(f"{BODY}-chain grad monolithic : {t_mono*1e3:8.1f} ms "
          f"= {flops/t_mono/1e12:6.1f} TFLOP/s matmul-normalized")
    print(f"{BODY}-chain grad microbatch8: {t_micro*1e3:8.1f} ms "
          f"= {flops/t_micro/1e12:6.1f} TFLOP/s matmul-normalized")
else:
    passes = 5 * L  # LN-equivalent r/w passes per grad step
    bts = passes * 2 * B * S * D * 2
    print(f"ln-chain grad monolithic : {t_mono*1e3:8.1f} ms "
          f"= {bts/t_mono/1e9:6.1f} GB/s effective")
    print(f"ln-chain grad microbatch8: {t_micro*1e3:8.1f} ms "
          f"= {bts/t_micro/1e9:6.1f} GB/s effective")
print(f"mono/micro ratio (same FLOPs+bytes, live set 4x larger): "
      f"{t_mono/t_micro:.2f}x")
