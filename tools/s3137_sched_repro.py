"""Minimal XLA repro of the S=3137 scheduling wall (VERDICT r2 task 1).

BASELINE.md ("Reference-default geometry") measures the same LayerNorm
sustaining ~298 GB/s standalone but ~25 GB/s effective inside the full
ViT-B/4 train step, and attributes the 5-7x roofline gap to XLA
scheduling at large live activation sets. This is the smallest program
that reproduces the phenomenon — no framework code, no attention, just
LayerNorm + residual adds:

  A. standalone       : y = LN(x)                      (1 live tensor)
  B. monolithic grad  : grad of 12x residual-LN chain  (12 live saved
                        activations of [32,3137,768] during the bwd)
  C. microbatched grad: the SAME chain/grad, batch split into chunks of
                        8 inside one jit (live set 4x smaller)

Identical FLOPs and HBM bytes per image in B and C; only the live-set
size differs. B running far below A's bandwidth while C recovers most
of it proves the bound is the scheduler, not the op or the memory
system. Run on the TPU:

  PYTHONPATH=/root/repo:/root/.axon_site python tools/s3137_sched_repro.py

Timing syncs via host transfer (jax.block_until_ready is a no-op on the
axon PJRT plugin — CLAUDE.md).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

B, S, D, L = 32, 3137, 768, 12
DTYPE = jnp.bfloat16
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, S, D)), dtype=DTYPE)
scales = jnp.asarray(1.0 + 0.01 * rng.normal(size=(L, D)), dtype=jnp.float32)
biases = jnp.asarray(0.01 * rng.normal(size=(L, D)), dtype=jnp.float32)


def ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * scale + bias).astype(x.dtype)


@jax.jit
def standalone(x, scales, biases):
    return ln(x, scales[0], biases[0])


def chain_loss(params, x):
    scales, biases = params
    for i in range(L):
        x = x + ln(x, scales[i], biases[i])
    return jnp.sum(x.astype(jnp.float32))


@jax.jit
def mono_grad(params, x):
    return jax.grad(chain_loss)(params, x)


@jax.jit
def micro_grad(params, x):
    def body(carry, xc):
        g = jax.grad(chain_loss)(params, xc)
        return jax.tree.map(jnp.add, carry, g), None

    zero = jax.tree.map(jnp.zeros_like, params)
    out, _ = jax.lax.scan(body, zero, x.reshape(4, B // 4, S, D))
    return out


def timeit(fn, *args):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])  # sync (compile+run)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


params = (scales, biases)
bytes_ln = 2 * B * S * D * 2  # one LN: read + write bf16
t_a = timeit(standalone, x, scales, biases)
# Per chain step fwd: read x, read x again for +, write x' (+ LN r/w) —
# count conservatively as 2 LN-equivalents fwd + 3 bwd per layer.
t_b = timeit(mono_grad, params, x)
t_c = timeit(micro_grad, params, x)

eq = 5 * L  # LN-equivalent passes per grad step (fwd 2/layer + bwd 3/layer)
print(f"A standalone LN [{B},{S},{D}]: {t_a*1e3:8.2f} ms "
      f"= {bytes_ln/t_a/1e9:6.1f} GB/s")
print(f"B monolithic 12-layer grad  : {t_b*1e3:8.2f} ms "
      f"= {eq*bytes_ln/t_b/1e9:6.1f} GB/s effective per pass")
print(f"C microbatch-8 same grad    : {t_c*1e3:8.2f} ms "
      f"= {eq*bytes_ln/t_c/1e9:6.1f} GB/s effective per pass")
print(f"B/C ratio (same FLOPs+bytes, only live-set size differs): "
      f"{t_b/t_c:.2f}x")
