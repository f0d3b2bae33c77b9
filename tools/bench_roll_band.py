"""Band-only A/B on the TPU: XLA shift band vs v5 lane-roll kernel.

Geometry: reference default S=3137, d=64, W=7, bf16.
Loops inside one jit (tunnel overhead ~2.5 ms/dispatch).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_roll_band.py [BH] [ITERS]

Staged during the round-3 axon outage (BASELINE.md "attack #5") — run on
tunnel restoration; expected fwd roofline ~4.1 ms vs the shift path's
measured 23.5 ms at BH=384.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from focused_attention_vit_tpu.ops.window import _shift_banded_attention
from focused_attention_vit_tpu.ops.mhla_band_roll import roll_banded_attention

BH = int(sys.argv[1]) if len(sys.argv) > 1 else 384  # 32*12
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
S, D, W = 3137, 64, 7
B, H = BH // 12, 12

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, S, D)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, H, S, D)), dtype=jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, H, S, D)), dtype=jnp.bfloat16)
q_ds = jnp.asarray(q.transpose(0, 1, 3, 2))
k_ds = jnp.asarray(k.transpose(0, 1, 3, 2))
v_ds = jnp.asarray(v.transpose(0, 1, 3, 2))


def loop(fn, *_template):
    # The arrays MUST flow through run's parameters, not a closure: jit
    # embeds closed-over device arrays as HLO constants, and the axon
    # remote-compile request then ships 3x154 MB of literals -> HTTP 413.
    def run(*args):
        def body(c, _):
            out = fn(*[a + c for a in args])
            return c + out.ravel()[0].astype(c.dtype) * 0, out.ravel()[0]
        c0 = jnp.zeros((), args[0].dtype)
        _, outs = jax.lax.scan(body, c0, None, length=ITERS)
        return outs.sum()
    return jax.jit(run)


def timeit(name, fn, *args):
    f = loop(fn, *args)
    r = f(*args)
    _ = float(r)  # sync (block_until_ready is a no-op on axon)
    t0 = time.perf_counter()
    r = f(*args)
    _ = float(r)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {dt:.2f} ms/iter")
    return dt


def shift_fwd(q, k, v):
    return _shift_banded_attention(q, k, v, W)


def roll_fwd(q, k, v):
    return roll_banded_attention(q, k, v, W)


def grad_wrap(fn):
    def loss(q, k, v):
        return (fn(q, k, v).astype(jnp.float32) ** 2).sum()
    g = jax.grad(loss, argnums=(0, 1, 2))
    def both(q, k, v):
        gs = g(q, k, v)
        return gs[0] + gs[1] + gs[2]
    return both


print(f"BH={BH} S={S} d={D} W={W} bf16, {ITERS} iters inside jit")
t_shift_f = timeit("shift fwd      ", shift_fwd, q, k, v)
t_roll_f = timeit("roll  fwd      ", roll_fwd, q_ds, k_ds, v_ds)
t_shift_b = timeit("shift fwd+bwd  ", grad_wrap(shift_fwd), q, k, v)
t_roll_b = timeit("roll  fwd+bwd  ", grad_wrap(roll_fwd), q_ds, k_ds, v_ds)
print(f"speedup fwd {t_shift_f / t_roll_f:.2f}x, fwd+bwd "
      f"{t_shift_b / t_roll_b:.2f}x")

# correctness spot-check on-device (bf16 tolerance)
o1 = _shift_banded_attention(q, k, v, W)
o2 = roll_banded_attention(q_ds, k_ds, v_ds, W).transpose(0, 1, 3, 2)
err = float(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max())
print("max abs err vs shift:", err)
