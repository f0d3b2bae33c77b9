"""On-chip FD check: roll-band dropout mask identical fwd/bwd (hardware
PRNG path — the interpret-mode tests cover only the threefry stand-in).

Round-4 artifact: this probe exposed that Mosaic's prng_seed accepts at
most 2 scalars (the 3-value seeding compiled nowhere but interpret mode
— BASELINE.md "attack #8" postscript). Run on the chip after any change
to ops/mhla_band_roll's PRNG or tiling:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_dropout_fd.py
"""
import sys
sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure
configure()
import jax, jax.numpy as jnp, numpy as np
from focused_attention_vit_tpu.ops.mhla_band_roll import roll_banded_attention

rng = np.random.default_rng(0)
b, h, d, s, w, rate = 1, 2, 64, 1300, 7, 0.3
q = jnp.asarray(rng.normal(size=(b, h, d, s)).astype(np.float32))
k = jnp.asarray(rng.normal(size=(b, h, d, s)).astype(np.float32))
v = jnp.asarray(rng.normal(size=(b, h, d, s)).astype(np.float32))

f = jax.jit(lambda v_: roll_banded_attention(q, k, v_, w, (rate, 7)).sum())
df = jax.jit(jax.grad(lambda v_: roll_banded_attention(q, k, v_, w, (rate, 7)).sum()))
o1, o2 = float(f(v)), float(f(v))
assert o1 == o2, "non-deterministic given seed"
dv = df(v)
eps = 0.5
ok = True
for lane in (10, 700, 1290):  # tile 0, tile 1 (multi-tile), last lanes
    probe = jnp.zeros_like(v).at[0, 0, 3, lane].set(eps)
    fd = (float(f(v + probe)) - o1) / eps
    got = float(dv[0, 0, 3, lane])
    match = abs(got - fd) <= 1e-2 * max(1.0, abs(fd))
    print(f"lane {lane}: dv={got:.6f} fd={fd:.6f} match={match}", flush=True)
    ok &= match
print("ONCHIP DROPOUT FD", "OK" if ok else "FAIL")
