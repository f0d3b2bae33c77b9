"""Chip kernel audit: compile + numerically check EVERY production-
reachable Pallas branch on real TPU hardware.

Motivation (round 4, BASELINE.md "attack #8 postscript"): interpret-mode
stand-ins can mask compile-time holes — `pltpu.prng_seed` with 3 scalars
was green on CPU and uncompilable on the chip. CPU-green ≠
chip-compilable, so every kernel branch gets driven on hardware:

* roll band (ops/mhla_band_roll): fwd+bwd, bf16 and f32, rate 0 and
  >0 (in-kernel PRNG), geometries covering the widened single-tile fwd
  (S=3137), multi-tile non-divisible (S=1300), natively-single-tile
  (S=500), W=5, even W=2 (right-fixup-empty fold branch), and the
  env-overridable tile widths 256/1280 (monkeypatched DEFAULT_TILE).
* fused MHA (ops/mha_kernel): fwd+bwd, bf16/f32, rate 0 / >0, at its
  production short-S geometry.
* flash (ops/flash_attention_pallas): fwd+bwd, bf16/f32, padded
  (segment-ids branch, S=3137) and block-multiple unpadded (S=1024).
* archival v4 (FAVIT_USE_PALLAS_MHLA=1 composite incl. edge fix).
* masked shift band at long S (XLA, not Pallas — but a distinct
  dispatch branch): fwd+grad compile + oracle check.

Each row: jit-compile ON THE CHIP, run, compare against an XLA oracle
(shift band / dense softmax) where rate=0; for rate>0 rows check
determinism-given-seed, finiteness of fwd+grad, and empirical drop rate.
FD grad-vs-forward-difference for the in-kernel PRNG users lives in
tools/chip_dropout_fd.py (run it too after any PRNG/tiling change).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/chip_kernel_audit.py
Env: AUDIT_ONLY=<substring> to filter rows; AUDIT_SKIP_SLOW=1 to skip
the S=3137 rows (fast re-check). Exits nonzero on any FAIL.

Results log: BASELINE.md "chip kernel audit matrix" (round 5).
"""
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
import jax
import jax.numpy as jnp
import numpy as np

from focused_attention_vit_tpu.ops import mhla_band_roll as roll_mod
from focused_attention_vit_tpu.ops.mhla_band_roll import roll_banded_attention
from focused_attention_vit_tpu.ops import window as window_ops
from focused_attention_vit_tpu.ops.window import (
    windowed_latent_attention,
    _shift_banded_attention,
)
from focused_attention_vit_tpu.ops.mha_kernel import (
    fused_multi_head_attention,
    fused_mha_supported,
)
from focused_attention_vit_tpu.ops.flash_attention_pallas import (
    flash_attention_tpu,
)

ONLY = os.environ.get("AUDIT_ONLY", "")
SKIP_SLOW = os.environ.get("AUDIT_SKIP_SLOW", "0") == "1"

results = []


def run_row(name, fn):
    if ONLY and ONLY not in name:
        return
    if SKIP_SLOW and "3137" in name:
        return
    t0 = time.time()
    try:
        detail = fn() or ""
        status = "PASS"
    except Exception as e:
        detail = f"{type(e).__name__}: {str(e)[:200]}"
        status = "FAIL"
        if os.environ.get("AUDIT_TRACE"):
            traceback.print_exc()
    dt = time.time() - t0
    results.append((name, status, dt, detail))
    print(f"{status}  {name:56s} {dt:6.1f}s  {detail}", flush=True)


def mk(shape, dtype, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape), dtype=dtype)


def qkv(b, h, d, s, dtype, sminor=True):
    shape = (b, h, d, s) if sminor else (b, h, s, d)
    return (mk(shape, dtype, 0), mk(shape, dtype, 1), mk(shape, dtype, 2))


def _err(a, b):
    return float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )


# ---- roll band ----------------------------------------------------------

def roll_row(s, w, dtype, rate, b=1, h=2, d=64, tile=None, grad=True):
    def body():
        old_tile = roll_mod.DEFAULT_TILE
        if tile is not None:
            roll_mod.DEFAULT_TILE = tile
        try:
            q, k, v = qkv(b, h, d, s, dtype)
            drop = (rate, 7) if rate else (0.0, None)

            def f(q, k, v):
                return roll_banded_attention(q, k, v, w, drop)

            out = jax.jit(f)(q, k, v)
            note = ""
            if rate == 0.0:
                # Oracle: XLA shift band on [B,h,S,d]
                oracle = _shift_banded_attention(
                    q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2),
                    v.transpose(0, 1, 3, 2), w,
                ).transpose(0, 1, 3, 2)
                tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4
                e = _err(out, oracle)
                assert e < tol, f"fwd err {e} >= {tol}"
                note = f"fwd_err={e:.2e}"
            else:
                out2 = jax.jit(f)(q, k, v)
                assert _err(out, out2) == 0.0, "nondeterministic given seed"
                frac = float(jnp.mean((out == 0).astype(jnp.float32)))
                note = f"zero_frac={frac:.3f}"
            assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
            if grad:
                g = jax.jit(
                    jax.grad(
                        lambda q, k, v: jnp.sum(
                            f(q, k, v).astype(jnp.float32) ** 2
                        ),
                        argnums=(0, 1, 2),
                    )
                )(q, k, v)
                for gi in g:
                    assert bool(
                        jnp.all(jnp.isfinite(gi.astype(jnp.float32)))
                    ), "non-finite grad"
                if rate == 0.0:
                    go = jax.grad(
                        lambda q, k, v: jnp.sum(
                            _shift_banded_attention(
                                q.transpose(0, 1, 3, 2),
                                k.transpose(0, 1, 3, 2),
                                v.transpose(0, 1, 3, 2), w,
                            ).astype(jnp.float32) ** 2
                        ),
                        argnums=(0, 1, 2),
                    )(q, k, v)
                    gtol = (2e-1 if dtype == jnp.bfloat16 else 1e-3)
                    ge = max(_err(a, o) for a, o in zip(g, go))
                    assert ge < gtol, f"grad err {ge} >= {gtol}"
                    note += f" grad_err={ge:.2e}"
            return note
        finally:
            roll_mod.DEFAULT_TILE = old_tile

    return body


for dtype, dn in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
    run_row(f"roll S=3137 W=7 {dn} rate=0 (widened fwd, 5x640 bwd)",
            roll_row(3137, 7, dtype, 0.0))
    run_row(f"roll S=3137 W=7 {dn} rate=0.1",
            roll_row(3137, 7, dtype, 0.1))
    run_row(f"roll S=1300 W=7 {dn} rate=0 (multi-tile non-divisible)",
            roll_row(1300, 7, dtype, 0.0))
run_row("roll S=500 W=7 bf16 rate=0 (native single tile)",
        roll_row(500, 7, jnp.bfloat16, 0.0))
run_row("roll S=1300 W=5 bf16 rate=0", roll_row(1300, 5, jnp.bfloat16, 0.0))
run_row("roll S=1300 W=2 bf16 rate=0 (even W, empty right fixup)",
        roll_row(1300, 2, jnp.bfloat16, 0.0))
run_row("roll S=1300 W=2 bf16 rate=0.2 (even W dropout)",
        roll_row(1300, 2, jnp.bfloat16, 0.2))
run_row("roll S=3137 W=7 bf16 rate=0 tile=256",
        roll_row(3137, 7, jnp.bfloat16, 0.0, tile=256))
run_row("roll S=3137 W=7 bf16 rate=0.1 tile=1280",
        roll_row(3137, 7, jnp.bfloat16, 0.1, tile=1280))


# ---- fused MHA ----------------------------------------------------------

def mha_row(s, dtype, rate, b=2, h=3, d=64):
    def body():
        assert fused_mha_supported(s, d), "geometry not supported"
        q, k, v = qkv(b, h, d, s, dtype, sminor=False)
        rng = jax.random.PRNGKey(11) if rate else None

        def f(q, k, v):
            return fused_multi_head_attention(q, k, v, dropout_rate=rate,
                                              dropout_rng=rng)

        out = jax.jit(f)(q, k, v)
        note = ""
        if rate == 0.0:
            logits = jnp.einsum(
                "bhsd,bhtd->bhst", q, k,
                preferred_element_type=jnp.float32) * (d ** -0.5)
            oracle = jnp.einsum(
                "bhst,bhtd->bhsd", jax.nn.softmax(logits, axis=-1),
                v.astype(jnp.float32))
            tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4
            e = _err(out, oracle)
            assert e < tol, f"fwd err {e} >= {tol}"
            note = f"fwd_err={e:.2e}"
        else:
            out2 = jax.jit(f)(q, k, v)
            assert _err(out, out2) == 0.0, "nondeterministic given seed"
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
        g = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(f(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        for gi in g:
            assert bool(jnp.all(jnp.isfinite(gi.astype(jnp.float32))))
        return note

    return body


for dtype, dn in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
    run_row(f"mha S=197 {dn} rate=0", mha_row(197, dtype, 0.0))
    run_row(f"mha S=197 {dn} rate=0.1", mha_row(197, dtype, 0.1))


# ---- flash --------------------------------------------------------------

def flash_row(s, dtype, b=1, h=2, d=64):
    def body():
        q, k, v = qkv(b, h, d, s, dtype, sminor=False)
        out = jax.jit(flash_attention_tpu)(q, k, v)
        logits = jnp.einsum(
            "bhsd,bhtd->bhst", q, k,
            preferred_element_type=jnp.float32) * (d ** -0.5)
        oracle = jnp.einsum(
            "bhst,bhtd->bhsd", jax.nn.softmax(logits, axis=-1),
            v.astype(jnp.float32))
        tol = 2e-2 if dtype == jnp.bfloat16 else 1e-4
        e = _err(out, oracle)
        assert e < tol, f"fwd err {e} >= {tol}"
        g = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(
                flash_attention_tpu(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        go = jax.grad(
            lambda q, k, v: jnp.sum(
                jnp.einsum(
                    "bhst,bhtd->bhsd",
                    jax.nn.softmax(
                        jnp.einsum("bhsd,bhtd->bhst", q, k,
                                   preferred_element_type=jnp.float32)
                        * (d ** -0.5), axis=-1),
                    v.astype(jnp.float32)) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        gtol = 5e-1 if dtype == jnp.bfloat16 else 5e-3
        ge = max(_err(a, o) for a, o in zip(g, go))
        assert ge < gtol, f"grad err {ge} >= {gtol}"
        return f"fwd_err={e:.2e} grad_err={ge:.2e}"

    return body


run_row("flash S=3137 bf16 (padded, segment ids)",
        flash_row(3137, jnp.bfloat16))
run_row("flash S=3137 f32 (padded, segment ids)",
        flash_row(3137, jnp.float32))
run_row("flash S=1024 bf16 (block-multiple, no pad)",
        flash_row(1024, jnp.bfloat16))


# ---- archival v4 (composite via window dispatch) ------------------------

def v4_row():
    def body():
        os.environ["FAVIT_USE_PALLAS_MHLA"] = "1"
        os.environ["FAVIT_MHLA_IMPL"] = "shiftband"  # bypass auto->roll
        try:
            dtype = jnp.bfloat16
            q, k, v = qkv(1, 2, 64, 3137, dtype, sminor=False)
            out = jax.jit(
                lambda q, k, v: windowed_latent_attention(q, k, v, 7)
            )(q, k, v)
            oracle = _shift_banded_attention(q, k, v, 7)
            e = _err(out, oracle)
            assert e < 2e-2, f"fwd err {e}"
            g = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    windowed_latent_attention(q, k, v, 7).astype(
                        jnp.float32) ** 2),
                argnums=(0, 1, 2)))(q, k, v)
            for gi in g:
                assert bool(jnp.all(jnp.isfinite(gi.astype(jnp.float32))))
            return f"fwd_err={e:.2e}"
        finally:
            os.environ.pop("FAVIT_USE_PALLAS_MHLA", None)
            os.environ.pop("FAVIT_MHLA_IMPL", None)

    return body


run_row("v4 archival S=3137 bf16 (FAVIT_USE_PALLAS_MHLA composite)",
        v4_row())


# ---- masked shift band at long S (XLA dispatch branch) ------------------

def masked_row():
    def body():
        dtype = jnp.bfloat16
        q, k, v = qkv(1, 2, 64, 3137, dtype, sminor=False)
        rng = np.random.default_rng(5)
        mask = jnp.asarray(
            rng.integers(0, 2, size=(1, 3137, 3137)), jnp.float32
        )
        out = jax.jit(
            lambda q, k, v: windowed_latent_attention(
                q, k, v, 7, attention_mask=mask)
        )(q, k, v)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
        g = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(
                windowed_latent_attention(
                    q, k, v, 7, attention_mask=mask
                ).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        for gi in g:
            assert bool(jnp.all(jnp.isfinite(gi.astype(jnp.float32))))
        return "finite fwd+grad"

    return body


run_row("masked shift band S=3137 bf16 (XLA _banded_mask branch)",
        masked_row())


# ---- summary ------------------------------------------------------------

fails = [r for r in results if r[1] == "FAIL"]
print(f"\n{len(results)} rows: {len(results) - len(fails)} pass, "
      f"{len(fails)} fail")
sys.exit(1 if fails else 0)
