"""Unit tests for the functional ops against reference semantics."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _dominant_np(labels, p):
    """Patch-dominant label, numpy oracle (mode, smallest-id tie-break)."""
    h, w = labels.shape
    gh, gw = h // p, w // p
    tiles = (
        labels.reshape(gh, p, gw, p).transpose(0, 2, 1, 3).reshape(gh * gw, p * p)
    )
    out = []
    for row in tiles:
        vals, cnts = np.unique(row, return_counts=True)
        out.append(vals[np.argmax(cnts)])
    return np.asarray(out)

from focused_attention_vit_tpu.ops import (
    extract_patches,
    window_index_table,
    dominant_superpixel_per_patch,
    segment_pool,
    superpixel_centroids,
    sinusoidal_positional_encoding,
    centroid_positional_encoding,
    slic_segment,
)


class TestPatchExtraction:
    def test_ordering_matches_reference_rearrange(self, rng):
        """(p1 p2 c) flattening order, row-major patches
        (reference: models/vit.py:38-39)."""
        b, h, w, c, p = 2, 8, 8, 3, 4
        x = rng.normal(size=(b, h, w, c)).astype(np.float32)
        out = np.asarray(extract_patches(jnp.asarray(x), p))
        assert out.shape == (b, 4, p * p * c)
        # Patch (i=0, j=1) spans rows 0:4, cols 4:8; element (p1, p2, ch)
        # sits at index (p1*p + p2)*c + ch.
        expect = x[0, 0:4, 4:8, :].reshape(p * p * c)
        np.testing.assert_allclose(out[0, 1], expect)

    def test_roundtrip_count(self, rng):
        x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        out = extract_patches(jnp.asarray(x), 4)
        assert out.shape == (1, 64, 48)


def _reference_window_loop(seq_len, window_size):
    """Direct numpy transcription of the reference edge rule
    (models/mhla.py:46-83) for odd window sizes."""
    hw = window_size // 2
    rows = []
    for i in range(seq_len):
        start = max(0, i - hw)
        end = min(seq_len, i + hw + 1)
        win = list(range(start, end))
        if len(win) < window_size:
            pad = window_size - len(win)
            if start == 0:
                win = win + [seq_len - 1] * pad
            else:
                win = [0] * pad + win
        rows.append(win)
    return np.array(rows, dtype=np.int32)


class TestWindowIndexTable:
    @pytest.mark.parametrize("s,w", [(10, 7), (3137, 7), (5, 3), (17, 5), (3, 7)])
    def test_matches_reference_rule_odd(self, s, w):
        np.testing.assert_array_equal(
            window_index_table(s, w), _reference_window_loop(s, w)
        )

    def test_even_window_defined(self):
        """Even windows crash the reference (ragged stack); here they are
        defined as [i-hw, i+hw-1] with the same edge rules."""
        t = window_index_table(10, 4)
        assert t.shape == (10, 4)
        np.testing.assert_array_equal(t[5], [3, 4, 5, 6])
        assert (t >= 0).all() and (t < 10).all()


def _dict_pool_reference(embeddings, seg_ids, num_segments, pooling):
    """Numpy transcription of SuperpixelPooling semantics
    (models/sppp.py:176-189), indexed by segment id with zeros for
    empty segments (the rebuild's static-shape convention)."""
    n, d = embeddings.shape
    out = np.zeros((num_segments, d), dtype=np.float64)
    for s in range(num_segments):
        members = embeddings[seg_ids == s]
        if len(members) == 0:
            continue
        if pooling == "mean":
            out[s] = members.mean(0)
        elif pooling == "max":
            out[s] = members.max(0)
        else:  # attention
            logits = members.sum(-1)
            w = np.exp(logits - logits.max())
            w = w / w.sum()
            out[s] = (members * w[:, None]).sum(0)
    return out


class TestSegmentPool:
    @pytest.mark.parametrize("pooling", ["mean", "max", "attention"])
    def test_matches_dict_semantics(self, rng, pooling):
        b, n, d, r = 3, 24, 8, 5
        emb = rng.normal(size=(b, n, d)).astype(np.float32)
        # Ensure some segments are empty.
        ids = rng.integers(0, r - 1, size=(b, n)).astype(np.int32)
        got = np.asarray(
            segment_pool(jnp.asarray(emb), jnp.asarray(ids), r, pooling)
        )
        for bi in range(b):
            expect = _dict_pool_reference(emb[bi], ids[bi], r, pooling)
            np.testing.assert_allclose(got[bi], expect, rtol=1e-5, atol=1e-5)

    def test_dominant_assignment(self):
        """Patch goes to the segment covering most pixels, ties to the
        smaller id (models/sppp.py:117-126 via sorted torch.unique)."""
        seg = np.zeros((4, 4), dtype=np.int32)
        seg[0:2, 0:2] = 1  # patch (0,0) fully segment 1
        seg[0, 2] = 2      # patch (0,1): 1 pixel of 2, 3 pixels of 0
        ids = dominant_superpixel_per_patch(jnp.asarray(seg), 2, 4)
        np.testing.assert_array_equal(np.asarray(ids), [1, 0, 0, 0])

    def test_tie_breaks_to_smaller_id(self):
        seg = np.array([[3, 3], [1, 1]], dtype=np.int32)
        ids = dominant_superpixel_per_patch(jnp.asarray(seg), 2, 5)
        assert int(ids[0]) == 1


class TestWindowedAttention:
    """The fast banded path (+ edge fix) must match the gather oracle,
    which is itself parity-tested against torch in test_parity_torch.py."""

    @pytest.mark.parametrize("s,w", [(40, 7), (33, 5), (100, 3), (64, 4)])
    def test_fast_path_matches_gather(self, rng, s, w):
        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention,
            _gather_windowed_attention,
        )

        b, h, d = 2, 3, 16
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        fast = windowed_latent_attention(q, k, v, w)
        oracle = _gather_windowed_attention(q, k, v, w)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(oracle), atol=1e-5, rtol=1e-5
        )
        if s > 2 * w:
            # weights_transform plumbing: the identity transform forces the
            # shift path and must reproduce the oracle exactly (this is the
            # hook long-S train-mode attention dropout rides).
            hooked = windowed_latent_attention(
                q, k, v, w, weights_transform=lambda x: x
            )
            np.testing.assert_allclose(
                np.asarray(hooked), np.asarray(oracle), atol=1e-5, rtol=1e-5
            )

    @pytest.mark.parametrize("s,w", [(40, 7), (33, 5), (100, 3), (64, 4),
                                     (600, 7)])
    def test_masked_band_matches_gather(self, s, w):
        """Masked windowed attention through the public dispatch (shift
        band + ops/window._banded_mask at banded S, incl. s=600 >
        DENSE_BAND_MAX_SEQ) vs the gather oracle's mask semantics
        (reference models/mhla.py:136-143): values AND grads, with edge
        rows' duplicated keys masked via the same clamped index."""
        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention,
            _gather_windowed_attention,
        )

        rng = np.random.default_rng(20260820)
        b, h, d = 2, 2, 16
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        mask = jnp.asarray(
            (rng.random(size=(b, s, s)) < 0.8).astype(np.float32)
        )
        got = windowed_latent_attention(q, k, v, w, mask)
        oracle = _gather_windowed_attention(q, k, v, w, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(oracle), atol=1e-5, rtol=1e-5
        )

        cot = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        g1 = jax.grad(lambda t: jnp.sum(
            windowed_latent_attention(*t, w, mask) * cot
        ))((q, k, v))
        g2 = jax.grad(lambda t: jnp.sum(
            _gather_windowed_attention(*t, w, mask) * cot
        ))((q, k, v))
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4
            )

    def test_masked_long_s_never_materializes_window_tensor(self):
        """VERDICT r3 'what's weak' #2: masked attention at
        S > DENSE_BAND_MAX_SEQ used to fall into the gather formulation
        materializing [B,h,S,W,d] K/V windows (~2.2 GB/tensor at
        S=3137 b32 f32) with a scatter backward. Pin that the traced
        program (fwd AND grad) contains no [.., S, W, d]-shaped value at
        S=3137, for eval and for the train-dropout path through the
        MHLA module."""
        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention,
        )
        from focused_attention_vit_tpu.models.layers import (
            MultiHeadLatentAttention,
        )

        rng = np.random.default_rng(7)
        b, h, s, d, w = 1, 2, 3137, 8, 7
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        mask = jnp.asarray(
            (rng.random(size=(b, s, s)) < 0.9).astype(np.float32)
        )
        big = f"{s},{w},{d}]"  # any aval printed ...,S,W,d]

        jaxpr = repr(jax.make_jaxpr(
            lambda q: windowed_latent_attention(q, q, q, w, mask).sum()
        )(q))
        assert big not in jaxpr
        grad_jaxpr = repr(jax.make_jaxpr(jax.grad(
            lambda q: windowed_latent_attention(q, q, q, w, mask).sum()
        ))(q))
        assert big not in grad_jaxpr

        # Output correct vs the oracle on a narrow slice is covered by
        # test_masked_band_matches_gather (s=600); here just finite.
        out = jax.jit(
            lambda q: windowed_latent_attention(q, q, q, w, mask)
        )(q)
        assert bool(jnp.isfinite(out).all())

        # Train path with dropout + mask through the module.
        dim = h * d
        m = MultiHeadLatentAttention(
            embed_dim=dim, num_heads=h, window_size=w, dropout=0.1
        )
        x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
        params = m.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, deterministic=False, attention_mask=mask,
        )
        mod_jaxpr = repr(jax.make_jaxpr(
            lambda p, x: m.apply(
                p, x, deterministic=False, attention_mask=mask,
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
        )(params, x))
        assert big not in mod_jaxpr

    @pytest.mark.parametrize("impl", ["auto", "shift"])
    def test_fuzz_random_geometries_match_gather(self, impl, monkeypatch):
        """Seeded sweep over random (S, W) pairs — including S < W, S == W,
        even W, and W == 1 — the fixed-geometry cases above can't cover,
        run once per dispatch implementation: auto (dense band-masked at
        these S, plus the S<=2W gather degenerates) and forced shift
        band. The roll kernel has lane-granularity geometry rules of its
        own and keeps its dedicated boundary-case sweep
        (test_roll_band_matches_shift_fwd_and_grad). Values AND gradients
        must match the gather oracle at every geometry.

        Uses a locally seeded rng (NOT the session fixture) so a failing
        geometry reproduces under `pytest -k`, independent of what other
        tests consumed from the shared stream."""
        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention,
            _gather_windowed_attention,
        )

        monkeypatch.setenv("FAVIT_MHLA_IMPL", impl)
        rng = np.random.default_rng(20260819)
        geoms = {(int(s), int(w)) for s, w in zip(
            rng.integers(2, 90, size=10), rng.integers(1, 12, size=10)
        )}
        geoms |= {(2, 7), (7, 7), (8, 1), (50, 2)}  # forced degenerates
        if impl != "auto":
            # S <= 2W dispatches to gather before the impl switch is read
            # (window.py windowed_latent_attention) — identical to the
            # auto run; keep the degenerates there only.
            geoms = {(s, w) for s, w in geoms if s > 2 * w}
        b, h, d = 1, 2, 8
        for i, (s, w) in enumerate(sorted(geoms)):
            q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
            k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
            fast = windowed_latent_attention(q, k, v, w)
            oracle = _gather_windowed_attention(q, k, v, w)
            np.testing.assert_allclose(
                np.asarray(fast), np.asarray(oracle), atol=1e-5, rtol=1e-5,
                err_msg=f"forward mismatch at impl={impl} s={s} w={w}",
            )
            if i % 3 == 0:  # grads on a third of the sweep (runtime)
                cot = jnp.asarray(
                    rng.normal(size=(b, h, s, d)).astype(np.float32)
                )
                g_fast = jax.grad(
                    lambda t: (windowed_latent_attention(*t, w) * cot).sum()
                )((q, k, v))
                g_orac = jax.grad(
                    lambda t: (_gather_windowed_attention(*t, w) * cot).sum()
                )((q, k, v))
                for a, b_ in zip(g_fast, g_orac):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4,
                        err_msg=f"grad mismatch at impl={impl} s={s} w={w}",
                    )

    def test_mhla_long_s_tpu_auto_takes_roll_kernel_for_training(
        self, rng, monkeypatch
    ):
        """Production dispatch (round-4 attack #8): on a TPU backend,
        FAVIT_MHLA_IMPL=auto at long S takes the roll kernel for
        TRAINING too (in-kernel dropout, custom-VJP backward) — measured
        61.9 vs 48.0 img/s at S=3137 b32. Pinned on CPU by faking the
        backend check while keeping the kernel in interpret mode; grads
        must match the shift-band path's (same init/inputs, rate 0 so
        the RNG streams don't differ)."""
        import focused_attention_vit_tpu.models.layers as L
        import focused_attention_vit_tpu.ops.mhla_band_roll as R
        from focused_attention_vit_tpu.models.layers import (
            MultiHeadLatentAttention,
        )
        from focused_attention_vit_tpu.ops import window as window_ops

        s = window_ops.DENSE_BAND_MAX_SEQ + 63
        b, dim, heads, w = 1, 32, 2, 7
        x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
        m = MultiHeadLatentAttention(
            embed_dim=dim, num_heads=heads, window_size=w, dropout=0.0
        )
        params = m.init(jax.random.PRNGKey(0), x, deterministic=False)

        def grad_of(p):
            return jax.grad(
                lambda p: m.apply(p, x, deterministic=False).sum()
            )(p)

        g_shift = grad_of(params)

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(R, "_interpret", lambda: True)
        jaxpr = repr(jax.make_jaxpr(
            lambda p: m.apply(p, x, deterministic=False).sum()
        )(params))
        assert "custom_vjp_call" in jaxpr or "pallas" in jaxpr, (
            "TPU-auto train dispatch did not take the roll kernel"
        )
        g_roll = grad_of(params)
        for (ks, a), (kr, b_) in zip(
            jax.tree_util.tree_leaves_with_path(g_shift),
            jax.tree_util.tree_leaves_with_path(g_roll),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3,
                err_msg=str(ks),
            )

    def test_mhla_long_s_train_dropout_takes_band_path(self, rng):
        """MHLA at long S (> DENSE_BAND_MAX_SEQ) with attn dropout in train
        mode rides the halo-shift band: the traced program contains no
        [S, W, d] window gather (the round-2 formulation materialized 7× K/V
        with a scatter backward), and the output stays finite."""
        from focused_attention_vit_tpu.models.layers import (
            MultiHeadLatentAttention,
        )
        from focused_attention_vit_tpu.ops import window as window_ops

        s = window_ops.DENSE_BAND_MAX_SEQ + 63
        b, dim, heads, w = 1, 32, 2, 7
        m = MultiHeadLatentAttention(
            embed_dim=dim, num_heads=heads, window_size=w, dropout=0.1
        )
        x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
        params = m.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, deterministic=False,
        )

        def fwd(p, x):
            return m.apply(
                p, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)},
            )

        jaxpr = repr(jax.make_jaxpr(fwd)(params, x))
        assert "gather" not in jaxpr, (
            "long-S train-mode MHLA dropout fell back to the window-gather "
            "formulation"
        )
        out = jax.jit(fwd)(params, x)
        assert out.shape == (b, s, dim)
        assert bool(jnp.isfinite(out).all())

    @pytest.mark.parametrize("s,w", [(40, 7), (33, 5), (100, 3), (64, 4),
                                     (197, 7)])
    def test_dense_band_matches_gather(self, rng, s, w):
        """The short-S dense band-masked formulation (log-multiplicity bias
        for the duplicated-edge-key softmax semantics) vs the gather oracle
        — edge rows included, no overwrite."""
        from focused_attention_vit_tpu.ops.window import (
            _dense_band_attention,
            _gather_windowed_attention,
        )

        b, h, d = 2, 3, 16
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        got = _dense_band_attention(q, k, v, w)
        oracle = _gather_windowed_attention(q, k, v, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(oracle), atol=1e-5, rtol=1e-5
        )

    @pytest.mark.parametrize("s,w", [(900, 7), (65, 7), (197, 5), (640, 7), (1281, 7)])
    def test_roll_band_matches_shift_fwd_and_grad(self, rng, s, w,
                                                  monkeypatch):
        """v5 lane-roll compact band (ops/mhla_band_roll.py, S-minor
        Pallas kernel, interpret mode on CPU) vs the production shift
        band: fwd and custom-VJP grads exact, incl. the duplicated-edge-
        key softmax multiplicity (both sides use the halo layout of
        ops/window._halo_pad); multi-tile (s=900 > one 640-lane tile) and
        exact-tile-boundary (s=640) cases included. Also pins the
        FAVIT_MHLA_IMPL=roll dispatch through the public op."""
        import focused_attention_vit_tpu.ops.window as W
        from focused_attention_vit_tpu.ops.mhla_band_roll import (
            roll_banded_attention_bhsd,
        )

        b, h, d = 2, 2, 32
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        oracle = W._shift_banded_attention(q, k, v, w)
        got = roll_banded_attention_bhsd(q, k, v, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(oracle), atol=1e-5, rtol=1e-5
        )

        g_or = jax.grad(
            lambda q, k, v: (W._shift_banded_attention(q, k, v, w) * g).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        g_ro = jax.grad(
            lambda q, k, v: (roll_banded_attention_bhsd(q, k, v, w) * g).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b_ in zip(g_ro, g_or):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4
            )

        monkeypatch.setenv("FAVIT_MHLA_IMPL", "roll")
        if s > 2 * w:
            full = W.windowed_latent_attention(q, k, v, w)
            np.testing.assert_allclose(
                np.asarray(full), np.asarray(oracle), atol=1e-5, rtol=1e-5
            )

    def test_roll_band_window_wider_than_halo_raises(self, rng):
        """W-1 > the 128-lane tile halo would wrap the circular roll onto
        wrong keys on multi-tile shapes — must be a loud error, not
        silent corruption."""
        from focused_attention_vit_tpu.ops.mhla_band_roll import (
            roll_banded_attention,
        )

        q = jnp.zeros((1, 1, 8, 700), jnp.float32)
        with pytest.raises(ValueError, match="window_size"):
            roll_banded_attention(q, q, q, 130)

    def test_roll_band_dropout_seed_fold_envelope_raises(self, rng):
        """The in-kernel PRNG folds (row, mask-block) into ONE seed
        scalar (b*2^16 + i — Mosaic's prng_seed takes at most two
        values); b*h >= 2^15 would wrap/alias dropout streams, so it
        must fail loudly (advisor round 4). Deterministic (rate=0) runs
        at the same geometry stay allowed."""
        from focused_attention_vit_tpu.ops.mhla_band_roll import (
            roll_banded_attention,
        )

        q = jnp.zeros((2 ** 15, 1, 8, 16), jnp.bfloat16)
        with pytest.raises(ValueError, match="seed fold"):
            roll_banded_attention(q, q, q, 3, (0.1, 7))
        # (rate=0 has no PRNG stream and stays allowed at any bh — but a
        # 2^15-row grid is minutes in interpret mode, so the allowed leg
        # is covered by the ordinary-geometry tests above.)

    @pytest.mark.parametrize("s", [300, 900])
    def test_roll_band_dropout_semantics(self, rng, s):
        """In-kernel band dropout: deterministic given seed, seed-
        dependent, ~rate of window slots dropped, grads finite, and the
        bwd kernel's recomputed mask matches fwd (finite-difference
        check on a kept coordinate's linearity in V). s=900 exercises
        the multi-tile per-tile reseed + dk/dv overlap-add under
        dropout; s=300 the single-tile fold."""
        from focused_attention_vit_tpu.ops.mhla_band_roll import (
            roll_banded_attention,
        )

        b, h, d, w, rate = 1, 2, 16, 7, 0.3
        q = jnp.asarray(rng.normal(size=(b, h, d, s)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, d, s)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, d, s)).astype(np.float32))
        o1 = roll_banded_attention(q, k, v, w, (rate, 7))
        o2 = roll_banded_attention(q, k, v, w, (rate, 7))
        o3 = roll_banded_attention(q, k, v, w, (rate, 8))
        det = roll_banded_attention(q, k, v, w, (0.0, None))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-6
        assert np.abs(np.asarray(o1) - np.asarray(det)).max() > 1e-6
        assert np.isfinite(np.asarray(o1)).all()

        # out is linear in V with dropped-weight coefficients; the VJP
        # wrt V must therefore equal the fwd difference quotient exactly
        # (same mask in fwd and bwd). Probe one lane in the first tile
        # and one past the first 640-lane tile boundary (s=900) so a
        # mask-recompute or overlap-add regression in the multi-tile
        # backward cannot pass.
        dv = jax.grad(
            lambda v: (roll_banded_attention(q, k, v, w, (rate, 7))).sum()
        )(v)
        eps = 0.5
        for lane in (10, s - 250):
            probe = jnp.zeros_like(v).at[0, 0, 3, lane].set(eps)
            fd = (
                roll_banded_attention(q, k, v + probe, w, (rate, 7)).sum()
                - roll_banded_attention(q, k, v, w, (rate, 7)).sum()
            ) / eps
            np.testing.assert_allclose(
                float(dv[0, 0, 3, lane]), float(fd), rtol=1e-3, atol=1e-3
            )

    @pytest.mark.parametrize("s,w", [(40, 7), (33, 5), (100, 3), (64, 4),
                                     (197, 7), (9, 7)])
    def test_ds_layout_matches_gather(self, rng, s, w):
        """The S-minor [B,h,d,S] band path (tools/s3137_sched_repro.py
        ``block_sminor`` A/B — measured layout-neutral end-to-end, kept as
        the documented A/B twin of the production band) — fwd and grads
        ≡ the gather oracle after layout conversion."""
        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention_ds,
            _gather_windowed_attention,
        )

        b, h, d = 2, 3, 16
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        oracle = _gather_windowed_attention(q, k, v, w)

        to_ds = lambda t: t.transpose(0, 1, 3, 2)
        got = to_ds(windowed_latent_attention_ds(
            to_ds(q), to_ds(k), to_ds(v), w
        ))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(oracle), atol=1e-5, rtol=1e-5
        )

        cot = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        g1 = jax.grad(lambda q, k, v: jnp.sum(to_ds(
            windowed_latent_attention_ds(to_ds(q), to_ds(k), to_ds(v), w)
        ) * cot), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda q, k, v: jnp.sum(
            _gather_windowed_attention(q, k, v, w) * cot
        ), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4
            )

    def test_ds_layout_dropout_hook_shape(self, rng):
        """The DS band's weights_transform hook sees the same [B,h,W,S]
        shape as the production band's (dropout-mask compatibility)."""
        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention_ds,
        )

        b, h, d, s, w = 1, 2, 8, 40, 7
        q = jnp.asarray(rng.normal(size=(b, h, d, s)).astype(np.float32))
        seen = []

        def probe(wts):
            seen.append(wts.shape)
            return wts

        windowed_latent_attention_ds(q, q, q, w, weights_transform=probe)
        assert seen == [(b, h, w, s)]

    @pytest.mark.parametrize("s,w", [(40, 7), (100, 3), (64, 4)])
    def test_shift_path_matches_gather(self, rng, s, w):
        """The long-S production path (shift-banded + exact edge-row
        overwrite) vs the oracle — exercised explicitly now that short S
        dispatches to the dense band formulation."""
        import focused_attention_vit_tpu.ops.window as W

        b, h, d = 2, 3, 16
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        oracle = W._gather_windowed_attention(q, k, v, w)
        try:
            # Force the shift path by dropping the dense-band threshold.
            orig = W.DENSE_BAND_MAX_SEQ
            W.DENSE_BAND_MAX_SEQ = 0
            fast = W.windowed_latent_attention(q, k, v, w)
        finally:
            W.DENSE_BAND_MAX_SEQ = orig
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(oracle), atol=1e-5, rtol=1e-5
        )

    def test_gradients_match_gather(self, rng):
        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention,
            _gather_windowed_attention,
        )

        b, h, s, d, w = 1, 2, 40, 8, 5
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

        def loss_fast(q, k, v):
            return jnp.sum(windowed_latent_attention(q, k, v, w) * cot)

        def loss_oracle(q, k, v):
            return jnp.sum(_gather_windowed_attention(q, k, v, w) * cot)

        g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
        g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
        for gf, go in zip(g_fast, g_oracle):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(go), atol=1e-5, rtol=1e-4
            )

    def test_opt_in_pallas_path_matches_gather(self, rng):
        """The FAVIT_USE_PALLAS_MHLA opt-in path (archival v4 tile-band
        kernel) in interpreter mode vs the gather oracle — interior rows
        exact; edge rows differ by design (clamp vs reference padding) and
        are overwritten by the public op."""
        from jax.experimental.pallas import tpu as pltpu

        from focused_attention_vit_tpu.ops.mhla_kernel_v4 import (
            banded_attention_v4,
        )
        from focused_attention_vit_tpu.ops.window import (
            _gather_windowed_attention,
        )

        b, h, s, d, w = 1, 2, 300, 16, 7
        hw = w // 2
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

        with pltpu.force_tpu_interpret_mode():
            banded = banded_attention_v4(q, k, v, w)
        oracle = _gather_windowed_attention(q, k, v, w)
        np.testing.assert_allclose(
            np.asarray(banded)[:, :, hw : s - hw],
            np.asarray(oracle)[:, :, hw : s - hw],
            atol=1e-5,
            rtol=1e-5,
        )

    def test_v4_tile_band_fwd_and_grads(self, rng):
        """v4 tile-band kernel (interpret mode): fwd + all three custom-VJP
        grads ≡ the shift-banded clamp formulation, including the
        edge-clamp gradient fold."""
        from jax.experimental.pallas import tpu as pltpu

        from focused_attention_vit_tpu.ops.mhla_kernel_v4 import (
            banded_attention_v4,
        )

        def _clamp_shift(q, k, v, w):
            # Clamp-semantics shift band (the v4 kernel's edge rule; the
            # production path overwrites its edge rows — window.py). The
            # production _shift_banded_attention is exact-halo, so the
            # clamp oracle lives here.
            hw = w // 2
            pad = ((0, 0), (0, 0), (hw, w - 1 - hw), (0, 0))
            kp = jnp.pad(k, pad, mode="edge")
            vp = jnp.pad(v, pad, mode="edge")
            s = q.shape[2]
            logits = jnp.stack(
                [
                    jnp.einsum(
                        "bhsd,bhsd->bhs",
                        q,
                        jax.lax.dynamic_slice_in_dim(kp, o, s, axis=2),
                    )
                    for o in range(w)
                ],
                axis=-1,
            ) * (q.shape[-1] ** -0.5)
            weights = jax.nn.softmax(logits, axis=-1)
            return sum(
                weights[..., o : o + 1]
                * jax.lax.dynamic_slice_in_dim(vp, o, s, axis=2)
                for o in range(w)
            )

        b, h, s, d, w = 2, 2, 197, 64, 7
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

        with pltpu.force_tpu_interpret_mode():
            out = banded_attention_v4(q, k, v, w, block=64)
            g_v4 = jax.grad(
                lambda q, k, v: (banded_attention_v4(q, k, v, w, block=64) * cot).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)
        ref = _clamp_shift(q, k, v, w)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4
        )
        g_ref = jax.grad(
            lambda q, k, v: (_clamp_shift(q, k, v, w) * cot).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b_ in zip(g_v4, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4
            )


class TestFusedMHA:
    def test_matches_dense_and_grads(self, rng):
        """Fused single-tile attention kernel (interpret mode, p=0): fwd and
        all custom-VJP grads ≡ the dense einsum path. (The in-kernel PRNG
        dropout branch requires real TPU hardware — validated there: mask
        determinism per key, mean preservation ≈1.0, per-head streams.)"""
        from jax.experimental.pallas import tpu as pltpu

        from focused_attention_vit_tpu.ops.mha_kernel import (
            fused_multi_head_attention,
        )
        from focused_attention_vit_tpu.ops.attention import (
            scaled_dot_product_attention,
        )

        b, h, s, d = 2, 3, 197, 64
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

        with pltpu.force_tpu_interpret_mode():
            out = fused_multi_head_attention(q, k, v)
            g1 = jax.grad(
                lambda q, k, v: (fused_multi_head_attention(q, k, v) * cot).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)
        ref = scaled_dot_product_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4
        )
        g2 = jax.grad(
            lambda q, k, v: (scaled_dot_product_attention(q, k, v) * cot).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4
            )


class TestAugmentation:
    def test_onehot_crop_matches_dynamic_slice(self, rng):
        """The MXU one-hot crop ≡ per-image pad-crop via dynamic_slice
        (reference transform RandomCrop(32, padding=4),
        utils/data_utils.py:33-37)."""
        from focused_attention_vit_tpu.data.pipeline import augment_train_batch

        b, h, w, c, p = 8, 32, 32, 3, 4
        imgs = rng.integers(0, 255, size=(b, h, w, c)).astype(np.uint8)
        key = jax.random.PRNGKey(7)
        out = np.asarray(
            augment_train_batch(jnp.asarray(imgs), key, img_size=h)
        )

        # Oracle: same keys/offsets, dynamic_slice crop.
        from focused_attention_vit_tpu.data.pipeline import (
            CIFAR10_MEAN, CIFAR10_STD, _normalize,
        )

        k_crop, k_flip = jax.random.split(key)
        x = jnp.asarray(imgs).astype(jnp.float32) / 255.0
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        offs = jax.random.randint(k_crop, (b, 2), 0, 2 * p + 1)
        crop = jax.vmap(
            lambda img, off: jax.lax.dynamic_slice(
                img, (off[0], off[1], 0), (h, w, c)
            )
        )(xp, offs)
        flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        crop = jnp.where(flip[:, None, None, None], crop[:, :, ::-1, :], crop)
        expect = np.asarray(_normalize(crop, CIFAR10_MEAN, CIFAR10_STD))
        np.testing.assert_allclose(out, expect, atol=1e-5, rtol=1e-5)


class TestChunkedAttention:
    def test_matches_dense(self, rng):
        from focused_attention_vit_tpu.ops.flash_attention import (
            _chunked_attention,
        )
        from focused_attention_vit_tpu.ops.attention import (
            scaled_dot_product_attention,
        )

        b, h, s, d = 2, 2, 300, 16
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        got = _chunked_attention(q, k, v, chunk=128)
        ref = scaled_dot_product_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_gradient_matches_dense(self, rng):
        from focused_attention_vit_tpu.ops.flash_attention import (
            _chunked_attention,
        )
        from focused_attention_vit_tpu.ops.attention import (
            scaled_dot_product_attention,
        )

        b, h, s, d = 1, 1, 130, 8
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

        g1 = jax.grad(lambda q: jnp.sum(_chunked_attention(q, k, v, chunk=64) ** 2))(q)
        g2 = jax.grad(lambda q: jnp.sum(scaled_dot_product_attention(q, k, v) ** 2))(q)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), atol=2e-5, rtol=1e-3
        )


class TestDropoutAttentionChunked:
    """Long-S attention-weight dropout without the [B,h,S,S] tensor
    (VERDICT round-2 task 4; reference flag surface
    /root/reference/main.py:108-109 → models/vit.py:96-97)."""

    def test_rate_zero_is_dense(self, rng):
        from focused_attention_vit_tpu.ops.flash_attention import (
            dropout_attention_q_chunked,
        )
        from focused_attention_vit_tpu.ops.attention import (
            scaled_dot_product_attention,
        )

        b, h, s, d = 1, 2, 300, 16
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        got = dropout_attention_q_chunked(
            q, k, v, 0.0, jax.random.PRNGKey(0), chunk=128
        )
        ref = scaled_dot_product_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_matches_materialized_same_masks(self, rng):
        """Exactly equals a materialized softmax-dropout-PV computation that
        draws the same per-chunk fold_in masks — pins the semantics."""
        from focused_attention_vit_tpu.ops.flash_attention import (
            dropout_attention_q_chunked,
        )

        b, h, s, d, chunk, rate = 1, 2, 200, 8, 64, 0.3
        key = jax.random.PRNGKey(7)
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))

        got = dropout_attention_q_chunked(q, k, v, rate, key, chunk=chunk)

        logits = np.einsum(
            "bhsd,bhtd->bhst", np.asarray(q), np.asarray(k)
        ) * (d**-0.5)
        w = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        n = -(-s // chunk)
        keep = 1.0 - rate
        out = np.zeros((b, h, s, d), np.float32)
        for i in range(n):
            lo, hi = i * chunk, min((i + 1) * chunk, s)
            m = np.asarray(jax.random.bernoulli(
                jax.random.fold_in(key, i), keep, (b, h, chunk, s)
            ))[:, :, : hi - lo]
            wi = np.where(m, w[:, :, lo:hi] / keep, 0.0)
            out[:, :, lo:hi] = np.einsum(
                "bhct,bhtd->bhcd", wi, np.asarray(v)
            )
        np.testing.assert_allclose(np.asarray(got), out, atol=2e-5, rtol=1e-4)

    def test_s3137_dropout_no_s2_tensor_and_runs(self, rng):
        """At the reference-default S=3137 with attn_dropout=0.1 the module
        takes the chunked path: the traced program holds no S×S
        intermediate, and the step executes on CPU."""
        from focused_attention_vit_tpu.models.layers import MultiHeadAttention

        b, s, dim, heads = 1, 3137, 32, 2
        m = MultiHeadAttention(embed_dim=dim, num_heads=heads, dropout=0.1)
        x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
        params = m.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, deterministic=False,
        )

        def fwd(p, x):
            return m.apply(
                p, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)},
            )

        jaxpr = jax.make_jaxpr(fwd)(params, x)
        assert "3137,3137" not in repr(jaxpr), (
            "S×S attention tensor materialized at S=3137 with dropout on"
        )
        out = jax.jit(fwd)(params, x)
        assert out.shape == (b, s, dim)
        assert bool(jnp.isfinite(out).all())

    def test_gradients_flow(self, rng):
        from focused_attention_vit_tpu.ops.flash_attention import (
            dropout_attention_q_chunked,
        )

        b, h, s, d = 1, 1, 130, 8
        q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
        key = jax.random.PRNGKey(3)

        g = jax.grad(lambda q: jnp.sum(
            dropout_attention_q_chunked(q, k, v, 0.5, key, chunk=64) ** 2
        ))(q)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0.0


class TestCentroids:
    def test_matches_reference_loop(self, rng):
        """Masked-mean centroids with (0.5, 0.5) for empty segments
        (models/sppp.py:413-449)."""
        b, h, w, r = 2, 8, 6, 4
        seg = rng.integers(0, r - 1, size=(b, h, w)).astype(np.int32)
        got = np.asarray(superpixel_centroids(jnp.asarray(seg), r))
        for bi in range(b):
            ygrid, xgrid = np.meshgrid(
                np.arange(h) / h, np.arange(w) / w, indexing="ij"
            )
            for s in range(r):
                mask = seg[bi] == s
                if mask.sum() > 0:
                    ex = (xgrid * mask).sum() / mask.sum()
                    ey = (ygrid * mask).sum() / mask.sum()
                else:
                    ex = ey = 0.5
                np.testing.assert_allclose(got[bi, s], [ex, ey], atol=1e-6)


class TestPositionalEncodings:
    def test_sinusoidal_matches_reference_formula(self):
        """models/sppp.py:258-266."""
        s, d = 12, 16
        pe = np.asarray(sinusoidal_positional_encoding(s, d))
        position = np.arange(s)[:, None]
        div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
        np.testing.assert_allclose(
            pe[:, 0::2], np.sin(position * div), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            pe[:, 1::2], np.cos(position * div), atol=2e-5, rtol=1e-4
        )

    def test_centroid_encoding_matches_reference_formula(self, rng):
        """sin(x·freq) ‖ cos(y·freq) concat with cls centroid prepend
        (models/sppp.py:271-296)."""
        b, r, d = 2, 5, 8
        cents = rng.uniform(size=(b, r, 2)).astype(np.float32)
        pe = np.asarray(centroid_positional_encoding(jnp.asarray(cents), d, r + 1))
        assert pe.shape == (b, r + 1, d)
        half = d // 2
        freq = np.exp(np.arange(half) * (-np.log(10000.0) / half))
        # cls token at (0.5, 0.5)
        np.testing.assert_allclose(
            pe[:, 0, :half],
            np.broadcast_to(np.sin(0.5 * freq), (b, half)),
            atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            pe[:, 0, half:],
            np.broadcast_to(np.cos(0.5 * freq), (b, half)),
            atol=1e-5, rtol=1e-4,
        )
        np.testing.assert_allclose(
            pe[0, 1:, :half], np.sin(cents[0, :, 0:1] * freq), atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            pe[0, 1:, half:], np.cos(cents[0, :, 1:2] * freq), atol=1e-5, rtol=1e-4
        )


class TestSLIC:
    def test_labels_shape_and_range(self, rng):
        img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        seg = np.asarray(slic_segment(jnp.asarray(img), num_segments=9))
        assert seg.shape == (2, 32, 32)
        assert seg.min() >= 0 and seg.max() < 9

    def test_spatial_locality(self, rng):
        """On a uniform image, SLIC must return (approximately) the seed
        grid — every segment spatially compact and all segments used."""
        img = np.full((1, 32, 32, 3), 0.5, dtype=np.float32)
        seg = np.asarray(
            slic_segment(jnp.asarray(img), num_segments=16, compactness=10.0)
        )[0]
        assert len(np.unique(seg)) == 16
        # Each 8x8 grid cell interior should be a single label (the exact
        # cell boundary is an equidistant tie on a uniform image).
        for gi in range(4):
            for gj in range(4):
                cell = seg[
                    gi * 8 + 2 : (gi + 1) * 8 - 2, gj * 8 + 2 : (gj + 1) * 8 - 2
                ]
                assert len(np.unique(cell)) == 1

    def test_color_boundary_respected(self):
        """Two clearly separated colors with low compactness → boundary
        follows color, not only the grid."""
        img = np.zeros((1, 32, 32, 3), dtype=np.float32)
        img[:, :, 16:, :] = 1.0
        seg = np.asarray(
            slic_segment(jnp.asarray(img), num_segments=4, compactness=0.1)
        )[0]
        left = set(np.unique(seg[:, :14]).tolist())
        right = set(np.unique(seg[:, 18:]).tolist())
        assert left.isdisjoint(right)

    def test_connectivity_merges_fragments(self):
        """A tiny isolated fragment of a far-away label must be absorbed by
        a surrounding segment when enforce_connectivity=True (skimage
        min_size merging; reference inherits it via skimage defaults)."""
        img = np.full((32, 32, 3), 0.5, dtype=np.float32)
        img[:16] = 0.0
        img[16:] = 1.0
        img[2:4, 2:4] = 1.0  # 2×2 bright speck inside the dark half
        seg = np.asarray(
            slic_segment(
                jnp.asarray(img), num_segments=4, compactness=0.01, sigma=0.0
            )
        )
        speck = np.unique(seg[2:4, 2:4])
        assert len(speck) == 1
        # merged into a label used by its (dark) surroundings
        assert speck[0] in np.unique(seg[:8, :8][~np.isin(
            np.arange(64).reshape(8, 8), [18, 19, 26, 27])])

    def test_connected_components_exact(self, rng):
        """Device CC labeling ≡ scipy.ndimage.label partitions."""
        from scipy import ndimage as ndi
        from focused_attention_vit_tpu.ops.slic import _connected_components

        seg = rng.integers(0, 3, size=(24, 24)).astype(np.int32)
        comp = np.asarray(_connected_components(jnp.asarray(seg)))
        # partition equality against per-label scipy components
        expect = np.zeros_like(seg)
        nxt = 1
        for lab in np.unique(seg):
            cc, n = ndi.label(seg == lab)
            for k in range(1, n + 1):
                expect[cc == k] = nxt
                nxt += 1
        # same-partition check: bijection between ids
        pairs = set(zip(comp.ravel().tolist(), expect.ravel().tolist()))
        assert len(pairs) == len(set(p[0] for p in pairs))
        assert len(pairs) == len(set(p[1] for p in pairs))

    def test_golden_skimage_agreement(self):
        """Fidelity vs the slow skimage-faithful numpy oracle
        (tools/slic_numpy.py) on committed CIFAR-shaped fixtures
        (tests/fixtures/slic_golden.npz, tools/make_slic_golden.py).

        Two pinned levels:
        1. the k-means core (pre-connectivity) is *bit-exact* vs the
           oracle's neighbourhood-limited search;
        2. end-to-end (with on-device connectivity enforcement) the
           dominant-superpixel-per-patch assignment — the only SLIC product
           SPPP consumes (reference models/sppp.py:117-126) — agrees with
           full-skimage golden labels at ≥72% mean / ≥60% min under optimal
           (Hungarian) label matching. Measured r2: 78.3% mean, 65.6% min;
           residual is skimage's BFS-order-dependent merge-target choice,
           which has no deterministic parallel analogue (the oracle's own
           agreement with itself under a one-iteration perturbation is 93%
           mean / 84% min).
        """
        from scipy.optimize import linear_sum_assignment
        from tools.slic_numpy import slic_numpy

        fix = np.load(
            os.path.join(os.path.dirname(__file__), "fixtures", "slic_golden.npz")
        )
        images, golden = fix["images"], fix["golden_labels"]
        R = int(fix["n_segments"])
        m, sig = float(fix["compactness"]), float(fix["sigma"])

        # 1. bit-exact core
        ours_nc = np.asarray(
            slic_segment(
                jnp.asarray(images), num_segments=R, compactness=m,
                sigma=sig, enforce_connectivity=False,
            )
        )
        for i in range(len(images)):
            oracle_nc = slic_numpy(
                images[i], n_segments=R, compactness=m, sigma=sig,
                enforce_connectivity=False,
            )
            assert (oracle_nc == ours_nc[i]).all(), f"core mismatch, img {i}"

        # 2. end-to-end patch-dominant agreement
        ours = np.asarray(
            slic_segment(
                jnp.asarray(images), num_segments=R, compactness=m, sigma=sig
            )
        )
        scores = []
        for i in range(len(images)):
            g = _dominant_np(golden[i], 4)
            o = np.asarray(dominant_superpixel_per_patch(ours[i], 4, R))
            cont = np.zeros((g.max() + 1, R))
            np.add.at(cont, (g, o), 1)
            ri, ci = linear_sum_assignment(-cont)
            scores.append(cont[ri, ci].sum() / g.size)
        assert np.mean(scores) >= 0.72, scores
        assert np.min(scores) >= 0.60, scores


class TestCallbackSupportDetection:
    """The auto-connectivity host path rides jax.pure_callback, which the
    axon PJRT tunnel rejects (UNIMPLEMENTED: send/recv) while registering
    its devices as plain 'tpu' — so detection must use the platform
    registration string, not jax.default_backend() (which returned 'tpu'
    and made the old `backend != "axon"` gate crash bench.py's SPPP run
    on the real chip)."""

    def test_axon_tpu_detected_unsupported(self):
        from focused_attention_vit_tpu.ops.slic import _callbacks_supported

        assert not _callbacks_supported(backend="tpu", platforms="axon,cpu")
        assert not _callbacks_supported(backend="tpu", platforms="axon")

    def test_real_tpu_and_cpu_supported(self):
        from focused_attention_vit_tpu.ops.slic import _callbacks_supported

        assert _callbacks_supported(backend="tpu", platforms="")
        # Forced-CPU under an axon registration (the test suite itself)
        # still supports callbacks — the CPU runtime executes them.
        assert _callbacks_supported(backend="cpu", platforms="axon,cpu")


class TestNativeConnectivity:
    """Host C++ connectivity enforcement (native/connectivity.cpp via
    ops/native_connectivity.py) — the TPU-native analogue of skimage's
    Cython ``_enforce_label_connectivity_cython`` the reference inherits
    through ``skimage.segmentation.slic`` (reference models/sppp.py:64-65).
    Oracle: tools/slic_numpy._enforce_connectivity (same BFS semantics)."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from focused_attention_vit_tpu.ops import native_connectivity

        if not native_connectivity.native_available():
            pytest.skip("no C++ toolchain for native connectivity")

    def test_bfs_semantics_exact_vs_oracle(self, rng=None):
        from focused_attention_vit_tpu.ops.native_connectivity import (
            enforce_connectivity_host,
        )
        from tools.slic_numpy import _enforce_connectivity as oracle

        rng = np.random.default_rng(7)
        for _ in range(12):
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            labels = rng.integers(0, 5, size=(h, w)).astype(np.int32)
            min_size = int(rng.integers(1, 12))
            ours = enforce_connectivity_host(labels, min_size, 10**6)
            want = oracle(labels.astype(np.int64), min_size).astype(np.int32)
            assert (ours == want).all()

    def test_reduce_caps_label_count(self):
        from focused_attention_vit_tpu.ops.native_connectivity import (
            enforce_connectivity_host,
        )

        rng = np.random.default_rng(3)
        labels = rng.integers(0, 30, size=(64, 64)).astype(np.int32)
        out = enforce_connectivity_host(labels, 2, 16)
        assert out.min() >= 0 and out.max() < 16

    def test_batch_threading_matches_single(self):
        from focused_attention_vit_tpu.ops.native_connectivity import (
            enforce_connectivity_host,
        )

        rng = np.random.default_rng(11)
        batch = rng.integers(0, 6, size=(6, 32, 32)).astype(np.int32)
        b_out = enforce_connectivity_host(batch, 4, 10**6, n_threads=3)
        for i in range(6):
            one = enforce_connectivity_host(batch[i], 4, 10**6)
            assert (b_out[i] == one).all()

    def test_slic_host_mode_under_jit(self):
        """enforce_connectivity='host' routes through jax.pure_callback and
        produces a capped, connectivity-enforced partition under jit."""
        rng = np.random.default_rng(5)
        img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
        f = jax.jit(
            lambda x: slic_segment(
                x, num_segments=16, compactness=0.1,
                enforce_connectivity="host",
            )
        )
        seg = np.asarray(f(jnp.asarray(img)))
        assert seg.shape == (2, 32, 32)
        assert seg.min() >= 0 and seg.max() < 16
        # eager == jit
        seg2 = np.asarray(
            slic_segment(
                jnp.asarray(img), num_segments=16, compactness=0.1,
                enforce_connectivity="host",
            )
        )
        assert (seg == seg2).all()

    def test_slic_host_mode_eager_bypasses_pure_callback(self, monkeypatch):
        """Eager (non-traced) host-connectivity calls must invoke the C++
        kernel directly, NOT via jax.pure_callback: routing an eager call
        through the callback machinery deadlocks a single-threaded CPU
        runtime (the callback's one-op program occupies the only executor
        thread while its input is still being produced by the async
        k-means program — reproduced via SPPPViT.init on a 1-core host).
        Pin the routing by making pure_callback explode."""
        rng = np.random.default_rng(6)
        img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

        def boom(*a, **k):
            raise AssertionError("eager host path used pure_callback")

        monkeypatch.setattr(jax, "pure_callback", boom)
        seg = np.asarray(
            slic_segment(
                img, num_segments=16, compactness=0.1,
                enforce_connectivity="host",
            )
        )
        assert seg.shape == (2, 32, 32)
        assert seg.min() >= 0 and seg.max() < 16

    @pytest.mark.slow
    def test_224_connectivity_agreement_vs_skimage_golden(self):
        """The 224²/R=16 connectivity question (VERDICT r3 next-round #1):
        what does each production connectivity mode cost against the
        skimage-faithful golden (connectivity ON — the reference's
        inherited default, /root/reference/models/sppp.py:64-65) at the
        granularity SPPP consumes — patch-dominant superpixel ids at
        patch 16, optimal label matching?

        Committed golden: tests/fixtures/slic_golden_224.npz
        (tools/make_slic_golden_224.py, 6 structured ImageNet-standardized
        images labelled by tools/slic_numpy.py WITH connectivity).

        Measured 2026-08-20 (pinned with slack below, recorded in
        BASELINE.md "224² connectivity"):
          host C++ : mean 0.998 (pixel-EXACT on 5/6 images — the
                     bit-exact-core domain extends to 224², and
                     native/connectivity.cpp is exact skimage semantics)
          device ON: mean 0.831 (approximate rank/merge rule)
          OFF      : mean 0.662 — the axon-tunnel fallback is POOR at
                     the reference's own geometry; see ops/slic.py
                     docstring for the production story.
        """
        from scipy.optimize import linear_sum_assignment

        fix = np.load(
            os.path.join(os.path.dirname(__file__), "fixtures",
                         "slic_golden_224.npz")
        )
        imgs, golden = fix["images"], fix["golden_labels"]
        R, P = int(fix["n_segments"]), 16

        def dom(labels, r):
            return np.asarray(
                dominant_superpixel_per_patch(jnp.asarray(labels), P, r)
            )

        def agree(a, b):
            n = int(max(a.max(), b.max())) + 1
            cont = np.zeros((n, n))
            np.add.at(cont, (a, b), 1)
            ri, ci = linear_sum_assignment(-cont)
            return cont[ri, ci].sum() / a.size

        def agreements(mode, idxs):
            out = []
            for i in idxs:
                lab = np.asarray(slic_segment(
                    jnp.asarray(imgs[i]), num_segments=R, compactness=0.1,
                    enforce_connectivity=mode,
                ))
                gd = dom(golden[i], int(golden[i].max()) + 1)
                ld = dom(lab, max(R, int(lab.max()) + 1))
                out.append(agree(gd, ld))
            return float(np.mean(out))

        host = agreements("host", range(len(imgs)))
        assert host >= 0.97, f"host-C++ 224² agreement regressed: {host}"
        # Pixel-level: the host path reproduces the skimage golden
        # essentially exactly (f32 core vs the oracle's f64 flips at most
        # a few boundary pixels on one image).
        lab0 = np.asarray(slic_segment(
            jnp.asarray(imgs[0]), num_segments=R, compactness=0.1,
            enforce_connectivity="host",
        ))
        assert (lab0 == golden[0]).mean() >= 0.98

        off = agreements(False, range(len(imgs)))
        assert 0.5 <= off, f"conn-OFF 224² agreement changed: {off}"

        # Device enforcement on a 2-image subset (it is the slow mode).
        dev = agreements(True, range(2))
        assert dev >= 0.7, f"device-ON 224² agreement regressed: {dev}"

    def test_host_partition_agrees_with_device_on_patch_dominant(self):
        """Host vs on-device enforcement: same consumption-granularity
        result (patch-dominant superpixel under optimal label matching),
        even though raw label ids differ (different compaction orders)."""
        from scipy.optimize import linear_sum_assignment

        # Structured input (smooth gradients + mild texture) — on pure
        # noise the exact skimage cascade correctly collapses everything
        # into one label, which is not a useful comparison surface.
        rng = np.random.default_rng(9)
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 31.0
        base = np.stack([yy, xx, (yy + xx) / 2], -1)
        img = (
            base[None] + 0.05 * rng.normal(size=(2, 32, 32, 3))
        ).astype(np.float32)
        R = 16
        host = np.asarray(
            slic_segment(
                jnp.asarray(img), num_segments=R, compactness=0.1,
                enforce_connectivity="host",
            )
        )
        dev = np.asarray(
            slic_segment(
                jnp.asarray(img), num_segments=R, compactness=0.1,
                enforce_connectivity=True,
            )
        )
        for i in range(2):
            hd = np.asarray(dominant_superpixel_per_patch(host[i], 4, R))
            dd = np.asarray(dominant_superpixel_per_patch(dev[i], 4, R))
            cont = np.zeros((R, R))
            np.add.at(cont, (hd, dd), 1)
            ri, ci = linear_sum_assignment(-cont)
            assert cont[ri, ci].sum() / hd.size >= 0.85


class TestBandWeightsRematTag:
    """Every band formulation's softmax weights carry the
    'mhla_band_weights' checkpoint_name tag, so
    remat_policy='band_weights' bites regardless of which path the
    dispatch picks (review finding: the tag originally existed only on
    the shift band, making the policy a silent no-op at S<=512 where the
    dense band runs)."""

    @pytest.mark.parametrize("impl,shape_str", [
        ("densefull", "f32[1,2,40,40]"),   # dense band-masked [B,h,S,S]
        ("shift", "f32[1,2,7,40]"),        # shift band [B,h,W,S]
    ])
    def test_policy_saves_band_weights(self, rng, monkeypatch, impl,
                                       shape_str):
        import contextlib
        import io

        from focused_attention_vit_tpu.ops.window import (
            windowed_latent_attention,
        )

        monkeypatch.setenv("FAVIT_MHLA_IMPL", impl)
        q = jnp.asarray(
            rng.normal(size=(1, 2, 40, 8)).astype(np.float32)
        )

        def dump(policy):
            f = jax.checkpoint(
                lambda q: windowed_latent_attention(q, q, q, 7).sum(),
                policy=policy,
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                jax.ad_checkpoint.print_saved_residuals(f, q)
            return buf.getvalue()

        saved = dump(jax.checkpoint_policies.save_only_these_names(
            "mhla_band_weights"
        ))
        line = [l for l in saved.splitlines()
                if "ops/window.py" in l and shape_str in l]
        assert line, f"band weights not saved under the policy:\n{saved}"

        # Negative control: a policy naming nothing saves no window.py
        # residual — the tag, not the policy machinery, is what's pinned.
        control = dump(jax.checkpoint_policies.save_only_these_names(
            "no_such_tag"
        ))
        assert not any("ops/window.py" in l for l in control.splitlines()), (
            control
        )


class TestSLICFuzz:
    """SLIC core fuzzed across seeded random geometries (non-square
    images, varying segment counts, compactness/sigma extremes).

    Two regimes, decided by the same rule the implementation uses
    (`ops/slic._grid_seeds`): when skimage's isotropic regular grid
    yields exactly R seeds, the k-means core must be BIT-EXACT vs the
    skimage-faithful numpy oracle (this covers all production
    geometries and most square cases); otherwise the oracle itself
    would return a different number of segments than requested, so the
    fixed-R fallback grid is checked structurally (labels dense in
    [0, R), fully assigned). Locally seeded rng: a failing geometry
    reproduces under ``pytest -k``."""

    @staticmethod
    def _skimage_grid_matches(h, w, n_seg):
        step = max(1, int(round(np.sqrt(h * w / n_seg))))
        ny = len(range(step // 2, h, step))
        nx = len(range(step // 2, w, step))
        return ny * nx == n_seg

    @pytest.mark.parametrize("case", range(10))
    def test_core_vs_oracle_random_geometry(self, case):
        from tools.slic_numpy import slic_numpy

        rng = np.random.default_rng(987_000 + case)
        h = int(rng.integers(12, 49))
        w = int(rng.integers(12, 49))
        n_seg = int(rng.choice([4, 9, 16, 25, 36]))
        compactness = float(rng.choice([0.05, 0.1, 1.0, 10.0]))
        sigma = float(rng.choice([0.0, 1.0]))
        img = rng.random((h, w, 3), dtype=np.float64).astype(np.float32)
        geom = f"h={h} w={w} R={n_seg} m={compactness} sigma={sigma}"

        ours = np.asarray(
            slic_segment(
                jnp.asarray(img[None]), num_segments=n_seg,
                compactness=compactness, sigma=sigma,
                enforce_connectivity=False,
            )
        )[0]
        assert ours.shape == (h, w), geom
        assert ours.min() >= 0 and ours.max() < n_seg, geom

        if self._skimage_grid_matches(h, w, n_seg):
            oracle = slic_numpy(
                img, n_segments=n_seg, compactness=compactness,
                sigma=sigma, enforce_connectivity=False,
            )
            assert (ours == oracle).all(), (
                f"core mismatch at {geom} (skimage-grid regime): "
                f"{(ours != oracle).mean():.3%} pixels differ"
            )

    def test_production_geometries_use_skimage_grid(self):
        """The bit-exact regime must cover the geometries SPPP actually
        runs at (reference models/sppp.py defaults: R=16 at 32² and
        224²)."""
        assert self._skimage_grid_matches(32, 32, 16)
        assert self._skimage_grid_matches(224, 224, 16)
