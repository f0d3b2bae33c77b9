"""Dynamic-batching serving front-end (serve.BatchingServer).

The reference has no serving path (eval loops only,
/root/reference/experiments/traditional.py:268-301); this is the
TPU-native addition: fixed-shape compiled program + request coalescing.
"""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from focused_attention_vit_tpu.infer import Predictor
from focused_attention_vit_tpu.models import VisionTransformer
from focused_attention_vit_tpu.serve import BatchingServer


@pytest.fixture(scope="module")
def predictor():
    import jax

    model = VisionTransformer(
        img_size=32, patch_size=8, num_classes=10, embed_dim=32, depth=1,
        num_heads=2, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    p = Predictor(
        model, params, img_size=32, batch_size=8, compute_dtype=jnp.float32
    )
    p.warmup()
    return p


def _images(rng, n):
    return rng.integers(0, 255, size=(n, 32, 32, 3)).astype(np.uint8)


class TestBatchingServer:
    def test_results_match_direct_predictor(self, predictor):
        rng = np.random.default_rng(1)
        reqs = [_images(rng, n) for n in (1, 3, 2, 4, 6, 8)]
        with BatchingServer(predictor, max_delay_ms=100.0) as srv:
            futs = [srv.submit(r) for r in reqs]
            outs = [f.result(timeout=30) for f in futs]
        for req, out in zip(reqs, outs):
            direct = predictor.predict_proba(req)
            assert out.shape == (len(req), 10)
            np.testing.assert_allclose(out, direct, rtol=0, atol=1e-6)

    def test_coalesces_into_full_batches(self, predictor):
        rng = np.random.default_rng(2)
        srv = BatchingServer(predictor, max_delay_ms=250.0)
        try:
            # 4 × 2 images submitted back-to-back = exactly one full
            # device batch (capacity 8): the worker must coalesce them.
            futs = [srv.submit(_images(rng, 2)) for _ in range(4)]
            for f in futs:
                f.result(timeout=30)
            assert srv.stats.batches == 1
            assert srv.stats.batched_images == 8
            assert srv.stats.mean_batch_fill == pytest.approx(1.0)
            assert srv.stats.requests == 4
        finally:
            srv.close()

    def test_oversize_request_ships_alone(self, predictor):
        rng = np.random.default_rng(3)
        req = _images(rng, 20)  # > batch_size=8 → Predictor-internal chunking
        with BatchingServer(predictor, max_delay_ms=10.0) as srv:
            out = srv.predict_proba(req)
            assert srv.stats.oversize_requests == 1
        np.testing.assert_allclose(
            out, predictor.predict_proba(req), rtol=0, atol=1e-6
        )
        assert out.shape == (20, 10)

    def test_concurrent_submitters(self, predictor):
        rng = np.random.default_rng(4)
        reqs = [_images(rng, 1 + (i % 5)) for i in range(12)]
        outs = [None] * len(reqs)
        with BatchingServer(predictor, max_delay_ms=20.0) as srv:

            def client(i):
                outs[i] = srv.submit(reqs[i]).result(timeout=30)

            threads = [
                threading.Thread(target=client, args=(i,))
                for i in range(len(reqs))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        for req, out in zip(reqs, outs):
            np.testing.assert_allclose(
                out, predictor.predict_proba(req), rtol=0, atol=1e-6
            )

    def test_mixed_shapes_do_not_poison_each_other(self, predictor):
        """Concurrent requests with different (h, w) must each succeed:
        the coalescer only concatenates same-shape requests (a mixed
        np.concatenate would fail BOTH futures)."""
        rng = np.random.default_rng(7)
        a = _images(rng, 2)  # 32x32
        b = rng.integers(0, 255, size=(2, 48, 48, 3)).astype(np.uint8)
        with BatchingServer(predictor, max_delay_ms=100.0) as srv:
            fa, fb = srv.submit(a), srv.submit(b)
            out_a = fa.result(timeout=60)
            out_b = fb.result(timeout=60)
        np.testing.assert_allclose(
            out_a, predictor.predict_proba(a), atol=1e-6
        )
        np.testing.assert_allclose(
            out_b, predictor.predict_proba(b), atol=1e-6
        )

    def test_empty_request_rejected(self, predictor):
        with BatchingServer(predictor, max_delay_ms=5.0) as srv:
            with pytest.raises(ValueError, match="non-empty"):
                srv.submit(np.zeros((0, 32, 32, 3), np.uint8))

    def test_cancelled_future_does_not_kill_worker(self, predictor):
        """A caller-cancelled future must not raise InvalidStateError in
        the worker (which would leave every later request hanging)."""
        rng = np.random.default_rng(8)
        with BatchingServer(predictor, max_delay_ms=200.0) as srv:
            f1 = srv.submit(_images(rng, 2))
            f1.cancel()  # still queued (worker waits for the delay)
            f2 = srv.submit(_images(rng, 2))
            out = f2.result(timeout=60)  # worker must still be alive
            assert out.shape == (2, 10)
            f3 = srv.submit(_images(rng, 1))
            assert f3.result(timeout=60).shape == (1, 10)

    def test_submit_after_close_raises(self, predictor):
        srv = BatchingServer(predictor, max_delay_ms=1.0)
        srv.close()
        with pytest.raises(RuntimeError, match="closed"):
            srv.submit(np.zeros((1, 32, 32, 3), np.uint8))

    def test_close_drains_pending(self, predictor):
        rng = np.random.default_rng(5)
        srv = BatchingServer(predictor, max_delay_ms=5000.0)
        fut = srv.submit(_images(rng, 3))  # would wait 5 s for more
        srv.close()  # must cut the delay short and still serve it
        assert fut.result(timeout=30).shape == (3, 10)

    def test_close_with_hung_worker_fails_queued_futures(self):
        """If the worker never returns within close()'s join timeout (the
        documented axon-tunnel hang mode), queued futures must be failed
        with a RuntimeError so blocking callers unblock — not wait
        forever (review finding)."""
        import threading

        release = threading.Event()

        class _Hung:
            batch_size = 4

            def predict_proba(self, images_u8):
                release.wait()  # device "hang"
                return np.zeros((len(images_u8), 10), np.float32)

        rng = np.random.default_rng(6)
        srv = BatchingServer(_Hung(), max_delay_ms=1.0)
        f1 = srv.submit(_images(rng, 1))  # taken by the worker, hangs
        import time

        time.sleep(0.3)
        # With the default two workers this lands IN-FLIGHT on worker 2
        # (which also hangs); with one worker it would sit queued — close()
        # must fail it either way.
        f2 = srv.submit(_images(rng, 1))
        srv.close(timeout=0.5)
        with pytest.raises(RuntimeError, match="unresponsive"):
            f2.result(timeout=10)
        # The IN-FLIGHT future (popped by the worker, hung inside device
        # inference) must be failed too — it's the one a device hang
        # actually strands.
        with pytest.raises(RuntimeError, match="unresponsive"):
            f1.result(timeout=10)
        release.set()  # let the daemon worker exit cleanly


class TestHTTPFrontend:
    """POST /predict round-trips .npy arrays through the coalescer."""

    def _post_npy(self, url, arr):
        import io
        import urllib.request

        buf = io.BytesIO()
        np.save(buf, arr)
        req = urllib.request.Request(
            url + "/predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200
            return np.load(io.BytesIO(resp.read()), allow_pickle=False)

    def test_predict_healthz_stats(self, predictor):
        import json
        import urllib.request

        from focused_attention_vit_tpu.serve import HTTPFrontend

        rng = np.random.default_rng(6)
        reqs = [_images(rng, n) for n in (2, 5, 8)]
        with BatchingServer(predictor, max_delay_ms=5.0) as srv:
            with HTTPFrontend(srv, port=0) as fe:
                url = f"http://{fe.host}:{fe.port}"
                with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
                    assert r.read() == b"ok"
                for req in reqs:
                    out = self._post_npy(url, req)
                    np.testing.assert_allclose(
                        out, predictor.predict_proba(req), atol=1e-6
                    )
                with urllib.request.urlopen(url + "/stats", timeout=10) as r:
                    stats = json.loads(r.read())
        assert stats["requests"] == 3
        assert stats["images"] == 15

    def test_bad_request_is_400(self, predictor):
        import urllib.error
        import urllib.request

        from focused_attention_vit_tpu.serve import HTTPFrontend

        with BatchingServer(predictor, max_delay_ms=5.0) as srv:
            with HTTPFrontend(srv, port=0) as fe:
                url = f"http://{fe.host}:{fe.port}"
                req = urllib.request.Request(
                    url + "/predict", data=b"not an npy", method="POST"
                )
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=10)
                assert ei.value.code == 400
                # a 3-d body (missing batch dim) is also a client error
                import io

                buf = io.BytesIO()
                np.save(buf, np.zeros((32, 32, 3), np.uint8))
                req = urllib.request.Request(
                    url + "/predict", data=buf.getvalue(), method="POST"
                )
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=10)
                assert ei.value.code == 400

    def test_server_fault_is_503(self, predictor):
        """A RuntimeError is a SERVER fault (closed server; jax device
        errors subclass RuntimeError) and must surface as 503, not 400
        (review finding: a mid-serving device outage was reported as a
        bad request — no client retry, no unhealthy signal)."""
        import io
        import urllib.error
        import urllib.request

        from focused_attention_vit_tpu.serve import HTTPFrontend

        with BatchingServer(predictor, max_delay_ms=5.0) as srv:
            with HTTPFrontend(srv, port=0) as fe:
                url = f"http://{fe.host}:{fe.port}"
                srv.close()
                buf = io.BytesIO()
                np.save(buf, np.zeros((1, 32, 32, 3), np.uint8))
                req = urllib.request.Request(
                    url + "/predict", data=buf.getvalue(), method="POST"
                )
                with pytest.raises(urllib.error.HTTPError) as ei:
                    urllib.request.urlopen(req, timeout=10)
                assert ei.value.code == 503


def test_build_model_dispatch():
    import argparse

    from focused_attention_vit_tpu.models import (
        VisionTransformer,
        VisionTransformerMHLA,
    )
    from focused_attention_vit_tpu.serve import _build_model

    ns = argparse.Namespace(
        model="vit_mhla", img_size=32, patch_size=8, num_classes=10,
        embed_dim=32, depth=1, num_heads=2, window_size=7,
        compute_dtype="float32",
    )
    m = _build_model(ns)
    assert isinstance(m, VisionTransformerMHLA) and m.use_mhla
    ns.model = "vit"
    assert isinstance(_build_model(ns), VisionTransformer)


class TestPipelinedWorkers:
    """The default workers=2 server overlaps inference across batches
    (transfer-bound serving — BASELINE.md 'serving-stack throughput')
    while the _filling gate keeps coalescing semantics single-packer."""

    def test_two_batches_in_flight_concurrently(self):
        import threading

        barrier = threading.Barrier(2, timeout=15)

        class _Rendezvous:
            batch_size = 2

            def predict_proba(self, images_u8):
                # Completes only when TWO batches are inside inference at
                # once — proves worker-level pipelining. A single-worker
                # server would deadlock here (barrier timeout).
                barrier.wait()
                return np.zeros((len(images_u8), 10), np.float32)

        rng = np.random.default_rng(9)
        srv = BatchingServer(_Rendezvous(), max_delay_ms=1.0, workers=2)
        try:
            f1 = srv.submit(_images(rng, 2))  # full batch -> ships at once
            f2 = srv.submit(_images(rng, 2))
            assert f1.result(timeout=30).shape == (2, 10)
            assert f2.result(timeout=30).shape == (2, 10)
        finally:
            srv.close()

    def test_single_worker_opt_out(self, predictor):
        rng = np.random.default_rng(10)
        req = _images(rng, 3)
        srv = BatchingServer(predictor, max_delay_ms=5.0, workers=1)
        try:
            out = srv.predict_proba(req)
        finally:
            srv.close()
        np.testing.assert_allclose(
            out, predictor.predict_proba(req), rtol=0, atol=1e-6
        )
