"""Dynamic-batching serving front-end.

The reference has no serving path at all — its only inference surface is
the experiment eval loops (/root/reference/experiments/traditional.py:
268-301). This module is the TPU-native production-serving layer on top
of :class:`focused_attention_vit_tpu.infer.Predictor`:

- **One compiled program.** The Predictor's fixed batch shape means the
  serving path never recompiles; XLA's compile model rewards exactly one
  program shape (CLAUDE.md: remote compiles cost seconds-to-minutes).
- **Request coalescing.** Concurrent variable-size requests are packed
  into full device batches by a background worker — throughput rides
  batch packing (device img/s is ~flat in batch above ~64 on v5e,
  BASELINE.md "eval latency"), latency is bounded by ``max_delay_ms``.
- **Whole-request packing.** A request's images stay in one device batch
  (simple result routing, no cross-batch reassembly); requests larger
  than the device batch fall through to ``Predictor.predict_proba``,
  which chunks internally over the same compiled program.

Thread-safe: ``submit`` may be called from any number of threads; results
are delivered via :class:`concurrent.futures.Future`.

An stdlib-only HTTP front-end (:class:`HTTPFrontend` + ``python -m
focused_attention_vit_tpu.serve``) exposes the coalescer over localhost:
``POST /predict`` with an ``.npy``-serialized uint8 ``[n,h,w,3]`` body
returns an ``.npy`` of ``[n,C]`` probabilities; ``GET /healthz`` and
``GET /stats`` give liveness and coalescer counters.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


def _deliver(fut: Future, result=None, exc=None) -> None:
    """Resolve a future, tolerating caller-side cancellation — a
    cancelled future must never kill the worker thread (InvalidStateError
    would leave every later request hanging)."""
    try:
        if fut.cancelled():
            return
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
    except Exception:
        pass  # racing cancel() between the check and the set


@dataclass
class ServeStats:
    """Counters for observability (read under no lock — monotonic ints)."""

    requests: int = 0
    images: int = 0
    batches: int = 0
    batched_images: int = 0  # images that went through the coalescer
    oversize_requests: int = 0  # ran alone via predict_proba chunking
    fill_sum: float = field(default=0.0)  # Σ per-batch fill fraction

    @property
    def mean_batch_fill(self) -> float:
        return self.fill_sum / self.batches if self.batches else 0.0


class BatchingServer:
    """Coalesces concurrent predict requests into full device batches.

    Parameters
    ----------
    predictor:
        A ready :class:`~focused_attention_vit_tpu.infer.Predictor`.
    max_delay_ms:
        How long the worker waits to fill a batch after the first request
        arrives. The p99 added latency of the coalescer.
    workers:
        Inference worker threads. JAX dispatch is async and the result
        pull releases the GIL, so with 2 workers one batch's host→device
        transfer overlaps the other's compute + readback — the serving
        path is transfer-bound (BASELINE.md "serving-stack throughput").
        Batches may complete out of order across workers; each request's
        future is delivered by the worker that took it, so per-request
        semantics are unchanged.
    """

    def __init__(self, predictor, *, max_delay_ms: float = 5.0,
                 workers: int = 2):
        self._p = predictor
        self._capacity = int(predictor.batch_size)
        self._max_delay = max_delay_ms / 1000.0
        self._lock = threading.Lock()
        self._nonempty = threading.Condition(self._lock)
        self._queue: List[Tuple[np.ndarray, Future]] = []
        self._filling = False  # single-packer gate, see _take_batch
        # Futures workers have popped but not yet delivered — tracked so
        # close() can fail them when a worker hangs in device inference
        # (queued futures alone don't cover the in-flight batches).
        self._inflight: List[Future] = []
        self._closed = False
        self.stats = ServeStats()
        self._workers = [
            threading.Thread(
                target=self._run, name=f"favit-serve-{i}", daemon=True
            )
            for i in range(max(1, int(workers)))
        ]
        for t in self._workers:
            t.start()

    # -- client side -----------------------------------------------------

    def submit(self, images_u8: np.ndarray) -> Future:
        """Enqueue ``[n, h, w, 3] uint8``; resolves to ``[n, C]`` probs."""
        images_u8 = np.asarray(images_u8)
        if images_u8.ndim != 4 or images_u8.shape[0] == 0:
            raise ValueError(
                f"expected non-empty [n, h, w, c] uint8, got shape "
                f"{images_u8.shape}"
            )
        fut: Future = Future()
        with self._nonempty:
            if self._closed:
                raise RuntimeError("server is closed")
            self.stats.requests += 1
            self.stats.images += len(images_u8)
            self._queue.append((images_u8, fut))
            self._nonempty.notify()
        return fut

    def predict_proba(self, images_u8: np.ndarray) -> np.ndarray:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(images_u8).result()

    def close(self, timeout: Optional[float] = 10.0) -> None:
        """Drain the queue and stop the worker.

        If the workers do not finish within ``timeout`` (e.g. device
        inference hung — the documented axon-tunnel outage mode), every
        still-queued future is failed with a RuntimeError so blocking
        callers in :meth:`predict_proba` unblock instead of waiting
        forever. A future a worker already took but never delivered is
        failed the same way."""
        with self._nonempty:
            self._closed = True
            self._nonempty.notify_all()
        deadline = time.monotonic() + (timeout if timeout else 0.0)
        for t in self._workers:
            t.join(max(0.0, deadline - time.monotonic())
                   if timeout is not None else None)
        if any(t.is_alive() for t in self._workers):
            with self._nonempty:
                undelivered = [fut for _, fut in self._queue]
                undelivered += self._inflight
                self._queue.clear()
                self._inflight = []
            for fut in undelivered:
                _deliver(
                    fut,
                    exc=RuntimeError(
                        "server closed while the inference worker was "
                        "unresponsive; request abandoned"
                    ),
                )

    def __enter__(self) -> "BatchingServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- worker side -----------------------------------------------------

    def _take_batch(self) -> Optional[List[Tuple[np.ndarray, Future]]]:
        """Block for the first request, then pack whole requests until the
        device batch is full or ``max_delay`` has elapsed.

        Only ONE worker packs at a time (``_filling`` gate): concurrent
        fillers would split back-to-back requests into half-empty batches
        — coalescing semantics are identical to a single-worker server,
        and extra workers add only inference overlap."""
        with self._nonempty:
            while (not self._queue or self._filling) and not self._closed:
                self._nonempty.wait()
            while self._filling:
                # Closed while another worker packs: let it finish; any
                # overflow it leaves in the queue is ours next.
                self._nonempty.wait(timeout=0.05)
            if not self._queue:
                return None  # closed and drained
            self._filling = True
            try:
                deadline = time.monotonic() + self._max_delay
                taken: List[Tuple[np.ndarray, Future]] = []
                n = 0
                hw = None  # only same-(h,w,c) requests share a concatenate
                while True:
                    # Pack every queued request that still fits.
                    i = 0
                    while i < len(self._queue):
                        req = self._queue[i][0]
                        req_n = len(req)
                        if req_n > self._capacity and not taken:
                            # Oversize request at the head: ship it alone.
                            return [self._queue.pop(i)]
                        if n + req_n <= self._capacity and (
                            hw is None or req.shape[1:] == hw
                        ):
                            item = self._queue.pop(i)
                            taken.append(item)
                            hw = req.shape[1:]
                            n += req_n
                        else:
                            i += 1
                    remaining = deadline - time.monotonic()
                    if n >= self._capacity or self._closed or remaining <= 0:
                        return taken
                    self._nonempty.wait(timeout=remaining)
            finally:
                self._filling = False
                self._nonempty.notify_all()

    def _run(self) -> None:
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            arrays = [a for a, _ in batch]
            futs = [fut for _, fut in batch]
            total = sum(len(a) for a in arrays)
            with self._lock:
                self._inflight.extend(futs)
            try:
                probs = self._p.predict_proba(np.concatenate(arrays))
            except Exception as e:  # propagate to every waiting caller
                for fut in futs:
                    _deliver(fut, exc=e)
                self._done_inflight(futs)
                continue
            with self._lock:
                if total > self._capacity:
                    self.stats.oversize_requests += 1
                else:
                    self.stats.batches += 1
                    self.stats.batched_images += total
                    self.stats.fill_sum += total / self._capacity
            off = 0
            for a, fut in batch:
                _deliver(fut, result=probs[off : off + len(a)])
                off += len(a)
            self._done_inflight(futs)

    def _done_inflight(self, futs) -> None:
        with self._lock:
            for f in futs:
                try:
                    self._inflight.remove(f)
                except ValueError:
                    pass  # close() already drained the list


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib only — zero-egress container, no web framework).
# ---------------------------------------------------------------------------


class HTTPFrontend:
    """Localhost HTTP inference endpoint over a :class:`BatchingServer`.

    Wire format is numpy's own ``.npy`` serialization both ways (exact,
    self-describing, no JSON float costs): ``POST /predict`` body =
    ``np.save`` of a uint8 ``[n, h, w, 3]`` array; 200 response body =
    ``np.save`` of float32 ``[n, num_classes]`` probabilities.
    """

    def __init__(self, server: BatchingServer, host: str = "127.0.0.1",
                 port: int = 0, request_timeout_s: float = 120.0):
        import http.server
        import io
        import json

        srv = server
        timeout_s = request_timeout_s

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet; stats carry the counters
                pass

            def _reply(self, code, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, b"ok", "text/plain")
                elif self.path == "/stats":
                    s = srv.stats
                    payload = json.dumps(dict(
                        requests=s.requests, images=s.images,
                        batches=s.batches, batched_images=s.batched_images,
                        oversize_requests=s.oversize_requests,
                        mean_batch_fill=round(s.mean_batch_fill, 4),
                    )).encode()
                    self._reply(200, payload, "application/json")
                else:
                    self._reply(404, b"not found", "text/plain")

            def do_POST(self):
                if self.path != "/predict":
                    self._reply(404, b"not found", "text/plain")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    arr = np.load(io.BytesIO(self.rfile.read(n)),
                                  allow_pickle=False)
                    probs = srv.submit(arr).result(timeout=timeout_s)
                except ValueError as e:
                    self._reply(400, str(e).encode(), "text/plain")
                    return
                except TimeoutError as e:
                    self._reply(
                        504, f"inference timed out: {e}".encode(),
                        "text/plain",
                    )
                    return
                except RuntimeError as e:
                    # Server-side fault, NOT a client error: a closed /
                    # closing server (submit / close() abandonment) or a
                    # device failure surfaced through the future (jax's
                    # XlaRuntimeError subclasses RuntimeError — e.g. the
                    # axon tunnel dropping mid-serving). 503 lets clients
                    # and load balancers retry / mark unhealthy; mapping
                    # these to 400 hid outages as bad requests.
                    self._reply(
                        503, f"{type(e).__name__}: {e}".encode(),
                        "text/plain",
                    )
                    return
                except Exception as e:  # device errors etc. → 500, not a
                    # dropped connection (BaseHTTPRequestHandler would
                    # close the socket with no response).
                    self._reply(
                        500, f"{type(e).__name__}: {e}".encode(),
                        "text/plain",
                    )
                    return
                buf = io.BytesIO()
                np.save(buf, probs)
                self._reply(200, buf.getvalue(), "application/x-npy")

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="favit-http", daemon=True
        )

    def start(self) -> "HTTPFrontend":
        self._thread.start()
        return self

    def close(self) -> None:
        if self._thread.is_alive():
            # shutdown() waits on an event only serve_forever() sets —
            # calling it before start() would deadlock.
            self._httpd.shutdown()
            self._thread.join(timeout=10)
        self._httpd.server_close()

    def __enter__(self) -> "HTTPFrontend":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()


def _build_model(args):
    import jax.numpy as jnp

    from focused_attention_vit_tpu.models import (
        VisionTransformer,
        VisionTransformerMHLA,
    )

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    kw = dict(
        img_size=args.img_size, patch_size=args.patch_size,
        num_classes=args.num_classes, embed_dim=args.embed_dim,
        depth=args.depth, num_heads=args.num_heads, dtype=dtype,
    )
    if args.model == "vit":
        return VisionTransformer(**kw)
    return VisionTransformerMHLA(
        window_size=args.window_size, use_mhla=True, **kw
    )


def main(argv=None) -> None:
    """``python -m focused_attention_vit_tpu.serve --checkpoint_dir ...``

    Loads trained params (the sidecar written by train.checkpoint), builds
    the fixed-shape Predictor (optionally mesh-sharded), and serves HTTP
    until interrupted. The reference has no equivalent surface.
    """
    import argparse

    p = argparse.ArgumentParser(description="favit serving front-end")
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="training checkpoint dir (required unless "
                        "--from_export)")
    p.add_argument("--from_export", type=str, default=None, metavar="DIR",
                   help="serve a jax.export artifact directory "
                        "(export.save_serving_artifact) — no model class "
                        "or checkpoint needed")
    p.add_argument("--export_artifact", type=str, default=None, metavar="DIR",
                   help="instead of serving: write the compiled serving "
                        "program + params to DIR and exit")
    p.add_argument("--model", choices=["vit", "vit_mhla"], default="vit_mhla")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--embed_dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--window_size", type=int, default=7)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--batch_size", type=int, default=64,
                   help="device batch (the one compiled program shape)")
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--workers", type=int, default=2,
                   help="inference worker threads (2 overlaps one batch's "
                        "host->device transfer with the other's compute; "
                        "coalescing itself stays single-packer)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--tp", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from focused_attention_vit_tpu.infer import Predictor
    from focused_attention_vit_tpu.utils import compile_cache

    compile_cache.enable()
    if args.from_export:
        if args.export_artifact:
            p.error("--from_export and --export_artifact are exclusive")
        if args.checkpoint_dir:
            p.error(
                "--from_export and --checkpoint_dir are exclusive: the "
                "artifact carries its own program and params, so the "
                "checkpoint would be silently ignored"
            )
        from focused_attention_vit_tpu.export import load_serving_artifact

        predictor = load_serving_artifact(args.from_export)
        print(f"loaded artifact {args.from_export} "
              f"(batch {predictor.batch_size}, input {predictor.input_hw}, "
              f"{predictor.num_classes} classes); compiling ...", flush=True)
        predictor.warmup()
    else:
        if not args.checkpoint_dir:
            p.error("--checkpoint_dir is required unless --from_export")
        # Same mesh convention as the training CLI (experiments/base.py):
        # --num_devices <=0 or None means "all devices" when a mesh is
        # requested; --tp alone also requests a mesh.
        mesh = None
        if args.num_devices or args.tp > 1:
            from focused_attention_vit_tpu.parallel import make_mesh

            n = args.num_devices
            if n is None or n <= 0:
                n = len(jax.devices())
            if n > 1 or args.tp > 1:
                mesh = make_mesh(n, tp=args.tp)
        model = _build_model(args)
        predictor = Predictor.from_checkpoint(
            model, args.checkpoint_dir,
            sample_input=jnp.zeros((1, args.img_size, args.img_size, 3)),
            img_size=args.img_size, batch_size=args.batch_size,
            compute_dtype=(jnp.bfloat16 if args.compute_dtype == "bfloat16"
                           else jnp.float32),
            mesh=mesh,
        )
        if args.export_artifact:
            from focused_attention_vit_tpu.export import (
                save_serving_artifact,
            )

            out = save_serving_artifact(predictor, args.export_artifact)
            print(f"serving artifact written to {out}", flush=True)
            return
        print(f"compiling (batch {args.batch_size}, "
              f"{jax.devices()[0].platform}) ...", flush=True)
        predictor.warmup()
    with BatchingServer(predictor, max_delay_ms=args.max_delay_ms,
                        workers=args.workers) as srv:
        with HTTPFrontend(srv, host=args.host, port=args.port) as fe:
            print(f"serving on http://{fe.host}:{fe.port} "
                  f"(POST /predict, GET /stats, GET /healthz)", flush=True)
            try:
                while True:
                    time.sleep(3600)
            except KeyboardInterrupt:
                print("shutting down", flush=True)


if __name__ == "__main__":
    main()
