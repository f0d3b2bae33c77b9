"""Serving-stack throughput/latency benchmark (real chip).

Measures the production serving path end-to-end — the layer the reference
does not have (its only inference surface is the experiment eval loops,
/root/reference/experiments/traditional.py:268-301):

1. ``direct``    — Predictor.predict_proba full-batch steady throughput
                   (the compiled-program ceiling through this process).
2. ``coalesced`` — BatchingServer under N concurrent single-image
                   clients: achieved img/s, request p50/p99 latency, and
                   mean device-batch fill (how well dynamic coalescing
                   packs the fixed-shape program).
3. ``http``      — the same through the stdlib HTTP front-end (loopback),
                   isolating the wire/serialization overhead.

Writes one JSON line to stdout (and optionally appends a section to
BASELINE.md by hand — numbers are recorded there).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serving.py
Env:   SERVE_BENCH_SECONDS (default 10), SERVE_BENCH_CLIENTS (default 48),
       SERVE_BENCH_BATCH (device batch, default 64).
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from focused_attention_vit_tpu import models  # noqa: E402
from focused_attention_vit_tpu.infer import Predictor  # noqa: E402
from focused_attention_vit_tpu.serve import (  # noqa: E402
    BatchingServer,
    HTTPFrontend,
)

SECONDS = float(os.environ.get("SERVE_BENCH_SECONDS", "10"))
CLIENTS = int(os.environ.get("SERVE_BENCH_CLIENTS", "48"))
BATCH = int(os.environ.get("SERVE_BENCH_BATCH", "64"))
IMG = 224


def build_predictor() -> Predictor:
    model = models.VisionTransformerMHLA(
        img_size=IMG, patch_size=16, num_classes=10, embed_dim=768,
        depth=12, num_heads=12, window_size=7, use_mhla=True,
        dropout=0.0,
    )
    params = jax.jit(
        lambda k: model.init(k, np.zeros((1, IMG, IMG, 3), np.float32))
    )(jax.random.PRNGKey(0))["params"]
    pred = Predictor(model, params, img_size=IMG, batch_size=BATCH)
    pred.warmup()
    return pred


def bench_direct(pred: Predictor, rng) -> dict:
    imgs = rng.integers(0, 255, size=(BATCH, IMG, IMG, 3), dtype=np.uint8)
    for _ in range(3):
        pred.predict_proba(imgs)  # warm
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECONDS:
        pred.predict_proba(imgs)
        n += BATCH
    dt = time.time() - t0
    return {"images_per_sec": round(n / dt, 1),
            "batch_latency_ms": round(1000 * dt / (n / BATCH), 2)}


def bench_offline(pred: Predictor, rng) -> dict:
    """One big predict_proba call — exercises the in-request chunk
    pipeline (padded_predict_proba max_in_flight): chunk i+1's H2D
    transfer overlaps chunk i's compute + readback."""
    imgs = rng.integers(0, 255, size=(8 * BATCH, IMG, IMG, 3),
                        dtype=np.uint8)
    pred.predict_proba(imgs[: 2 * BATCH])  # warm
    t0 = time.time()
    reps = 0
    while time.time() - t0 < SECONDS:
        pred.predict_proba(imgs)
        reps += 1
    dt = time.time() - t0
    return {"images_per_sec": round(reps * len(imgs) / dt, 1),
            "call_ms": round(1000 * dt / reps, 1)}


def _client_loop(submit, stop, lat, count):
    rng = np.random.default_rng(threading.get_ident() % 2**31)
    img = rng.integers(0, 255, size=(1, IMG, IMG, 3), dtype=np.uint8)
    while not stop.is_set():
        t0 = time.time()
        submit(img)
        lat.append(time.time() - t0)
        count[0] += 1


def bench_concurrent(submit_fn, n_clients: int) -> dict:
    stop = threading.Event()
    lats: list[list] = [[] for _ in range(n_clients)]
    counts = [[0] for _ in range(n_clients)]
    threads = [
        threading.Thread(
            target=_client_loop, args=(submit_fn, stop, lats[i], counts[i]),
            daemon=True,
        )
        for i in range(n_clients)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    time.sleep(SECONDS)
    stop.set()
    for t in threads:
        t.join(30)
    dt = time.time() - t0
    all_lat = np.array(sorted(x for l in lats for x in l))
    total = sum(c[0] for c in counts)
    return {
        "clients": n_clients,
        "images_per_sec": round(total / dt, 1),
        "p50_ms": round(1000 * float(np.percentile(all_lat, 50)), 1),
        "p99_ms": round(1000 * float(np.percentile(all_lat, 99)), 1),
    }


def main():
    rng = np.random.default_rng(0)
    pred = build_predictor()
    out = {"batch": BATCH, "img_size": IMG, "model": "mhla_b16",
           "backend": jax.default_backend(), "seconds": SECONDS}

    out["direct"] = bench_direct(pred, rng)
    out["offline_512"] = bench_offline(pred, rng)

    srv = BatchingServer(pred, max_delay_ms=3.0)
    # warm the coalescer path
    srv.predict_proba(rng.integers(0, 255, (1, IMG, IMG, 3), dtype=np.uint8))
    out["coalesced"] = bench_concurrent(srv.predict_proba, CLIENTS)
    out["coalesced"]["mean_batch_fill"] = round(srv.stats.mean_batch_fill, 3)

    front = HTTPFrontend(srv, port=0)
    front.start()
    url = f"http://127.0.0.1:{front.port}/predict"

    def http_submit(img):
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
        np.load(io.BytesIO(urllib.request.urlopen(req, timeout=120).read()))

    out["http"] = bench_concurrent(http_submit, min(CLIENTS, 32))
    front.close()
    srv.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
