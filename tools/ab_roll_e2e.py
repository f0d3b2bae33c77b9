"""End-to-end A/B at the bench s3137 MHLA config: default path vs
FAVIT_MHLA_IMPL=roll (v5 lane-roll band kernel).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_roll_e2e.py
Env: AB_MB (default 4), AB_SCAN (default 0), AB_REMAT (default 0),
AB_DROPOUT (default 0.1), AB_IMPLS (comma list), AB_MODE (train|eval).
(The round-3 FAVIT_ROLL_BWD=xla hybrid backward was removed in round 4
when the in-kernel dkv accumulation made the Pallas backward win.)

Round-3 staging measured the old production config (remat+scan+mb8,
36.6 img/s); defaults now match the attack-#6 production config
(no-remat, mono layers, mb4 — 48.1 img/s, the round-4 baseline).
"""
import os
import sys

sys.path.insert(0, "/root/repo")
from focused_attention_vit_tpu.utils.tpu_setup import configure

configure()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

mb = int(os.environ.get("AB_MB", "4"))
scan = os.environ.get("AB_SCAN", "0") == "1"
remat = os.environ.get("AB_REMAT", "0") == "1"
drop = float(os.environ.get("AB_DROPOUT", "0.1"))
impls = os.environ.get("AB_IMPLS", "auto,roll").split(",")

from focused_attention_vit_tpu.models import VisionTransformerMHLA  # noqa

mode = os.environ.get("AB_MODE", "train")  # train | eval

for impl in impls:
    os.environ["FAVIT_MHLA_IMPL"] = impl
    m = VisionTransformerMHLA(
        img_size=224, patch_size=4, num_classes=10, embed_dim=768,
        depth=12, num_heads=12, dropout=drop, dtype=jnp.bfloat16,
        window_size=7, use_mhla=True, scan_layers=scan, remat=remat,
    )
    if mode == "eval":
        p50, steady = bench.bench_eval_latency(m, 32, 224)
        print(
            f"impl={impl} eval b32: p50 {p50*1e3:.2f} ms, steady "
            f"{steady*1e3:.2f} ms = {32/steady:.2f} img/s", flush=True,
        )
    else:
        ips = bench.bench_train(m, 32, 224, microbatch=mb)
        print(f"impl={impl} mb={mb} scan={scan} remat={remat} drop={drop}: "
              f"{ips:.2f} img/s", flush=True)
