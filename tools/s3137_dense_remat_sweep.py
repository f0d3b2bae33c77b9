#!/usr/bin/env python
"""Dense ViT-B/4 S=3137: remat × microbatch sweep.

Full remat costs an extra forward (~25-33%% of the matmul work). Round 2
measured no-remat as OOM at the monolithic batch-32 step, so every
dense S=3137 number since has paid it — but microbatch-8 shrinks the
live activation set 4×, which may bring no-remat back inside HBM.
BASELINE "attack #4" only swept selective POLICIES (all rejected by the
remote compiler) at the MHLA band config; plain no-remat × microbatch
on the dense path was never tried.

Usage: python tools/s3137_dense_remat_sweep.py [steps]
"""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def main():
    from focused_attention_vit_tpu.utils.tpu_setup import configure

    configure()

    import jax.numpy as jnp

    from bench import bench_train
    from focused_attention_vit_tpu.models import VisionTransformer

    common = dict(
        img_size=224, patch_size=4, num_classes=10, embed_dim=768,
        depth=12, num_heads=12, dropout=0.1, dtype=jnp.bfloat16,
    )
    cases = [
        ("remat_scan_mb8 (prod)", dict(remat=True, scan_layers=True), 8),
        ("noremat_scan_mb8", dict(remat=False, scan_layers=True), 8),
        ("noremat_scan_mb4", dict(remat=False, scan_layers=True), 4),
        ("noremat_mono_mb8", dict(remat=False, scan_layers=False), 8),
        ("noremat_scan_mb16", dict(remat=False, scan_layers=True), 16),
    ]
    results = {}
    for name, kw, mb in cases:
        try:
            ips = bench_train(
                VisionTransformer(**common, **kw), 32, 224,
                steps=STEPS, warmup=2, microbatch=mb,
            )
            results[name] = round(ips, 2)
        except Exception as e:
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            traceback.print_exc()
        print(json.dumps({name: results[name]}), flush=True)
    print("SWEEP " + json.dumps(results))


if __name__ == "__main__":
    main()
