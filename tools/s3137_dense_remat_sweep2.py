#!/usr/bin/env python
"""Follow-up to s3137_dense_remat_sweep: refine around the no-remat win
(mono mb8 measured 18.56 vs prod 14.53) and test whether windowed MHLA
gains from dropping remat too."""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from focused_attention_vit_tpu.utils.tpu_setup import configure

    configure()

    import jax.numpy as jnp

    from bench import bench_train
    from focused_attention_vit_tpu.models import (
        VisionTransformer,
        VisionTransformerMHLA,
    )

    common = dict(
        img_size=224, patch_size=4, num_classes=10, embed_dim=768,
        depth=12, num_heads=12, dropout=0.1, dtype=jnp.bfloat16,
    )
    cases = [
        ("dense_noremat_mono_mb4",
         VisionTransformer(**common, remat=False, scan_layers=False), 4),
        ("dense_noremat_mono_mb16",
         VisionTransformer(**common, remat=False, scan_layers=False), 16),
        ("dense_remat_mono_mb8",
         VisionTransformer(**common, remat=True, scan_layers=False), 8),
        ("mhla_noremat_mono_mb8",
         VisionTransformerMHLA(**common, window_size=7, use_mhla=True,
                               remat=False, scan_layers=False), 8),
        ("mhla_noremat_scan_mb4",
         VisionTransformerMHLA(**common, window_size=7, use_mhla=True,
                               remat=False, scan_layers=True), 4),
        ("mhla_noremat_mono_mb4",
         VisionTransformerMHLA(**common, window_size=7, use_mhla=True,
                               remat=False, scan_layers=False), 4),
    ]
    results = {}
    for name, model, mb in cases:
        try:
            ips = bench_train(model, 32, 224, steps=10, warmup=2,
                              microbatch=mb)
            results[name] = round(ips, 2)
        except Exception as e:
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
            traceback.print_exc()
        print(json.dumps({name: results[name]}), flush=True)
    print("SWEEP2 " + json.dumps(results))


if __name__ == "__main__":
    main()
