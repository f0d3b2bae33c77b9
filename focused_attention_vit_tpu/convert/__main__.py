"""Checkpoint-conversion CLI: torch state dict → Flax msgpack pytree.

The reference performs weight conversion implicitly inside each pretrained
experiment's setup (e.g. /root/reference/experiments/mhla_pretrained.py:
166-234, with the indexing bugs SURVEY §2.1 documents); here conversion is
a standalone, scriptable deployment step::

    python -m focused_attention_vit_tpu.convert vit_b_16_weights.pth \
        params.msgpack --format torchvision
    python -m focused_attention_vit_tpu.convert vit.pth mhla.msgpack \
        --format reference --to mhla

The output msgpack is the same format the training checkpoints' params
sidecar and ``data/pretrained.py``'s converted-weights cache use, so it
plugs straight into ``infer.Predictor``/``serve`` and the pretrained
experiments' cache path (``<variant>_flax.msgpack``).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m focused_attention_vit_tpu.convert",
        description="Convert a torch ViT checkpoint to a Flax msgpack "
                    "param pytree.",
    )
    p.add_argument("input", help=".pth/.pt torch state dict")
    p.add_argument("output", help="output .msgpack path")
    p.add_argument("--format", choices=["torchvision", "reference", "hf"],
                   default="torchvision",
                   help="checkpoint layout (torchvision vit_b_16-family, "
                        "the reference repo's VisionTransformer, or a "
                        "HuggingFace ViTModel state dict)")
    p.add_argument("--to", choices=["vit", "mhla", "sppp", "cross"],
                   default="vit",
                   help="apply the variant surgery transform after "
                        "conversion (identity latent_proj for mhla, "
                        "pos-embed drop for sppp, qkv split for cross)")
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--embed_dim", type=int, default=768,
                   help="only used to derive head_dim for --to mhla")
    p.add_argument("--num_classes", type=int, default=None,
                   help="keep the checkpoint head only if it matches "
                        "(torchvision/hf formats; reference keeps always)")
    p.add_argument("--drop_pos_embed", action="store_true",
                   help="drop the learned pos_embed (mhla/cross variants; "
                        "sppp always drops it)")
    args = p.parse_args(argv)

    import torch  # torch only needed for conversion, never for serving

    from focused_attention_vit_tpu import convert as C
    from focused_attention_vit_tpu.train.checkpoint import save_params

    sd = torch.load(args.input, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and not any(
        hasattr(v, "shape") for v in sd.values()
    ):
        sd = sd["state_dict"]

    if args.format == "torchvision":
        params = C.torchvision_vit_to_flax(
            sd, depth=args.depth, num_classes=args.num_classes,
            num_heads=args.num_heads,
        )
    elif args.format == "hf":
        params = C.hf_vit_to_flax(
            sd, depth=args.depth, num_classes=args.num_classes,
            num_heads=args.num_heads,
        )
    else:
        params = C.reference_vit_to_flax(
            sd, depth=args.depth, num_heads=args.num_heads
        )

    keep_pos = not args.drop_pos_embed
    if args.to == "mhla":
        params = C.vit_params_to_mhla(
            params, args.depth, args.embed_dim // args.num_heads,
            keep_pos_embed=keep_pos,
        )
    elif args.to == "sppp":
        params = C.vit_params_to_sppp(params)
    elif args.to == "cross":
        params = C.vit_params_to_cross(
            params, args.depth, keep_pos_embed=keep_pos
        )

    out = save_params(args.output, params)
    n = sum(
        x.size for x in __import__("jax").tree.leaves(params)
    )
    print(f"wrote {out} ({n/1e6:.1f}M params, format={args.format}, "
          f"to={args.to})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
