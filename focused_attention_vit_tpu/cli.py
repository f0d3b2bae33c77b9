"""CLI entry point — flag-compatible with the reference main.py:64-149.

Differences by design (documented, SURVEY.md §2.1): the reference main.py
crashes on import-name mismatches (main.py:41-43); here every experiment
name dispatches to a working class. ``--device`` is accepted for
compatibility — JAX selects the TPU/CPU backend itself.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Vision Transformer Experiments")

    # General settings (reference: main.py:69-82)
    parser.add_argument(
        "--experiment", type=str, required=True,
        choices=[
            "traditional", "traditional_pretrained",
            "sppp", "sppp_pretrained",
            "cross_attention", "multihead_cross_attention",
            "mhla_pretrained", "sppp_mhla_pretrained",
        ],
    )
    parser.add_argument("--data_dir", type=str, default="./data")
    parser.add_argument("--results_dir", type=str, default="./results")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--device", type=str, default=None)

    # Dataset settings (reference: main.py:85-93)
    parser.add_argument("--dataset", type=str, default="cifar10",
                        choices=["cifar10", "cifar100", "imagenet"])
    parser.add_argument("--img_size", type=int, default=224)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--subset_size", type=int, default=None)

    # Model settings (reference: main.py:96-111)
    parser.add_argument("--patch_size", type=int, default=16)
    parser.add_argument("--embed_dim", type=int, default=768)
    parser.add_argument("--depth", type=int, default=12)
    parser.add_argument("--num_heads", type=int, default=12)
    parser.add_argument("--mlp_ratio", type=float, default=4.0)
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--attn_dropout", type=float, default=0.0)
    parser.add_argument("--embed_dropout", type=float, default=0.0)

    # SPPP settings (reference: main.py:114-120)
    parser.add_argument("--num_superpixels", type=int, default=16)
    parser.add_argument("--compactness", type=float, default=0.1)
    parser.add_argument("--pooling_type", type=str, default="mean",
                        choices=["mean", "max", "attention"])
    parser.add_argument(
        "--slic_iters", type=int, default=10,
        help="SLIC k-means iterations (default 10 = skimage-faithful). "
        "Fewer iterations trade segmentation fidelity for speed: at "
        "224^2/R=16 the patch-dominant agreement vs the skimage golden "
        "drops 0.998 -> 0.90 at 8 iterations (BASELINE.md 'SPPP SLIC "
        "iteration count') - an opt-in knob, not a default.")
    parser.add_argument("--slic_connectivity", type=str, default="auto",
                        choices=["auto", "on", "off", "host"],
                        help="skimage-style SLIC connectivity enforcement: "
                             "auto = on-device for images <=64^2 px (cheap, "
                             "golden-validated), host C++ kernel above when "
                             "callbacks work (exact skimage BFS, ~ms/image), "
                             "else off with a warning; 'on' forces the "
                             "on-device path at any size (~25x SLIC cost at "
                             "224^2 — see BASELINE.md); 'host' forces the "
                             "native kernel (native/connectivity.cpp)")

    # MHLA settings (reference: main.py:123-124)
    parser.add_argument("--window_size", type=int, default=7)

    # Training settings (reference: main.py:127-132)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.05)
    parser.add_argument("--lr_schedule", type=str, default="constant",
                        choices=["constant", "cosine"],
                        help="LR schedule (extension; reference = constant)")
    parser.add_argument("--warmup_epochs", type=float, default=0.0,
                        help="Linear LR warmup, in (fractional) epochs")
    parser.add_argument("--grad_clip_norm", type=float, default=None,
                        help="Global-norm gradient clipping (extension)")
    parser.add_argument("--mu_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="AdamW first-moment dtype (extension): "
                             "bfloat16 halves mu memory; nu stays f32. "
                             "Composes with --fsdp")

    # Pretrained settings (reference: main.py:135-143)
    parser.add_argument("--pretrained_model_variant", type=str, default="vit_b_16")
    parser.add_argument("--pretrained_source", type=str, default="torchvision",
                        choices=["torchvision", "huggingface"])
    parser.add_argument("--freeze_layers", action="store_true")
    parser.add_argument("--head_learning_rate", type=float, default=1e-3)

    # Visualization settings (reference: main.py:146-147)
    parser.add_argument("--visualize", action="store_true")

    # TPU-native extensions (supersets of the reference CLI)
    parser.add_argument("--checkpoint_dir", type=str, default=None,
                        help="Orbax checkpoint dir (per-epoch save + resume)")
    parser.add_argument("--sync_checkpoint", action="store_true",
                        help="Block each epoch until its checkpoint commits "
                             "(default: async — on-device snapshot, the "
                             "device-to-host pull and writes overlap the "
                             "next epoch)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Capture a jax.profiler trace of training")
    parser.add_argument("--no_detailed_metrics", action="store_true",
                        help="Skip AUC/confusion-matrix computation")
    parser.add_argument("--remat", action="store_true",
                        help="Gradient checkpointing per block (for the "
                             "patch-4 / S=3137 geometry at large batch)")
    parser.add_argument("--remat_policy", type=str, default=None,
                        choices=["full", "band_weights"],
                        help="What per-block checkpointing saves under "
                             "--remat: 'full' saves nothing (classic "
                             "remat); 'band_weights' keeps the MHLA band "
                             "softmax weights so backward skips the band "
                             "recompute (MHLA models only)")
    parser.add_argument("--scan_layers", action="store_true",
                        help="lax.scan over depth (stacked block params); "
                             "shrinks the XLA program 12x for very long "
                             "sequences (random-init experiments)")
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Model/pipeline compute dtype (bfloat16 for "
                             "MXU-native training; params stay float32)")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="Train on a ('data','model') device mesh of "
                             "this many chips (-1 = all available); batch "
                             "sharded over 'data', XLA grad all-reduce "
                             "over ICI")
    parser.add_argument("--tp", type=int, default=1,
                        help="Tensor-parallel ('model') axis size; must "
                             "divide --num_devices. Shards MLP hidden dim "
                             "and attention heads Megatron-style")
    parser.add_argument("--sp", type=int, default=1,
                        help="Sequence-parallel ('seq') axis size; must "
                             "divide --num_devices (with --tp). Shards the "
                             "token axis; windowed MHLA attention exchanges "
                             "a W//2-row halo over ICI "
                             "(parallel/sequence.py). MHLA models only")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-3 fully-sharded data parallelism: "
                             "params + optimizer moments sharded over the "
                             "'data' axis (just-in-time all-gather / grad "
                             "reduce-scatter via GSPMD); same trajectory "
                             "as DP with per-device state memory divided "
                             "by the DP size. Requires a mesh; composes "
                             "with --tp/--pp")
    parser.add_argument("--pp", type=int, default=1,
                        help="Pipeline-parallel ('stage') axis size; must "
                             "divide --num_devices (with --tp/--sp) and "
                             "the depth. GPipe fill-drain over the block "
                             "stack (parallel/pipeline.py); requires "
                             "--scan_layers. Composes with --sp: under the "
                             "pipeline the sequence axis rides GSPMD "
                             "(models/layers.py sp_gspmd)")
    parser.add_argument("--microbatch", type=int, default=None,
                        help="Gradient-accumulation chunk inside the jitted "
                             "train step (identical batch math; smaller "
                             "live activation set). Composes with a mesh: "
                             "chunks stay batch-sharded over 'data' (value "
                             "must be a multiple of the DP size). Default: "
                             "auto (16 on a single device, off on a mesh); "
                             "0 disables")

    return parser.parse_args(argv)


def _common_kwargs(args):
    return dict(
        img_size=args.img_size,
        patch_size=args.patch_size,
        in_channels=3,
        num_classes=10 if args.dataset == "cifar10" else 100,
        embed_dim=args.embed_dim,
        depth=args.depth,
        num_heads=args.num_heads,
        mlp_ratio=args.mlp_ratio,
        dropout=args.dropout,
        attn_dropout=args.attn_dropout,
        embed_dropout=args.embed_dropout,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        lr_schedule=args.lr_schedule,
        warmup_epochs=args.warmup_epochs,
        grad_clip_norm=args.grad_clip_norm,
        mu_dtype=args.mu_dtype,
        epochs=args.epochs,
        device=args.device,
        data_dir=args.data_dir,
        results_dir=args.results_dir,
        subset_size=args.subset_size,
        dataset=args.dataset,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        sync_checkpoint=args.sync_checkpoint,
        profile_dir=args.profile_dir,
        detailed_metrics=not args.no_detailed_metrics,
        compute_dtype=args.compute_dtype,
        remat=args.remat,
        remat_policy=args.remat_policy,
        scan_layers=args.scan_layers,
        num_devices=args.num_devices,
        fsdp=args.fsdp,
        tp=args.tp,
        sp=args.sp,
        pp=args.pp,
        microbatch=args.microbatch,
    )


def _pretrained_kwargs(args):
    return dict(
        pretrained_model_variant=args.pretrained_model_variant,
        pretrained_source=args.pretrained_source,
        freeze_layers=args.freeze_layers,
        head_learning_rate=args.head_learning_rate,
    )


def _sppp_kwargs(args):
    return dict(
        num_superpixels=args.num_superpixels,
        compactness=args.compactness,
        pooling_type=args.pooling_type,
        slic_connectivity=args.slic_connectivity,
        slic_iters=args.slic_iters,
    )


def _save_visualizations(args):
    """--visualize: save a sample-image grid and a per-patch grid into
    results_dir (the reference parses this flag but never acts on it,
    main.py:146-147 — acting on it is a strict superset)."""
    import numpy as np

    from focused_attention_vit_tpu.data import load_dataset
    from focused_attention_vit_tpu.utils.viz import (
        visualize_images,
        visualize_patches,
    )

    data = load_dataset(
        args.dataset if args.dataset != "imagenet" else "cifar10",
        data_dir=args.data_dir,
        subset_size=max(16, args.subset_size or 16),
        seed=args.seed,
    )
    imgs = data["train_images"][:16].astype(np.float32) / 255.0
    # viz helpers denormalize; feed normalized-equivalent values.
    mean = np.array((0.4914, 0.4822, 0.4465))
    std = np.array((0.2470, 0.2435, 0.2616))
    normed = (imgs - mean) / std
    visualize_images(
        normed,
        labels=data["train_labels"][:16],
        class_names=data["class_names"],
        save_path=f"{args.results_dir}/sample_images.png",
    )
    visualize_patches(
        normed[0],
        patch_size=min(args.patch_size, imgs.shape[1]),
        save_path=f"{args.results_dir}/sample_patches.png",
    )
    print(f"Visualizations saved to {args.results_dir}")


def main(argv=None):
    args = parse_args(argv)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=[
            logging.FileHandler("vit_experiments.log"),
            logging.StreamHandler(sys.stdout),
        ],
    )
    logger = logging.getLogger("focused_attention_vit_tpu")

    os.makedirs(args.data_dir, exist_ok=True)
    os.makedirs(args.results_dir, exist_ok=True)

    if args.visualize:
        _save_visualizations(args)

    import jax

    from focused_attention_vit_tpu.utils.tpu_setup import configure as _configure

    _configure()

    logger.info("Experiment: %s", args.experiment)
    logger.info("Dataset: %s", args.dataset)
    logger.info("Backend: %s (%s)", jax.default_backend(), jax.devices())
    logger.info("Batch size: %d", args.batch_size)
    logger.info("Epochs: %d", args.epochs)

    from focused_attention_vit_tpu import experiments as exp

    name = args.experiment
    instance = None
    if name == "traditional":
        instance = exp.TraditionalViTExperiment(**_common_kwargs(args))
    elif name == "traditional_pretrained":
        instance = exp.PretrainedTraditionalViTExperiment(
            **_common_kwargs(args), **_pretrained_kwargs(args)
        )
    elif name == "sppp":
        instance = exp.SPPPExperiment(
            **_common_kwargs(args), **_sppp_kwargs(args)
        )
    elif name == "sppp_pretrained":
        instance = exp.PretrainedSPPPExperiment(
            **_common_kwargs(args), **_sppp_kwargs(args), **_pretrained_kwargs(args)
        )
    elif name == "mhla_pretrained":
        instance = exp.PretrainedMHLAViTExperiment(
            **_common_kwargs(args), **_pretrained_kwargs(args),
            window_size=args.window_size,
        )
    elif name == "sppp_mhla_pretrained":
        instance = exp.PretrainedSPPPMHLAExperiment(
            **_common_kwargs(args), **_sppp_kwargs(args), **_pretrained_kwargs(args),
            window_size=args.window_size,
        )
    elif name == "cross_attention":
        exp.run_cross_attention_experiments(args)
    elif name == "multihead_cross_attention":
        exp.run_multihead_cross_attention_experiments(args)
    else:  # pragma: no cover — argparse choices guard this
        logger.error("Unknown experiment: %s", name)
    if instance is not None:
        instance.run()
        if instance.preempted:
            # 128+SIGTERM: supervisors see a termination, restart the
            # command, and --checkpoint_dir auto-resume continues.
            raise SystemExit(143)


if __name__ == "__main__":
    main()
