#!/usr/bin/env python
"""End-to-end multi-epoch training parity: torch reference vs this framework.

VERDICT r3 next-round #2: the step-level trajectory parity (f64, 3 steps,
≤1e-5/leaf — tests/test_parity_torch.py) is strong but short; the accuracy
surface itself had never been compared. This harness trains the
constructible reference models (/root/reference/models/vit.py,
/root/reference/models/vit_mhla.py — torch CPU) and the JAX production
pipeline on the SAME synthetic dataset (data/datasets._synthetic_cifar,
the loader's zero-egress fallback), from the SAME initial weights (torch
init → convert/torch_to_jax), with the SAME batch order, optimizer
(AdamW lr 1e-4 wd 0.05 — the reference protocol,
/root/reference/experiments/traditional.py:152-157) and preprocessing
(u8/255 → CIFAR normalize; augmentation off on both sides so the
comparison has no RNG surface; dropout 0 for the same reason — the
dropout/augmentation math itself is pinned by dedicated tests).

This is an ENVELOPE comparison (loss/accuracy curves track), not bitwise:
f32 arithmetic differences compound over hundreds of steps.

Run:  env PYTHONPATH= JAX_PLATFORMS=cpu python tools/train_parity_torch_vs_jax.py
Writes results/train_parity_torch_vs_jax.json and prints per-epoch table.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, "/root/reference")

import numpy as np


def build_batches(n_train, n_test, batch, epochs, num_classes=10, seed=0):
    """Synthetic CIFAR batches in a FIXED order shared by both frameworks."""
    from focused_attention_vit_tpu.data.datasets import _synthetic_cifar

    data = _synthetic_cifar(num_classes, n_train, n_test, seed=0)
    order_rng = np.random.default_rng(seed)
    epoch_orders = [
        order_rng.permutation(n_train)[: (n_train // batch) * batch]
        for _ in range(epochs)
    ]
    return data, epoch_orders


def run_jax(model_name, geometry, data, epoch_orders, batch, lr, wd,
            torch_state_dict):
    import jax
    import jax.numpy as jnp
    from focused_attention_vit_tpu import models as fmodels
    from focused_attention_vit_tpu.convert.torch_to_jax import (
        reference_vit_to_flax,
        reference_vit_mhla_to_flax,
    )
    from focused_attention_vit_tpu.train.state import TrainState, make_adamw
    from focused_attention_vit_tpu.train.steps import (
        make_train_step,
        make_eval_step,
    )

    if model_name == "vit":
        jm = fmodels.VisionTransformer(**geometry)
        params = reference_vit_to_flax(
            torch_state_dict, geometry["depth"],
            num_heads=geometry["num_heads"],
        )
    else:
        jm = fmodels.VisionTransformerMHLA(**geometry)
        params = reference_vit_mhla_to_flax(
            torch_state_dict, geometry["depth"], use_mhla=True,
            num_heads=geometry["num_heads"],
        )
    state = TrainState.create(
        apply_fn=jm.apply, params=params, tx=make_adamw(lr, weight_decay=wd)
    )
    train_step = make_train_step(geometry["img_size"], augment=False)
    eval_step = make_eval_step(geometry["img_size"])

    ones_mask = jnp.ones((batch,), jnp.float32)

    def eval_split(state, images, labels):
        tot_loss = tot_correct = tot = 0
        for i in range(0, (len(images) // batch) * batch, batch):
            m = eval_step(
                state, jnp.asarray(images[i : i + batch]),
                jnp.asarray(labels[i : i + batch]), ones_mask,
            )
            tot_loss += float(m["loss_sum"])
            tot_correct += int(m["correct"])
            tot += batch
        return tot_loss / tot, 100.0 * tot_correct / tot

    hist = []
    for ep, order in enumerate(epoch_orders):
        t0 = time.time()
        ep_loss = ep_correct = ep_n = 0
        for i in range(0, len(order), batch):
            idx = order[i : i + batch]
            state, m = train_step(
                state,
                jnp.asarray(data["train_images"][idx]),
                jnp.asarray(data["train_labels"][idx]),
                jax.random.PRNGKey(ep * 100003 + i),  # unused (no aug/dropout)
            )
            ep_loss += float(m["loss_sum"])
            ep_correct += int(m["correct"])
            ep_n += len(idx)
        vl, va = eval_split(state, data["test_images"], data["test_labels"])
        hist.append(dict(
            train_loss=ep_loss / ep_n, train_acc=100.0 * ep_correct / ep_n,
            val_loss=vl, val_acc=va, secs=time.time() - t0,
        ))
        print(f"  jax   ep{ep}: {hist[-1]}", flush=True)
    return hist


def run_torch(model_name, geometry, data, epoch_orders, batch, lr, wd,
              state_dict):
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    if model_name == "vit":
        from models.vit import VisionTransformer as TorchModel
    else:
        from models.vit_mhla import VisionTransformerMHLA as TorchModel
    tm = TorchModel(**geometry)
    tm.load_state_dict(state_dict)
    opt = torch.optim.AdamW(tm.parameters(), lr=lr, weight_decay=wd)
    crit = nn.CrossEntropyLoss()

    mean = torch.tensor([0.4914, 0.4822, 0.4465]).view(1, 3, 1, 1)
    std = torch.tensor([0.2470, 0.2435, 0.2616]).view(1, 3, 1, 1)

    def prep(u8_nhwc):
        x = torch.from_numpy(u8_nhwc).float().permute(0, 3, 1, 2) / 255.0
        return (x - mean) / std

    def eval_split(images, labels):
        tm.eval()
        tot_loss = tot_correct = tot = 0
        with torch.no_grad():
            for i in range(0, (len(images) // batch) * batch, batch):
                x = prep(images[i : i + batch])
                y = torch.from_numpy(
                    labels[i : i + batch].astype(np.int64)
                )
                out = tm(x)
                tot_loss += float(crit(out, y)) * batch
                tot_correct += int((out.argmax(1) == y).sum())
                tot += batch
        return tot_loss / tot, 100.0 * tot_correct / tot

    hist = []
    for ep, order in enumerate(epoch_orders):
        t0 = time.time()
        tm.train()
        ep_loss = ep_correct = ep_n = 0
        for i in range(0, len(order), batch):
            idx = order[i : i + batch]
            x = prep(data["train_images"][idx])
            y = torch.from_numpy(data["train_labels"][idx].astype(np.int64))
            opt.zero_grad()
            out = tm(x)
            loss = crit(out, y)
            loss.backward()
            opt.step()
            ep_loss += float(loss) * len(idx)
            ep_correct += int((out.argmax(1) == y).sum())
            ep_n += len(idx)
        vl, va = eval_split(data["test_images"], data["test_labels"])
        hist.append(dict(
            train_loss=ep_loss / ep_n, train_acc=100.0 * ep_correct / ep_n,
            val_loss=vl, val_acc=va, secs=time.time() - t0,
        ))
        print(f"  torch ep{ep}: {hist[-1]}", flush=True)
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n_train", type=int, default=2048)
    ap.add_argument("--n_test", type=int, default=512)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=0.05)
    ap.add_argument("--models", default="vit,vit_mhla")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "train_parity_torch_vs_jax.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch

    data, epoch_orders = build_batches(
        args.n_train, args.n_test, args.batch, args.epochs
    )

    results = {"config": vars(args)}
    for model_name in args.models.split(","):
        geometry = dict(
            img_size=32, patch_size=4, num_classes=10, embed_dim=64,
            depth=args.depth, num_heads=4, mlp_ratio=4.0,
            dropout=0.0, attn_dropout=0.0, embed_dropout=0.0,
        )
        if model_name == "vit_mhla":
            geometry["window_size"] = 7
            geometry["use_mhla"] = True

        torch.manual_seed(0)
        if model_name == "vit":
            from models.vit import VisionTransformer as TorchModel
        else:
            from models.vit_mhla import VisionTransformerMHLA as TorchModel
        sd = TorchModel(**geometry).state_dict()

        print(f"== {model_name} (torch)", flush=True)
        th = run_torch(model_name, geometry, data, epoch_orders,
                       args.batch, args.lr, args.wd, sd)
        print(f"== {model_name} (jax)", flush=True)
        jh = run_jax(model_name, geometry, data, epoch_orders,
                     args.batch, args.lr, args.wd, sd)
        results[model_name] = {"torch": th, "jax": jh}

        print(f"\n== {model_name}: per-epoch deltas (jax - torch)")
        for ep, (t, j) in enumerate(zip(th, jh)):
            print(
                f"  ep{ep}: dtrain_loss={j['train_loss']-t['train_loss']:+.4f}"
                f" dval_loss={j['val_loss']-t['val_loss']:+.4f}"
                f" dtrain_acc={j['train_acc']-t['train_acc']:+.2f}"
                f" dval_acc={j['val_acc']-t['val_acc']:+.2f}"
            )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
