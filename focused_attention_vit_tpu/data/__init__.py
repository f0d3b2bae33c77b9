"""Data pipeline: dataset loading + on-device augmentation.

The reference uses torchvision CIFAR10 + PIL-based host-side transforms in
DataLoader workers (utils/data_utils.py:21-156). TPU rebuild: datasets are
held in host RAM as uint8 arrays; batches cross to the device as raw uint8
(16× smaller than f32 at 224²) and the *entire* augmentation chain — pad,
random crop, horizontal flip, resize, normalize — runs inside the jitted
train step on the VPU, fused with the forward pass.
"""

from focused_attention_vit_tpu.data.datasets import (
    load_cifar10,
    load_cifar100,
    load_dataset,
    CIFAR10_CLASS_NAMES,
)
from focused_attention_vit_tpu.data.imagenet import (
    load_imagenet_subset,
    get_sample_batch,
)
from focused_attention_vit_tpu.data.pipeline import (
    augment_train_batch,
    prepare_eval_batch,
    batch_iterator,
    padded_eval_batches,
    CIFAR10_MEAN,
    CIFAR10_STD,
)

__all__ = [
    "load_cifar10",
    "load_cifar100",
    "load_dataset",
    "load_imagenet_subset",
    "get_sample_batch",
    "CIFAR10_CLASS_NAMES",
    "augment_train_batch",
    "prepare_eval_batch",
    "batch_iterator",
    "padded_eval_batches",
    "CIFAR10_MEAN",
    "CIFAR10_STD",
]
