"""Training infrastructure: TrainState, jitted steps, loops, checkpoints."""

from focused_attention_vit_tpu.train.state import (
    TrainState,
    create_train_state,
    make_adamw,
    make_grouped_optimizer,
)
from focused_attention_vit_tpu.train.steps import (
    make_train_step,
    make_eval_step,
)
from focused_attention_vit_tpu.train.loop import train_and_evaluate, evaluate
from focused_attention_vit_tpu.train.metrics import (
    accuracy_from_logits,
    confusion_matrix,
    auc_ovr,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_adamw",
    "make_grouped_optimizer",
    "make_train_step",
    "make_eval_step",
    "train_and_evaluate",
    "evaluate",
    "accuracy_from_logits",
    "confusion_matrix",
    "auc_ovr",
]
