"""TrainState construction and optimizer factories.

The reference trains with ``optim.AdamW(lr, weight_decay)`` + CE
(experiments/traditional.py:152-157). The pretrained experiments add
parameter groups with distinct learning rates and freezing:

* traditional_pretrained — body lr vs head lr
  (experiments/traditional_pretrained.py:196-209);
* mhla_pretrained — body 1×, latent_proj 5×, head
  (experiments/mhla_pretrained.py:319-327);
* sppp_mhla_pretrained — 4 groups incl. 2× "SPPP components"
  (experiments/sppp_mhla_pretrained.py:348-362);
* optional freeze-all-but-(head, latent_proj)
  (experiments/mhla_pretrained.py:237-247).

TPU-native equivalent: one ``optax.multi_transform`` over a label pytree —
labels select per-group AdamW instances; frozen params get
``optax.set_to_zero``. Functionally identical, but a single fused update
under jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Standard Flax TrainState (params/opt-state/apply_fn/step)."""


def make_adamw(learning_rate: float, weight_decay: float = 0.05):
    return optax.adamw(learning_rate=learning_rate, weight_decay=weight_decay)


def make_grouped_optimizer(
    params: Mapping[str, Any],
    label_fn: Callable[[str], str],
    group_lrs: Dict[str, float],
    weight_decay: float = 0.05,
    frozen_label: str = "frozen",
) -> optax.GradientTransformation:
    """Per-group AdamW via optax.multi_transform.

    Args:
      params: the model parameter pytree.
      label_fn: maps a top-level-joined parameter path (e.g.
        ``"blocks_3/attn/latent_proj/kernel"``) to a group label.
      group_lrs: label → learning rate. Labels not present map to
        ``frozen_label`` and receive no updates.
    """
    labels = _path_labels(params, label_fn)
    transforms = {
        name: make_adamw(lr, weight_decay) for name, lr in group_lrs.items()
    }
    transforms[frozen_label] = optax.set_to_zero()
    return optax.multi_transform(transforms, labels)


def _path_labels(params: Mapping[str, Any], label_fn: Callable[[str], str]):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
        return "/".join(parts)

    label_tree = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [label_fn(path_str(path)) for path, _ in flat],
    )
    return label_tree


def create_train_state(
    model,
    rng: jax.Array,
    sample_input,
    tx: optax.GradientTransformation,
    params: Mapping[str, Any] | None = None,
) -> TrainState:
    """Initialize (or adopt converted) params and build the TrainState."""
    if params is None:
        variables = model.init(rng, sample_input)
        params = variables["params"]
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
