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

from typing import Any, Callable, Dict, Mapping, Optional, Union

import jax
import optax
from flax.training import train_state

# float base LR or an optax schedule (step -> lr)
LRLike = Union[float, Callable[[Any], Any]]


class TrainState(train_state.TrainState):
    """Standard Flax TrainState (params/opt-state/apply_fn/step)."""


def make_lr_schedule(
    base_lr: float,
    kind: str = "constant",
    total_steps: int = 0,
    warmup_steps: int = 0,
) -> LRLike:
    """Learning-rate schedule factory (TPU extension — the reference
    trains at a constant LR, experiments/traditional.py:152-157).

    kind='constant' with warmup_steps=0 returns the bare float so the
    optimizer stays bit-identical to the reference protocol; any schedule
    is an optax step->lr callable evaluated inside the jitted update.
    """
    if kind not in ("constant", "cosine"):
        raise ValueError(f"unknown lr schedule '{kind}'")
    warmup_steps = int(warmup_steps)
    if kind == "constant":
        if warmup_steps <= 0:
            return base_lr
        return optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, base_lr, warmup_steps),
                optax.schedules.constant_schedule(base_lr),
            ],
            boundaries=[warmup_steps],
        )
    if total_steps <= warmup_steps:
        raise ValueError(
            f"cosine schedule needs total_steps ({total_steps}) > "
            f"warmup_steps ({warmup_steps})"
        )
    return optax.schedules.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=0.0,
    )


def _check_clip(grad_clip_norm: Optional[float]) -> Optional[float]:
    if grad_clip_norm is not None and grad_clip_norm <= 0:
        raise ValueError(
            f"grad_clip_norm must be > 0 (got {grad_clip_norm}); omit the "
            "flag to disable clipping"
        )
    return grad_clip_norm


def make_adamw(
    learning_rate: LRLike,
    weight_decay: float = 0.05,
    grad_clip_norm: Optional[float] = None,
    mu_dtype=None,
):
    """AdamW (reference protocol: experiments/traditional.py:152-157).

    ``mu_dtype`` (TPU extension, optax-native): dtype of the FIRST moment
    — ``jnp.bfloat16`` halves its memory. The second moment stays f32:
    bf16's 7 mantissa bits round small squared-gradient accumulations to
    zero (its exponent range equals f32's — the loss is precision, not
    range), which distorts the per-parameter 1/sqrt(nu) scale. Composes
    with FSDP: the bf16 moment leaves shard over 'data' like any other.
    """
    tx = optax.adamw(
        learning_rate=learning_rate, weight_decay=weight_decay,
        mu_dtype=mu_dtype,
    )
    if _check_clip(grad_clip_norm) is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def make_grouped_optimizer(
    params: Mapping[str, Any],
    label_fn: Callable[[str], str],
    group_lrs: Dict[str, LRLike],
    weight_decay: float = 0.05,
    frozen_label: str = "frozen",
    grad_clip_norm: Optional[float] = None,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """Per-group AdamW via optax.multi_transform.

    Args:
      params: the model parameter pytree.
      label_fn: maps a top-level-joined parameter path (e.g.
        ``"blocks_3/attn/latent_proj/kernel"``) to a group label.
      group_lrs: label → learning rate (float or optax schedule). Labels
        not present map to ``frozen_label`` and receive no updates.
      grad_clip_norm: optional global-norm clip. Applied OUTSIDE the
        multi_transform (before group routing) so the norm spans every
        TRAINABLE group at once — frozen parameters are zeroed first, so
        gradients that update nothing cannot inflate the norm and crush
        the head's updates (the whole point of freezing a ViT-B backbone).
    """
    labels = _path_labels(params, label_fn)
    transforms = {
        name: make_adamw(lr, weight_decay, mu_dtype=mu_dtype)
        for name, lr in group_lrs.items()
    }
    transforms[frozen_label] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, labels)
    if _check_clip(grad_clip_norm) is not None:
        is_frozen = jax.tree.map(lambda lab: lab == frozen_label, labels)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), is_frozen),
            optax.clip_by_global_norm(grad_clip_norm),
            tx,
        )
    return tx


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
