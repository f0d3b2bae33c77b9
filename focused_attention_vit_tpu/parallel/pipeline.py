"""Pipeline parallelism (PP): GPipe-style SPMD pipeline over a 'stage' axis.

The reference is single-device (SURVEY.md §2.4 — no parallelism of any
kind); this is the TPU-native depth-scaling layer: the stacked per-layer
parameters (the ``scan_layers`` form, models/layers.scanned_blocks) are
sharded over a ``stage`` mesh axis — each stage holds ``depth/n_stages``
consecutive transformer blocks — and activations flow through the stages
as rotating microbatches.

Schedule (classic GPipe fill–drain, expressed as ONE ``lax.scan`` inside
``shard_map`` so XLA sees a static program):

  tick t ∈ [0, M + n - 1):
    stage 0 ingests microbatch t (while t < M);
    every stage applies its local blocks (a ``lax.scan`` over its
    ``depth/n`` layers) to its current activation;
    the last stage records the finished microbatch ``t - (n-1)``;
    activations rotate one stage to the right by ``ppermute``.

All stages execute the same program every tick (SPMD — the fill/drain
"bubbles" compute on garbage and are masked out by ``where``), so the
whole pipeline is one compiled region; the backward pass flows through
the ``ppermute``/``psum`` transposes automatically, giving the reverse
(drain–fill) pipeline without any hand-written schedule. Bubble fraction
is the usual (n-1)/(M+n-1) — pick ``microbatches ≥ 4·n_stages`` to
amortize.

Communication per tick: one microbatch activation per stage boundary over
ICI ('stage' is laid out innermost on the mesh — nearest-neighbour links).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stage_sharding_rules(params_stacked, mesh: Mesh, axis: str = "stage"):
    """PartitionSpec pytree sharding the leading (depth) axis over ``axis``.

    Apply to the scan-form block params (leaves ``[depth, ...]``) so each
    stage holds only its own layers' weights (true PP memory scaling, not
    replication)."""

    def spec(leaf):
        nd = leaf.ndim if hasattr(leaf, "ndim") else 0
        return P(axis, *([None] * (nd - 1))) if nd else P()

    return jax.tree.map(spec, params_stacked)


def _pipe_local(
    x_mb: jnp.ndarray,
    params_local,
    dropout_key: Optional[jnp.ndarray],
    *,
    apply_block: Callable,
    n_stages: int,
    n_micro: int,
    axis: str,
) -> jnp.ndarray:
    """Per-stage pipeline body (inside shard_map).

    ``x_mb``: all microbatches ``[M, mb, S, D]`` (replicated — only stage 0
    reads them). ``params_local``: this stage's layers, leaves
    ``[depth/n, ...]``. Returns the full output ``[M, mb, S, D]``
    (replicated via a masked psum from the last stage).
    """
    n, m = n_stages, n_micro
    stage = jax.lax.axis_index(axis)
    layers_per_stage = jax.tree.leaves(params_local)[0].shape[0]

    def apply_stage(x, key):
        def layer(carry, sl):
            p, i = sl
            k = None if key is None else jax.random.fold_in(key, i)
            return apply_block(p, carry, k), None

        idx = stage * layers_per_stage + jnp.arange(layers_per_stage)
        out, _ = jax.lax.scan(layer, x, (params_local, idx))
        return out

    # Initial carries are constants but become stage-varying inside the
    # loop (ppermute / stage-masked updates) — mark them varying up front
    # so the scan carry types are stable.
    state0 = jax.lax.pcast(jnp.zeros_like(x_mb[0]), axis, to="varying")
    outputs0 = jax.lax.pcast(jnp.zeros_like(x_mb), axis, to="varying")

    def tick(carry, t):
        state, outputs = carry
        # Stage 0 ingests microbatch t (garbage after the fill phase —
        # masked out because the last stage only records valid ticks).
        inp = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, m - 1), 0, keepdims=False
        )
        state = jnp.where(stage == 0, inp, state)
        key = (
            None
            if dropout_key is None
            else jax.random.fold_in(
                jax.random.fold_in(dropout_key, t), stage
            )
        )
        state = apply_stage(state, key)
        out_t = t - (n - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            outputs, state, jnp.clip(out_t, 0, m - 1), 0
        )
        outputs = jnp.where((stage == n - 1) & (out_t >= 0), upd, outputs)
        if n > 1:
            state = jax.lax.ppermute(
                state, axis, [(i, (i + 1) % n) for i in range(n)]
            )
        return (state, outputs), None

    (_, outputs), _ = jax.lax.scan(
        tick, (state0, outputs0), jnp.arange(m + n - 1)
    )
    # Valid outputs live on the last stage only (zeros elsewhere) —
    # replicate with one psum.
    return jax.lax.psum(
        jnp.where(stage == n - 1, outputs, jnp.zeros_like(outputs)), axis
    )


def spmd_pipeline(
    apply_block: Callable,
    params_stacked,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "stage",
    microbatches: Optional[int] = None,
    dropout_key: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run ``depth`` stacked layers over ``x`` as an SPMD pipeline.

    Args:
      apply_block: ``(layer_params, x, dropout_key_or_None) -> x`` pure
        per-layer function (e.g. a bound Flax block ``.apply``).
      params_stacked: pytree with leading depth axis on every leaf (the
        ``scan_layers`` parameter form); depth must divide by the stage
        count. May arrive sharded over ``axis`` (stage_sharding_rules).
      x: ``[B, S, D]`` activations; B must divide by ``microbatches``.
      microbatches: number of pipeline microbatches (default: stage count;
        more microbatches → smaller bubble fraction (n-1)/(M+n-1)).

    Returns ``[B, S, D]``, numerically identical to applying the layers
    sequentially (same microbatch decomposition — batch-independent
    layers make the split exact).
    """
    n = mesh.shape[axis]
    depth = jax.tree.leaves(params_stacked)[0].shape[0]
    if depth % n:
        raise ValueError(f"depth={depth} must divide by {n} pipeline stages")
    m = microbatches or n
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch={b} must divide by {m} microbatches")

    x_mb = x.reshape(m, b // m, *x.shape[1:])
    local = partial(
        _pipe_local,
        apply_block=apply_block,
        n_stages=n,
        n_micro=m,
        axis=axis,
    )
    pspec = stage_sharding_rules(params_stacked, mesh, axis)
    if dropout_key is not None:
        f = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), pspec, P()),
            out_specs=P(),
            axis_names={axis},
        )
        out = f(x_mb, params_stacked, dropout_key)
    else:
        f = jax.shard_map(
            lambda xm, p: local(xm, p, None),
            mesh=mesh,
            in_specs=(P(), pspec),
            out_specs=P(),
            axis_names={axis},
        )
        out = f(x_mb, params_stacked)
    return out.reshape(b, *x.shape[1:])
