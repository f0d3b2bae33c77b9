"""SLIC superpixel segmentation as a fixed-shape TPU op.

The reference calls ``skimage.segmentation.slic`` per image on the host,
crossing the device boundary twice per image (reference:
models/sppp.py:44-74). That is the dominant cost of the SPPP pipeline and is
impossible under jit. This rebuild re-derives SLIC as what it fundamentally
is — a grid-seeded, locally-constrained k-means in (color, x, y) space — with
a *fixed* iteration count and *fixed* shapes so the whole SPPP model compiles
into one XLA program.

Faithfulness notes (SURVEY.md §7 hard part 1):

* seeds are placed on a regular grid like skimage's SLIC;
* a Gaussian pre-smoothing with the same ``sigma`` parameter is applied
  (reference passes ``sigma=1.0``, models/sppp.py:64-65);
* the distance metric is the standard SLIC metric
  ``d² = d_color² + (m/S)² · d_xy²`` with compactness m and grid interval S
  (the reference forwards ``compactness`` straight to skimage);
* the per-pixel assignment searches *all* R centroids rather than the 2S×2S
  neighbourhood — with R = 16 segments that is a [H·W, R] distance matrix,
  cheaper on TPU than irregular neighbourhood gathers, and a strict superset
  of the neighbourhood search;
* skimage's final connectivity enforcement IS implemented, as a
  four-mode subsystem (``--slic_connectivity = auto|on|off|host``, see
  :func:`slic_segment`): ``host`` runs the C++ union-find relabeller
  (native/connectivity.cpp) via a pure_callback — pixel-exact vs skimage on
  5/6 of the 224² golden images, 0.998 mean patch-dominant agreement
  (tests/fixtures/slic_golden_224.npz); ``on`` forces the in-jit
  device relabel+merge pass (agreement 0.831 at 224², golden-exact at
  ≤64²); ``off`` skips enforcement (0.662 at 224² — measured to matter,
  which is why omission is NOT the default). ``auto`` picks the device
  pass at ≤64² pixels, the host kernel above that on runtimes where
  callbacks work, and falls back to off (with the measured cost in the
  warning text) only under the axon tunnel where host callbacks cannot
  cross.

skimage converts RGB inputs to CIELAB before clustering; the reference feeds
it *normalized* tensors (mean/std-standardized, not in [0, 1]), for which LAB
is ill-defined anyway — this implementation clusters in the image's own
channel space scaled to a comparable dynamic range.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# "auto" connectivity threshold: enforce up to this many pixels (64²
# covers CIFAR-native inputs; above it the fragment scatters dominate the
# whole SPPP pipeline — see slic_segment's docstring).
AUTO_CONNECTIVITY_MAX_PIXELS = 64 * 64

_warned_auto_off = False


def _callbacks_supported(backend: str | None = None,
                         platforms: str | None = None) -> bool:
    """Whether the active backend can run host send/recv callbacks.

    The axon PJRT tunnel rejects them (UNIMPLEMENTED) but registers its
    devices as plain ``'tpu'``, so ``jax.default_backend()`` alone cannot
    identify it — detect the plugin via the platform registration string
    (``jax.config.jax_platforms``, set to ``'axon,cpu'`` by that
    environment's sitecustomize, falling back to ``$JAX_PLATFORMS``).
    Args exist for unit testing; production calls pass nothing.
    """
    backend = backend or jax.default_backend()
    if backend == "cpu":
        return True
    if platforms is None:
        platforms = jax.config.jax_platforms or os.environ.get(
            "JAX_PLATFORMS", ""
        )
    return "axon" not in (platforms or "")


def _warn_auto_connectivity_off(h: int, w: int) -> None:
    """One-time visibility for the auto connectivity-off decision, so the
    deviation from skimage's default semantics shows up in experiment logs,
    not only in docs (skimage enforce_connectivity defaults to True, which
    the reference inherits at /root/reference/models/sppp.py:64-65)."""
    global _warned_auto_off
    if _warned_auto_off:
        return
    _warned_auto_off = True
    import warnings

    warnings.warn(
        f"SLIC enforce_connectivity='auto' resolved to OFF at {h}x{w} "
        f"(> {AUTO_CONNECTIVITY_MAX_PIXELS} px): the skimage-default "
        "connectivity relabel/merge step is skipped for speed. Measured "
        "cost at 224²/R=16 vs the committed skimage golden: patch-"
        "dominant agreement 0.66 (host-C++ enforcement is 1.00/exact, "
        "device enforcement 0.83 — BASELINE.md '224² connectivity'). "
        "Pass enforce_connectivity=True (CLI: --slic_connectivity on) "
        "for on-device fidelity, or 'host' on a backend with host-"
        "callback support (any real TPU runtime; the axon dev tunnel "
        "is the exception) for exact skimage semantics at ~0.7 ms/img.",
        stacklevel=3,
    )


def _gaussian_kernel1d(sigma: float) -> np.ndarray:
    # scipy.ndimage.gaussian_filter truncates at 4σ — match it so the
    # pre-smoothing is numerically the oracle's (tools/slic_numpy.py).
    radius = max(1, int(4.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur on ``[H, W, C]`` (scipy 'reflect' edges)."""
    if sigma <= 0:
        return image
    k = jnp.asarray(_gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2

    def conv_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, r)
        # scipy's default mode 'reflect' duplicates the edge sample
        # (a b c → b a | a b c | c b), i.e. jnp.pad mode='symmetric'.
        xp = jnp.pad(x, pad, mode="symmetric")
        # Sliding windows via stacked shifts (kernel is tiny: ~7 taps).
        out = jnp.zeros_like(x)
        for t in range(k.shape[0]):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(t, t + x.shape[axis])
            out = out + k[t] * xp[tuple(sl)]
        return out

    out = conv_axis(image.astype(jnp.float32), 0)
    out = conv_axis(out, 1)
    return out.astype(image.dtype)


def _grid_seeds(h: int, w: int, num_segments: int) -> np.ndarray:
    """Regular-grid seed coordinates ``[R, 2]`` (y, x), like SLIC.

    skimage seeds sit on an isotropic grid with step
    ``round(sqrt(h·w/R))`` starting at ``step//2``
    (``skimage.util.regular_grid``); the cell count that grid yields can
    differ from the R requested, in which case skimage just returns a
    different number of segments. This framework's SPPP stack is
    static-shape (exactly R segment slots — models/sppp_common.py), so:

    - whenever the skimage grid yields EXACTLY R seeds, use it — the
      k-means core is then bit-compatible with skimage/the oracle
      (tests/test_ops.py TestSLICFuzz). All production geometries land
      here (32²/224² at the R=16 default: identical seeds either way).
    - otherwise fall back to an aspect-matched grid of exactly R cell
      centers — a documented deviation in exchange for the fixed R the
      on-device pipeline requires (the oracle itself would return ≠R
      segments for these geometries, so "bit-exact" has no referent).
    """
    step = max(1, int(round(np.sqrt(h * w / num_segments))))
    ys = np.arange(step // 2, h, step, dtype=np.float32)
    xs = np.arange(step // 2, w, step, dtype=np.float32)
    if len(ys) * len(xs) == num_segments:
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        return np.stack(
            [yy.reshape(-1), xx.reshape(-1)], axis=-1
        ).astype(np.float32)
    # Fallback: aspect-matched grid with exactly num_segments cells.
    gh = max(1, int(round(np.sqrt(num_segments * h / w))))
    gw = int(np.ceil(num_segments / gh))
    while gh * gw < num_segments:
        gw += 1
    ys = (np.arange(gh) + 0.5) * (h / gh)
    xs = (np.arange(gw) + 0.5) * (w / gw)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    seeds = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
    return seeds[:num_segments].astype(np.float32)


@partial(
    jax.jit, static_argnames=("num_segments", "n_iter", "enforce_connectivity")
)
def _slic_single(
    image: jnp.ndarray,
    num_segments: int,
    compactness: float,
    n_iter: int,
    enforce_connectivity: bool = True,
) -> jnp.ndarray:
    h, w, c = image.shape
    img = image.astype(jnp.float32)

    # Spatial grid, in pixels.
    ygrid = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None], (h, w)
    ).reshape(-1)
    xgrid = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32)[None, :], (h, w)
    ).reshape(-1)
    feats = img.reshape(-1, c)  # [P, C]
    p = h * w

    # Grid interval S and the SLIC spatial weight (m/S)².
    interval = float(np.sqrt(h * w / num_segments))
    spatial_w = (compactness / interval) ** 2
    # skimage's assignment only searches a ±2S window around each centroid
    # (_slic.pyx: y in [int(cy - 2·step), int(cy + 2·step)]). Emulated here
    # by masking the dense [P, R] distance matrix — same assignment, but a
    # TPU-friendly regular computation instead of irregular gathers.
    step_px = float(max(1, int(round(interval))))

    seeds = jnp.asarray(_grid_seeds(h, w, num_segments))  # [R, 2] (y, x)
    seed_yx = seeds
    # Initialize centroid colors by bilinear-free nearest sampling.
    sy = jnp.clip(seed_yx[:, 0].astype(jnp.int32), 0, h - 1)
    sx = jnp.clip(seed_yx[:, 1].astype(jnp.int32), 0, w - 1)
    c_color = img[sy, sx, :]  # [R, C]
    c_pos = seed_yx  # [R, 2]

    def distances(c_color, c_pos):
        """Masked [P, R] SLIC distances + the unmasked fallback."""
        d_color = (
            jnp.sum(feats**2, -1, keepdims=True)
            - 2.0 * feats @ c_color.T
            + jnp.sum(c_color**2, -1)[None, :]
        )
        dy = ygrid[:, None] - c_pos[None, :, 0]
        dx = xgrid[:, None] - c_pos[None, :, 1]
        d = d_color + spatial_w * (dy * dy + dx * dx)
        # int() truncation bounds, as in skimage's window arithmetic.
        lo_y = jnp.trunc(c_pos[None, :, 0] - 2.0 * step_px)
        hi_y = jnp.trunc(c_pos[None, :, 0] + 2.0 * step_px)
        lo_x = jnp.trunc(c_pos[None, :, 1] - 2.0 * step_px)
        hi_x = jnp.trunc(c_pos[None, :, 1] + 2.0 * step_px)
        in_win = (
            (ygrid[:, None] >= lo_y)
            & (ygrid[:, None] <= hi_y)
            & (xgrid[:, None] >= lo_x)
            & (xgrid[:, None] <= hi_x)
        )
        return jnp.where(in_win, d, jnp.inf), d

    def assign(c_color, c_pos):
        d_masked, d_full = distances(c_color, c_pos)
        # Pixels covered by no window (possible once centroids drift) fall
        # back to the nearest centroid unrestricted, as skimage guarantees
        # every pixel ends up labelled.
        covered = jnp.isfinite(jnp.min(d_masked, axis=-1))
        return jnp.where(
            covered, jnp.argmin(d_masked, axis=-1), jnp.argmin(d_full, axis=-1)
        )

    def step(_, carry):
        c_color, c_pos = carry
        # In-loop, match skimage exactly: uncovered pixels stay unlabelled
        # and contribute nothing to the centroid update (no fallback argmin
        # here — it exists only in the final assignment).
        d_masked, _ = distances(c_color, c_pos)
        d_min = jnp.min(d_masked, axis=-1)
        labels = jnp.argmin(d_masked, axis=-1)  # [P]
        onehot = jax.nn.one_hot(labels, num_segments, dtype=jnp.float32)
        onehot = onehot * jnp.isfinite(d_min)[:, None]
        raw_counts = onehot.sum(0)  # [R]
        counts = jnp.maximum(raw_counts, 1.0)
        new_color = (onehot.T @ feats) / counts[:, None]
        new_y = (onehot.T @ ygrid) / counts
        new_x = (onehot.T @ xgrid) / counts
        new_pos = jnp.stack([new_y, new_x], axis=-1)
        # A cluster that captured zero pixels keeps its previous centroid
        # (skimage: `if not mask.any(): continue`); without this guard the
        # clamped division would collapse it to position (0,0) / color 0.
        has = raw_counts > 0.0
        new_color = jnp.where(has[:, None], new_color, c_color)
        new_pos = jnp.where(has[:, None], new_pos, c_pos)
        return new_color, new_pos

    # skimage runs `assign → update` n_iter times and keeps the labels of the
    # *last assignment* — i.e. the final labels see n_iter-1 centroid
    # updates, not n_iter (segmentation/_slic.pyx main loop).
    c_color, c_pos = jax.lax.fori_loop(
        0, max(0, n_iter - 1), step, (c_color, c_pos)
    )
    labels = assign(c_color, c_pos)
    labels = labels.reshape(h, w).astype(jnp.int32)
    if enforce_connectivity:
        labels = _enforce_connectivity(labels, num_segments)
    return labels


def _seg_min_scan(comp: jnp.ndarray, seg: jnp.ndarray, axis: int, reverse: bool):
    """Min-propagate component ids along ``axis`` within runs of equal
    ``seg`` label (a segmented min-scan — one associative_scan, log-depth)."""

    def op(a, b):
        s1, v1 = a
        s2, v2 = b
        return s1 & s2, jnp.where(s2, jnp.minimum(v1, v2), v2)

    if reverse:
        comp = jnp.flip(comp, axis)
        seg = jnp.flip(seg, axis)
    same = seg == jnp.roll(seg, 1, axis=axis)
    idx = jnp.arange(seg.shape[axis])
    first = jnp.expand_dims(idx == 0, axis=1 - axis)
    same = same & ~first  # run starts fresh at index 0
    _, v = jax.lax.associative_scan(op, (same, comp), axis=axis)
    if reverse:
        v = jnp.flip(v, axis)
    return v


def _connected_components(seg: jnp.ndarray) -> jnp.ndarray:
    """4-connected components of an int label map.

    Returns [H, W] int32 component ids = min flat pixel index in the
    component (so ids order by scan-order discovery, like skimage's BFS).
    Fixpoint of alternating row/column segmented min-scans — each sweep is
    4 log-depth scans, so convergence needs one sweep per "bend" of the
    most serpentine component instead of one shift per pixel of its
    diameter.
    """
    h, w = seg.shape
    init = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)

    def sweep(comp):
        comp = _seg_min_scan(comp, seg, axis=1, reverse=False)
        comp = _seg_min_scan(comp, seg, axis=1, reverse=True)
        comp = _seg_min_scan(comp, seg, axis=0, reverse=False)
        comp = _seg_min_scan(comp, seg, axis=0, reverse=True)
        return comp

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        comp, _ = carry
        new = sweep(comp)
        return new, jnp.any(new != comp)

    comp, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    return comp


def _adjacent_component(comp: jnp.ndarray, big: int) -> jnp.ndarray:
    """Per-component min id of any 4-adjacent different component ([P])."""
    h, w = comp.shape

    def shifted(dy, dx):
        out = jnp.full((h, w), big, jnp.int32)
        src = comp[
            max(0, -dy) : h - max(0, dy), max(0, -dx) : w - max(0, dx)
        ]
        return out.at[
            max(0, dy) : h - max(0, -dy), max(0, dx) : w - max(0, -dx)
        ].set(src)

    cand = jnp.full((h, w), big, jnp.int32)
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        nb = shifted(dy, dx)
        cand = jnp.minimum(cand, jnp.where(nb != comp, nb, big))
    return jax.ops.segment_min(
        cand.reshape(-1), comp.reshape(-1), num_segments=big
    )


# skimage's default min_size_factor (segmentation/_slic.pyx): components
# smaller than this fraction of the mean segment size get merged. Shared
# by the device path (_enforce_connectivity) and the host C++ kernel so
# the two enforcement paths apply the same threshold.
MIN_SIZE_FACTOR = 0.5


def _enforce_connectivity(
    seg: jnp.ndarray, num_segments: int, min_size_factor: float = MIN_SIZE_FACTOR
) -> jnp.ndarray:
    """skimage-style connectivity enforcement, on device, static shapes.

    skimage relabels 4-connected components sequentially and merges
    components smaller than ``min_size_factor · (H·W/R)`` into an adjacent
    one (segmentation/_slic.pyx semantics; the reference relies on it via
    skimage defaults, /root/reference/models/sppp.py:64-65). The output must
    stay in ``[0, num_segments)`` for the static-shape SPPP pipeline, so
    when more than R components survive merging, the smallest are merged
    into a neighbour until exactly ≤ R remain, then ids are densely ranked
    in scan order (skimage's label order).
    """
    h, w = seg.shape
    p = h * w
    big = p
    min_size = int(round(min_size_factor * (h * w / num_segments)))

    comp = _connected_components(seg)

    def sizes_of(comp):
        return (
            jnp.zeros(p, jnp.int32).at[comp.reshape(-1)].add(1, mode="drop")
        )

    # Merge-small passes (parallel analogue of skimage's cascading scan-order
    # merges; pointer-jumping inside each pass resolves chains). Early-exit
    # while: each [p]-table gather costs ~65 ms at 224² b128 (xplane,
    # round 3), so passes that would be no-ops must not run.
    ids0 = jnp.arange(p, dtype=jnp.int32)

    def merge_cond(carry):
        i, comp, changed = carry
        return (i < 4) & changed

    def merge_body(carry):
        i, comp, _ = carry
        sizes = sizes_of(comp)
        adj = _adjacent_component(comp, big)
        small = (sizes > 0) & (sizes < min_size) & (adj < big)
        mapping = jnp.where(small, adj.astype(jnp.int32), ids0)
        mapping = mapping[mapping]
        mapping = mapping[mapping]
        return i + 1, mapping[comp], small.any()

    _, comp, _ = jax.lax.while_loop(
        merge_cond, merge_body, (jnp.int32(0), comp, jnp.bool_(True))
    )

    # Reduce to ≤ R components — BATCHED: each pass keeps the R largest
    # live components (strict (size, smaller-id-wins) ranking) and merges
    # every other component into its min-id 4-adjacent neighbour in one
    # shot. A small component may merge into a kept one freely; among
    # small components only "downhill" (target id < own id) merges are
    # allowed, so merge chains are acyclic and pointer jumping resolves
    # them in log steps. The largest-id small component always has a legal
    # target (its min-adjacent is either kept or smaller-id), so every
    # pass strictly reduces the live count — ~log passes total instead of
    # the one-merge-per-iteration loop that made connectivity cost 190×
    # the SPPP pipeline at 224² (VERDICT round-2 task 5).
    def count_of(comp):
        rep = jnp.zeros(p, jnp.int32).at[comp.reshape(-1)].set(1, mode="drop")
        return rep.sum()

    ids = jnp.arange(p, dtype=jnp.int32)

    def reduce_cond(comp):
        return count_of(comp) > num_segments

    def reduce_body(comp):
        sizes = sizes_of(comp)
        live = sizes > 0
        # Keep the R largest live components; among equal sizes the
        # smaller representative id wins. Two-stage exact selection in
        # int32 — a combined key `sizes*(p+1) + (p-ids)` overflows int32
        # at 224² (p=50176, and x64 is disabled on this stack), which
        # silently corrupted the ranking above the golden-test geometry.
        szl = jnp.where(live, sizes, -1)
        kth_size = jax.lax.top_k(szl, num_segments)[0][num_segments - 1]
        above = live & (sizes > kth_size)
        slots = num_segments - above.sum()  # ties at kth_size to fill
        eq = live & (sizes == kth_size)
        neg_ids = jnp.where(eq, -ids, -(p + 1))
        eq_ids_sorted = -jax.lax.top_k(neg_ids, num_segments)[0]  # ascending
        thr_idx = jnp.clip(slots - 1, 0, num_segments - 1)
        thr = jax.lax.dynamic_index_in_dim(
            eq_ids_sorted, thr_idx, keepdims=False
        )
        keep = above | (eq & (slots > 0) & (ids <= thr))
        adj = _adjacent_component(comp, big)
        has_adj = adj < big
        target = adj.astype(jnp.int32)
        allowed = has_adj & (keep[jnp.clip(target, 0, p - 1)] | (target < ids))
        mapping = jnp.where(live & ~keep & allowed, target, ids)
        # 2^6-deep chain resolution: each [p]-table gather costs ~65 ms at
        # 224² b128 (xplane, round 3), so the former 17 jumps (~1.1 s per
        # pass) are the dominant cost. Merge chains deeper than 64 are
        # practically nonexistent, and any chain left unresolved simply
        # keeps count > R so the enclosing while runs one more (cheap)
        # pass — correctness is unaffected.
        for _ in range(6):
            mapping = mapping[mapping]
        return mapping[comp]

    comp = jax.lax.while_loop(reduce_cond, reduce_body, comp)

    # Dense ranks in scan order (component id = min flat index).
    rep = jnp.zeros(p, jnp.int32).at[comp.reshape(-1)].set(1, mode="drop")
    rank = jnp.cumsum(rep) - 1
    return jnp.minimum(rank[comp], num_segments - 1).astype(jnp.int32)


def slic_segment(
    images: jnp.ndarray,
    num_segments: int = 16,
    compactness: float = 0.1,
    sigma: float = 1.0,
    n_iter: int = 10,
    enforce_connectivity: "bool | str" = "auto",
) -> jnp.ndarray:
    """SLIC-style superpixel segmentation, fully on device.

    Args:
      images: ``[B, H, W, C]`` or ``[H, W, C]`` float image(s) — any
        standardization; clustering runs in the image's channel space.
      num_segments: number of superpixels R (static).
      compactness: SLIC compactness m (reference default 0.1,
        models/sppp.py:31).
      sigma: Gaussian pre-smoothing width (reference passes 1.0).
      n_iter: fixed k-means iteration count.
      enforce_connectivity: skimage-style component relabel + small-segment
        merging (skimage default True, which the reference inherits).
        ``"auto"`` (default) enforces it on device for images up to
        ``AUTO_CONNECTIVITY_MAX_PIXELS`` (CIFAR-native scales, where the
        skimage-golden agreement tests run); above that it routes to the
        exact host C++ kernel (``native/connectivity.cpp``, ~0.7 ms/img
        under the step via ``pure_callback``) on backends that support
        host callbacks — which is every real TPU runtime — and degrades
        to OFF with a warning only on the axon dev tunnel (no callback
        support). Measured at 224²/R=16 against the committed
        skimage-faithful golden (tests/fixtures/slic_golden_224.npz,
        patch-dominant agreement under optimal matching — BASELINE.md
        "224² connectivity"): host 1.00 (pixel-exact on 5/6 images),
        device ON 0.83 at ~51 ms/img on v5e (the fragment scatters cost
        ~190× the rest of the SPPP pipeline: 6.6 s vs 35 ms at b128 —
        why auto does not pick it), OFF 0.66. Pass ``True`` to force
        device enforcement, ``"host"`` to force the C++ kernel.

    Returns:
      int32 segment map ``[B, H, W]`` (or ``[H, W]``), labels in [0, R).
    """
    single = images.ndim == 3
    if single:
        images = images[None]
    h, w = images.shape[1:3]
    if enforce_connectivity == "auto":
        if h * w <= AUTO_CONNECTIVITY_MAX_PIXELS:
            enforce_connectivity = True
        else:
            # Above the device-affordable size the enforcement moves to the
            # host C++ kernel (native/connectivity.cpp — exact skimage BFS
            # semantics, ~ms per image) via jax.pure_callback. The axon
            # PJRT tunnel does not support host callbacks
            # (UNIMPLEMENTED: send/recv), so on that backend auto degrades
            # to off with a warning unless FAVIT_HOST_CONNECTIVITY=1
            # forces the host path (real TPU runtimes support callbacks).
            from focused_attention_vit_tpu.ops import native_connectivity

            callback_ok = _callbacks_supported() or os.environ.get(
                "FAVIT_HOST_CONNECTIVITY", "0"
            ) == "1"
            if native_connectivity.native_available() and callback_ok:
                enforce_connectivity = "host"
            else:
                enforce_connectivity = False
                _warn_auto_connectivity_off(h, w)

    host = enforce_connectivity == "host"

    def per_image(im):
        im = gaussian_blur(im, sigma)
        return _slic_single(
            im, num_segments, compactness, n_iter,
            False if host else enforce_connectivity,
        )

    out = jax.vmap(per_image)(images)
    if host:
        from focused_attention_vit_tpu.ops import native_connectivity

        min_size = int(round(MIN_SIZE_FACTOR * (h * w / num_segments)))

        def _host_fn(lab):
            return native_connectivity.enforce_connectivity_host(
                np.asarray(lab), min_size, num_segments
            )

        if isinstance(out, jax.core.Tracer):
            # Traced (inside jit): the callback's operands are produced by
            # the same program, so they are materialized before the
            # custom-call runs.
            out = jax.pure_callback(
                _host_fn,
                jax.ShapeDtypeStruct(out.shape, jnp.int32),
                out,
            )
        else:
            # Eager: call the host kernel directly on the concrete value.
            # Routing eager calls through pure_callback can DEADLOCK on a
            # single-threaded CPU runtime — the callback's one-op program
            # may start (occupying the only executor thread) while its
            # input is still being produced by the asynchronously
            # dispatched k-means program, which then never gets a thread.
            # Reproduced via `SPPPViT.init` (eager dispatch) on this
            # 1-core machine; inside-jit and multi-device runs are
            # unaffected.
            out = jnp.asarray(_host_fn(out))
    return out[0] if single else out
