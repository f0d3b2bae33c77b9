"""Top-N device ops by self time from a jax.profiler trace.

Usage: python tools/xplane_top.py <profile_dir> [N]

Parses the ``*.xplane.pb`` written by ``jax.profiler.start_trace``
directly via tensorflow's tsl protobuf (the tensorboard_plugin_profile
converter API mismatches on this toolchain — CLAUDE.md). Aggregates
XEvents on the TPU device planes by event name (fusion name), reporting
total self-duration — the op-level view that drove the round-2/3 roofline
work (BASELINE.md).
"""

import glob
import os
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_spaces(profile_dir):
    paths = glob.glob(
        os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb under {profile_dir}")
    spaces = []
    for p in sorted(paths, key=os.path.getmtime):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def device_op_totals(xspace):
    """{event_name: total_duration_us} over device (TPU) planes."""
    totals = defaultdict(float)
    counts = defaultdict(int)
    for plane in xspace.planes:
        name = plane.name.lower()
        if not ("tpu" in name or "/device" in name or "gpu" in name):
            continue
        if "step" in name.lower():
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                meta = ev_names.get(ev.metadata_id)
                nm = meta.name if meta else str(ev.metadata_id)
                totals[nm] += ev.duration_ps / 1e6
                counts[nm] += 1
    return totals, counts


def category_totals(totals, counts):
    """Aggregate ``%opname.N = ...`` events by opname prefix, skipping
    wrapper events (jit_*, while, bare module ids) that double-count
    their children — the round-4 view that exposed the SPPP and roll-bwd
    decompositions when per-fusion names were too fragmented (no
    scan/remat → every fusion unique)."""
    import re

    cat_t, cat_n = defaultdict(float), defaultdict(int)
    for nm, us in totals.items():
        if nm.startswith("jit_") or re.fullmatch(r"\d+", nm):
            continue
        m = re.match(r"%([a-zA-Z_][\w-]*?)[.\d]*\s*=", nm)
        key = m.group(1) if m else nm.split(" ")[0][:40]
        if key == "while":
            continue
        cat_t[key] += us
        cat_n[key] += counts[nm]
    return cat_t, cat_n


def main():
    args = [a for a in sys.argv[1:] if a != "--by-category"]
    by_cat = "--by-category" in sys.argv
    profile_dir = args[0]
    top_n = int(args[1]) if len(args) > 1 else 25
    path, xs = load_spaces(profile_dir)[-1]  # latest capture
    totals, counts = device_op_totals(xs)
    if by_cat:
        totals, counts = category_totals(totals, counts)
    grand = sum(totals.values())
    print(f"# {path}")
    print(f"# device busy total: {grand/1e3:.2f} ms")
    print(f"{'us':>12} {'%':>6} {'n':>6}  op")
    for nm, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{us:12.0f} {100*us/grand:6.2f} {counts[nm]:6d}  {nm[:110]}")


if __name__ == "__main__":
    main()
