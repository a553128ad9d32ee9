"""Aggregate an xplane trace (BENCH_PROFILE_DIR capture) into per-op time shares.

Usage:
    BENCH_PROFILE_DIR=/tmp/prof python bench.py          # capture
    python tools/profile_xplane.py /tmp/prof [--top 40]  # aggregate

Groups XLA op instances by fusion/op name prefix and prints total device time,
call count, and share — the view used to find the vision-tower elementwise
overhead (ROUND_NOTES round-2 gap 2) and decode cache-copy waste (gap fixed in
round 2). TPU device planes only; host planes are skipped.
"""

from __future__ import annotations

import argparse
import glob
import re
import sys
from collections import defaultdict


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))
    if not files:
        raise SystemExit(f"no .xplane.pb under {path}")
    spaces = []
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        spaces.append((f, xs))
    return spaces


_CANON = [
    (re.compile(r"^fusion(\.\d+)?$"), "fusion(generic)"),
    (re.compile(r"^loop_"), "loop_fusion"),
    (re.compile(r"^input_"), "input_fusion"),
    (re.compile(r"^output_"), "output_fusion"),
]


def aggregate(spaces, merge_digits: bool = True):
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    device_time = 0.0
    for _, xs in spaces:
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()} if hasattr(
                plane.event_metadata, "values"
            ) else {}
            if not ev_meta:
                ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    if merge_digits:
                        name = re.sub(r"\.\d+$", "", name)
                    dur = ev.duration_ps / 1e12
                    totals[name] += dur
                    counts[name] += 1
                    device_time += dur
    return totals, counts, device_time


def aggregate_modules(spaces):
    """Per-XLA-module device time: the per-stage view (vision / prefill /
    decode / pool programs are separate jit modules). Reads the 'XLA Modules'
    line of each TPU plane; falls back to empty when the runtime didn't emit
    module lines (older libtpu)."""
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for _, xs in spaces:
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                if "module" not in line.name.lower():
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    # strip the uniquing suffixes: jit_prefill(137438...) etc.
                    name = re.sub(r"\(\d+\)$", "", name)
                    totals[name] += ev.duration_ps / 1e12
                    counts[name] += 1
    return totals, counts


def busy_idle(spaces) -> list[tuple[str, float, float]]:
    """Per-TPU-plane (name, wall_s, busy_s): busy = interval-UNION of the XLA
    Ops line's events (parents nest children, so a plain sum double-counts;
    async copy spans overlap compute). idle = wall - busy is the device-starved
    share — host gaps, tunnel RTTs, input waits."""
    out = []
    for _, xs in spaces:
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            intervals = []
            for line in plane.lines:
                if "XLA Ops" not in line.name and "xla op" not in line.name.lower():
                    continue
                for ev in line.events:
                    start = ev.offset_ps
                    intervals.append((start, start + ev.duration_ps))
            if not intervals:
                continue
            intervals.sort()
            busy = 0
            cur_s, cur_e = intervals[0]
            for s, e in intervals[1:]:
                if s > cur_e:
                    busy += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            busy += cur_e - cur_s
            wall = intervals[-1][1] if False else max(e for _, e in intervals) - min(
                s for s, _ in intervals
            )
            out.append((plane.name, wall / 1e12, busy / 1e12))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--filter", default="", help="only ops whose name contains this")
    args = ap.parse_args()

    spaces = load_xspace(args.trace_dir)
    for name, wall, busy in busy_idle(spaces):
        idle = wall - busy
        print(
            f"plane {name}: wall {wall*1e3:.0f} ms, busy {busy*1e3:.0f} ms "
            f"({busy/wall:.1%}), idle {idle*1e3:.0f} ms ({idle/wall:.1%})"
        )
    mod_totals, mod_counts = aggregate_modules(spaces)
    if mod_totals:
        print("\nper-module device time:")
        print(f"{'module':<64} {'ms':>9} {'calls':>7}")
        for name, secs in sorted(mod_totals.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{name[:64]:<64} {secs * 1e3:>9.2f} {mod_counts[name]:>7}")
    totals, counts, device_time = aggregate(spaces)
    rows = sorted(totals.items(), key=lambda kv: kv[1], reverse=True)
    if args.filter:
        rows = [r for r in rows if args.filter in r[0]]
    print(f"device total: {device_time * 1e3:.1f} ms over {len(totals)} distinct ops")
    print(f"{'op':<64} {'ms':>9} {'calls':>7} {'share':>7}")
    for name, secs in rows[: args.top]:
        share = secs / device_time if device_time else 0.0
        print(f"{name[:64]:<64} {secs * 1e3:>9.2f} {counts[name]:>7} {share:>6.1%}")


if __name__ == "__main__":
    sys.exit(main())
