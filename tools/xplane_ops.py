"""Summarize per-op device time from a jax.profiler trace.json.gz.

The axon profiler emits a trace-viewer JSON (vm.trace.json.gz) next to the
xplane; this aggregates complete events ("X" phase) by name per process/track
and prints the top ops — enough to attribute backbone milliseconds to
individual HLO ops / fusions.

Usage: python tools/xplane_ops.py <trace_dir_or_trace.json.gz> [top_n] [filter]
"""

import collections
import glob
import gzip
import json
import os
import sys


def shape_summary(events, pid_names, tid_names):
    """Group device XLA ops by (hlo_category, output rows) — rows ~= pyramid
    level for backbone traces."""
    import re

    agg = collections.defaultdict(lambda: [0.0, 0])
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if not cat or cat == "while":
            continue
        track = pid_names.get(ev.get("pid"), "")
        if "TPU" not in track and "device" not in track.lower():
            continue
        ln = args.get("long_name", "")
        m = re.match(r"%\S+ = \(?\w+\[(\d+)", ln)
        rows = m.group(1) if m else "?"
        agg[(cat, rows)][0] += ev.get("dur", 0) / 1e3
        agg[(cat, rows)][1] += 1
    rows_ = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print("\n== device ops by (category, out_rows)")
    for (cat, r), (dur, cnt) in rows_[:30]:
        print(f"  {dur:9.2f} ms x{cnt:5d}  {cat:24s} rows={r}")


def main():
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    filt = sys.argv[3] if len(sys.argv) > 3 else ""
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "**", "*trace.json.gz"),
                                 recursive=True))
        path = cands[-1]
    print(f"parsing {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    tid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    agg = collections.defaultdict(lambda: [0.0, 0])
    track_total = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X":
            continue
        pid, tid = ev.get("pid"), ev.get("tid")
        track = f"{pid_names.get(pid, pid)} / {tid_names.get((pid, tid), tid)}"
        name = ev.get("name", "?")
        if filt and filt not in name:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        agg[(track, name)][0] += dur
        agg[(track, name)][1] += 1
        track_total[track] += dur
    by_track = collections.defaultdict(list)
    for (track, name), (dur, cnt) in agg.items():
        by_track[track].append((dur, cnt, name))
    for track, rows in sorted(by_track.items(),
                              key=lambda kv: -track_total[kv[0]]):
        rows.sort(reverse=True)
        print(f"\n== {track}  (total {track_total[track]:.1f} ms)")
        for dur, cnt, name in rows[:top]:
            print(f"  {dur:9.2f} ms x{cnt:4d}  {name[:100]}")
    shape_summary(events, pid_names, tid_names)


if __name__ == "__main__":
    main()
