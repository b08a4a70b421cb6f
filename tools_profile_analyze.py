"""Summarize a jax.profiler trace (dev tool).

    python -m ideas_tpu.train_cli ... --profile_dir /tmp/prof
    python tools_profile_analyze.py /tmp/prof [top_k]

Parses the chrome-trace json(.gz) files the profiler writes and prints
the top ops by total device time — enough to see where the
milliseconds go without the tensorboard profile plugin (absent in this
environment).
"""

import collections
import glob
import gzip
import json
import os
import sys


def load_events(root):
    paths = glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    paths += glob.glob(os.path.join(root, "**", "*.trace.json"),
                       recursive=True)
    events = []
    for p in paths:
        op = gzip.open if p.endswith(".gz") else open
        with op(p, "rt") as fp:
            data = json.load(fp)
        events.extend(data.get("traceEvents", []))
    return events


def main():
    root = sys.argv[1]
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    events = load_events(root)
    if not events:
        print(f"no trace files under {root}")
        return 1

    # Device lanes: pid/tid names containing TPU/device hints.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in names.items()
                   if any(s in n.lower() for s in ("tpu", "device", "xla"))}

    total = collections.Counter()
    count = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        total[e["name"]] += e["dur"]
        count[e["name"]] += 1
    grand = sum(total.values())
    print(f"{len(events)} events; device-lane op time {grand / 1e3:.1f} ms "
          f"(pids: {sorted(names.items())[:6]}...)")
    print(f"{'op':60s} {'total ms':>10s} {'calls':>7s} {'%':>6s}")
    for name, dur in total.most_common(top_k):
        print(f"{name[:60]:60s} {dur / 1e3:10.2f} {count[name]:7d} "
              f"{dur / max(grand, 1) * 100:6.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
