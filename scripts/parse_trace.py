"""Aggregate device op times from a jax.profiler trace.json.gz.

Usage: python scripts/parse_trace.py [trace_dir_or_file] [top_n]
Groups XLA op events on the TPU device tracks by (fusion) name prefix and
prints total ms (across the traced steps) descending.
"""
import gzip
import json
import re
import sys
from collections import defaultdict
from glob import glob


def load(path):
    if not path.endswith(".json.gz"):
        cands = sorted(glob(path + "/**/*.trace.json.gz", recursive=True))
        path = cands[-1]
    print(f"# {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        return json.load(f)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jxtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    tr = load(path)
    events = tr["traceEvents"]

    # Identify device-side process ids (TPU core tracks, not host threads).
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if ("TPU" in n or "/device:" in n) and "Host" not in n}
    if not dev_pids:
        dev_pids = {p for p, n in pid_name.items() if "Host" not in n}

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        # Strip numeric suffixes to group duplicated fusions.
        key = re.sub(r"\.\d+$", "", name)
        key = re.sub(r"\d+", "#", key)
        agg[key] += dur
        cnt[key] += 1
        total += dur
    print(f"total device op time: {total:.1f} ms (all traced steps)")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v:9.2f} ms  x{cnt[k]:<5d} {k[:110]}")


if __name__ == "__main__":
    main()
