"""Summarize /tmp/tpu_queue logs into a markdown table (PLAN.md-ready).

Each bench-style log ends with one JSON line; trace/speed logs are free
text — we grab their last meaningful lines. Pure host-side text parsing,
safe to run anywhere.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_queue"


def last_json(path):
    best = None
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    best = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return best


def main():
    rows = []
    for path in sorted(glob.glob(os.path.join(OUT, "*.log"))):
        name = os.path.basename(path)[:-4]
        if name == "queue":
            continue
        j = last_json(path)
        if j and "value" in j:
            rows.append((name, f"{j['value']} {j.get('unit', '')}",
                         f"iter_ms={j.get('iter_ms_median', '?')} "
                         f"spread={j.get('spread_p10_p90_pct', '?')}% "
                         f"warm={j.get('warm', '?')} "
                         f"vs_baseline={j.get('vs_baseline', '?')}"))
            continue
        # free-text tools: keep the last few non-empty lines
        with open(path, errors="replace") as f:
            lines = [ln.rstrip() for ln in f if ln.strip()]
        tail = " | ".join(lines[-3:]) if lines else "(empty)"
        rows.append((name, "", tail[:300]))

    print("| step | value | detail |")
    print("|---|---|---|")
    for name, val, detail in rows:
        print(f"| {name} | {val} | {detail} |")

    qlog = os.path.join(OUT, "queue.log")
    if os.path.exists(qlog):
        print("\n== queue.log rc lines ==")
        with open(qlog, errors="replace") as f:
            for ln in f:
                if re.match(r"rc=|===|QUEUE", ln):
                    print(ln.rstrip()[:200])


if __name__ == "__main__":
    main()
