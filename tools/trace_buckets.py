"""Aggregate device-op time buckets from a jax.profiler trace of the
bench pipeline (the program of record — bench.build_pipeline).

Captures one steady-state iteration under jax.profiler.trace, parses the
xplane protobuf with tensorflow's xplane_pb2, and prints per-op and
per-bucket totals for the DEVICE plane. Buckets are keyed on the XLA
op/fusion names (pallas custom-calls keep their kernel names).

Run ON THE TPU: python tools/trace_buckets.py [nimg]
"""

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Patterns match the classify() key: "%<name>.<n> <opcode>" (defining op
# name + opcode only, operands stripped). Pallas kernels keep their traced
# scope name (mlp.* = fused gdMlp; op.* = the ss2d stem/scan/tail family).
BUCKETS = [
    ("pallas gdmlp", re.compile(r"%(gd)?mlp[.\d]* custom-call")),
    ("pallas scan/stem/tail", re.compile(
        r"%(op|dir_body|stem|tail|ss2d|scan)[.\d_]* custom-call")),
    ("conv", re.compile(r"conv")),
    ("transpose/copy", re.compile(r"transpose|copy|reshape|pad|slice")),
    ("dot/matmul", re.compile(r"dot|einsum")),
    ("convert", re.compile(r"convert")),
    ("fusion (elementwise)", re.compile(r"fusion")),
    ("dynamic/gather/scatter", re.compile(r"dynamic|gather|scatter")),
    ("reduce", re.compile(r"reduce")),
]


def classify(name: str) -> str:
    # Classify on the defining op name + opcode ONLY ("%mlp.31 = ... custom-call")
    # — the full HLO text lists operands (e.g. "%copy-done.399") whose names
    # would otherwise misfile compute ops into the copy bucket.
    head = name.split(" = ", 1)
    key = head[0]
    if len(head) > 1:
        # opcode follows the result type: "...{layout} opcode(" for arrays,
        # "(..., ...)) opcode(" for tuple-returning ops (pallas multi-output
        # kernels) — the old \} -only form misfiled those into "other"
        m = re.search(r"[\})]\s*([a-z0-9-]+)\(", head[1])
        if m:
            key += " " + m.group(1)
    for label, pat in BUCKETS:
        if pat.search(key):
            return label
    return "other"


def parse_trace(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())

    per_op = defaultdict(float)
    for plane in xs.planes:
        nm = plane.name.lower()
        if not ("tpu" in nm or "device" in nm) or "host" in nm:
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # ONLY the "XLA Ops" line carries exclusive per-op device
            # durations; the other device-plane lines (async copies, steps,
            # modules) overlap compute and would multiply-count the
            # iteration (async weight-prefetch copy-starts each report the
            # full wait span — summing them drowned the real ops 4:1)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                per_op[name] += ev.duration_ps / 1e9  # -> ms
    return per_op


def main():
    nimg = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    logdir = "/tmp/bem_trace_buckets"
    os.system(f"rm -rf {logdir}")

    import jax

    from bench import build_pipeline

    fn, (key, img, cond_in) = build_pipeline(nimg)
    float(fn(key, img, cond_in))  # compile + warm
    float(fn(jax.random.fold_in(key, 1), img, cond_in))
    jax.profiler.start_trace(logdir)
    float(fn(jax.random.fold_in(key, 2), img, cond_in))
    jax.profiler.stop_trace()

    per_op = parse_trace(logdir)
    total = sum(per_op.values())
    buckets = defaultdict(float)
    for name, ms in per_op.items():
        buckets[classify(name)] += ms

    print(f"\n== buckets (device total {total:.1f} ms) ==")
    for label, ms in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{label:28s} {ms:8.1f} ms  {100*ms/total:5.1f}%")

    print("\n== top 30 ops ==")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
