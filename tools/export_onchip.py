"""Exercise the jax.export serving artifact on the real TPU (VERDICT r3 #6).

Exports the exact bench pipeline (bench.build_pipeline) as a StableHLO
artifact with platforms=("tpu",), loads it back WITHOUT the model-building
code in scope (fresh deserialize), and checks the artifact path against the
live jit path on the chip:

- value parity (same scalar out, same key),
- steady-state median iteration time within a few % of the jit path.

Prints one JSON line for the queue log.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from bench import build_pipeline
    from bem_tpu.enhancement.export import export_pipeline, load_pipeline

    fn, (key, img, cond_in) = build_pipeline(2)

    # live jit path (also primes the compile cache)
    want = float(fn(key, img, cond_in))
    t_jit = _median_iter(fn, key, img, cond_in)

    path = "/tmp/bench_pipe.jaxexport"
    t0 = time.perf_counter()
    export_pipeline(fn, (key, img, cond_in), path, platforms=("tpu",))
    export_s = time.perf_counter() - t0

    g = load_pipeline(path)
    gj = jax.jit(g)
    got = float(gj(key, img, cond_in))
    t_exp = _median_iter(gj, key, img, cond_in)

    out = {
        "metric": "export_onchip",
        "value_jit": want,
        "value_exported": got,
        "value_rel_err": abs(got - want) / max(abs(want), 1e-9),
        "iter_ms_jit": round(1e3 * t_jit, 1),
        "iter_ms_exported": round(1e3 * t_exp, 1),
        "exported_vs_jit": round(t_exp / t_jit, 4),
        "export_s": round(export_s, 1),
        "artifact_bytes": __import__("os").path.getsize(path),
    }
    print(json.dumps(out))
    assert out["value_rel_err"] < 1e-2, out
    # within-1%-of-jit is the target; allow 5% before failing loudly so a
    # transport hiccup doesn't mask the value-parity result
    assert out["exported_vs_jit"] < 1.05, out


def _median_iter(fn, key, img, cond_in, iters: int = 8) -> float:
    import jax

    float(fn(key, img, cond_in))  # warm
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(jax.random.fold_in(key, i), img, cond_in))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


if __name__ == "__main__":
    main()
