"""On-chip numerics + speed check for the fused tail's LN statistic dots.

The tail computes per-pixel LayerNorm statistics with MXU dots. Mosaic
lowers f32 dots at DEFAULT precision as single-pass bf16 (0.2 absolute LN
error on mean-dominated scan outputs — the round-3 finding that forced
HIGHEST). HIGHEST costs 6 passes; HIGH (3-pass bf16x3) carries ~f32
operand precision and should halve the stat-dot cost. This script measures
the error and the per-call time of each setting ON THE CHIP at serving
shape + realistic mean-dominated magnitudes, so the precision choice is a
recorded decision, not a guess.

Run: python tools/tail_prec_check.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bem_tpu.ops.ss2d_tail as tail_mod


def run_case(prec_name: str):
    os.environ["BEM_TAIL_STAT_PREC"] = prec_name
    # shapes: L0-serving lane width at 1/10 batch-equivalent rows so the
    # host->tunnel upload stays seconds (relative timing is what matters),
    # mean-dominated magnitudes like real scan outputs
    Bg, G, C, L = 4, 8, 40, 28672
    rng = np.random.default_rng(0)
    base = rng.standard_normal((Bg, G * C, 1)) * 30.0  # per-channel means
    y = base + rng.standard_normal((Bg, G * C, L)).astype(np.float32)
    yr = jnp.asarray(y, jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal(C) * 0.2 + 1.0, jnp.float32)
    bi = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    W = jnp.asarray(rng.standard_normal((C, C)) * 0.2, jnp.float32)
    res = jnp.asarray(rng.standard_normal(yr.shape), jnp.bfloat16)

    fn = jax.jit(lambda a, r: tail_mod.ss2d_tail_cf(
        a, None, sc, bi, W, None, G, r))
    out = np.asarray(fn(yr, res), np.float32)
    ref = np.asarray(tail_mod._tail_ref(yr, None, sc, bi, W, None, G, res),
                     np.float32)
    err = np.max(np.abs(out - ref))

    # amortize the ~30 ms tunnel dispatch with an in-jit repetition loop
    REPS = 20

    def looped(a, r):
        def body(i, c):
            o = tail_mod.ss2d_tail_cf(a * (1.0 + 0.0 * c), None, sc, bi, W,
                                      None, G, r)
            return jnp.sum(o.astype(jnp.float32)[:, :1, :1]) * 1e-9
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0),
                                 unroll=True)

    g = jax.jit(looped)
    float(g(yr, res))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(g(yr, res))
        ts.append(time.perf_counter() - t0)
    per_call = (float(np.median(ts)) - 0.030) / REPS
    print(f"prec={prec_name:8s} max|err| vs f32 ref = {err:.5f}  "
          f"call = {1e3 * per_call:.2f} ms", flush=True)


if __name__ == "__main__":
    for p in ("highest", "split2"):
        run_case(p)
