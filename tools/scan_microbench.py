"""Micro-benchmark the ss2d scan kernel's level-1 segment-cumsum variants
on the real TPU at the L0 serving shape.

The additive block scan (ops/ss2d_fused_g._seg_scan_add) runs two
within-segment cumsums per (n, block); each doubling is currently a
pltpu.roll + mask + add. The gdmlp roll-hoist experiment showed Mosaic
lowers misaligned SLICES much cheaper than rolls, so this bench times the
direction kernel end-to-end with each cumsum lowering to pick a winner:

  roll   — pltpu.roll(y, s) + where(col-mask) + add        (current)
  slice  — concat([zeros(s), y[:, :-s]]) + where + add     (slice form)

Run: python tools/scan_microbench.py  (on the TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_call(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    # axon block_until_ready can be a no-op: force a scalar fetch
    float(jnp.asarray(out).ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import bem_tpu.ops.ss2d_fused_g as fg
    from bem_tpu.ops.ss2d_seq import ss2d_seq_pair_g

    rng = np.random.default_rng(0)
    # L0 serving shape: Bg=4, G=8, C=40, L=448*640
    G, C, L, N, R = 8, 40, 448 * 640, 1, 3
    Bg = 4
    x = jnp.asarray(rng.normal(size=(Bg, G * C, L)) * 0.1, jnp.bfloat16)
    Wx = jnp.asarray(rng.normal(size=(4, R + 2 * N, C)) * 0.1, jnp.float32)
    Wdt = jnp.asarray(rng.normal(size=(4, C, R)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(4, C)) * 0.1, jnp.float32)
    A = jnp.asarray(-np.exp(rng.normal(size=(4, C, N)) * 0.2), jnp.float32)
    D = jnp.asarray(rng.normal(size=(4, C)) * 0.1, jnp.float32)

    run = jax.jit(lambda x: ss2d_seq_pair_g(x, Wx, Wdt, bias, A, D, G, "row"))

    base_out = None
    for name in ("roll", "slice"):
        fg.SEG_CUMSUM_MODE = name
        run_v = jax.jit(
            lambda x: ss2d_seq_pair_g(x, Wx, Wdt, bias, A, D, G, "row"))
        # clear jax caches so the kernel retraces with the new mode
        jax.clear_caches()
        out = run_v(x)
        if base_out is None:
            base_out = np.asarray(out, np.float32)
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - base_out)))
            print(f"scan[{name}]: max |Δ| vs roll = {err:.2e}")
        print(f"scan[{name}]  {time_call(run_v, x):8.2f} ms / pair-call")
    fg.SEG_CUMSUM_MODE = "roll"

    # ---- gdmlp tap-loop dtype -------------------------------------------
    import bem_tpu.ops.gdmlp_fused as gm

    H, Wd = 448, 640
    C2, hdim = 40, 160
    xg = jnp.asarray(rng.normal(size=(32, C2, H * Wd)) * 0.1, jnp.bfloat16)
    W1 = jnp.asarray(rng.normal(size=(2 * hdim, C2)) * 0.1, jnp.float32)
    dwt = jnp.asarray(rng.normal(size=(2 * hdim, 9)) * 0.3, jnp.float32)
    W2 = jnp.asarray(rng.normal(size=(C2, hdim)) * 0.1, jnp.float32)
    lns = jnp.ones((C2,), jnp.float32)
    lnb = jnp.zeros((C2,), jnp.float32)
    base_out = None
    for name in ("f32", "bf16"):
        gm.CONV_DTYPE = name
        run_g = jax.jit(lambda x: gm.gdmlp_fused_cf(
            x, W1, None, dwt, None, W2, None, H, Wd, lns, lnb, True))
        jax.clear_caches()
        out = run_g(xg)
        if base_out is None:
            base_out = np.asarray(out, np.float32)
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - base_out)))
            print(f"gdmlp[{name}]: max |Δ| vs f32 = {err:.2e}")
        print(f"gdmlp[{name}] {time_call(run_g, xg):8.2f} ms / L0-call")
    gm.CONV_DTYPE = "f32"


if __name__ == "__main__":
    main()
