"""Quantify VPU pass throughput + per-grid-step overhead for scan-shaped
pallas kernels at different block geometries.

Each kernel runs NPASS rounds of the monoid-scan inner op (roll + 2x where +
mul + fma) over a (C, LANES) fp32 block, grid-stepping over the same total
element count. Compares lane widths and C to find where the VPU saturates.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_vpu.py
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOTAL = 16 * 2 * 286720  # lanes-equivalents processed per variant (L0 shape)
C = 40
NPASS = 10  # passes of the inner op per block


def make_kernel(lanes, npass):
    def kernel(x_ref, o_ref):
        a = x_ref[0].astype(jnp.float32)
        b = a * 0.5
        col = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1) % 32
        s = 1
        for i in range(npass):
            sh = 1 << (i % 5)
            mask = col < sh
            a_sh = pltpu.roll(a, sh, axis=1)
            b_sh = pltpu.roll(b, sh, axis=1)
            a_sh = jnp.where(mask, 1.0, a_sh)
            b_sh = jnp.where(mask, 0.0, b_sh)
            b = a * b_sh + b
            a = a * a_sh
        o_ref[0] = (a + b).astype(o_ref.dtype)

    return kernel


def run(lanes, npass=NPASS, reps=3):
    n_blocks = TOTAL // lanes
    x = jnp.asarray(
        np.random.default_rng(0).random((n_blocks, C, lanes)), jnp.float32
    )
    f = pl.pallas_call(
        make_kernel(lanes, npass),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((1, C, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, C, lanes), jnp.float32),
    )
    g = jax.jit(lambda v: jnp.sum(f(v).astype(jnp.float32)[:, :1, :1]) * 1e-9)
    float(g(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(x))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) - 0.030
    elems = TOTAL * C
    print(f"lanes={lanes:6d} npass={npass:3d} blocks={n_blocks:6d}: "
          f"{dt*1e3:8.2f} ms  -> {elems*npass/dt/1e9:7.1f} G elem-pass/s  "
          f"({dt/n_blocks*1e6:6.2f} us/step)", flush=True)
    return dt


def make_kernel2(lanes, mode):
    """Variant inner ops: arith / exp / softplus / dot."""
    def kernel(x_ref, o_ref):
        a = x_ref[0].astype(jnp.float32)
        b = a * 0.5
        for i in range(10):
            if mode == "arith":
                b = a * b + b
                a = a * a
            elif mode == "exp":
                a = jnp.exp(a * -0.01)
                b = a * b + b
            elif mode == "softplus":
                a = jax.nn.softplus(a * 0.01)
                b = a * b + b
            elif mode == "roll":
                a = pltpu.roll(a, 1, axis=1)
                b = a * b + b
        o_ref[0] = (a + b).astype(o_ref.dtype)

    return kernel


def run2(mode, lanes=4096, reps=3):
    n_blocks = TOTAL // lanes
    x = jnp.asarray(
        np.random.default_rng(0).random((n_blocks, C, lanes)), jnp.float32
    )
    f = pl.pallas_call(
        make_kernel2(lanes, mode),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((1, C, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, C, lanes), jnp.float32),
    )
    g = jax.jit(lambda v: jnp.sum(f(v).astype(jnp.float32)[:, :1, :1]) * 1e-9)
    float(g(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(x))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) - 0.030
    print(f"mode={mode:9s}: {dt*1e3:8.2f} ms for 10 rounds "
          f"-> {TOTAL*C*10/dt/1e9:7.1f} G elem-round/s", flush=True)

if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "modes":
        for m in ("arith", "roll", "exp", "softplus"):
            run2(m)
    else:
        for lanes in (1024, 2048, 4096, 8192):
            run(lanes)
        for npass in (5, 20, 40):
            run(4096, npass)
