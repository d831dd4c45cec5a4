"""Microbenchmark the SS2D scan paths on the real TPU.

Times each candidate with an in-jit repetition loop (lax.fori_loop with a
data dependence) to amortize the ~30 ms remote-transport dispatch floor,
then forces a scalar fetch. Shapes mirror bench.py's flagship IE at 448x640.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_scan.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REPS = 10


def timed(name, fn, *args, iters=3, reps=REPS):
    """Prints ms per single fn application, amortized over `reps` in-jit."""

    def looped(c0, *a):
        def body(i, carry):
            scaled = [
                x * (1.0 + 0.0 * carry) if isinstance(x, jax.Array) and x.ndim >= 3 else x
                for x in a
            ]
            out = fn(*scaled)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        # unroll: while-loops hit a ~128 s slow path in the remote compiler
        return jax.lax.fori_loop(0, reps, body, c0, unroll=True)

    g = jax.jit(looped)
    t0 = time.time()
    float(g(jnp.float32(0), *args))
    tc = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(g(jnp.float32(0), *args))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - 0.030) / reps  # subtract dispatch floor
    print(f"{name:34s}: {per*1e3:8.2f} ms/call   (compile {tc:.0f}s)")
    return per


def make_inputs(Bt=8, K=4, C=40, N=1, H=448, W=640, seed=0):
    L = H * W
    rng = np.random.default_rng(seed)
    bf16, f32 = jnp.bfloat16, jnp.float32
    return dict(
        u=jnp.asarray(rng.standard_normal((Bt, K, C, L)), bf16),
        dt=jnp.asarray(rng.standard_normal((Bt, K, C, L)) * 0.1, bf16),
        A=jnp.asarray(-np.exp(rng.standard_normal((K * C, N)) * 0.1), f32),
        Bs=jnp.asarray(rng.standard_normal((Bt, K, N, L)), bf16),
        Cs=jnp.asarray(rng.standard_normal((Bt, K, N, L)), bf16),
        D=jnp.asarray(rng.standard_normal((K * C,)), f32),
        bias=jnp.asarray(rng.standard_normal((K * C,)) * 0.01, f32),
    )


def main():
    from bem_tpu.ops.scan_fused import selective_scan_fused

    v = make_inputs()
    Bt, K, C, L = v["u"].shape
    io_gb = (2 * v["u"].nbytes + 2 * v["Bs"].nbytes + v["u"].nbytes) / 1e9

    t = timed(
        "fused pallas kernel (fwd)",
        lambda u_, d_, B_, C_: selective_scan_fused(
            u_, d_, v["A"], B_, C_, v["D"], v["bias"], True
        ),
        v["u"], v["dt"], v["Bs"], v["Cs"],
    )
    print(f"    ~{io_gb / t:.0f} GB/s effective on {io_gb*1e3:.0f} MB io")


if __name__ == "__main__":
    main()
