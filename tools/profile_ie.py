"""Per-component timing of the flagship IE forward at K=16, 448x640.

Times (a) the full Network forward, (b) one VSSBlock per U-Net level, and
(c) the pieces of a level-0 VSSBlock, each with an in-jit repetition loop to
amortize the ~30 ms remote-transport dispatch floor.

Run: python tools/profile_ie.py [full|blocks|parts]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REPS = 8


def timed(name, fn, *args, iters=3, reps=REPS):
    def looped(c0, *a):
        def body(i, carry):
            scaled = [
                (x * (1.0 + 0.0 * carry)).astype(x.dtype)
                if isinstance(x, jax.Array) and x.ndim >= 3 else x
                for x in a
            ]
            out = fn(*scaled)
            out = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

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
    per = (min(ts) - 0.030) / reps
    print(f"{name:42s}: {per*1e3:8.2f} ms/call   (compile {tc:.0f}s)", flush=True)
    return per


K, H, W = 16, 448, 640


def full():
    from bem_tpu.archs import build_network

    common = dict(n_feat=40, stage=1, num_blocks=(2, 2, 2), d_state=(1, 1, 1),
                  ssm_ratio=1, mlp_ratio=4, mlp_type="gdmlp",
                  use_pixelshuffle=True)
    ie = build_network(dict(type="Network", in_channels=6, out_channels=3, **common))
    x = jnp.asarray(np.random.default_rng(0).random((K, H, W, 6)), jnp.bfloat16)
    v = jax.jit(ie.init)(jax.random.PRNGKey(0), x[:1])
    timed("IE full fwd (K=16, 448x640)", lambda a: ie.apply(v, a)[-1], x, reps=2)


def blocks():
    from bem_tpu.nn.vss import VSSBlock

    for name, (h, w, c) in {
        "L0": (H, W, 40), "L1": (H // 2, W // 2, 80), "L2": (H // 4, W // 4, 160),
    }.items():
        blk = VSSBlock(hidden_dim=c, forward_type="v05_noz", mlp_ratio=4.0,
                       mlp_type="gdmlp")
        x = jnp.asarray(np.random.default_rng(0).random((K, h, w, c)), jnp.bfloat16)
        v = jax.jit(blk.init)(jax.random.PRNGKey(0), x[:1])
        timed(f"VSSBlock {name} ({h}x{w} C={c})", lambda a, blk=blk, v=v: blk.apply(v, a), x, reps=4)


def parts():
    from bem_tpu.nn.layers import Conv2d, Dense, LayerNorm2d
    from bem_tpu.nn.vss import GDMlp
    from bem_tpu.ops.ss2d_fused import ss2d_dir_fused
    from bem_tpu.nn import init as inits

    C = 40
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((K, H, W, C)), jnp.bfloat16)

    ln = LayerNorm2d()
    vln = jax.jit(ln.init)(jax.random.PRNGKey(0), x[:1])
    timed("LayerNorm2d L0", lambda a: ln.apply(vln, a), x)

    dense = Dense(C, use_bias=False)
    vd = jax.jit(dense.init)(jax.random.PRNGKey(0), x[:1])
    timed("in_proj Dense CxC", lambda a: dense.apply(vd, a), x)

    conv = Conv2d(C, kernel_size=3, padding=1, groups=C, use_bias=False)
    vc = jax.jit(conv.init)(jax.random.PRNGKey(0), x[:1])
    timed("dwconv3x3 + silu", lambda a: jax.nn.silu(conv.apply(vc, a)), x)

    # transpose NHWC -> (B,2,C,L)
    def to_xs2(a):
        xc = jnp.transpose(a, (0, 3, 1, 2))
        row = xc.reshape(K, C, H * W)
        col = jnp.transpose(xc, (0, 1, 3, 2)).reshape(K, C, H * W)
        return jnp.stack([row, col], axis=1)

    timed("build xs2 (transposes)", to_xs2, x)

    xs2 = to_xs2(x)
    R, N = 3, 1
    Wx = jnp.asarray(rng.standard_normal((4, R + 2 * N, C)) * 0.1, jnp.float32)
    Wdt = jnp.asarray(rng.standard_normal((4, C, R)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((4, C)) * 0.01, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((4, C, N)) * 0.1, jnp.float32))
    D = jnp.asarray(rng.standard_normal((4, C)), jnp.float32)
    timed("ss2d_dir_fused kernel", lambda a: ss2d_dir_fused(a, Wx, Wdt, bias, A, D), xs2)

    y2 = ss2d_dir_fused(xs2, Wx, Wdt, bias, A, D)

    def merge(a):
        y_row = a[:, 0].reshape(K, C, H, W)
        y_col = jnp.transpose(a[:, 1].reshape(K, C, W, H), (0, 1, 3, 2))
        y = (y_row + y_col).astype(jnp.float32)
        return jnp.transpose(y, (0, 2, 3, 1))

    timed("merge + transpose back (fp32)", merge, y2)

    yl = merge(y2)
    timed("out LN (fp32 in)", lambda a: ln.apply(vln, a), yl)

    out_proj = Dense(C, use_bias=False)
    vo = jax.jit(out_proj.init)(jax.random.PRNGKey(0), yl[:1].astype(jnp.bfloat16))
    timed("out_proj Dense", lambda a: out_proj.apply(vo, a.astype(jnp.bfloat16)), yl)

    mlp = GDMlp(hidden_features=4 * C, out_features=C)
    vm = jax.jit(mlp.init)(jax.random.PRNGKey(0), x[:1])
    timed("gdMlp (4x)", lambda a: mlp.apply(vm, a), x)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("full", "all"):
        full()
    if which in ("blocks", "all"):
        blocks()
    if which in ("parts", "all"):
        parts()
