"""Full-HD two-stage inference speed test (reference: Enhancement/speed_test.py).

python -m bem_tpu.enhancement.speed_test --opt CG.yml --cond_opt IE.yml \\
    [--input_size 2048] [--repeat 100] [--speedup]

Protocol parity (speed_test.py:83-117): a 2048x2048 input, `repeat`
two-stage forwards either sequentially or in the batched "speedup" mode
(tile K conditions, one Stage-II forward). Prints total seconds.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(args_list=None):
    import jax
    import jax.numpy as jnp

    from ..archs import build_network
    from ..ops.resize import resize_bilinear
    from ..utils.checkpoint import load_params
    from ..utils.options import parse

    p = argparse.ArgumentParser()
    p.add_argument("--opt", required=True)
    p.add_argument("--cond_opt", required=True)
    p.add_argument("--weights", default="")
    p.add_argument("--cond_weights", default="")
    p.add_argument("--input_size", default=2048, type=int)
    p.add_argument("--repeat", default=100, type=int)
    p.add_argument("--speedup", action="store_true")
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--spatial_shard", default=0, type=int,
                   help="shard image rows over N mesh devices (sequence "
                        "parallelism via GSPMD; forces scan_backend=xla — "
                        "parallel/spatial.py). 0 = single device.")
    args = p.parse_args(args_list)

    opt = parse(args.opt, is_train=False)
    cond_opt = parse(args.cond_opt, is_train=False)
    scale_factor = opt["condition"].get("scale_down", 16)

    net_opt = dict(opt["network_g"])
    net_opt["bayesian"] = True
    cond_net_opt = dict(cond_opt["network_g"])
    if args.spatial_shard:
        # Pallas custom calls are opaque to the SPMD partitioner; the pure
        # XLA scan partitions over the sharded rows (parallel/spatial.py)
        net_opt["scan_backend"] = "xla"
        cond_net_opt["scan_backend"] = "xla"
    net = build_network(net_opt)
    cond_net = build_network(cond_net_opt)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    S = args.input_size
    sc = S // scale_factor
    x = jnp.asarray(np.random.default_rng(0).random((1, S, S, 3)), dtype)
    x_down = resize_bilinear(x, size=(sc, sc))

    params = (load_params(args.weights) if args.weights
              else jax.jit(net.init)(jax.random.PRNGKey(0), x_down)["params"])
    cond_params = (
        load_params(args.cond_weights) if args.cond_weights
        else jax.jit(cond_net.init)(
            jax.random.PRNGKey(1), jnp.concatenate([x, x], -1))["params"]
    )

    if args.spatial_shard:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import make_mesh
        from ..parallel.spatial import spatial_sharding

        mesh = make_mesh(args.spatial_shard, axis_names=("space",))
        sh = spatial_sharding(mesh)
        rep = NamedSharding(mesh, P())
        x = jax.device_put(x, sh)
        x_down = jax.device_put(x_down, sh)
        params = jax.tree.map(lambda a: jax.device_put(a, rep), params)
        cond_params = jax.tree.map(
            lambda a: jax.device_put(a, rep), cond_params)

    if args.speedup:
        @jax.jit
        def run(key, x, x_down):
            keys = jax.random.split(key, args.repeat)
            conds = jax.vmap(
                lambda k: net.apply({"params": params}, x_down,
                                    rngs={"bayes": k})[-1][0]
            )(keys)
            # mock metric + best-candidate selection (speed_test.py:99-104)
            score = jnp.mean(jnp.square(conds), axis=(1, 2, 3))
            best = conds[jnp.argmin(score)][None]
            up = resize_bilinear(best, scale=float(scale_factor)).astype(x.dtype)
            pred = cond_net.apply({"params": cond_params},
                                  jnp.concatenate([x, up], -1))[-1]
            return jnp.sum(pred)

        float(run(jax.random.PRNGKey(0), x, x_down))  # compile
        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(1), x, x_down))
        print(f"running time: {time.perf_counter() - t0:.4f} sec")
    else:
        @jax.jit
        def step(key, x, x_down):
            cond = net.apply({"params": params}, x_down, rngs={"bayes": key})[-1]
            up = resize_bilinear(cond, scale=float(scale_factor)).astype(x.dtype)
            pred = cond_net.apply({"params": cond_params},
                                  jnp.concatenate([x, up], -1))[-1]
            return jnp.sum(pred)

        key = jax.random.PRNGKey(0)
        float(step(key, x, x_down))  # compile
        t0 = time.perf_counter()
        for i in range(args.repeat):
            s = float(step(jax.random.fold_in(key, i), x, x_down))
        print(f"running time: {time.perf_counter() - t0:.4f} sec")


if __name__ == "__main__":
    main()
