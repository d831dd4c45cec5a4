"""FLOPs / params / throughput analysis.

Reference: analysis/flops_param.py + analysis/util.py (fvcore counting with
a custom selective-scan flop handler, csms6s.py:216-223) and
vmamba/main.py:347 (throughput). TPU-native: FLOPs come from XLA's own cost
analysis of the compiled executable (which sees through jit/fusions), with
the analytical selective-scan estimate available separately.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax
import numpy as np


def count_params(params: Any) -> int:
    return int(sum(p.size for p in jax.tree_util.tree_leaves(params)))


def flops_selective_scan(B=1, L=256, D=768, N=16, with_D=True, with_Z=False) -> int:
    """Analytical estimate 9*B*L*D*N (csms6s.py:143-164, per
    state-spaces/mamba#110)."""
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    if with_Z:
        flops += B * D * L
    return flops


def count_flops(fn: Callable, *example_args) -> Dict[str, float]:
    """Compile fn and read XLA's cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
    }


def throughput(fn: Callable, *example_args, iters: int = 10, warmup: int = 2,
               batch: int = 1) -> float:
    """Images/sec of a jitted callable. Forces a device fetch per call (some
    remote TPU transports make block_until_ready a no-op)."""
    import jax.numpy as jnp

    g = jax.jit(lambda *a: jnp.sum(fn(*a)))
    for _ in range(warmup):
        float(g(*example_args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(g(*example_args))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def analyze_network(net, example_input, rng_seed: int = 0) -> Dict[str, Any]:
    """Params + FLOPs for a flax module's forward (analysis/flops_param.py)."""
    import jax.numpy as jnp

    variables = jax.jit(net.init)(jax.random.PRNGKey(rng_seed), example_input)

    def fwd(x):
        out = net.apply(variables, x)
        return out[-1] if isinstance(out, (list, tuple)) else out

    stats = count_flops(fwd, example_input)
    stats["params"] = count_params(variables["params"])
    return stats
