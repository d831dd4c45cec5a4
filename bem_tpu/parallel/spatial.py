"""Spatially-sharded (sequence-parallel) inference over a device mesh.

The reference caps inference at one GPU's memory: its 2048x2048 speed
protocol (Enhancement/speed_test.py:83-117) runs the two-stage forward on a
single device, sequentially. On TPU the natural scale-out for huge images is
to shard the IMAGE ROWS over a mesh axis and let XLA's SPMD partitioner do
what NCCL code never could automatically: convolution halo exchanges,
sharded reductions for the per-pixel norms, and the distributed prefix
structure of the associative scan, all over ICI.

Requirements:
- the network must be built with ``scan_backend="xla"`` — Pallas custom
  calls are opaque to GSPMD and would force a gather to one device; the
  pure-XLA scan path partitions cleanly (ops/scan.py "xla" backend). The
  helper asserts this.
- H must divide by (devices * 2^levels) for clean level transitions
  (callers already reflect-pad to window multiples, eval.py protocol).

For the linear-recurrence hot op itself there is also the explicit
shard_map formulation with O(D) carry exchange per device —
``parallel/context.py`` — which this module complements: `spatial_apply`
scales the WHOLE model (convs, norms, merges, scans) with zero
model-code changes, while `context_parallel_linear_scan` is the
hand-optimal primitive for custom pipelines.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    """NHWC sharding with image rows split over ``axis``."""
    return NamedSharding(mesh, P(None, axis, None, None))


def spatial_apply(net, variables, x: jax.Array, mesh: Mesh,
                  axis: str = "space", rngs: Optional[Any] = None):
    """Run ``net.apply(variables, x)[-1]`` with H sharded over ``axis``.

    x: (B, H, W, C) host or device array. Returns the output with the same
    spatial sharding (callers can jnp.asarray it to gather).
    """
    backend = getattr(net, "scan_backend", None)
    assert backend == "xla", (
        "spatial_apply requires the network to be built with "
        f"scan_backend='xla' (got {backend!r}): Pallas custom calls are "
        "opaque to the SPMD partitioner and would gather the image onto "
        "one device")
    sh_in = spatial_sharding(mesh, axis)
    sh_rep = NamedSharding(mesh, P())
    xs = jax.device_put(x, sh_in)
    vs = jax.tree.map(lambda a: jax.device_put(a, sh_rep), variables)

    if rngs is None:
        fn = jax.jit(lambda v, t: net.apply(v, t)[-1], out_shardings=sh_in)
        return fn(vs, xs)
    fn = jax.jit(lambda v, t, r: net.apply(v, t, rngs=r)[-1],
                 out_shardings=sh_in)
    return fn(vs, xs, rngs)
