"""Context-parallel linear scan: sequences sharded across a mesh axis.

The reference scales long sequences only inside one GPU (chunked CUDA scan,
SURVEY §2.9 / kernels/selective_scan/README.md:22-46). On TPU the same
chunk recurrence extends across chips: each device scans its local sequence
chunk, the per-chunk boundary states ``(prod a, h_last)`` are combined in an
exclusive scan across the ``seq`` mesh axis (one all-gather of tiny state
over ICI), and each device folds the incoming carry into its local result.

This subsumes ring-attention-style decomposition for the first-order linear
recurrence workload: communication is O(D) per device, independent of L.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.scan import linear_scan


def _local_combine(a, b, axis_name):
    """Per-device scan + cross-device carry correction."""
    h_local = linear_scan(a, b)  # zero-initialized local scan
    # cumulative products of a within the chunk (carry propagation factors)
    prefix = jax.lax.associative_scan(jnp.multiply, a, axis=-2)
    a_prod = prefix[..., -1:, :]  # (..., 1, D)
    boundary = h_local[..., -1:, :]

    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    aps = jax.lax.all_gather(a_prod, axis_name)  # (n, ..., 1, D)
    hbs = jax.lax.all_gather(boundary, axis_name)

    # exclusive scan over devices: carry into device idx
    def step(c, x):
        ap, hb = x
        return ap * c + hb, c

    _, carries = jax.lax.scan(step, jnp.zeros_like(a_prod), (aps, hbs))
    carry_in = carries[idx]  # state entering this device's chunk
    return h_local + prefix * carry_in


def context_parallel_linear_scan(
    a: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
) -> jax.Array:
    """Inclusive scan of ``h_t = a_t h_{t-1} + b_t`` with axis -2 sharded.

    a, b: (..., L, D) arrays (host-global); L is sharded over ``axis``.
    """
    ndim = a.ndim
    spec = P(*([None] * (ndim - 2) + [axis, None]))
    fn = jax.shard_map(
        partial(_local_combine, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )
    return fn(a, b)
