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


def _local_combine(a, b, axis_name, backend):
    """Per-device scan + cross-device carry correction."""
    h_local = linear_scan(a, b, backend=backend)  # zero-initialized local scan
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
    backend: Optional[str] = None,
) -> jax.Array:
    """Inclusive scan of ``h_t = a_t h_{t-1} + b_t`` with axis -2 sharded.

    a, b: (..., L, D) arrays (host-global); L is sharded over ``axis``.
    ``backend`` pins the per-device scan backend (default: the global one).
    """
    from ..ops.scan import default_backend

    if backend is None:
        # resolve the global default OUTSIDE the shard_map trace so the
        # choice is explicit in the jaxpr
        backend = default_backend()
    ndim = a.ndim
    spec = P(*([None] * (ndim - 2) + [axis, None]))
    # check_vma=False: the pallas_call inside linear_scan does not carry
    # varying-manual-axes metadata, and the combine is manually correct
    # (carries are exchanged via explicit all_gathers)
    fn = jax.shard_map(
        partial(_local_combine, axis_name=axis, backend=backend),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(a, b)
