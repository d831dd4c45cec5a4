"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP surface (SURVEY §2.9,
basicsr/utils/dist_util.py:10-82 + DDP wrap base_model.py:97-103):

- a 1-D ``data`` mesh axis shards the batch; params stay replicated; XLA
  inserts the gradient all-reduce (the only collective the reference uses).
- ``bayes`` axis (optional 2nd dim) shards the K Monte-Carlo samples of
  Stage-I inference across chips — the natural parallel axis the reference's
  per-sample Python loop cannot exploit.
- process-0 gating (``master_only``, dist_util.py:74-82) maps to
  ``jax.process_index() == 0``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch with the leading dim sharded over `axis`."""

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
