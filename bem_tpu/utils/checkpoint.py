"""Checkpoint save/load.

Two artifacts, mirroring the reference (base_model.py:236-394):
- ``net_g_<iter>.msgpack``  — network params only ({param_key: tree}), the
  ``.pth`` equivalent; ``net_g_latest`` symlinked by name.
- ``<iter>.state``          — full training state (step/params/opt_state/
  ema/bayes_prior/rng) via orbax, for exact resume.

Both live under experiments/<name>/ like the reference's models/ and
training_states/ subdirs.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
from flax import serialization


def save_params(path: str, params: Any, param_key: str = "params", extra: dict = None):
    tree = {param_key: jax.device_get(params)}
    if extra:
        tree.update({k: jax.device_get(v) for k, v in extra.items()})
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def load_params(path: str, param_key: str = "params") -> Any:
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    if param_key in tree:
        return tree[param_key]
    # fall back to the sole entry (reference load_network param_key fallback,
    # base_model.py:303-312)
    if len(tree) == 1:
        return next(iter(tree.values()))
    return tree


def save_state(path: str, state: Any):
    """Serialize a TrainState pytree (orbax-free msgpack for portability)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = serialization.to_bytes(jax.device_get(state))
    with open(path, "wb") as f:
        f.write(flat)


def load_state(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def find_latest_state(state_dir: str) -> Optional[str]:
    """Max-iteration .state file (reference train.py:74-94 auto_resume scan)."""
    if not os.path.isdir(state_dir):
        return None
    best, best_iter = None, -1
    for name in os.listdir(state_dir):
        m = re.fullmatch(r"(\d+)\.state", name)
        if m and int(m.group(1)) > best_iter:
            best_iter = int(m.group(1))
            best = os.path.join(state_dir, name)
    return best
